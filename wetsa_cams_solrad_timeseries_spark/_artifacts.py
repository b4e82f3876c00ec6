"""Session-scoped artifact lifecycle.

Several queries materialize process-unique helper layouts once per run —
the q91 hive-partitioned events copy, the q77/q82 multi-file split
replays (both under ``tempfile.gettempdir()``), and q81's bucketed
warehouse tables (under ``./spark-warehouse``). The process-unique token
in each name fixes the stale-pid-reuse bug, but on its own every run
leaves a full generation of files behind, so repeated harness rounds
grow /tmp and the warehouse without bound.

Lifecycle rule implemented here, at the moment a generation is created:

1. **sweep**: remove every PRIOR generation matching the artifact's name
   pattern that does not carry the current process token, whose OWNER
   process (sibling ``<dir>.owner`` pid file) is no longer alive, AND
   that is older than ``_SWEEP_AGE_S``. Liveness + age together make
   CONCURRENT harnesses safe: a live sibling's generation is never
   clobbered mid-use however long it runs (a dir's mtime freezes at
   creation, so age alone failed for >1 h sessions; observed earlier: a
   parallel oracle-gate run sweeping the pytest process's bucketed
   tables failed q81), while orphans from crashed runs still get
   collected one age-window later. Disk stays bounded at ~one
   generation per SF tag per age window.
2. **atexit**: best-effort removal of our own generation at interpreter
   exit (pure ``shutil`` — no Spark needed, so it works after the
   session/JVM is gone).

Together they bound disk usage at ~one live generation per SF tag.
"""

from __future__ import annotations

import atexit
import glob
import os
import shutil
import time

_REGISTERED: set[str] = set()

# Foreign generations younger than this are presumed to belong to a LIVE
# concurrent process and are left alone; their own atexit hook removes
# them, or a later sweep does once they age out.
_SWEEP_AGE_S = 3600.0


def _cleanup_registered() -> None:  # pragma: no cover - exit hook
    for path in list(_REGISTERED):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except OSError:
                pass


atexit.register(_cleanup_registered)


def register_cleanup(path: str) -> str:
    """Register an arbitrary path for best-effort removal at interpreter
    exit (no sweep — for throwaway outputs like drain parquet dirs that
    have no generation pattern). Returns ``path`` for chaining."""
    _REGISTERED.add(path)
    return path


def _owner_alive(artifact_dir: str) -> bool:
    """True when the SIBLING ``<dir>.owner`` pid file records a process
    that still runs. The owner file sits NEXT TO the artifact dir, not
    inside it, because a Spark ``mode("overwrite")`` write wipes the dir
    contents. Missing/unreadable owner files report NOT alive (fall
    through to the age gate)."""
    try:
        with open(artifact_dir.rstrip("/") + ".owner") as fh:
            pid = int(fh.read().strip())
        return os.path.exists(f"/proc/{pid}")
    except (OSError, ValueError):
        return False


def claim_artifact_dir(pattern: str, token: str, path: str) -> str:
    """Claim ``path`` (which must match ``pattern`` and contain ``token``)
    as this process's generation of an artifact family: sweep prior
    generations matching ``pattern`` that lack ``token``, and register
    ``path`` for atexit removal. Returns ``path`` for chaining.

    Sweep rule: a foreign generation is removed only when its recorded
    OWNER process is gone AND it is older than the age gate. The
    liveness check matters because a dir's mtime freezes at creation —
    age alone would let a second harness delete a >1 h-old generation a
    LONG-RUNNING sibling is still reading (the clobber class the age
    gate was added for, merely pushed past the 1 h mark)."""
    for stale in glob.glob(pattern):
        # The pattern can also match sibling .owner pid FILES — only
        # directories are artifact generations.
        if not os.path.isdir(stale):
            continue
        if token in os.path.basename(stale):
            continue
        if _owner_alive(stale):
            continue
        try:
            if time.time() - os.path.getmtime(stale) < _SWEEP_AGE_S:
                continue
        except OSError:
            continue
        shutil.rmtree(stale, ignore_errors=True)
        try:
            os.remove(stale.rstrip("/") + ".owner")
        except OSError:
            pass
    # Record ownership (sibling pid file) so other processes can test
    # our liveness before sweeping.
    owner = path.rstrip("/") + ".owner"
    try:
        with open(owner, "w") as fh:
            fh.write(str(os.getpid()))
    except OSError:
        pass
    _REGISTERED.add(path)
    _REGISTERED.add(owner)
    return path


# Absolute warehouse path per SparkContext, resolved ONCE at session
# creation (session.get_spark calls resolve_warehouse immediately): a
# RELATIVE spark.sql.warehouse.dir is resolved by Spark against the
# process cwd at session START, so abspath-ing it lazily at first claim
# could point the sweep/atexit at a different ./spark-warehouse if the
# cwd moved in between (round-10 ADVICE fix).
_WAREHOUSE_ABS: dict[str, str] = {}


def resolve_warehouse(spark) -> str:
    """Absolute path of the session's managed-table warehouse, cached by
    applicationId so the value is pinned to what Spark resolved at
    session start regardless of later ``os.chdir`` calls."""
    key = spark.sparkContext.applicationId
    if key not in _WAREHOUSE_ABS:
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        wh = wh.removeprefix("file://").removeprefix("file:")
        _WAREHOUSE_ABS[key] = os.path.abspath(wh)
    return _WAREHOUSE_ABS[key]


def claim_warehouse_table(spark, family_glob: str, token: str, table_name: str) -> None:
    """Claim a managed TABLE's directory as this process's generation of
    a warehouse artifact family — the shared scaffold of the cross-run
    index queries (q193 LSH band rows, q197 PQ books + codes, q201
    postings stats): resolve the session warehouse dir (stripping the
    file: scheme Spark sometimes reports), sweep dead prior generations
    of ``family_glob``, and register ``table_name``'s dir for atexit
    removal. Raises on a missing/odd catalog config — callers wrap in
    try/except and treat failure as "catalog unavailable" (their query
    then falls back to unpersisted frames)."""
    wh = resolve_warehouse(spark)
    claim_artifact_dir(
        os.path.join(wh, family_glob), token, os.path.join(wh, table_name)
    )
