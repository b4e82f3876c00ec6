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
   pattern that does not carry the current process token (safe — tokens
   are process-unique, so another LIVE process never matches a foreign
   sweep pattern's base name with our token either; a concurrent
   process's artifacts are only removed by that process's own exit hook
   or a later sweep after it exited, which is the documented
   single-harness assumption of the /tmp layouts).
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

_REGISTERED: set[str] = set()


def _cleanup_registered() -> None:  # pragma: no cover - exit hook
    for path in list(_REGISTERED):
        shutil.rmtree(path, ignore_errors=True)


atexit.register(_cleanup_registered)


def claim_artifact_dir(pattern: str, token: str, path: str) -> str:
    """Claim ``path`` (which must match ``pattern`` and contain ``token``)
    as this process's generation of an artifact family: sweep prior
    generations matching ``pattern`` that lack ``token``, and register
    ``path`` for atexit removal. Returns ``path`` for chaining."""
    for stale in glob.glob(pattern):
        if token not in os.path.basename(stale):
            shutil.rmtree(stale, ignore_errors=True)
    _REGISTERED.add(path)
    return path
