"""Query registry: every declared engine capability as a named query with a
DuckDB oracle.

Each entry maps a SURVEY.md §2 operator (or an extension operator from the
north star) to:
  - ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
  - ``oracle`` — ANSI SQL for DuckDB over the same tables, or ``None`` for
    genuinely non-SQL-expressible ops (driver then records rows-only).

Determinism rules (the driver hashes sorted values):
  - every computed column is aliased identically in Spark and SQL;
  - multi-row float aggregates are rounded via ``round(x + 1e-9, 6)`` on
    BOTH sides. The nudge matters: decimal-resolution inputs make true
    aggregate values land exactly on rounding-grid boundaries, where
    cross-engine ULP noise (summation order; DuckDB vectorization/FMA vs
    JVM scalar arithmetic — observed even on per-row expressions) flips
    the rounded digit. Adding 1e-9 relocates the tie set to values the
    decimal data cannot produce, and 1e-9 dwarfs the ULP noise at these
    magnitudes, so both engines always round the same way. Empirically:
    2/54 queries flaked single rows at sf0.1 before the nudge, 0 after;
  - any top-k / row_number ordering has a unique tie-break key.
"""

from __future__ import annotations

from wetsa_cams_solrad_timeseries_spark.plans import (
    relational,
    relational2,
    relational3,
    timeseries,
    llm_ops,
    vector,
    pipeline_ops,
    curation,
    analytics,
    advanced,
)
from wetsa_cams_solrad_timeseries_spark.plans._spec import QuerySpec


# The driver's correctness pass runs registry order under a ~50-query
# budget, so with >50 declared queries some get no row each round. The
# rotation below front-loads whatever the MOST RECENT correctness report
# did not cover, so coverage alternates and every query's authoritative
# row stays no older than two rounds. Queries whose kernels changed since
# their last driver row can be pinned ahead of the automatic rotation.
_PIN_FIRST = (
    # Round 5 changed kernels/oracles — their r3/r4 driver rows are stale:
    # broadcast hints on SF-scaling tables became size-gated
    # (maybe_broadcast) in q03/q21/q22/q57/q59/q65/q66/q67/q74-q80/q84;
    # q66/q22 additionally pre-project the decimal money column; q83's
    # min/max moved to the raw double column; q93's oracle unnests
    # per-row; q71's session kernel constant-factor path changed; q76 was
    # restructured (region semi-join); q40's kernel moved from crossJoin
    # to the blocked-matmul applyInPandas path. Pinned in
    # most-structurally-changed-first order.
    "q40_embedding_neardup",
    "q66_nation_trade_volume",
    "q22_local_supplier_volume",
    "q76_market_share",
    "q83_salted_skew_agg",
    "q93_label_centroids",
    "q71_streaming_sessions",
    "q21_shipping_priority",
    "q65_returned_items",
    "q57_event_enrichment",
    "q74_large_volume_customers",
    "q77_streaming_multibatch",
    "q53_streaming_stateful",
    # NOT pinned despite round-5 touches — driver budget math: 13 pins
    # leave ~37 of the ~50 rows for the 73 never-checked new queries
    # (q95–q167; the remainder rotates to the front over the next two
    # rounds — tier 1 below outranks staleness rotation). The
    # unpinned-but-touched queries are covered at CLASS level by a
    # pinned twin plus a plan/pytest lock: q03/q59/q67/q75/q78/q79/q80/
    # q84 share the identical maybe_broadcast mechanic with pinned
    # q21/q22/q57/q65/q66/q74/q76 (and test_plan_budgets asserts the
    # gate); q82's drain-partition sizing is shared with pinned q53/q77;
    # q81/q91 changed only artifact lifecycle (now age-gated sweep) and
    # self-assert their pruning/zero-Exchange properties inline on every
    # execution; q85's scalar join respelling (join→crossJoin) is
    # plan-type-only and re-gated locally. The whole 159-query inventory
    # is additionally green at sf0.01 AND sf0.001 via tools/
    # check_oracle.py on every round-5 session (see STATUS.md).
)


def _coverage_sets() -> tuple[frozenset[str], frozenset[str]]:
    """(ever_covered, latest_covered) from the CORRECTNESS_r*.json
    reports in the repo root (two levels above this package).

    ``ever_covered`` = union across ALL rounds — its complement is the
    never-driver-checked set, which outranks everything but the pins (a
    query with NO authoritative row is a bigger gap than a stale one).
    ``latest_covered`` drives the staleness rotation among ever-checked
    queries. Missing/unparsable reports → empty sets (plain order)."""
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    ever: set[str] = set()
    best_round, best_path = -1, None
    try:
        for fname in os.listdir(root):
            m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
            if not m:
                continue
            path = os.path.join(root, fname)
            with open(path) as f:
                ever.update(json.load(f).keys())
            if int(m.group(1)) > best_round:
                best_round, best_path = int(m.group(1)), path
        if best_path is None:
            return frozenset(), frozenset()
        with open(best_path) as f:
            latest = frozenset(json.load(f).keys())
        return frozenset(ever), latest
    except (OSError, ValueError):
        return frozenset(), frozenset()


def _collect() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        relational2,
        relational3,
        timeseries,
        llm_ops,
        vector,
        pipeline_ops,
        curation,
        analytics,
        advanced,
    ):
        merged.update(mod.SPECS)
    ever, latest = _coverage_sets()
    ordered = [name for name in _PIN_FIRST if name in merged]
    # Tier 1: never driver-checked in ANY round.
    ordered += [n for n in merged if n not in ever and n not in ordered]
    # Tier 2: checked before, but rotated out of the latest round.
    ordered += [n for n in merged if n not in latest and n not in ordered]
    ordered += [n for n in merged if n not in ordered]
    return {name: merged[name] for name in ordered}


QUERIES: dict[str, QuerySpec] = _collect()
