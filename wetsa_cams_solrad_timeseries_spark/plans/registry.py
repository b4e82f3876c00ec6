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
)
from wetsa_cams_solrad_timeseries_spark.plans._spec import QuerySpec


# Queries the round-1 driver run never reached (its correctness pass runs
# registry order under a time budget and stopped mid-inventory), plus the
# two it flagged (q15 hash fail, q50 no-oracle). They run FIRST so a
# truncated pass can never leave them unverified again; relative order
# within each tier is still module order.
_VERIFY_FIRST = (
    "q15_sessionize",
    "q50_approx_sketches",
    "q35_fingerprints",
    "q36_text_quality",
    "q37_langid",
    "q64_tfidf",
    "q38_cosine_topk",
    "q39_ann_lsh_topk",
    "q40_embedding_neardup",
    "q41_multimodal_features",
    "q42_streaming_tumbling",
    "q53_streaming_stateful",
    "q56_ann_ivf_topk",
    "q63_streaming_sliding",
    "q71_streaming_sessions",
    "q72_dedup_clusters",  # new in round 2 — verify first
    "q73_neardup_lsh",  # new in round 2 — verify first
    "q74_large_volume_customers",
    "q75_disjunctive_revenue",
    "q76_market_share",
)


def _collect() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in (relational, relational2, relational3, timeseries, llm_ops, vector):
        merged.update(mod.SPECS)
    out: dict[str, QuerySpec] = {}
    for name in _VERIFY_FIRST:
        out[name] = merged[name]
    for name, spec in merged.items():
        if name not in out:
            out[name] = spec
    return out


QUERIES: dict[str, QuerySpec] = _collect()
