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
    timeseries,
    llm_ops,
    vector,
)
from wetsa_cams_solrad_timeseries_spark.plans._spec import QuerySpec


def _collect() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for mod in (relational, relational2, timeseries, llm_ops, vector):
        out.update(mod.SPECS)
    return out


QUERIES: dict[str, QuerySpec] = _collect()
