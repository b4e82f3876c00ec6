"""Table profiling: per-column quality statistics in one aggregation pass.

The observability primitive of a 100 TB pipeline: before/after every
dedup/filter stage you want null rates, distinct-ish cardinalities, and
numeric ranges per column — computed in ONE scan + ONE reduce (every
statistic is an algebraic aggregate), not a per-column loop of jobs.

Output is long-form (one row per column) so the profile of a 500-column
table is 500 rows, joinable across pipeline stages for drift detection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: rows, nulls, null_rate, distinct count
    (approximate by default — HLL sketch, one pass; exact costs a shuffle
    per column at scale), min/max/mean for numeric columns.

    All statistics for all columns compute in a single aggregation over
    one scan; the long-form reshape is a literal `stack`, not a shuffle.
    """
    cols = list(columns) if columns is not None else df.columns
    bad = [c for c in cols if "`" in c]
    if bad:
        raise ValueError(f"column names with backticks unsupported: {bad}")
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.NumericType)
    }
    distinct_fn = F.countDistinct if exact_distinct else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(distinct_fn(F.col(c)).alias(f"__d_{c}"))
        if c in numeric:
            aggs += [
                F.round(F.min(c).cast("double") + F.lit(1e-9), 6).alias(f"__min_{c}"),
                F.round(F.max(c).cast("double") + F.lit(1e-9), 6).alias(f"__max_{c}"),
                F.round(F.avg(c) + F.lit(1e-9), 6).alias(f"__avg_{c}"),
            ]
    wide = df.agg(*aggs)

    parts = []
    for c in cols:
        lit = c.replace("'", "''")  # SQL string-literal escaping
        mn = f"`__min_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"`__max_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        av = f"`__avg_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{lit}', `__nn_{c}`, `__d_{c}`, {mn}, {mx}, {av}")
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(column_name, n_non_null, n_distinct, min_value, max_value, avg_value)"
        ),
    )
    return stacked.select(
        "column_name",
        "n_rows",
        "n_non_null",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_null"),
        F.round(
            (F.col("n_rows") - F.col("n_non_null")) / F.col("n_rows") + F.lit(1e-9), 6).alias("null_rate"),
        "n_distinct",
        "min_value",
        "max_value",
        "avg_value",
    )
