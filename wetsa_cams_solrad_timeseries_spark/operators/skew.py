"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join handling covers joins, but a grouped aggregation on a
pathologically hot key (one key owning 30% of 100 TB) still funnels that
key's partials into ONE reducer. Salting splits each key into
``n_salts`` sub-keys for the partial phase, so the hot key's work spreads
across ``n_salts`` reducers; the final phase combines the (tiny)
per-salt partials.

Only algebraic measures decompose this way — sum/count/min/max directly,
avg as sum÷count at the final phase. The operator is RESULT-transparent:
output is bit-identical to a plain groupBy for sum-of-doubles up to
summation order (hence the engine-wide round-6 rule for float aggregates).

Note Spark's map-side partial aggregation already handles *moderate*
skew (each map task pre-combines); explicit salting is for the regime
where even the per-reducer combine of partials is too hot — or when the
aggregate's state is large (collect_list/HLL sketches).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# "count" is count(col) — non-null count, matching groupBy().agg(F.count(col))
# and making avg = sum/count reproduce Spark's null-skipping average.
_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_join(
    fact,
    dim,
    key: str,
    dim_key: str,
    n_salts: int = 8,
):
    """Skew-mitigated equi-join: the hot-key fix for the JOIN side (the
    aggregation side is :func:`salted_aggregate`). The fact's join key is
    salted with a deterministic hash-derived salt in [0, n_salts); the
    dim side is replicated n_salts× (explode over a salt sequence) so
    every (key, salt) bucket finds its dim row. A key that would land
    1B rows in one join task now spreads across n_salts tasks; the dim
    replication cost is n_salts×|dim| — cheap when dim is the small
    side, which is exactly the skewed-fact-join case.

    Deterministic (salt = crc32(fact key) % n_salts, no RNG) and
    result-identical to the plain join, which the oracle-checked query
    (q146) and the plan test assert. AQE's skew-join split solves the
    same problem at runtime when enabled; this is the explicit form
    that works on any session and composes with bucketing.
    """
    salt = (F.crc32(F.col(key).cast("string")) % n_salts).cast("int")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = fact_s.join(
        dim_s,
        (fact_s[key] == dim_s[dim_key])
        & (fact_s["__salt"] == dim_s["__salt"]),
    )
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, Sequence[str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregation with salt.

    ``measures`` maps column → aggregates, e.g. ``{"value": ("sum",
    "count", "min", "max", "avg")}``. Output columns are named
    ``{agg}_{col}``.
    """
    keys = list(keys)
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )

    partial_aggs, final_aggs, post = [], [], []
    for col, aggs in measures.items():
        need = set(aggs)
        if "avg" in need:
            need |= {"sum", "count"}
        for agg in sorted(need - {"avg"}):
            name = f"{agg}_{col}"
            partial_aggs.append(_PARTIAL[agg](col).alias(name))
            final_aggs.append(_FINAL[agg](name).alias(name))
        for agg in aggs:
            if agg == "avg":
                post.append(
                    (F.col(f"sum_{col}") / F.col(f"count_{col}")).alias(f"avg_{col}")
                )
            else:
                post.append(F.col(f"{agg}_{col}"))

    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final = partial.groupBy(*keys).agg(*final_aggs)
    return final.select(*keys, *post)
