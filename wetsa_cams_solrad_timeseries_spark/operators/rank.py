"""Distributed global ranking: exact corpus-wide row_number / ntile
without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` collapses the whole
dataset into ONE task — the textbook global-sort scale-killer (Spark even
warns). The production decomposition implemented here is the classic
two-phase rank:

1. ``repartitionByRange`` on the ordering key — Spark samples range
   boundaries and gives ascending key ranges to ascending partition ids;
2. per-partition ``row_number`` (each task sorts only its own range);
3. per-partition counts → cumulative offsets (one row PER PARTITION, a
   few hundred at cluster scale — the only driver-ish step, and it is
   bounded by partition count, never by data);
4. global_rank = local row_number + offset of all lower ranges.

The result is exact and independent of where the sampled boundaries
land, because the ordering key is made unique by a caller-supplied
tie-break column: no key straddles two partitions ambiguously, and
offsets account for every row. This is the same algorithm Spark itself
uses for ``sortByKey`` ranges; expressing it with DataFrame ops keeps
Catalyst in charge of everything but the boundary sampling.

``global_ntile`` applies the SQL-standard NTILE split on top of the
scalable rank: with n rows and k tiles, the first ``n % k`` tiles get
``n // k + 1`` rows — bit-for-bit the semantics of ``ntile(k) OVER
(ORDER BY ...)`` in Spark and DuckDB, so oracles can use plain NTILE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_LOCAL = "__gr_local"
_OFF = "__gr_off"
_TOTAL = "__gr_total"


def global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    *,
    rank_col: str = "rank",
    num_partitions: int | None = None,
    keep_total: bool = False,
) -> DataFrame:
    """Exact 1-based global row_number over ``order_cols`` (which must be
    a unique composite key — include a tie-break), computed with
    range-partition + local-sort + offset instead of a one-task window.
    With ``keep_total`` the row count rides along as ``__gr_total``
    (used by :func:`global_ntile`).
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parted = df.repartitionByRange(nparts, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    w_local = Window.partitionBy(_PID).orderBy(*cols)
    local = parted.withColumn(_LOCAL, F.row_number().over(w_local))
    sizes = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("__cnt"))
    # Offsets frame: one row per partition (bounded by cluster layout,
    # not data) — the single-partition running sum here is over ≤nparts
    # rows by construction.
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        _PID,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias(_OFF),
        F.sum("__cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias(_TOTAL),
    )
    out = (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_LOCAL) + F.col(_OFF)).cast("long"))
        .drop(_PID, _LOCAL, _OFF)
    )
    return out if keep_total else out.drop(_TOTAL)


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    *,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running total of ``value_col`` over a global ordering,
    computed with the same two-phase decomposition as :func:`global_rank`
    (per-range local cumsum + per-partition totals → offsets) instead of
    a one-task window. The workhorse behind shard planning ("cut the
    corpus every N bytes in key order") and exact CDF assignment.

    Exactness note: with integer values the result is independent of the
    partition boundaries (integer addition is associative); with doubles
    the grouping of additions differs from a serial scan, so use integer
    byte/count columns for bit-stable planning decisions.
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parted = df.repartitionByRange(nparts, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted.withColumn("__gr_lsum", F.sum(value_col).over(w_local))
    totals = parted.groupBy(_PID).agg(F.sum(value_col).alias("__tot"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID, F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col("__gr_lsum") + F.col(_OFF))
        .drop(_PID, "__gr_lsum", _OFF)
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    k: int,
    *,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(k) over a global ordering, scalably (see module doc).

    SQL-standard split: big = n % k tiles of size n//k + 1 come first,
    the rest have size n//k. Matches ``ntile(k)`` in Spark AND DuckDB.
    """
    ranked = global_rank(
        df,
        order_cols,
        rank_col="__gr_rank",
        num_partitions=num_partitions,
        keep_total=True,
    )
    n = F.col(_TOTAL)
    r = F.col("__gr_rank")
    size_small = (n / k).cast("long")
    big = n % k
    size_big = size_small + 1
    cut = big * size_big
    tile = (
        F.when(r <= cut, ((r - 1) / size_big).cast("long") + 1)
        .otherwise(big + ((r - cut - 1) / size_small).cast("long") + 1)
        .cast("int")
    )
    return ranked.withColumn(tile_col, tile).drop("__gr_rank", _TOTAL)
