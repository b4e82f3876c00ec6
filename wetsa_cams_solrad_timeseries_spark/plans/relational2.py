"""Relational surface, part 2: analytic window functions, cube, unpivot,
correlated predicates, selective scans, date-part aggregation, string
function chains, and sketch aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.plans._spec import (
    exact_sum,
    exact_sum_sql,
    maybe_broadcast,
)


# --------------------------------------------------------------------------
# q43 — analytic window functions (lag/lead/rank/running sums)
# --------------------------------------------------------------------------
def q43_analytic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/dense_rank/cumulative sum over one partitioning — all four
    functions share a single shuffle+sort on (o_custkey, o_orderdate)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.dense_rank().over(w).cast("long").alias("order_seq"),
        F.round(F.sum("o_totalprice").over(wcum) + F.lit(1e-9), 6).alias("cum_spend"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_delta"),
    )


Q43_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       dense_rank()       OVER w AS order_seq,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING) + 1e-9, 6) AS cum_spend,
       o_totalprice - lag(o_totalprice) OVER w AS price_delta
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --------------------------------------------------------------------------
# q44 — cube (all grouping-set combinations)
# --------------------------------------------------------------------------
def q44_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): 4 grouping sets in one Expand+agg pass."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(exact_sum("o_totalprice") + F.lit(1e-9), 6).alias("total_price"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
    )


Q44_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round({exact_sum_sql('o_totalprice')} + 1e-9, 6) AS total_price,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# q45 — unpivot / melt (wide → long)
# --------------------------------------------------------------------------
def q45_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via ``stack`` — the inverse of the compile
    pipeline's pivot (R1); per-row expression, no shuffle until the
    final aggregate."""
    li = table(spark, sf_dir, "lineitem")
    long = li.select(
        "l_orderkey",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount) AS (measure, value)"
        ),
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(exact_sum("value") + F.lit(1e-9), 6).alias("sum_value"),
        F.round(exact_sum("value") / F.count("value") + F.lit(1e-9), 6).alias("avg_value"),
    )


Q45_ORACLE = f"""
WITH long AS (
  SELECT l_orderkey, measure, value
  FROM lineitem
  UNPIVOT (value FOR measure IN (l_quantity AS quantity,
                                 l_extendedprice AS extendedprice,
                                 l_discount AS discount))
)
SELECT measure, count(*) AS n_values,
       round({exact_sum_sql('value')} + 1e-9, 6) AS sum_value,
       round({exact_sum_sql('value')} / count(value) + 1e-9, 6) AS avg_value
FROM long GROUP BY measure
"""


# --------------------------------------------------------------------------
# q46 — correlated predicate (rows above their group average)
# --------------------------------------------------------------------------
def q46_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average order value — the correlated
    scalar subquery expressed as a window average (one shuffle, no
    re-join), the scalable decorrelated form."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round(F.col("cust_avg") + F.lit(1e-9), 6).alias("cust_avg_price"),
        )
    )


Q46_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       round(cust_avg + 1e-9, 6) AS cust_avg_price
FROM (
  SELECT *, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
)
WHERE o_totalprice > cust_avg
"""


# --------------------------------------------------------------------------
# q47 — selective scan + single aggregate (TPC-H Q6 shape)
# --------------------------------------------------------------------------
def q47_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly selective filter + one aggregate: every predicate reaches the
    parquet scan (PushedFilters), the aggregate is a single partial+final
    pass — the canonical scan-bound query."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(exact_sum(F.col("l_extendedprice") * F.col("l_discount")) + F.lit(1e-9), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q47_ORACLE = f"""
SELECT round({exact_sum_sql('l_extendedprice * l_discount')} + 1e-9, 6) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q48 — date-part aggregation (seasonality profile)
# --------------------------------------------------------------------------
def q48_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar breakdown of the event stream: day-of-week × hour-of-day
    aggregation (the time-series profiling twin of the reference's
    per-day loops)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value") + F.lit(1e-9), 6).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday → +1 aligns.
Q48_ORACLE = """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hour_of_day,
       count(*) AS n_events,
       round(avg(value) + 1e-9, 6) AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q49 — string function chain
# --------------------------------------------------------------------------
def q49_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-surface coverage: concat_ws, substring, lpad, replace,
    upper/lower, length, split-part — per-row, codegen'd, no shuffle."""
    cu = table(spark, sf_dir, "customer")
    name_num = F.split(F.col("c_name"), "#").getItem(1)
    return cu.select(
        "c_custkey",
        F.upper(F.col("c_mktsegment")).alias("segment_upper"),
        F.lower(F.col("c_name")).alias("name_lower"),
        name_num.alias("name_number"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_name")).alias("seg_name"),
        F.length(F.col("c_name")).alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
    )


Q49_ORACLE = """
SELECT c_custkey,
       upper(c_mktsegment) AS segment_upper,
       lower(c_name) AS name_lower,
       string_split(c_name, '#')[2] AS name_number,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       concat_ws('|', c_mktsegment, c_name) AS seg_name,
       CAST(length(c_name) AS INTEGER) AS name_len,
       replace(c_name, 'Customer', 'Cust') AS name_short,
       substr(c_name, 1, 8) AS name_prefix
FROM customer
"""


# --------------------------------------------------------------------------
# q50 — sketch aggregates (KMV distinct + bottom-k sample quantile)
# --------------------------------------------------------------------------
_KMV_K = 256
_KMV_SCALE = float((_KMV_K - 1) * 4294967296)  # (k−1)·2³², exact in a double


def q50_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory sketch aggregates per event type, built on the
    portable ``hash32`` so BOTH engines compute identical estimates (the
    reason to prefer these over ``approx_count_distinct``/t-digest here:
    engine-native sketches are unverifiable cross-engine by design).

    - KMV (k-minimum-values) distinct estimate: keep the k=256 smallest
      distinct hashes of user_id; if ≥k survive, est = (k−1)·2³² / h_(k),
      else the exact distinct-hash count. One integer division — the
      standard bottom-k cardinality estimator.
    - Bottom-k sample median of ``value``: a deterministic uniform sample
      (the 256 rows with smallest hash of event_id), then the sample's
      lower median (no interpolation → cross-engine exact).

    Scale shape: TWO-STAGE bounded-k selection, no per-group global
    sort anywhere in the plan — and ZERO Python round-trips (the
    round-5 mapInPandas form had the same plan shape but paid ~6 s of
    Arrow+Python serialization at sf0.1 where the JVM form pays ~0.5 s).
    Stage 1 groups by (group, spark_partition_id()) and keeps each
    physical partition's k smallest rows per group via
    slice(sort_array(collect_list(..)), 1, k): any row outside a
    partition's bottom-k cannot be in the global bottom-k — the same
    pruning argument as map-side combine, expressed as JVM array ops.
    Stage 2 flattens the surviving ≤ partitions·k rows per group and
    takes the global bottom-k. The stage-1 shuffle carries pruned
    arrays (≤ k·8 bytes per group per partition); the stage-2 fan-in is
    partitions·k per group — fine at any realistic layout (10k
    partitions × 256 ≈ 2.5M longs/group); a deployment with an extreme
    partition count would ADD an intermediate merge keyed on
    (group, pid % 1024) — not implemented here because the harness
    never approaches that regime. Exact twins are hash-checked in
    q11/q18."""
    from wetsa_cams_solrad_timeseries_spark.functions.hashing import hash32

    ev = table(spark, sf_dir, "events")

    # KMV over distinct user-id hashes. Stage 1 emits, per physical
    # partition and group, the k smallest hashes PLUS the partition's
    # row count: post-distinct rows are globally unique, so per-partition
    # counts sum to the exact distinct-hash count — one pass serves both
    # statistics.
    dh = ev.select(
        "event_type", hash32(F.col("user_id").cast("string")).alias("h")
    ).distinct()

    kmv = (
        dh.groupBy("event_type", F.spark_partition_id().alias("__pid"))
        .agg(
            F.slice(F.sort_array(F.collect_list("h")), 1, _KMV_K).alias("hs"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_h"),
            # kth smallest of the union of per-partition bottom-ks ==
            # global kth smallest; element_at is null when fewer than k
            # survive.
            F.element_at(
                F.sort_array(F.flatten(F.collect_list("hs"))), _KMV_K
            ).alias("hk"),
        )
        .select(
            "event_type",
            F.when(
                F.col("n_h") >= _KMV_K,
                F.round(F.lit(_KMV_SCALE) / F.col("hk") + F.lit(1e-9), 0).cast("long"),
            )
            .otherwise(F.col("n_h"))
            .alias("kmv_users"),
        )
    )

    # Bottom-k sample → lower median of value: same two-stage selection
    # keyed by (sample-hash, event_id), then the median comes from
    # sorting the ≤k-element sample array — array ops, not a window.
    hs = hash32(F.concat_ws("_", F.lit("s"), F.col("event_id").cast("string")))
    sampled = ev.select(
        "event_type", "value", "event_id", hs.alias("hs")
    )

    samp = F.slice(
        F.sort_array(F.flatten(F.collect_list("ss"))),
        1,
        _KMV_K,
    )
    by_value = F.sort_array(
        F.transform(
            F.col("samp"),
            lambda s: F.struct(
                s["value"].alias("value"), s["event_id"].alias("event_id")
            ),
        )
    )
    lower_median_idx = F.floor((F.size(F.col("samp")) + 1) / 2).cast("int") - 1
    med = (
        sampled.groupBy("event_type", F.spark_partition_id().alias("__pid"))
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("hs", "event_id", "value"))),
                1,
                _KMV_K,
            ).alias("ss")
        )
        .groupBy("event_type")
        .agg(samp.alias("samp"))
        .select(
            "event_type",
            F.round(
                F.get(by_value, lower_median_idx)["value"] + F.lit(1e-9), 6
            ).alias("p50_est"),
        )
    )

    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return exact.join(kmv, on="event_type").join(med, on="event_type")


Q50_ORACLE = f"""
WITH dh AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM events
),
rk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM dh
),
kmv AS (
  SELECT event_type,
         max(CASE WHEN rk <= {_KMV_K} THEN h END) AS hk,
         count(*) AS n_h
  FROM rk GROUP BY event_type
),
samp AS (
  SELECT event_type, value, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(('0x' || substr(md5('s_' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT),
                    event_id) AS srk
  FROM events
),
med AS (
  SELECT event_type, round(value + 1e-9, 6) AS p50_est FROM (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS vrk,
           count(*) OVER (PARTITION BY event_type) AS n_samp
    FROM samp WHERE srk <= {_KMV_K}
  ) WHERE vrk = (n_samp + 1) // 2
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_users, count(*) AS n_events
  FROM events GROUP BY event_type
)
SELECT ex.event_type, exact_users, n_events,
       CASE WHEN n_h >= {_KMV_K}
            THEN CAST(round({_KMV_SCALE!r} / hk + 1e-9, 0) AS BIGINT)
            ELSE n_h END AS kmv_users,
       p50_est
FROM ex JOIN kmv USING (event_type) JOIN med USING (event_type)
"""


# --------------------------------------------------------------------------
# q51 — range/interval join (bucketized band join)
# --------------------------------------------------------------------------
def q51_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events falling inside a 14-day window after any order of the same
    customer — the band join Spark lacks natively, via interval
    bucketization (operators/joins.py:range_join: equi-join on
    (key, bucket) + exact filter instead of a per-key cross join)."""
    from wetsa_cams_solrad_timeseries_spark.operators.joins import range_join

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # 2024 events vs 1995-2001 orders never overlap; shift the order dates
    # into the event year deterministically to make the join non-vacuous.
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("user_id"),
        F.expr("o_orderdate + (INTERVAL 28 YEARS)").alias("win_start"),
        F.expr("o_orderdate + (INTERVAL 28 YEARS) + (INTERVAL 14 DAYS)").alias("win_end"),
    )
    joined = range_join(
        ev, o, left_ts="ts", right_start="win_start", right_end="win_end",
        by=["user_id"], bucket="7 days",
    )
    return joined.groupBy("user_id", "o_orderkey", "win_start").agg(
        F.count(F.lit(1)).alias("n_events_in_window"),
        F.min("ts").alias("first_event"),
        F.max("ts").alias("last_event"),
    )


Q51_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey AS user_id,
         o_orderdate + INTERVAL 28 YEAR AS win_start,
         o_orderdate + INTERVAL 28 YEAR + INTERVAL 14 DAY AS win_end
  FROM orders
)
SELECT o.user_id, o.o_orderkey, o.win_start,
       count(*) AS n_events_in_window,
       min(e.ts) AS first_event,
       max(e.ts) AS last_event
FROM events e
JOIN o ON e.user_id = o.user_id AND e.ts >= o.win_start AND e.ts < o.win_end
GROUP BY o.user_id, o.o_orderkey, o.win_start
"""


# --------------------------------------------------------------------------
# q52 — SCD2 / CDC snapshot construction
# --------------------------------------------------------------------------
def q52_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) construction from a change
    stream: treating each customer's orders as state changes, build
    validity intervals [valid_from, valid_to) with a current-row flag —
    the MERGE-less CDC pattern (dedupe changes → lead() window). One
    shuffle on the business key."""
    o = table(spark, sf_dir, "orders")
    changes = o.groupBy(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").alias("valid_from"),
    ).agg(
        F.max("o_orderkey").alias("version_id"),
        F.round(F.sum("o_totalprice") + F.lit(1e-9), 6).alias("day_total"),
    )
    w = Window.partitionBy("cust_id").orderBy("valid_from")
    return changes.select(
        "cust_id",
        "version_id",
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.when(F.lead("valid_from").over(w).isNull(), 1).otherwise(0).alias("is_current"),
        "day_total",
    )


Q52_ORACLE = """
WITH changes AS (
  SELECT o_custkey AS cust_id, o_orderdate AS valid_from,
         max(o_orderkey) AS version_id,
         round(sum(o_totalprice) + 1e-9, 6) AS day_total
  FROM orders GROUP BY 1, 2
)
SELECT cust_id, version_id, valid_from,
       lead(valid_from) OVER w AS valid_to,
       CASE WHEN lead(valid_from) OVER w IS NULL THEN 1 ELSE 0 END AS is_current,
       day_total
FROM changes
WINDOW w AS (PARTITION BY cust_id ORDER BY valid_from)
"""


# --------------------------------------------------------------------------
# q57 — event-stream dimension enrichment
# --------------------------------------------------------------------------
def q57_event_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-enrichment pattern: events broadcast-joined through the
    customer → nation → region dimension chain, then aggregated per
    (region, event_type). In Structured Streaming the identical plan
    enriches micro-batches (broadcast dims refresh per batch)."""
    ev = table(spark, sf_dir, "events")
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")
    return (
        ev.join(maybe_broadcast(cu), ev.user_id == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact-decimal sum: region-level totals aggregate the whole
            # fact table into ~35 groups — the magnitude regime where a
            # double sum's 6th decimal is order-dependent (plans/_spec).
            F.round(exact_sum("value") + F.lit(1e-9), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


Q57_ORACLE = f"""
SELECT r_name AS region_name, event_type,
       count(*) AS n_events,
       round({exact_sum_sql('value')} + 1e-9, 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
JOIN customer ON user_id = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, event_type
"""


# --------------------------------------------------------------------------
# q58 — order-priority count with EXISTS on a date range (TPC-H Q4 shape)
# --------------------------------------------------------------------------
def q58_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join with a correlated date predicate: orders in a
    quarter having at least one late lineitem."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-03-01").cast("timestamp"))
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(late, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q58_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > TIMESTAMP '1996-03-01 00:00:00')
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q59 — conditional-share aggregate (TPC-H Q14 promo-revenue shape)
# --------------------------------------------------------------------------
def q59_brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio of one partition of revenue over total revenue in a single
    aggregation pass (conditional numerator, unconditional denominator)."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(maybe_broadcast(pa), li.l_partkey == pa.p_partkey)
    return joined.agg(
        F.round(
            exact_sum(F.when(F.col("p_brand") == "Brand#1", rev).otherwise(F.lit(0.0)))
            / exact_sum(rev) * 100.0 + F.lit(1e-9),
            6,
        ).alias("brand1_share_pct"),
        F.round(exact_sum(rev) + F.lit(1e-9), 6).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q59_BRAND_REV = (
    "CASE WHEN p_brand = 'Brand#1' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END"
)
Q59_ORACLE = f"""
SELECT round({exact_sum_sql(_Q59_BRAND_REV)}
             / {exact_sum_sql('l_extendedprice * (1 - l_discount)')} * 100.0 + 1e-9, 6) AS brand1_share_pct,
       round({exact_sum_sql('l_extendedprice * (1 - l_discount)')} + 1e-9, 6) AS total_revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --------------------------------------------------------------------------
# q65 — returned-item ranking (TPC-H Q10 shape)
# --------------------------------------------------------------------------
def q65_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to returns per customer over a quarter, top-20 with a
    deterministic tie-break; join + agg + rank over the aggregated side."""
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(cu), o.o_custkey == cu.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(1e-9), 6).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
    )
    # TakeOrderedAndProject shape (see q21/q88): rank only the 20
    # survivors, never single-partition-sort the full aggregated side.
    top = agg.orderBy(F.col("lost_revenue").desc(), F.col("c_custkey")).limit(20)
    w = Window.orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


Q65_ORACLE = """
WITH agg AS (
  SELECT c_custkey, c_name, c_mktsegment,
         round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 6) AS lost_revenue,
         count(*) AS n_returned_items
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY c_custkey, c_name, c_mktsegment
)
SELECT c_custkey, c_name, c_mktsegment, lost_revenue, n_returned_items, rn
FROM (SELECT *, row_number() OVER (ORDER BY lost_revenue DESC, c_custkey) AS rn FROM agg)
WHERE rn <= 20
"""


# --------------------------------------------------------------------------
# q66 — bi-nation trade volume by year (TPC-H Q7 shape)
# --------------------------------------------------------------------------
def q66_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation × customer-nation × ship-year revenue matrix:
    double dimension join + date-part extraction + grouped aggregate.

    The money expression is projected to DECIMAL(27,6) ONCE at the scan,
    before any join: the fact rows then carry one 16-byte decimal through
    the join shuffles instead of two doubles, and the aggregate consumes
    a ready column (measured ~18% off the query at sf0.1 — recovers the
    round-4 exact-decimal regression; values are bit-identical since the
    cast commutes with the joins)."""
    li = table(spark, sf_dir, "lineitem")
    li = li.withColumn(
        "__volume_dec",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)"),
    )
    o = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    su = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(maybe_broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("supp_nk"))
        .join(F.broadcast(n2), cu.c_nationkey == F.col("cust_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(F.sum("__volume_dec").cast("double") + F.lit(1e-9), 6).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q66_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       round({exact_sum_sql('l_extendedprice * (1 - l_discount)')} + 1e-9, 6) AS volume,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# --------------------------------------------------------------------------
# q67 — cheapest-supplier-per-part (TPC-H Q2's correlated-min shape)
# --------------------------------------------------------------------------
def q67_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each part sold, the supplier(s) matching the per-part minimum
    account balance — the correlated scalar-min subquery, decorrelated as
    a window min (no re-join of the aggregated subquery)."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    su = table(spark, sf_dir, "supplier")
    pa = table(spark, sf_dir, "part")
    priced = li.join(maybe_broadcast(su), li.l_suppkey == su.s_suppkey).join(
        maybe_broadcast(pa), li.l_partkey == pa.p_partkey
    )
    w = Window.partitionBy("l_partkey")
    return (
        priced.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "l_partkey",
            "p_brand",
            F.col("l_suppkey").alias("cheapest_suppkey"),
            "s_name",
            F.col("s_acctbal").alias("supplier_acctbal"),
        )
    )


Q67_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
priced AS (
  SELECT l_partkey, l_suppkey, p_brand, s_name, s_acctbal,
         min(s_acctbal) OVER (PARTITION BY l_partkey) AS min_bal
  FROM pairs
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part     ON l_partkey = p_partkey
)
SELECT l_partkey, p_brand, l_suppkey AS cheapest_suppkey, s_name,
       s_acctbal AS supplier_acctbal
FROM priced WHERE s_acctbal = min_bal
"""


# --------------------------------------------------------------------------
# q70 — correlation / covariance / dispersion aggregates (B-family)
# --------------------------------------------------------------------------
def q70_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation, sample covariance, and stddevs per group —
    the descriptive-statistics layer next to the regression aggregates
    (B1/B2): one distributed pass, same partial+final shape."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice") + F.lit(1e-9), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice") + F.lit(1e-9), 6).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity") + F.lit(1e-9), 6).alias("std_qty"),
        F.round(F.stddev_samp("l_extendedprice") + F.lit(1e-9), 6).alias("std_price"),
        F.round(F.var_samp("l_discount") + F.lit(1e-9), 6).alias("var_discount"),
        F.count(F.lit(1)).alias("n"),
    )


Q70_ORACLE = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice) + 1e-9, 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice) + 1e-9, 6) AS covar_qty_price,
       round(stddev_samp(l_quantity) + 1e-9, 6) AS std_qty,
       round(stddev_samp(l_extendedprice) + 1e-9, 6) AS std_price,
       round(var_samp(l_discount) + 1e-9, 6) AS var_discount,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


from wetsa_cams_solrad_timeseries_spark.plans._spec import make_specs

SPECS = make_specs(
    [
        ("q43_analytic_windows", q43_analytic_windows, Q43_ORACLE, (), "lag/lead/rank/cumsum"),
        ("q44_cube", q44_cube, Q44_ORACLE, (), "cube grouping sets"),
        ("q45_unpivot", q45_unpivot, Q45_ORACLE, ("R1",), "unpivot wide->long"),
        ("q46_above_group_avg", q46_above_group_avg, Q46_ORACLE, (), "decorrelated subquery"),
        ("q47_revenue_forecast", q47_revenue_forecast, Q47_ORACLE, (), "TPC-H Q6 selective scan"),
        ("q48_seasonality", q48_seasonality, Q48_ORACLE, (), "date-part aggregation"),
        ("q49_string_functions", q49_string_functions, Q49_ORACLE, ("F6", "F7", "F13"), "string chain"),
        ("q50_approx_sketches", q50_approx_sketches, Q50_ORACLE, (), "KMV + bottom-k sample sketches"),
        ("q51_range_join", q51_range_join, Q51_ORACLE, (), "bucketized range join"),
        ("q52_scd2_intervals", q52_scd2_intervals, Q52_ORACLE, (), "SCD2/CDC construction"),
        ("q57_event_enrichment", q57_event_enrichment, Q57_ORACLE, ("J2",), "stream-dim enrichment"),
        ("q58_order_priority_check", q58_order_priority_check, Q58_ORACLE, ("P7",), "TPC-H Q4 shape"),
        ("q59_brand_share", q59_brand_share, Q59_ORACLE, (), "TPC-H Q14 shape"),
        ("q65_returned_items", q65_returned_items, Q65_ORACLE, (), "TPC-H Q10 shape"),
        ("q66_nation_trade_volume", q66_nation_trade_volume, Q66_ORACLE, (), "TPC-H Q7 shape"),
        ("q67_cheapest_supplier", q67_cheapest_supplier, Q67_ORACLE, (), "TPC-H Q2 correlated-min shape"),
        ("q70_correlation_stats", q70_correlation_stats, Q70_ORACLE, ("B1", "B2"), "corr/covar/stddev aggregates"),
    ]
)
