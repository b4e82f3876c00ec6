"""Time-series query inventory: tumbling windows, dense grids, timestamp
joins, local-time derivation, QC filtering, sessionization, as-of joins,
quantiles — the reference's temporal surface (SURVEY.md §2.5, §2.7)
generalized over the `events` stream table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.operators.window_agg import (
    time_grid,
    tumbling_mean,
    with_dense_grid,
)
from wetsa_cams_solrad_timeseries_spark.operators.joins import asof_join, timestamp_join
from wetsa_cams_solrad_timeseries_spark.operators.filters import qc_flag_filter
from wetsa_cams_solrad_timeseries_spark.functions.scalar import local_time, null_safe_ratio


# --------------------------------------------------------------------------
# q02 — tumbling 10-minute window mean (A1, the reference's core operator)
# --------------------------------------------------------------------------
def q02_tumbling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``resample('10min').mean()`` (code/get-cams-solrad-ts.py:94) as
    ``groupBy(window(...))`` with the per-file station loop promoted to an
    explicit group key (event_type here). One shuffle keyed by
    (type, bucket); map-side partial aggregation makes the shuffle carry
    only one row per group per task at any scale.
    """
    ev = table(spark, sf_dir, "events")
    out = tumbling_mean(
        ev, ts_col="ts", value_cols=["value"], width="10 minutes",
        group_cols=["event_type"], counts=True,
    )
    return out.select(
        "event_type",
        "bucket_start",
        F.round(F.col("value") + F.lit(1e-9), 6).alias("avg_value"),
        F.col("n_rows").alias("n_events"),
    )


Q02_ORACLE = """
SELECT event_type,
       time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
       round(avg(value) + 1e-9, 6) AS avg_value,
       count(*) AS n_events
FROM events
GROUP BY event_type, time_bucket(INTERVAL '10 minutes', ts)
"""


# --------------------------------------------------------------------------
# q04 — timestamp equi-join of two series (J1) + bias/ratio (F9/F10)
# --------------------------------------------------------------------------
def q04_series_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compare pipeline's central join (code/solrad-compare.py:80):
    two 10-minute series (clicks as 'model', views as 'truth') inner-joined
    on the bucket timestamp, then bias and null-safe ratio derived
    (code/solrad-compare.py:88-91). Both sides are post-aggregation
    (small) — AQE demotes the join to broadcast at runtime."""
    ev = table(spark, sf_dir, "events")

    def series(kind: str, prefix: str) -> DataFrame:
        return (
            tumbling_mean(
                ev.filter(F.col("event_type") == kind),
                ts_col="ts", value_cols=["value"], width="10 minutes",
            )
            .select("bucket_start", F.round(F.col("value") + F.lit(1e-9), 6).alias(f"{prefix}_avg"))
        )

    clicks, views = series("click", "click"), series("view", "view")
    joined = timestamp_join(clicks, views, ts_col="bucket_start", how="inner")
    return joined.select(
        "bucket_start",
        "click_avg",
        "view_avg",
        (F.col("click_avg") - F.col("view_avg")).alias("bias"),
        F.abs(F.col("click_avg") - F.col("view_avg")).alias("abs_bias"),
        F.round(null_safe_ratio(F.col("click_avg"), F.col("view_avg")) + F.lit(1e-9), 6).alias("ratio"),
    )


Q04_ORACLE = """
WITH clicks AS (
  SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
         round(avg(value) + 1e-9, 6) AS click_avg
  FROM events WHERE event_type = 'click' GROUP BY 1
),
views AS (
  SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
         round(avg(value) + 1e-9, 6) AS view_avg
  FROM events WHERE event_type = 'view' GROUP BY 1
)
SELECT bucket_start, click_avg, view_avg,
       click_avg - view_avg AS bias,
       abs(click_avg - view_avg) AS abs_bias,
       round(click_avg / nullif(view_avg, 0) + 1e-9, 6) AS ratio
FROM clicks JOIN views USING (bucket_start)
"""


# --------------------------------------------------------------------------
# q05 — QC flag filter (P4/A2) over JSON-derived flags (extension: from_json)
# --------------------------------------------------------------------------
def q05_qc_flag_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ground-observation QC gate (code/solrad-compare.py:35-42): keep
    rows whose flag sum is 0, where flags derive from the event payload
    (JSON ``props`` parsed JVM-side with get_json_object — the extension
    tables' from_json surface, SURVEY.md §1.2)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    flagged = ev.select(
        "event_id", "event_type", "value",
        k.alias("k"),
        F.when(k > 90, 1).otherwise(0).alias("flag_k_high"),
        F.when(F.col("value") < 1.0, 1).otherwise(0).alias("flag_low_value"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("flag_error"),
    )
    clean = qc_flag_filter(flagged, ["flag_k_high", "flag_low_value", "flag_error"])
    return clean.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_clean"),
        F.round(F.avg("value") + F.lit(1e-9), 6).alias("avg_value"),
        F.round(F.avg("k") + F.lit(1e-9), 6).alias("avg_k"),
    )


Q05_ORACLE = """
WITH flagged AS (
  SELECT event_id, event_type, value,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 90 THEN 1 ELSE 0 END AS flag_k_high,
         CASE WHEN value < 1.0 THEN 1 ELSE 0 END AS flag_low_value,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS flag_error
  FROM events
)
SELECT event_type, count(*) AS n_clean,
       round(avg(value) + 1e-9, 6) AS avg_value,
       round(avg(k) + 1e-9, 6) AS avg_k
FROM flagged
WHERE coalesce(flag_k_high,0) + coalesce(flag_low_value,0) + coalesce(flag_error,0) = 0
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q07 — local-time derivation (F4/F5) through a tz-string round-trip
# --------------------------------------------------------------------------
def q07_local_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC-offset parsing and per-row local time (code/compile-solrad.py:52,
    115): build an Indonesia-style 'UTC+7/8/9' string per user, parse it
    back (F5), add as an interval (F4). Column-level interval arithmetic —
    no UDF."""
    from wetsa_cams_solrad_timeseries_spark.functions.scalar import parse_utc_offset

    ev = table(spark, sf_dir, "events")
    tz = F.concat(F.lit("UTC+"), ((F.col("user_id") % 3) + 7).cast("string"))
    withtz = ev.select("event_id", "user_id", "ts", tz.alias("tz_str"))
    off = parse_utc_offset("tz_str")
    return withtz.select(
        "event_id",
        "user_id",
        "tz_str",
        off.alias("offset_hours"),
        "ts",
        local_time("ts", off).alias("time_local"),
    )


Q07_ORACLE = """
SELECT event_id, user_id,
       'UTC+' || CAST(user_id % 3 + 7 AS VARCHAR) AS tz_str,
       CAST(replace('UTC+' || CAST(user_id % 3 + 7 AS VARCHAR), 'UTC', '') AS INTEGER) AS offset_hours,
       ts,
       ts + to_hours(CAST(user_id % 3 + 7 AS BIGINT)) AS time_local
FROM events
"""


# --------------------------------------------------------------------------
# q12 — dense time grid with empty buckets (A1 pandas-resample parity)
# --------------------------------------------------------------------------
def q12_dense_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``resample`` emits EMPTY buckets as NaN rows; Spark's window
    aggregate omits them (SURVEY.md §2.5 A1 divergence). Reproduce pandas:
    generate the bucket grid with ``sequence()`` on the executors and
    left-join the sparse aggregate onto it. Counts coalesce to 0, means
    stay null — exactly pandas semantics."""
    ev = table(spark, sf_dir, "events")
    agg = tumbling_mean(ev, ts_col="ts", value_cols=["value"], width="1 hour", counts=True)
    agg = agg.select(
        "bucket_start",
        F.round(F.col("value") + F.lit(1e-9), 6).alias("avg_value"),
        F.col("n_rows").alias("n_events"),
    )
    grid = time_grid(
        ev,
        lo=F.date_trunc("hour", F.min("ts")),
        hi=F.date_trunc("hour", F.max("ts")),
        width="1 hour",
    )
    return with_dense_grid(grid_df=grid, agg_df=agg, fill_zero_cols=["n_events"]).select(
        "bucket_start", "n_events", "avg_value"
    )


Q12_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket_start FROM bounds
),
agg AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
         round(avg(value) + 1e-9, 6) AS avg_value,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT g.bucket_start,
       coalesce(a.n_events, 0) AS n_events,
       a.avg_value AS avg_value
FROM grid g LEFT JOIN agg a USING (bucket_start)
"""


# --------------------------------------------------------------------------
# q15 — sessionization (gap-based) via ranking windows
# --------------------------------------------------------------------------
def q15_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity): lag + cumulative
    sum of session-break flags, then per-session aggregates. Two window
    passes over ONE shuffle (same partitioning by user_id), then a grouped
    aggregate that reuses the partitioning — no extra shuffle."""
    ev = table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_user))
    sessions = (
        ev.withColumn(
            "new_session",
            F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.round(F.sum("value") + F.lit(1e-9), 6).alias("sum_value"),
    )


Q15_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  -- CAST: DuckDB types a windowed sum(int) as HUGEINT (int128); Spark emits
  -- BIGINT. The driver's hasher encodes values with their storage type, so
  -- the widths must match even though the printed values are identical.
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       min(ts) AS session_start,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
       round(sum(value) + 1e-9, 6) AS sum_value
FROM sessions
GROUP BY user_id, session_seq
"""


# --------------------------------------------------------------------------
# q17 — as-of join (latest order at or before each event)
# --------------------------------------------------------------------------
def q17_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the latest prior order of the same
    customer (union–sort–carry-forward; see operators/joins.py for the
    scale analysis). The right side is pre-deduplicated to one row per
    (custkey, orderdate) so the result is well-defined on both engines."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
        .withColumnRenamed("o_orderdate", "last_orderdate")
    )
    joined = asof_join(
        ev, orders,
        left_ts="ts", right_ts="last_orderdate",
        by=["user_id"], right_cols=["last_orderkey", "last_orderdate"],
        how="left",
    )
    return joined.select("event_id", "user_id", "ts", "last_orderkey", "last_orderdate")


Q17_ORACLE = """
WITH ord AS (
  SELECT o_custkey AS user_id, o_orderdate AS last_orderdate,
         max(o_orderkey) AS last_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, o.last_orderkey, o.last_orderdate
FROM events e
ASOF LEFT JOIN ord o ON e.user_id = o.user_id AND e.ts >= o.last_orderdate
"""


# --------------------------------------------------------------------------
# q18 — exact quantiles (extension of A-family; linear interpolation)
# --------------------------------------------------------------------------
def q18_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``). At 100 TB swap for
    ``percentile_approx`` (t-digest sketch, mergeable, one pass) — kept
    exact here because the oracle hash requires exactness."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)") + F.lit(1e-9), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)") + F.lit(1e-9), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)") + F.lit(1e-9), 6).alias("p99"),
        F.round(F.min("value") + F.lit(1e-9), 6).alias("vmin"),
        F.round(F.max("value") + F.lit(1e-9), 6).alias("vmax"),
    )


Q18_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5) + 1e-9, 6)  AS p50,
       round(quantile_cont(value, 0.9) + 1e-9, 6)  AS p90,
       round(quantile_cont(value, 0.99) + 1e-9, 6) AS p99,
       round(min(value) + 1e-9, 6) AS vmin,
       round(max(value) + 1e-9, 6) AS vmax
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q54 — sliding (hopping) window aggregation
# --------------------------------------------------------------------------
def q54_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes: each event lands in
    width/slide = 2 windows. Spark's ``window(ts, width, slide)`` expands
    rows window-count times then aggregates — one shuffle, the same plan
    shape as the tumbling case (A1 generalization)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value") + F.lit(1e-9), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


# An event at ts belongs to window starts {bucket5(ts), bucket5(ts)−5min}
# filtered to ts < start + 10min (always true for the first).
Q54_ORACLE = """
WITH cand AS (
  SELECT event_type, value, ts,
         unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS window_start
  FROM events
)
SELECT window_start, event_type,
       count(*) AS n_events,
       round(avg(value) + 1e-9, 6) AS avg_value
FROM cand
WHERE ts >= window_start AND ts < window_start + INTERVAL '10 minutes'
GROUP BY window_start, event_type
"""


# --------------------------------------------------------------------------
# q55 — native session windows (gap-merged)
# --------------------------------------------------------------------------
def q55_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``session_window`` (30-minute gap): the built-in
    twin of the lag/cumsum sessionization in q15 — same session
    boundaries, one operator. Works identically under Structured
    Streaming with a watermark (state = open sessions)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# Session semantics: window end extends 30min past the LAST event; events
# within 30min of the previous event merge. Equivalent closed form: the
# q15 gap/cumsum construction.
Q55_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       count(*) AS n_events,
       round(sum(value) + 1e-9, 6) AS sum_value
FROM sessions
GROUP BY user_id, session_seq
"""


# --------------------------------------------------------------------------
# q60 — as-of join with tolerance (pandas merge_asof(tolerance=...) parity)
# --------------------------------------------------------------------------
def q60_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17's as-of join with an 8400-day tolerance — the cutoff lands
    inside the order-date range, so some matches survive and the ones
    whose matched order is older than 8400 days before the event null
    out (same single-shuffle carry-forward plan plus one gated column —
    operators/joins.py)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
        .withColumnRenamed("o_orderdate", "last_orderdate")
    )
    joined = asof_join(
        ev, orders,
        left_ts="ts", right_ts="last_orderdate",
        by=["user_id"], right_cols=["last_orderkey", "last_orderdate"],
        how="left", tolerance="8400 days",
    )
    return joined.select("event_id", "user_id", "ts", "last_orderkey", "last_orderdate")


Q60_ORACLE = """
WITH ord AS (
  SELECT o_custkey AS user_id, o_orderdate AS last_orderdate,
         max(o_orderkey) AS last_orderkey
  FROM orders GROUP BY 1, 2
),
matched AS (
  SELECT e.event_id, e.user_id, e.ts, o.last_orderkey, o.last_orderdate
  FROM events e
  ASOF LEFT JOIN ord o ON e.user_id = o.user_id AND e.ts >= o.last_orderdate
)
SELECT event_id, user_id, ts,
       CASE WHEN last_orderdate >= ts - INTERVAL 8400 DAY THEN last_orderkey END AS last_orderkey,
       CASE WHEN last_orderdate >= ts - INTERVAL 8400 DAY THEN last_orderdate END AS last_orderdate
FROM matched
"""


# --------------------------------------------------------------------------
# q61 — one-pass table profiling (pipeline observability)
# --------------------------------------------------------------------------
def q61_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct/range statistics for the fact table in one
    scan + one reduce (operators/profile.py). Exact distinct here because
    the oracle needs exactness; the default is the HLL sketch."""
    from wetsa_cams_solrad_timeseries_spark.operators.profile import profile_table

    li = table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"]
    return profile_table(li, columns=cols, exact_distinct=True)


Q61_ORACLE = """
WITH w AS (
  SELECT count(*) AS n_rows,
         count(l_orderkey) AS nn1, count(DISTINCT l_orderkey) AS d1,
         round(CAST(min(l_orderkey) AS DOUBLE) + 1e-9, 6) AS min1,
         round(CAST(max(l_orderkey) AS DOUBLE) + 1e-9, 6) AS max1, round(avg(l_orderkey) + 1e-9, 6) AS avg1,
         count(l_quantity) AS nn2, count(DISTINCT l_quantity) AS d2,
         round(CAST(min(l_quantity) AS DOUBLE) + 1e-9, 6) AS min2,
         round(CAST(max(l_quantity) AS DOUBLE) + 1e-9, 6) AS max2, round(avg(l_quantity) + 1e-9, 6) AS avg2,
         count(l_extendedprice) AS nn3, count(DISTINCT l_extendedprice) AS d3,
         round(CAST(min(l_extendedprice) AS DOUBLE) + 1e-9, 6) AS min3,
         round(CAST(max(l_extendedprice) AS DOUBLE) + 1e-9, 6) AS max3, round(avg(l_extendedprice) + 1e-9, 6) AS avg3,
         count(l_returnflag) AS nn4, count(DISTINCT l_returnflag) AS d4,
         count(l_shipdate) AS nn5, count(DISTINCT l_shipdate) AS d5
  FROM lineitem
)
SELECT column_name, n_rows, n_non_null,
       n_rows - n_non_null AS n_null,
       round(CAST(n_rows - n_non_null AS DOUBLE) / n_rows + 1e-9, 6) AS null_rate,
       n_distinct, min_value, max_value, avg_value
FROM (
  SELECT 'l_orderkey' AS column_name, n_rows, nn1 AS n_non_null, d1 AS n_distinct,
         min1 AS min_value, max1 AS max_value, avg1 AS avg_value FROM w
  UNION ALL
  SELECT 'l_quantity', n_rows, nn2, d2, min2, max2, avg2 FROM w
  UNION ALL
  SELECT 'l_extendedprice', n_rows, nn3, d3, min3, max3, avg3 FROM w
  UNION ALL
  SELECT 'l_returnflag', n_rows, nn4, d4, NULL, NULL, NULL FROM w
  UNION ALL
  SELECT 'l_shipdate', n_rows, nn5, d5, NULL, NULL, NULL FROM w
)
"""


# --------------------------------------------------------------------------
# q69 — latest-state snapshot via max_by/arg_max
# --------------------------------------------------------------------------
def q69_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state snapshot per user in ONE aggregation: max_by pulls
    the value/type of the latest event without a self-join or window
    (deterministic here because (user_id, ts) is unique). The idiomatic
    replacement for the 'window rank = 1' pattern when only the latest
    row's fields are needed — half the shuffle data of the ranked form."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.expr("max_by(event_type, ts)").alias("last_event_type"),
        F.round(F.expr("max_by(value, ts)") + F.lit(1e-9), 6).alias("last_value"),
        F.expr("min_by(event_type, ts)").alias("first_event_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


Q69_ORACLE = """
SELECT user_id,
       max(ts) AS last_ts,
       arg_max(event_type, ts) AS last_event_type,
       round(arg_max(value, ts) + 1e-9, 6) AS last_value,
       arg_min(event_type, ts) AS first_event_type,
       count(*) AS n_events
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q68 — event funnel (ordered-sequence conversion analysis)
# --------------------------------------------------------------------------
def q68_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → purchase funnel per user: first signup, first purchase
    strictly after it, conversion flag and time-to-convert. One grouped
    conditional-min aggregation per stage over a single shuffle on
    user_id — the ordered-sequence analysis every event pipeline needs."""
    ev = table(spark, sf_dir, "events")
    first_signup = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).alias("first_signup")
    per_user = ev.groupBy("user_id").agg(first_signup)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    # CONDITIONAL min, not a row filter: a pre-aggregation filter would
    # DROP a user whose purchases all precede the first signup (every
    # joined row removed → no group row), while the oracle's
    # FILTER-clause aggregate keeps them with converted=0. The when()
    # inside min() keeps the group row and nulls the aggregate — the
    # exact FILTER semantics.
    conv = (
        per_user.filter(F.col("first_signup").isNotNull())
        .join(purchases, on="user_id", how="left")
        .groupBy("user_id", "first_signup")
        .agg(
            F.min(
                F.when(
                    F.col("purchase_ts") > F.col("first_signup"),
                    F.col("purchase_ts"),
                )
            ).alias("first_purchase_after")
        )
    )
    return conv.select(
        "user_id",
        "first_signup",
        "first_purchase_after",
        F.when(F.col("first_purchase_after").isNotNull(), 1).otherwise(0).alias("converted"),
        (
            F.unix_micros(F.col("first_purchase_after"))
            - F.unix_micros(F.col("first_signup"))
        ).alias("conversion_us"),
    )


Q68_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
  FROM events GROUP BY user_id
),
conv AS (
  SELECT p.user_id, p.first_signup,
         min(e.ts) FILTER (e.event_type = 'purchase' AND e.ts > p.first_signup)
           AS first_purchase_after
  FROM per_user p
  LEFT JOIN events e ON e.user_id = p.user_id
  WHERE p.first_signup IS NOT NULL
  GROUP BY p.user_id, p.first_signup
)
SELECT user_id, first_signup, first_purchase_after,
       CASE WHEN first_purchase_after IS NOT NULL THEN 1 ELSE 0 END AS converted,
       epoch_us(first_purchase_after) - epoch_us(first_signup) AS conversion_us
FROM conv
"""


# --------------------------------------------------------------------------
# q95 — time-weighted average (irregular-sampling aggregate)
# --------------------------------------------------------------------------
def q95_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-function time-weighted average per (event_type, day): each
    observation's value holds until the NEXT observation, so the mean is
    Σ value·Δt / Σ Δt — the correct aggregate for irregularly-sampled
    series (a plain avg over-weights bursts; the reference's resample
    sidesteps this only because its input grid is regular,
    code/get-cams-solrad-ts.py:94). One window (lead) and one grouped
    aggregate share the (type, day) shuffle; the weighted sum runs in
    exact decimal (value·Δt magnitudes reach 1e12+, where double
    partial-sum order variance would cross the 1e-6 rounding grid —
    see _spec.exact_sum). The day's last observation carries no weight
    (its hold interval is open-ended); single-observation days yield a
    NULL twa rather than a fabricated weight."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    obs = ev.withColumn("day", F.date_trunc("day", F.col("ts"))).withColumn(
        "next_ts", F.lead("ts").over(w)
    )
    dt = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    num = (F.col("value") * dt.cast("double")).cast("decimal(27,6)")
    return obs.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(dt).cast("bigint").alias("dt_us"),
        F.round(
            F.sum(num).cast("double") / F.sum(dt).cast("double") + F.lit(1e-9), 6
        ).alias("twa"),
    )


Q95_ORACLE = """
WITH obs AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, ts, value,
         lead(ts) OVER (PARTITION BY event_type, date_trunc('day', ts)
                        ORDER BY ts, event_id) AS next_ts
  FROM events
)
SELECT event_type, day,
       count(*) AS n_obs,
       CAST(sum(epoch_us(next_ts) - epoch_us(ts)) AS BIGINT) AS dt_us,
       round(CAST(sum(CAST(value * CAST(epoch_us(next_ts) - epoch_us(ts) AS DOUBLE)
                           AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(sum(epoch_us(next_ts) - epoch_us(ts)) AS DOUBLE) + 1e-9,
             6) AS twa
FROM obs
GROUP BY event_type, day
"""


# --------------------------------------------------------------------------
# q96 — gap-filling linear interpolation over the dense bucket grid
# --------------------------------------------------------------------------
def q96_gap_fill_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-type hourly grid with EMPTY buckets linearly interpolated
    from the nearest real buckets on each side (edge gaps take the one
    available side) — the standard cleanup step between the reference's
    resample (which leaves NaN rows, code/get-cams-solrad-ts.py:94) and a
    model-ready series. Plan: one (type, bucket) aggregate, an
    executor-side ``sequence()`` grid per type, a left join, then TWO
    ignore-nulls windows (last-before / first-after) sharing one
    (type, bucket) sort — no self-join, no driver loop; at 100 TB every
    stage is keyed by (type, bucket) so the sort is reused. Bucket means
    are rounded BEFORE interpolation on both engines, so the
    interpolation arithmetic consumes identical inputs."""
    ev = table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_start")
        )
        .agg(F.round(F.avg("value") + F.lit(1e-9), 6).alias("avg_value"))
    )
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket_start"),
    )
    dense = grid.join(agg, on=["event_type", "bucket_start"], how="left")

    t = F.unix_micros(F.col("bucket_start")).cast("double")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("avg_value").isNotNull(), t)
    prev_val = F.last("avg_value", ignorenulls=True).over(w_back)
    prev_ts = F.last(obs_ts, ignorenulls=True).over(w_back)
    next_val = F.first("avg_value", ignorenulls=True).over(w_fwd)
    next_ts = F.first(obs_ts, ignorenulls=True).over(w_fwd)
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(prev_val.isNull(), next_val)
        .when(next_val.isNull(), prev_val)
        .otherwise(
            prev_val
            + (next_val - prev_val) * (t - prev_ts) / (next_ts - prev_ts)
        )
    )
    return dense.select(
        "event_type",
        "bucket_start",
        F.round(interp + F.lit(1e-9), 6).alias("filled_value"),
        F.col("avg_value").isNull().cast("int").alias("was_gap"),
    )


Q96_ORACLE = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start,
         round(avg(value) + 1e-9, 6) AS avg_value
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT event_type,
         unnest(generate_series(date_trunc('hour', min(ts)),
                                date_trunc('hour', max(ts)),
                                INTERVAL '1 hour')) AS bucket_start
  FROM events GROUP BY event_type
),
dense AS (
  SELECT g.event_type, g.bucket_start, a.avg_value,
         CAST(epoch_us(g.bucket_start) AS DOUBLE) AS t
  FROM grid g LEFT JOIN agg a USING (event_type, bucket_start)
),
ctx AS (
  SELECT *,
         last_value(avg_value IGNORE NULLS) OVER w_back AS prev_val,
         last_value(CASE WHEN avg_value IS NOT NULL THEN t END IGNORE NULLS)
             OVER w_back AS prev_ts,
         first_value(avg_value IGNORE NULLS) OVER w_fwd AS next_val,
         first_value(CASE WHEN avg_value IS NOT NULL THEN t END IGNORE NULLS)
             OVER w_fwd AS next_ts
  FROM dense
  WINDOW
    w_back AS (PARTITION BY event_type ORDER BY bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY event_type ORDER BY bucket_start
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket_start,
       round(CASE
               WHEN avg_value IS NOT NULL THEN avg_value
               WHEN prev_val IS NULL THEN next_val
               WHEN next_val IS NULL THEN prev_val
               ELSE prev_val + (next_val - prev_val) * (t - prev_ts)
                               / (next_ts - prev_ts)
             END + 1e-9, 6) AS filled_value,
       CAST(avg_value IS NULL AS INTEGER) AS was_gap
FROM ctx
"""


from wetsa_cams_solrad_timeseries_spark.plans._spec import make_specs

SPECS = make_specs(
    [
        ("q02_tumbling_mean", q02_tumbling_mean, Q02_ORACLE, ("A1",), "10-min tumbling mean"),
        ("q04_series_join", q04_series_join, Q04_ORACLE, ("J1", "F9", "F10"), "series join + bias/ratio"),
        ("q05_qc_flag_filter", q05_qc_flag_filter, Q05_ORACLE, ("P4", "A2"), "QC flag gate + JSON"),
        ("q07_local_time", q07_local_time, Q07_ORACLE, ("F4", "F5"), "local-time derivation"),
        ("q12_dense_grid", q12_dense_grid, Q12_ORACLE, ("A1",), "dense bucket grid"),
        ("q15_sessionize", q15_sessionize, Q15_ORACLE, (), "gap sessionization"),
        ("q17_asof_join", q17_asof_join, Q17_ORACLE, (), "as-of join"),
        ("q18_quantiles", q18_quantiles, Q18_ORACLE, ("A3",), "exact quantiles"),
        ("q54_sliding_window", q54_sliding_window, Q54_ORACLE, ("A1",), "sliding windows"),
        ("q55_session_window", q55_session_window, Q55_ORACLE, (), "native session windows"),
        ("q60_asof_tolerance", q60_asof_tolerance, Q60_ORACLE, (), "as-of join with tolerance"),
        ("q61_table_profile", q61_table_profile, Q61_ORACLE, (), "one-pass table profiling"),
        ("q68_funnel", q68_funnel, Q68_ORACLE, (), "signup→purchase funnel"),
        ("q69_latest_snapshot", q69_latest_snapshot, Q69_ORACLE, (), "max_by latest-state snapshot"),
        ("q95_time_weighted_avg", q95_time_weighted_avg, Q95_ORACLE, ("A1",), "time-weighted average"),
        ("q96_gap_fill_interpolation", q96_gap_fill_interpolation, Q96_ORACLE, ("A1", "R1"), "gap-fill linear interpolation"),
    ]
)
