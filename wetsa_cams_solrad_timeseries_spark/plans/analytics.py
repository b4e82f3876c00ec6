"""Product-analytics, statistics, and ML-evaluation queries (round 5,
q125+): the BI/experimentation/model-eval surface on top of the curation
engine — sliding-window distinct counts, attribution, streaks, cohort
math, contingency/robust/two-sample statistics, calibration tables,
sequence mining, sweep-line concurrency, and growth curves.

Split out of plans/curation.py for module size; the determinism rules
(_spec docstring) and the scale-shape docstring convention are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.plans._spec import (
    exact_sum,
    exact_sum_sql,
    maybe_broadcast,
    round6,
    round6_sql,
)


# --------------------------------------------------------------------------
# q125 — rolling 7-day distinct users (sliding-window WAU)
# --------------------------------------------------------------------------


def q125_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-active-users, daily cadence: EXACT distinct user count per
    7-day window sliding 1 day, per event type — the dashboard metric
    rolling sums cannot produce (distinct does not decompose across
    days). Spark's sliding ``window()`` replicates each event into its
    7 covering windows, then one distinct-aggregate per (window, type).

    Scale shape: the ×7 replication happens in the scan stage
    (pipeline-local Expand, no extra shuffle); the cost center is the
    countDistinct shuffle carrying (window, type, user) triples. At
    100 TB the exact form is this plan; the cheap form keeps one KMV/HLL
    sketch PER DAY and merges 7 per window (q92's mergeability makes
    that a tiny rollup) — exactness traded for a union-able fixed-size
    state, the standard WAU/MAU production trade.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "7 days", "1 day").alias("w"), "event_type"
        )
        .agg(
            F.countDistinct("user_id").alias("wau"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "wau",
            "n_events",
        )
    )


Q125_ORACLE = """
SELECT CAST(date_trunc('day', e.ts) - (t.i * INTERVAL 1 DAY) AS TIMESTAMP)
         AS win_start,
       e.event_type,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau,
       CAST(count(*) AS BIGINT) AS n_events
FROM events e, range(7) t(i)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q126 — per-entity feature assembly (feature-store shape)
# --------------------------------------------------------------------------

_Q126_TYPES = ("click", "view", "purchase", "signup", "error")


def q126_feature_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-feature materialization: one row per user with the
    activity-count one-hot block (conditional aggregation — the pivot
    every feature store compiles to), numeric stats, and the assembled
    feature vector a trainer consumes. The vector is built JVM-side with
    F.array over ONE grouped aggregate — no joins, no second pass — then
    emitted in q93's FLAT dimension-major convention
    ``(feature_pos, feature_val)`` via posexplode: the cross-engine hash
    compares scalars, never nested arrays (the driver canonicalizer
    cannot sort list cells — same rule as plans/pipeline_ops.py:q93).
    A consumer needing array form groups by user and sorts on pos.

    Scale shape: a single keyed aggregation with map-side combine;
    output width is fixed by the feature list (6 rows per user), so the
    shuffle carries small rows keyed by user. This is the
    batch-materialization half of a feature store; the streaming half is
    q53's stateful aggregate over the same keys.
    """
    ev = table(spark, sf_dir, "events")
    cnt = [
        F.sum((F.col("event_type") == t).cast("long")).alias(f"n_{t}")
        for t in _Q126_TYPES
    ]
    agg = ev.groupBy("user_id").agg(
        *cnt,
        F.count(F.lit(1)).alias("n_total"),
        F.sum("value").alias("sum_value"),
    )
    feat = [
        F.col(f"n_{t}").cast("double") / F.col("n_total")
        for t in _Q126_TYPES
    ] + [F.col("sum_value") / F.col("n_total")]
    assembled = agg.select(
        "user_id",
        *[F.col(f"n_{t}") for t in _Q126_TYPES],
        F.transform(
            F.array(*feat), lambda x: F.round(x + F.lit(1e-9), 6)
        ).alias("features"),
    )
    return assembled.select(
        "user_id",
        *[F.col(f"n_{t}") for t in _Q126_TYPES],
        F.posexplode("features").alias("feature_pos", "feature_val"),
    ).withColumn("feature_pos", (F.col("feature_pos") + 1).cast("long"))


def _q126_feat_sql() -> str:
    shares = ", ".join(
        f"round(n_{t} * 1.0 / n_total + 1e-9, 6)" for t in _Q126_TYPES
    )
    return f"[{shares}, round(sum_value / n_total + 1e-9, 6)]"


Q126_ORACLE = f"""
WITH agg AS (
  SELECT user_id,
         {', '.join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _Q126_TYPES)},
         count(*) AS n_total,
         sum(value) AS sum_value
  FROM events GROUP BY user_id
),
assembled AS (
  SELECT user_id, {', '.join(f'n_{t}' for t in _Q126_TYPES)},
         {_q126_feat_sql()} AS features
  FROM agg
)
-- Per-row unnest zipped with generate_subscripts (q93's convention) so
-- the output is flat scalars the cross-engine hash can compare.
SELECT user_id, {', '.join(f'n_{t}' for t in _Q126_TYPES)},
       CAST(generate_subscripts(features, 1) AS BIGINT) AS feature_pos,
       unnest(features) AS feature_val
FROM assembled
"""


# --------------------------------------------------------------------------
# q127 — percentile winsorization (outlier clipping)
# --------------------------------------------------------------------------


def q127_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier handling by winsorization: clip each value into its event
    type's [p01, p99] band — the data-cleaning step run before training
    on heavy-tailed measurements. The per-group percentile boundaries
    are a dimension-sized aggregate joined back by broadcast; clipping
    is scan-stage arithmetic; the audit reports how much mass moved.

    Scale shape: two passes over the fact (boundary aggregate + clip),
    the exact-percentile cost. At 100 TB the boundary pass switches to
    ``percentile_approx`` (t-digest, one mergeable pass) with identical
    downstream plumbing — the exact form is kept here because the gate
    demands cross-engine equality and sketches are engine-specific.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("p01"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("value") < F.col("p01")).cast("long")).alias(
            "n_clipped_low"
        ),
        F.sum((F.col("value") > F.col("p99")).cast("long")).alias(
            "n_clipped_high"
        ),
        round6(F.avg("value")).alias("avg_raw"),
        round6(F.avg(clipped)).alias("avg_winsorized"),
    )


Q127_ORACLE = f"""
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS p01,
         quantile_cont(value, 0.99) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN e.value < b.p01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(sum(CASE WHEN e.value > b.p99 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       {round6_sql('avg(e.value)')} AS avg_raw,
       {round6_sql('avg(least(greatest(e.value, b.p01), b.p99))')}
         AS avg_winsorized
FROM events e JOIN bounds b ON e.event_type = b.event_type
GROUP BY e.event_type
"""


# --------------------------------------------------------------------------
# q128 — first-touch attribution (self-stream as-of via carried-forward)
# --------------------------------------------------------------------------

_Q128_WINDOW_S = 3600


def q128_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution: each purchase is credited to the same
    user's most recent PRECEDING click within 1 hour. The as-of lookup
    runs INSIDE one stream (not across two tables like q17): the last
    click timestamp is carried forward with a conditional
    ``last(..., ignorenulls=True)`` cumulative window — the q118 LOCF
    mechanism applied to event timestamps — then the attribution window
    is a plain filter. One shuffle on user_id; no join at all.

    Output: per-day attributed purchase counts, conversion share, and
    mean click→purchase latency.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    with_click = ev.withColumn(
        "last_click_ts", F.last(click_ts, ignorenulls=True).over(w)
    )
    purchases = with_click.filter(F.col("event_type") == "purchase")
    lag_s = F.col("ts").cast("long") - F.col("last_click_ts").cast("long")
    attributed = (F.col("last_click_ts").isNotNull()) & (
        lag_s <= _Q128_WINDOW_S
    )
    return (
        purchases.withColumn("day", F.date_trunc("day", F.col("ts")))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(attributed.cast("long")).alias("n_attributed"),
            round6(F.avg(attributed.cast("double"))).alias(
                "attributed_share"
            ),
            round6(
                F.avg(F.when(attributed, lag_s.cast("double")))
            ).alias("avg_lag_s"),
        )
    )


Q128_ORACLE = f"""
WITH with_click AS (
  SELECT event_type, ts, event_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_ts
  FROM events
),
p AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CASE WHEN last_click_ts IS NOT NULL
                   AND CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(last_click_ts)) AS BIGINT)
                       <= {_Q128_WINDOW_S}
              THEN 1 ELSE 0 END AS attributed,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(last_click_ts)) AS BIGINT) AS lag_s
  FROM with_click WHERE event_type = 'purchase'
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(attributed) AS BIGINT) AS n_attributed,
       {round6_sql('avg(attributed * 1.0)')} AS attributed_share,
       {round6_sql('avg(CASE WHEN attributed = 1 THEN lag_s * 1.0 END)')}
         AS avg_lag_s
FROM p
GROUP BY day
"""


# --------------------------------------------------------------------------
# q129 — condition-based streaks (islands by flag, not by time gap)
# --------------------------------------------------------------------------


def q129_error_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-free streaks per user: consecutive non-error runs, built
    with the gaps-and-islands trick keyed on a CONDITION instead of a
    time gap (q15 sessionizes on gaps): island id = running count of
    errors seen so far, so every error starts a new island. Reports the
    streak-length distribution — the "how long do users go between
    failures" reliability metric.

    Scale shape: two windows over the same (user_id, ts) sort — Catalyst
    plans one Exchange + one Sort for both — then a two-level rollup of
    island sizes. Everything after the sort is per-partition streaming
    aggregation.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_err = (F.col("event_type") == "error").cast("long")
    marked = ev.withColumn("island", F.sum(is_err).over(w))
    streaks = (
        marked.filter(F.col("event_type") != "error")
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return streaks.groupBy("streak_len").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.countDistinct("user_id").alias("n_users"),
    )


Q129_ORACLE = """
WITH marked AS (
  SELECT user_id, event_type,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM events
),
streaks AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS streak_len
  FROM marked WHERE event_type <> 'error'
  GROUP BY user_id, island
)
SELECT streak_len,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM streaks
GROUP BY streak_len
"""


# --------------------------------------------------------------------------
# q130 — contingency table + chi-square statistic
# --------------------------------------------------------------------------


def q130_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association between event type and day-of-week: the full
    contingency rollup (observed vs expected under independence) reduced
    to the chi-square statistic per event type — the categorical
    counterpart of q70's Pearson correlation in the statistics family.

    Scale shape: one (type, dow) grouped count; marginals derive from it
    via two tiny re-aggregations joined back by broadcast (the
    contingency table is category-sized, not data-sized); the statistic
    is pure arithmetic over that table.
    """
    ev = table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))
    row_m = obs.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    col_m = obs.groupBy("dow").agg(F.sum("n").alias("col_n"))
    tot = obs.agg(F.sum("n").alias("total"))
    j = (
        obs.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "dow")
        .crossJoin(F.broadcast(tot))
    )
    exp = F.col("row_n") * F.col("col_n") / F.col("total")
    chi = (F.col("n") - exp) * (F.col("n") - exp) / exp
    return j.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_cells"),
        round6(F.sum(chi)).alias("chi2"),
    )


Q130_ORACLE = f"""
WITH obs AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
row_m AS (SELECT event_type, sum(n) AS row_n FROM obs GROUP BY event_type),
col_m AS (SELECT dow, sum(n) AS col_n FROM obs GROUP BY dow),
tot AS (SELECT sum(n) AS total FROM obs)
SELECT o.event_type,
       CAST(sum(o.n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_cells,
       {round6_sql('sum((o.n - r.row_n * c.col_n * 1.0 / t.total)'
                   ' * (o.n - r.row_n * c.col_n * 1.0 / t.total)'
                   ' / (r.row_n * c.col_n * 1.0 / t.total))')} AS chi2
FROM obs o
JOIN row_m r ON o.event_type = r.event_type
JOIN col_m c ON o.dow = c.dow, tot t
GROUP BY o.event_type
"""


# --------------------------------------------------------------------------
# q131 — cross-language vocabulary overlap matrix
# --------------------------------------------------------------------------


def q131_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between language buckets — the corpus
    diagnostic for language-ID leakage / shared boilerplate across
    splits. Kept LONG-FORM the whole way: distinct (lang, token) rows,
    |A∩B| from a token self-join, |A∪B| = |A|+|B|−|A∩B| — never a
    collect_set of a vocabulary into one row (a 100 TB vocab doesn't
    fit a row; the long form shuffles only distinct tokens).

    Scale shape: one distinct on (lang, token); the intersection join is
    keyed on token and produces lang-pair rows (pairs are
    #langs²-bounded, tokens are data-bounded); sizes join back by
    broadcast (langs-sized frame).
    """
    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            "lang",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("lang").agg(F.count(F.lit(1)).alias("vsize"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("lang").alias("lang_a"), F.col("vsize").alias("size_a")
    )
    sb = sizes.select(
        F.col("lang").alias("lang_b"), F.col("vsize").alias("size_b")
    )
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_common",
            "size_a",
            "size_b",
            round6(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


Q131_ORACLE = f"""
WITH vocab AS (
  SELECT DISTINCT lang,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
sizes AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS vsize FROM vocab GROUP BY lang
),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT i.lang_a, i.lang_b, i.n_common,
       sa.vsize AS size_a, sb.vsize AS size_b,
       {round6_sql('i.n_common * 1.0 / (sa.vsize + sb.vsize - i.n_common)')}
         AS jaccard
FROM inter i
JOIN sizes sa ON i.lang_a = sa.lang
JOIN sizes sb ON i.lang_b = sb.lang
"""


# --------------------------------------------------------------------------
# q132 — robust statistics: median absolute deviation
# --------------------------------------------------------------------------


def q132_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/scale per event type: median and MAD
    (median(|x − median|)) with the robust outlier count at the
    standard 3×1.4826×MAD cutoff — the heavy-tail-safe counterpart of
    mean/stddev profiling (q61) and the principled threshold source for
    q127's clipping.

    Scale shape: inherently two passes (the second percentile depends on
    the first — no single-pass exact form exists): group medians join
    back by broadcast (group-count-sized), then one more grouped
    percentile over |x − median|. At 100 TB both passes swap
    ``percentile`` for ``percentile_approx`` unchanged elsewhere.
    """
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    j = ev.join(F.broadcast(med), "event_type")
    dev = F.abs(F.col("value") - F.col("med"))
    mad = j.groupBy("event_type").agg(
        F.first("med").alias("med_v"),
        F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        F.count(F.lit(1)).alias("n_events"),
    )
    cutoff = F.lit(3.0) * F.lit(1.4826) * F.col("mad")
    j2 = ev.join(F.broadcast(mad), "event_type")
    return j2.groupBy("event_type").agg(
        F.first(F.round(F.col("med_v") + F.lit(1e-9), 6)).alias("median"),
        F.first(F.round(F.col("mad") + F.lit(1e-9), 6)).alias("mad"),
        F.sum(
            (F.abs(F.col("value") - F.col("med_v")) > cutoff).cast("long")
        ).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_events"),
    )


Q132_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med_v
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         any_value(m.med_v) AS med_v,
         quantile_cont(abs(e.value - m.med_v), 0.5) AS mad_v
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type
)
SELECT e.event_type,
       {round6_sql('any_value(a.med_v)')} AS median,
       {round6_sql('any_value(a.mad_v)')} AS mad,
       CAST(sum(CASE WHEN abs(e.value - a.med_v)
                          > 3.0 * 1.4826 * a.mad_v
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_events
FROM events e JOIN mad a ON e.event_type = a.event_type
GROUP BY e.event_type
"""


# --------------------------------------------------------------------------
# q133 — vocabulary novelty over document order (first-seen tokens)
# --------------------------------------------------------------------------

_Q133_BATCH = 100  # doc_id-range batches stand in for ingestion days


def q133_token_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve: bucket documents into ingestion batches
    (doc_id ranges stand in for arrival days) and count, per batch, how
    many of its tokens are NOVEL — first seen in that batch. The
    diminishing-novelty curve is the classic "is more crawl still adding
    vocabulary?" curation signal (Heaps' law in practice).

    Scale shape: first-seen batch per token is one min-aggregate over
    distinct (token, batch) pairs; batch totals and novelty counts come
    from the same grain re-aggregated — shuffle keys are tokens, state
    per token is one integer. No window, no collect.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") / _Q133_BATCH).cast("long").alias("batch"),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).distinct()
    first_seen = toks.groupBy("tok").agg(F.min("batch").alias("first_batch"))
    j = toks.join(first_seen, "tok")
    return j.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.sum((F.col("first_batch") == F.col("batch")).cast("long")).alias(
            "n_novel"
        ),
        round6(
            F.avg((F.col("first_batch") == F.col("batch")).cast("double"))
        ).alias("novelty_rate"),
    )


Q133_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT CAST(floor(doc_id * 1.0 / {_Q133_BATCH}) AS BIGINT)
           AS batch,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
first_seen AS (
  SELECT tok, min(batch) AS first_batch FROM toks GROUP BY tok
)
SELECT t.batch,
       CAST(count(*) AS BIGINT) AS n_distinct_tokens,
       CAST(sum(CASE WHEN f.first_batch = t.batch THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       {round6_sql('avg(CASE WHEN f.first_batch = t.batch '
                   'THEN 1.0 ELSE 0.0 END)')} AS novelty_rate
FROM toks t JOIN first_seen f ON t.tok = f.tok
GROUP BY t.batch
"""


# --------------------------------------------------------------------------
# q134 — period-over-period growth on an aggregated series
# --------------------------------------------------------------------------


def q134_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — lag() applied AFTER
    aggregation (q43 windows the raw facts; BI series math windows the
    aggregate): weekly rollup, then previous-week comparison and
    null-safe growth rate on the weeks-sized series.

    Scale shape: the fact shuffle is the weekly rollup with map-side
    combine; the lag window runs over the (type × weeks) aggregate — a
    frame bounded by the calendar, not the data.
    """
    ev = table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        round6(F.sum("value")).alias("sum_value"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n_events").over(w)
    return weekly.select(
        "event_type",
        "week",
        "n_events",
        "sum_value",
        prev.alias("prev_events"),
        round6(
            (F.col("n_events") - prev)
            / F.nullif(prev, F.lit(0)).cast("double")
        ).alias("wow_growth"),
    )


Q134_ORACLE = f"""
WITH weekly AS (
  SELECT event_type,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         CAST(count(*) AS BIGINT) AS n_events,
         {round6_sql('sum(value)')} AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, week, n_events, sum_value,
       lag(n_events) OVER w AS prev_events,
       {round6_sql('(n_events - lag(n_events) OVER w) * 1.0 '
                   '/ nullif(lag(n_events) OVER w, 0)')} AS wow_growth
FROM weekly
WINDOW w AS (PARTITION BY event_type ORDER BY week)
"""


# --------------------------------------------------------------------------
# q135 — leave-one-out target encoding
# --------------------------------------------------------------------------


def q135_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each row's category feature is the
    category's mean target EXCLUDING the row itself — (Σ−x)/(n−1) — the
    encoding that avoids the self-leakage plain mean-encoding suffers in
    training features. Group sums are one aggregate broadcast back; the
    per-row exclusion is scan-stage arithmetic. The audit reports the
    per-category spread the exclusion introduces.

    Scale shape: one grouped aggregate (category-sized) + broadcast
    join + one audit rollup; no window, no per-row state.
    """
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.sum("value").alias("g_sum"), F.count(F.lit(1)).alias("g_n")
    )
    j = ev.join(F.broadcast(g), "event_type")
    loo = (F.col("g_sum") - F.col("value")) / (F.col("g_n") - 1)
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        round6(F.avg(loo)).alias("avg_loo"),
        round6(F.min(loo)).alias("min_loo"),
        round6(F.max(loo)).alias("max_loo"),
        round6(F.avg("value")).alias("plain_mean"),
    )


Q135_ORACLE = f"""
WITH g AS (
  SELECT event_type, sum(value) AS g_sum, count(*) AS g_n
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {round6_sql('avg((g.g_sum - e.value) / (g.g_n - 1))')} AS avg_loo,
       {round6_sql('min((g.g_sum - e.value) / (g.g_n - 1))')} AS min_loo,
       {round6_sql('max((g.g_sum - e.value) / (g.g_n - 1))')} AS max_loo,
       {round6_sql('avg(e.value)')} AS plain_mean
FROM events e JOIN g ON e.event_type = g.event_type
GROUP BY e.event_type
"""


# --------------------------------------------------------------------------
# q136 — score-decile lift table (model calibration)
# --------------------------------------------------------------------------

# Same deterministic weight family as q116, JVM-side here (zip_with +
# aggregate) — this query is about the EVALUATION table, not the UDF path.
_Q136_W = [((i * 29) % 17 - 8) / 10.0 for i in range(64)]


def q136_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval lift table: score every embedding with a linear head
    (pure JVM zip_with/aggregate dot product), split the population into
    score deciles with the DISTRIBUTED exact NTILE (operators/rank.py —
    decile 1 = highest scores), and report each decile's positive rate
    and lift over the base rate — the calibration/gain chart every
    ranking-model evaluation starts from. "Positive" is the odd-label
    class of the embeddings table.

    Scale shape: scoring is scan-stage expression work; the decile
    assignment is the range-partition rank (no one-task window); the
    lift rollup is 10 rows joined to a 1-row base rate by broadcast.
    """
    from wetsa_cams_solrad_timeseries_spark.operators.rank import global_ntile

    emb = table(spark, sf_dir, "embeddings")
    # Unrolled codegen dot against the literal weight vector — identical
    # left-association IEEE value as the aggregate/zip_with spelling over
    # the transform-cast array (guide §4.1; the r13 dim-unroll). The cast
    # is the native element-wise Cast instead of an interpreted lambda.
    v = F.col("embedding").cast("array<double>")
    score = F.lit(0.0)
    for _i, _w in enumerate(_Q136_W):
        score = score + v[_i] * F.lit(float(_w))
    scored = emb.select(
        "vec_id",
        score.alias("score"),
        (F.col("label") % 2 == 1).cast("long").alias("positive"),
    )
    tiled = global_ntile(
        scored, [F.col("score").desc(), F.col("vec_id").asc()], 10,
        tile_col="decile",
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("positive").alias("n_positive"),
        F.avg("positive").alias("rate_raw"),
    )
    base = per.agg(
        (F.sum("n_positive") / F.sum("n")).alias("base_rate")
    )
    return per.crossJoin(F.broadcast(base)).select(
        "decile",
        "n",
        "n_positive",
        round6(F.col("rate_raw")).alias("positive_rate"),
        round6(F.col("rate_raw") / F.col("base_rate")).alias("lift"),
    )


def _q136_w_sql() -> str:
    return "[" + ", ".join(repr(w) for w in _Q136_W) + "]"


Q136_ORACLE = f"""
WITH scored AS (
  SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), {_q136_w_sql()})
           AS score,
         CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS positive
  FROM embeddings
),
tiled AS (
  SELECT positive,
         ntile(10) OVER (ORDER BY score DESC, vec_id ASC) AS decile
  FROM scored
),
per AS (
  SELECT CAST(decile AS INTEGER) AS decile,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(positive) AS BIGINT) AS n_positive,
         avg(positive * 1.0) AS rate_raw
  FROM tiled GROUP BY decile
),
base AS (SELECT sum(n_positive) * 1.0 / sum(n) AS base_rate FROM per)
SELECT decile, n, n_positive,
       {round6_sql('rate_raw')} AS positive_rate,
       {round6_sql('rate_raw / base_rate')} AS lift
FROM per, base
"""


# --------------------------------------------------------------------------
# q137 — null-safe join semantics (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------


def q137_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on a NULLABLE key with null-safe equality: rows whose derived
    segment is NULL (users never purchasing) must still pair —
    ``eqNullSafe`` (SQL ``IS NOT DISTINCT FROM``) treats NULL as a
    joinable value where ``=`` silently drops it, the classic
    missing-rows bug in dimension lookups keyed on optional attributes.
    The query joins user activity to a segment-attribute frame on the
    nullable segment key BOTH ways and reports the row-count gap the
    null semantics make — the audit that catches the bug.

    Scale shape: null-safe equality is still hash-joinable in Spark
    (null hashes to a bucket like any value — no fallback to NLJ, which
    the plan check in tests asserts for the budget family); one shuffle
    pair on the segment key, counts from 1-row aggregates.
    """
    ev = table(spark, sf_dir, "events")
    user_seg = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit("buyer"))
        ).alias("segment")
    )
    seg_attrs = spark.createDataFrame(
        [("buyer", 1.0), (None, 0.2)], "segment string, weight double"
    )
    strict = user_seg.join(
        F.broadcast(seg_attrs), user_seg.segment == seg_attrs.segment
    )
    nullsafe = user_seg.join(
        F.broadcast(seg_attrs),
        user_seg.segment.eqNullSafe(seg_attrs.segment),
    )
    a = strict.agg(
        F.count(F.lit(1)).alias("n_strict"),
        round6(F.sum("weight")).alias("w_strict"),
    )
    b = nullsafe.agg(
        F.count(F.lit(1)).alias("n_nullsafe"),
        round6(F.sum("weight")).alias("w_nullsafe"),
    )
    tot = user_seg.agg(F.count(F.lit(1)).alias("n_users"))
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_users",
            "n_strict",
            "n_nullsafe",
            (F.col("n_nullsafe") - F.col("n_strict")).alias("n_rescued"),
            "w_strict",
            "w_nullsafe",
        )
    )


Q137_ORACLE = f"""
WITH user_seg AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 'buyer' END) AS segment
  FROM events GROUP BY user_id
),
seg_attrs AS (
  SELECT 'buyer' AS segment, 1.0 AS weight
  UNION ALL SELECT NULL, 0.2
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_strict,
         {round6_sql('sum(s.weight)')} AS w_strict
  FROM user_seg u JOIN seg_attrs s ON u.segment = s.segment
),
b AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nullsafe,
         {round6_sql('sum(s.weight)')} AS w_nullsafe
  FROM user_seg u
  JOIN seg_attrs s ON u.segment IS NOT DISTINCT FROM s.segment
),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM user_seg)
SELECT t.n_users, a.n_strict, b.n_nullsafe,
       b.n_nullsafe - a.n_strict AS n_rescued,
       a.w_strict, b.w_nullsafe
FROM a, b, t
"""


# --------------------------------------------------------------------------
# q138 — event-transition (Markov) matrix
# --------------------------------------------------------------------------


def q138_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the first-order transition matrix of
    event types per user — counts and row-normalized probabilities of
    "X then Y" — the input to Markov attribution/journey models and the
    sequence statistic n-gram counters (q88) don't capture (order WITHIN
    a keyed stream, not text).

    Scale shape: one window shuffle on user_id gives every row its
    successor via lead(); the matrix rollup is a types²-sized aggregate;
    row normalization joins the types-sized marginal by broadcast.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    marg = pairs.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (
        pairs.join(F.broadcast(marg), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            round6(F.col("n") / F.col("row_n")).alias("p"),
        )
    )


Q138_ORACLE = f"""
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
cnt AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
marg AS (SELECT from_type, sum(n) AS row_n FROM cnt GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n,
       {round6_sql('c.n * 1.0 / m.row_n')} AS p
FROM cnt c JOIN marg m ON c.from_type = m.from_type
"""


# --------------------------------------------------------------------------
# q139 — percent-of-parent contribution at two hierarchy levels
# --------------------------------------------------------------------------


def q139_contribution_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical contribution analysis: each nation's revenue as a
    share of its REGION and of the WORLD, plus the region's share of
    world — the percent-of-parent arithmetic every drill-down BI view
    computes. All shares come from ONE nation-level aggregate re-rolled
    through two windowed totals over the dimension-sized result (25
    rows) — the fact table is scanned and shuffled exactly once.
    """
    o = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")
    nat = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(exact_sum("o_totalprice").alias("revenue"))
    )
    w_reg = Window.partitionBy("region")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return nat.select(
        "region",
        "nation",
        "revenue",
        round6(F.col("revenue") / F.sum("revenue").over(w_reg)).alias(
            "share_of_region"
        ),
        round6(F.col("revenue") / F.sum("revenue").over(w_all)).alias(
            "share_of_world"
        ),
        round6(
            F.sum("revenue").over(w_reg) / F.sum("revenue").over(w_all)
        ).alias("region_share_of_world"),
    )


Q139_ORACLE = f"""
WITH nat AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         {exact_sum_sql('o.o_totalprice')} AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation, revenue,
       {round6_sql('revenue / sum(revenue) OVER (PARTITION BY region)')}
         AS share_of_region,
       {round6_sql('revenue / sum(revenue) OVER ()')} AS share_of_world,
       {round6_sql('sum(revenue) OVER (PARTITION BY region) '
                   '/ sum(revenue) OVER ()')} AS region_share_of_world
FROM nat
"""


# --------------------------------------------------------------------------
# q140 — peak concurrency via distributed sweep line
# --------------------------------------------------------------------------

_Q140_GAP_S = 1800  # 30-minute session gap


def q140_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning metric —
    by the classic sweep line: sessionize per user (30-min gap islands),
    explode each session into a (+1 at start, −1 at end) endpoint pair,
    and take the running sum over the GLOBAL time ordering; the maximum
    of that running sum within a day is the day's peak concurrency.

    The global running sum is the scale crux: it is computed with
    :func:`operators.rank.global_prefix_sum` (range repartition + local
    cumsum + per-partition offsets), NOT a one-task window — the
    sweep line stays a distributed sort. Endpoint ordering puts −1
    before +1 at the same instant (end-exclusive sessions), with
    (user, island) as the unique tie-break, so the result is
    deterministic and partitioning-invariant (integer deltas).
    """
    from wetsa_cams_solrad_timeseries_spark.operators.rank import (
        global_prefix_sum,
    )

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = (gap.isNull() | (gap > _Q140_GAP_S)).cast("long")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("island", F.sum(new_sess).over(wc))
        .groupBy("user_id", "island")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    endpoints = sess.select(
        F.col("s_start").alias("t"),
        F.lit(1).alias("delta"),
        "user_id",
        "island",
    ).unionByName(
        sess.select(
            F.col("s_end").alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
            "island",
        )
    )
    cum = global_prefix_sum(
        endpoints, ["t", "delta", "user_id", "island"], "delta",
        out_col="concurrent",
    )
    return (
        cum.withColumn("day", F.date_trunc("day", F.col("t")))
        .groupBy("day")
        .agg(
            F.max("concurrent").cast("long").alias("peak_concurrency"),
            F.sum((F.col("delta") == 1).cast("long")).alias(
                "n_sessions_started"
            ),
        )
    )


Q140_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                      > {_Q140_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, island, min(ts) AS s_start, max(ts) AS s_end
  FROM (
    SELECT user_id, ts,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM marked
  )
  GROUP BY user_id, island
),
endpoints AS (
  SELECT s_start AS t, 1 AS delta, user_id, island FROM sess
  UNION ALL
  SELECT s_end AS t, -1 AS delta, user_id, island FROM sess
),
swept AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t, delta, user_id, island
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concurrent
  FROM endpoints
)
SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
       CAST(max(concurrent) AS BIGINT) AS peak_concurrency,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions_started
FROM swept
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q141 — cumulative adoption curve (running distinct users)
# --------------------------------------------------------------------------


def q141_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique users by day — the adoption/growth curve. A
    running DISTINCT count does not decompose like a running sum, so the
    scalable form is: first-seen day per user (one min-aggregate on
    user_id), daily new-user counts, then a running sum over the
    DAYS-sized series (calendar-bounded window, like q134). The fact
    table is never windowed.
    """
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


Q141_ORACLE = """
WITH first_seen AS (
  SELECT user_id,
         CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY first_day
)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily
"""


# --------------------------------------------------------------------------
# q142 — two-sample comparison (Welch t statistic)
# --------------------------------------------------------------------------


def q142_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-style two-sample comparison: Welch's t statistic (and its
    degrees of freedom) between every event type's values and the
    'view' control group — the experimentation readout the statistics
    family (corr q70, chi² q130, regression q09) still lacked. Built
    entirely from per-group moments (n, mean, variance): one grouped
    aggregate, then arithmetic against the broadcast control row.
    """
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    ctrl = (
        stats.filter(F.col("event_type") == "view")
        .select(
            F.col("n").alias("n0"),
            F.col("mean").alias("mean0"),
            F.col("var").alias("var0"),
        )
    )
    j = stats.filter(F.col("event_type") != "view").crossJoin(
        F.broadcast(ctrl)
    )
    se2 = F.col("var") / F.col("n") + F.col("var0") / F.col("n0")
    t = (F.col("mean") - F.col("mean0")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (F.col("var") / F.col("n")) * (F.col("var") / F.col("n"))
        / (F.col("n") - 1)
        + (F.col("var0") / F.col("n0")) * (F.col("var0") / F.col("n0"))
        / (F.col("n0") - 1)
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_treat"),
        round6(F.col("mean") - F.col("mean0")).alias("mean_diff"),
        round6(t).alias("t_stat"),
        round6(dof).alias("welch_dof"),
    )


Q142_ORACLE = f"""
WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         avg(value) AS mean,
         var_samp(value) AS var
  FROM events GROUP BY event_type
),
ctrl AS (
  SELECT n AS n0, mean AS mean0, var AS var0
  FROM stats WHERE event_type = 'view'
)
SELECT s.event_type,
       CAST(s.n AS BIGINT) AS n_treat,
       {round6_sql('s.mean - c.mean0')} AS mean_diff,
       {round6_sql('(s.mean - c.mean0) '
                   '/ sqrt(s.var / s.n + c.var0 / c.n0)')} AS t_stat,
       {round6_sql('(s.var / s.n + c.var0 / c.n0) '
                   '* (s.var / s.n + c.var0 / c.n0) '
                   '/ ((s.var / s.n) * (s.var / s.n) / (s.n - 1) '
                   '   + (c.var0 / c.n0) * (c.var0 / c.n0) / (c.n0 - 1))')}
         AS welch_dof
FROM stats s, ctrl c
WHERE s.event_type <> 'view'
"""


# --------------------------------------------------------------------------
# q143 — categorical entropy of the daily event mix
# --------------------------------------------------------------------------


def q143_entropy_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per day — the
    distribution-drift monitor: entropy collapsing toward 0 means one
    event type is taking over (incident!), entropy near log₂(k) means a
    balanced mix. Two category-sized aggregates and pure arithmetic —
    −Σ p·log₂(p) over the (day × type) counts.
    """
    ev = table(spark, sf_dir, "events")
    cnt = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    day_tot = cnt.groupBy("day").agg(F.sum("n").alias("day_n"))
    j = cnt.join(F.broadcast(day_tot), "day")
    p = F.col("n") / F.col("day_n")
    plogp = p * F.log2(p)
    return j.groupBy("day").agg(
        F.first("day_n").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        round6(-F.sum(plogp)).alias("entropy_bits"),
    )


Q143_ORACLE = f"""
WITH cnt AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
day_tot AS (SELECT day, sum(n) AS day_n FROM cnt GROUP BY day)
SELECT c.day,
       CAST(any_value(t.day_n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       {round6_sql('-sum((c.n * 1.0 / t.day_n) '
                   '* log2(c.n * 1.0 / t.day_n))')} AS entropy_bits
FROM cnt c JOIN day_tot t ON c.day = t.day
GROUP BY c.day
"""



# --------------------------------------------------------------------------
# q144 — order-fulfillment latency distribution
# --------------------------------------------------------------------------


def q144_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→first-shipment latency: days from order date to the
    earliest lineitem ship date, summarized per order priority — the
    operational-SLA readout, and the inventory's date-arithmetic
    exercise (datediff on DATE columns, not timestamps).

    Scale shape: the first-ship rollup partial-aggregates min(shipdate)
    map-side on l_orderkey; the orders join is key-to-key on the same
    hash partitioning; the priority rollup is priority-sized.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = o.join(first_ship, o.o_orderkey == F.col("l_orderkey"))
    lat = F.datediff(F.col("first_ship"), F.col("o_orderdate"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(lat).alias("min_days"),
        F.max(lat).alias("max_days"),
        round6(F.avg(lat)).alias("avg_days"),
        F.sum((lat <= 7).cast("long")).alias("n_within_week"),
    )


Q144_ORACLE = f"""
WITH first_ship AS (
  SELECT l_orderkey, min(l_shipdate) AS first_ship
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(datediff('day', o.o_orderdate, f.first_ship)) AS INTEGER)
         AS min_days,
       CAST(max(datediff('day', o.o_orderdate, f.first_ship)) AS INTEGER)
         AS max_days,
       {round6_sql("avg(datediff('day', o.o_orderdate, f.first_ship))")}
         AS avg_days,
       CAST(sum(CASE WHEN datediff('day', o.o_orderdate, f.first_ship) <= 7
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_week
FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
GROUP BY o.o_orderpriority
"""


# --------------------------------------------------------------------------
# q145 — market-basket co-occurrence with lift
# --------------------------------------------------------------------------


def q145_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: which part-type CATEGORIES ship together
    in one order more often than chance — pairwise co-occurrence counts
    and lift = P(A,B)/(P(A)·P(B)). The pair explosion is bounded by
    BASKET SIZE (an order has ≤7 lineitems), the same discipline as
    every blocked quadratic here: the self-join key is the order, never
    the catalog.

    Scale shape: distinct (order, category) pairs first (dedups repeat
    categories within an order), one self-join on l_orderkey
    (basket-bounded), then category²-sized rollups; marginals join back
    by broadcast.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pa = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cat = F.split(F.col("p_type"), " ").getItem(0).alias("category")
    baskets = (
        li.join(maybe_broadcast(pa), li.l_partkey == pa.p_partkey)
        .select("l_orderkey", cat)
        .distinct()
    )
    tot = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )  # 1-row, stays lazy — no driver-side count in plan construction
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.category") < F.col("b.category")),
        )
        .groupBy(
            F.col("a.category").alias("cat_a"),
            F.col("b.category").alias("cat_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    marg = baskets.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_cat")
    )
    ma = marg.select(
        F.col("category").alias("cat_a"), F.col("n_cat").alias("n_a")
    )
    mb = marg.select(
        F.col("category").alias("cat_b"), F.col("n_cat").alias("n_b")
    )
    lift = (F.col("n_both") / F.col("n_orders")) / (
        (F.col("n_a") / F.col("n_orders"))
        * (F.col("n_b") / F.col("n_orders"))
    )
    return (
        pairs.join(F.broadcast(ma), "cat_a")
        .join(F.broadcast(mb), "cat_b")
        .crossJoin(F.broadcast(tot))
        .select("cat_a", "cat_b", "n_both", "n_a", "n_b",
                round6(lift).alias("lift"))
    )


Q145_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey,
         string_split(p.p_type, ' ')[1] AS category
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
t AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
pairs AS (
  SELECT a.category AS cat_a, b.category AS cat_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM baskets a
  JOIN baskets b ON a.l_orderkey = b.l_orderkey
                AND a.category < b.category
  GROUP BY a.category, b.category
),
marg AS (
  SELECT category, CAST(count(*) AS BIGINT) AS n_cat
  FROM baskets GROUP BY category
)
SELECT p.cat_a, p.cat_b, p.n_both,
       ma.n_cat AS n_a, mb.n_cat AS n_b,
       {round6_sql('(p.n_both * 1.0 / t.n_orders) '
                   '/ ((ma.n_cat * 1.0 / t.n_orders) '
                   '   * (mb.n_cat * 1.0 / t.n_orders))')} AS lift
FROM pairs p
JOIN marg ma ON p.cat_a = ma.category
JOIN marg mb ON p.cat_b = mb.category, t
"""


# --------------------------------------------------------------------------
# q146 — salted skew JOIN (hot-key mitigation on the join side)
# --------------------------------------------------------------------------


def q146_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-side twin of q83's salted aggregation: the fact's join
    key is salted (deterministic crc32-derived, no RNG) and the dim side
    replicated salt-ways (operators/skew.py::salted_join), so a hot key
    spreads across n_salts tasks instead of melting one. The result is
    IDENTICAL to the plain join — which the oracle checks — and the
    mitigation matters precisely when the dim is too big to broadcast
    but the fact is skewed; AQE's runtime skew split is the automatic
    alternative, this is the explicit portable form.

    The declared result joins events to customer market segments and
    rolls up per segment — dimension-bounded output over a salted
    exchange.
    """
    from wetsa_cams_solrad_timeseries_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    cu = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(ev, cu, "user_id", "c_custkey", n_salts=8)
    # exact-decimal sum: salting deliberately REORDERS the partial sums
    # (q83's documented reorder case), and at large SF the per-segment
    # totals cross the magnitude where a double sum has no stable 6th
    # decimal — round6 alone cannot stabilize that (plans/_spec.py).
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        round6(exact_sum("value")).alias("sum_value"),
    )


Q146_ORACLE = f"""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       {round6_sql(exact_sum_sql('e.value'))} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


from wetsa_cams_solrad_timeseries_spark.plans._spec import make_specs

SPECS = make_specs(
    [
        ("q125_rolling_wau", q125_rolling_wau, Q125_ORACLE, (),
         "sliding-window exact distinct users"),
        ("q126_feature_assembly", q126_feature_assembly, Q126_ORACLE, (),
         "per-entity feature vector assembly"),
        ("q127_winsorize", q127_winsorize, Q127_ORACLE, (),
         "percentile winsorization audit"),
        ("q128_attribution", q128_attribution, Q128_ORACLE, (),
         "first-touch attribution via LOCF"),
        ("q129_error_streaks", q129_error_streaks, Q129_ORACLE, (),
         "condition-keyed gaps-and-islands"),
        ("q130_chi_square", q130_chi_square, Q130_ORACLE, (),
         "contingency table + chi-square"),
        ("q131_vocab_overlap", q131_vocab_overlap, Q131_ORACLE, (),
         "cross-language vocabulary Jaccard"),
        ("q132_mad_robust_stats", q132_mad_robust_stats, Q132_ORACLE, (),
         "median absolute deviation profiling"),
        ("q133_token_novelty", q133_token_novelty, Q133_ORACLE, (),
         "vocabulary novelty / growth curve"),
        ("q134_wow_growth", q134_wow_growth, Q134_ORACLE, (),
         "period-over-period growth on aggregate"),
        ("q135_target_encoding", q135_target_encoding, Q135_ORACLE, (),
         "leave-one-out target encoding"),
        ("q136_decile_lift", q136_decile_lift, Q136_ORACLE, (),
         "score-decile lift / calibration table"),
        ("q137_null_safe_join", q137_null_safe_join, Q137_ORACLE, (),
         "null-safe equality join audit"),
        ("q138_transition_matrix", q138_transition_matrix, Q138_ORACLE, (),
         "event-transition Markov matrix"),
        ("q139_contribution_shares", q139_contribution_shares, Q139_ORACLE,
         (), "percent-of-parent hierarchy shares"),
        ("q140_peak_concurrency", q140_peak_concurrency, Q140_ORACLE, (),
         "sweep-line peak concurrency"),
        ("q141_adoption_curve", q141_adoption_curve, Q141_ORACLE, (),
         "cumulative distinct-user growth"),
        ("q142_ab_test", q142_ab_test, Q142_ORACLE, (),
         "Welch two-sample t statistic"),
        ("q143_entropy_mix", q143_entropy_mix, Q143_ORACLE, (),
         "daily event-mix Shannon entropy"),
        ("q144_fulfillment_latency", q144_fulfillment_latency, Q144_ORACLE,
         (), "order→first-ship latency SLA"),
        ("q145_basket_lift", q145_basket_lift, Q145_ORACLE, (),
         "market-basket co-occurrence lift"),
        ("q146_salted_skew_join", q146_salted_skew_join, Q146_ORACLE, (),
         "salted hot-key join mitigation"),
    ]
)
