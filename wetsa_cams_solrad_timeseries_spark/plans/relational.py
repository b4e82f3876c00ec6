"""Relational query inventory: aggregation, joins, set ops, window
functions, grouping sets — the general operator surface (SURVEY.md §2.3–2.6
plus the TPC-H-style workloads the driver corpus is shaped for).

Every Spark query here is a declarative DataFrame plan: filters/projections
push into the parquet scan, small dimensions are broadcast, aggregates use
map-side partial aggregation. See each docstring for the SURVEY §2 IDs it
covers and the reference call-site it generalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.functions.scalar import clean_key, null_safe_ratio
from wetsa_cams_solrad_timeseries_spark.plans._spec import (
    exact_sum,
    exact_sum_sql,
    maybe_broadcast,
)


# --------------------------------------------------------------------------
# q01 — pricing summary (A1-family grouped aggregation; P1/P3 projections)
# --------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate over the fact table (TPC-H Q1 shape).

    Generalizes the reference's only true aggregation (A1, tumbling mean —
    code/get-cams-solrad-ts.py:94) to the grouped sum/avg/count family.
    Single hash-aggregate: map-side partials, one shuffle on the two group
    keys — the minimal plan at any scale.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity") + F.lit(1e-9), 6).alias("sum_qty"),
            F.round(exact_sum("l_extendedprice") + F.lit(1e-9), 6).alias("sum_base_price"),
            F.round(exact_sum(disc_price) + F.lit(1e-9), 6).alias("sum_disc_price"),
            F.round(exact_sum(disc_price * (1 + F.col("l_tax"))) + F.lit(1e-9), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity") + F.lit(1e-9), 6).alias("avg_qty"),
            F.round(exact_sum("l_extendedprice") / F.count("l_extendedprice") + F.lit(1e-9), 6).alias("avg_price"),
            F.round(F.avg("l_discount") + F.lit(1e-9), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity) + 1e-9, 6)                                        AS sum_qty,
       round({exact_sum_sql('l_extendedprice')} + 1e-9, 6)                     AS sum_base_price,
       round({exact_sum_sql('l_extendedprice * (1 - l_discount)')} + 1e-9, 6)  AS sum_disc_price,
       round({exact_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} + 1e-9, 6)  AS sum_charge,
       round(avg(l_quantity) + 1e-9, 6)                                        AS avg_qty,
       round({exact_sum_sql('l_extendedprice')} / count(l_extendedprice) + 1e-9, 6) AS avg_price,
       round(avg(l_discount) + 1e-9, 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q03 — star-schema broadcast dimension join (J2) + aggregation
# --------------------------------------------------------------------------
def q03_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact → supplier → nation → region chained broadcast joins (J2).

    Reference: code/compile-solrad.py:97,143-144 does per-key dimension
    probes in a driver loop; here all lookups are one pass of broadcast
    hash joins — the fact table never shuffles until the final aggregate.
    """
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")
    return (
        li.join(maybe_broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.round(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(1e-9), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q03_ORACLE = f"""
SELECT r_name AS region_name, n_name AS nation_name,
       round({exact_sum_sql('l_extendedprice * (1 - l_discount)')} + 1e-9, 6) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# q06 — key-normalized join (J3/F6)
# --------------------------------------------------------------------------
def q06_key_normalized_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join through the reference's station-name normalization (F6/J3,
    code/compile-solrad.py:11-23,49,84): a deliberately dirtied key
    (padding, underscores→spaces handled, trailing punctuation) is cleaned
    on both sides before the broadcast join.
    """
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    # Fact side: customers tagged with a dirty variant of their nation name.
    fact = (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .withColumn("dirty_nation", F.concat(F.lit("  "), F.col("n_name"), F.lit("!!")))
        .select("c_custkey", "c_acctbal", "dirty_nation")
        .withColumn("join_key", clean_key("dirty_nation"))
    )
    dim = na.withColumn("join_key", clean_key("n_name")).select("join_key", "n_regionkey")
    return (
        fact.join(F.broadcast(dim), on="join_key")
        .groupBy("join_key", "n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal") + F.lit(1e-9), 6).alias("avg_acctbal"),
        )
    )


# DuckDB regexp_replace is first-match-only without the 'g' flag; Spark's
# replaces all — the oracle must pass 'g' to match.
_CLEAN_SQL = (
    "trim(regexp_replace(lower(regexp_replace(translate({0}, '_', ' '), "
    "'[^a-zA-Z0-9\\s]', '', 'g')), '\\s+', ' ', 'g'))"
)

Q06_ORACLE = f"""
WITH fact AS (
  SELECT c_custkey, c_acctbal,
         {_CLEAN_SQL.format("('  ' || n_name || '!!')")} AS join_key
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
dim AS (
  SELECT {_CLEAN_SQL.format("n_name")} AS join_key, n_regionkey FROM nation
)
SELECT f.join_key, d.n_regionkey,
       count(*) AS n_customers,
       round(avg(c_acctbal) + 1e-9, 6) AS avg_acctbal
FROM fact f JOIN dim d USING (join_key)
GROUP BY f.join_key, d.n_regionkey
"""


# --------------------------------------------------------------------------
# q08 — scalar derivation chain (F8/F9/F10/F11): per-row, full precision
# --------------------------------------------------------------------------
def q08_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compare pipeline's derived-column chain (unit conversion ×k,
    bias, abs, null-safe ratio — code/solrad-compare.py:61-66,88-91)
    re-expressed over the fact table. Pure per-row IEEE arithmetic: stays
    inside whole-stage codegen, bit-identical across engines (no rounding
    needed).
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") * F.lit(60.0)).alias("qty_per_hour"),
        disc_price.alias("disc_price"),
        (disc_price - F.col("l_extendedprice")).alias("discount_bias"),
        F.abs(disc_price - F.col("l_extendedprice")).alias("abs_discount_bias"),
        null_safe_ratio(F.col("l_extendedprice"), F.col("l_quantity")).alias("price_per_unit"),
        null_safe_ratio(F.col("l_discount"), F.col("l_tax")).alias("disc_tax_ratio"),
    )


Q08_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_quantity * 60.0                                    AS qty_per_hour,
       l_extendedprice * (1 - l_discount)                   AS disc_price,
       l_extendedprice * (1 - l_discount) - l_extendedprice AS discount_bias,
       abs(l_extendedprice * (1 - l_discount) - l_extendedprice) AS abs_discount_bias,
       l_extendedprice / nullif(l_quantity, 0)              AS price_per_unit,
       l_discount / nullif(l_tax, 0)                        AS disc_tax_ratio
FROM lineitem
"""


# --------------------------------------------------------------------------
# q09 — OLS regression aggregates (B1/B2)
# --------------------------------------------------------------------------
def q09_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed scipy.linregress (code/solrad-compare.py:131-132): one
    grouped pass of regr_slope/intercept/r2/count. See
    operators/regression.py for the p-value/stderr closed form.
    """
    from wetsa_cams_solrad_timeseries_spark.operators.regression import regression_agg

    li = table(spark, sf_dir, "lineitem")
    return regression_agg(
        li, y="l_extendedprice", x="l_quantity",
        group_cols=("l_returnflag",), round_digits=6,
    )


Q09_ORACLE = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 6)     AS slope,
       round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 6) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity) + 1e-9, 6)        AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)  AS n
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q10 — union all (U1) of heterogeneous subsets
# --------------------------------------------------------------------------
def q10_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (code/compile-solrad.py:134 ``pd.concat``) → ``unionByName``.

    Two differently-filtered projections of orders unioned then
    re-aggregated — Catalyst pushes both filters to the scans.
    """
    o = table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_orderstatus", F.lit("high").alias("bucket"), "o_totalprice"
    )
    ur = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus", F.lit("urgent").alias("bucket"), "o_totalprice"
    )
    return (
        hi.unionByName(ur)
        .groupBy("bucket", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice") + F.lit(1e-9), 6).alias("total_price"),
        )
    )


Q10_ORACLE = """
WITH u AS (
  SELECT o_orderkey, o_orderstatus, 'high' AS bucket, o_totalprice
  FROM orders WHERE o_totalprice > 250000
  UNION ALL
  SELECT o_orderkey, o_orderstatus, 'urgent' AS bucket, o_totalprice
  FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT bucket, o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice) + 1e-9, 6) AS total_price
FROM u GROUP BY bucket, o_orderstatus
"""


# --------------------------------------------------------------------------
# q11 — distinct (A5)
# --------------------------------------------------------------------------
def q11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (code/compile-solrad.py:142 unique stations) → ``distinct()``;
    one partial-dedup + shuffle-dedup aggregation."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


Q11_ORACLE = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# --------------------------------------------------------------------------
# q13 — top-k per group (ranking window function)
# --------------------------------------------------------------------------
def q13_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price. Ranking window with a
    unique tie-break (orderkey) so the result is deterministic. One shuffle
    on the partition key; at scale this is the standard top-k-per-group
    plan (no global sort).
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q13_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# q14 — pivot (conditional aggregation)
# --------------------------------------------------------------------------
def q14_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns via conditional aggregation — the
    shuffle-free formulation of ``.pivot()`` (one pass, map-side partials);
    mirrors the reference's long→wide pivot (R1, compile-solrad.py:135-138)
    in its aggregatable form.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(F.lit(0.0))) + F.lit(1e-9), 6).alias("qty_open"),
        F.round(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(F.lit(0.0))) + F.lit(1e-9), 6).alias("qty_finished"),
        F.count(F.when(F.col("l_linestatus") == "O", F.lit(1))).alias("n_open"),
        F.count(F.when(F.col("l_linestatus") == "F", F.lit(1))).alias("n_finished"),
    )


Q14_ORACLE = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END) + 1e-9, 6) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END) + 1e-9, 6) AS qty_finished,
       count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open,
       count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_finished
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q16 — rollup with grouping indicators
# --------------------------------------------------------------------------
def q16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (not in the reference; part of the general
    relational surface, SURVEY.md §2.5 note). Spark computes grouping sets
    in one expand+aggregate pass."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity") + F.lit(1e-9), 6).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_returnflag"),
            F.grouping("l_linestatus").cast("int").alias("g_linestatus"),
        )
    )


Q16_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity) + 1e-9, 6) AS sum_qty,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_returnflag,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_linestatus
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q19 — anti join (P6 at scale)
# --------------------------------------------------------------------------
def q19_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order above 300k — left-anti join (the scalable
    form of the reference's exclusion guard P6, compile-solrad.py:87-89)."""
    cu = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cu.join(big, cu.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


Q19_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


# --------------------------------------------------------------------------
# q20 — semi join (P7 at scale)
# --------------------------------------------------------------------------
def q20_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership filter as left-semi join (P7, compile-solrad.py:92-94):
    customers with at least one 1997 order, counted per market segment."""
    cu = table(spark, sf_dir, "customer")
    o97 = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        cu.join(o97, cu.c_custkey == o97.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal") + F.lit(1e-9), 6).alias("avg_acctbal"),
        )
    )


Q20_ORACLE = """
SELECT c_mktsegment, count(*) AS n_customers, round(avg(c_acctbal) + 1e-9, 6) AS avg_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q21 — shipping priority (TPC-H Q3 shape: join + agg + deterministic top-k)
# --------------------------------------------------------------------------
def q21_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + aggregation + top-10 with unique tie-break. The top-k is
    a rank over the aggregated (small) side — at scale this is
    TakeOrdered, not a global sort of the fact table."""
    cu = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-06-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp")
    )
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(cu), o.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(1e-9), 6).alias("revenue"))
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k +
    # k-row merge) — at scale the aggregated side is every qualifying
    # order, so a global window-rank single-partition sort is the wrong
    # shape; the row_number then ranks only the 10 survivors.
    top = agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey")).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue", "rn")
    )


Q21_ORACLE = """
WITH agg AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 6) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
    AND l_shipdate  > TIMESTAMP '1996-06-01 00:00:00'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, o_orderdate, o_orderpriority, revenue, rn
FROM (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS rn FROM agg
)
WHERE rn <= 10
"""


# --------------------------------------------------------------------------
# q22 — local supplier volume (TPC-H Q5 shape: 5-way join, correlated keys)
# --------------------------------------------------------------------------
def q22_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join where customer and supplier must share a nation.
    nation/region are hinted broadcast (scale-invariant); customer and
    supplier go through the size-gated ``maybe_broadcast`` — they grow
    with SF, so at 100x the hint disappears and AQE picks SMJ/broadcast
    at runtime instead of OOMing on a forced build side."""
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Money expression projected to decimal once at the scan (see q66):
    # the join shuffles carry one decimal instead of two doubles.
    li = li.withColumn(
        "__revenue_dec",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(maybe_broadcast(cu), (o.o_custkey == cu.c_custkey) & (cu.c_nationkey == su.s_nationkey))
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum("__revenue_dec").cast("double") + F.lit(1e-9), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q22_ORACLE = f"""
SELECT n_name AS nation_name,
       round({exact_sum_sql('l_extendedprice * (1 - l_discount)')} + 1e-9, 6) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


from wetsa_cams_solrad_timeseries_spark.plans._spec import make_specs

SPECS = make_specs(
    [
        ("q01_pricing_summary", q01_pricing_summary, Q01_ORACLE, ("A1", "P1", "P3"), "grouped multi-aggregate"),
        ("q03_star_join_revenue", q03_star_join_revenue, Q03_ORACLE, ("J2",), "broadcast star join"),
        ("q06_key_normalized_join", q06_key_normalized_join, Q06_ORACLE, ("J3", "F6"), "normalized-key join"),
        ("q08_derived_columns", q08_derived_columns, Q08_ORACLE, ("F8", "F9", "F10", "F11"), "scalar chain"),
        ("q09_regression", q09_regression, Q09_ORACLE, ("B1", "B2"), "OLS regression aggregates"),
        ("q10_union_all", q10_union_all, Q10_ORACLE, ("U1",), "union all"),
        ("q11_distinct", q11_distinct, Q11_ORACLE, ("A5",), "distinct"),
        ("q13_topk_per_group", q13_topk_per_group, Q13_ORACLE, (), "ranking window"),
        ("q14_pivot", q14_pivot, Q14_ORACLE, ("R1",), "pivot/conditional agg"),
        ("q16_rollup", q16_rollup, Q16_ORACLE, (), "rollup grouping sets"),
        ("q19_anti_join", q19_anti_join, Q19_ORACLE, ("P6",), "anti join"),
        ("q20_semi_join", q20_semi_join, Q20_ORACLE, ("P7",), "semi join"),
        ("q21_shipping_priority", q21_shipping_priority, Q21_ORACLE, ("J1", "J2"), "TPC-H Q3 shape"),
        ("q22_local_supplier_volume", q22_local_supplier_volume, Q22_ORACLE, ("J2",), "TPC-H Q5 shape"),
    ]
)
