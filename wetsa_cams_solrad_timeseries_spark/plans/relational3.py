"""Relational surface, part 3: additional classic TPC-H shapes adapted to
the testdata schema (no partsupp/shipmode columns) — large-volume
customers (Q18), disjunctive predicate pushdown (Q19), and market share
(Q8). All use the structural ``round6``/``round6_sql`` helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.plans._spec import round6, round6_sql


# --------------------------------------------------------------------------
# q74 — large-volume customers (TPC-H Q18 shape)
# --------------------------------------------------------------------------
_Q74_MIN_QTY = 140


def q74_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total line quantity exceeds a threshold, with their
    customer — aggregate-then-semi-join: the HAVING filter reduces
    BEFORE the customer join, so the join input is the handful of big
    orders, not the fact table (the decorrelated Q18 plan)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(round6(F.sum("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > _Q74_MIN_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


Q74_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {round6_sql('sum(l_quantity)')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {round6_sql('sum(l_quantity)')} > {_Q74_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


# --------------------------------------------------------------------------
# q75 — disjunctive predicates (TPC-H Q19 shape)
# --------------------------------------------------------------------------
def q75_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue over OR-of-ANDs brand/size/quantity clauses — the classic
    pushdown test: the disjunction stays a single scan predicate (plus
    one broadcast join on part), never a union of three scans."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity").between(10, 35)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity").between(20, 50)))
    )
    return j.filter(clause).agg(
        round6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


Q75_ORACLE = f"""
SELECT {round6_sql('sum(l_extendedprice * (1 - l_discount))')} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


# --------------------------------------------------------------------------
# q76 — nation market share (TPC-H Q8 shape)
# --------------------------------------------------------------------------
def q76_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-year share of revenue supplied by one nation to one
    customer region: conditional-sum ÷ total-sum inside ONE aggregation
    (no self-join), all dimension joins broadcast."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cu = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")

    cust_region = (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp_nation = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_region), o.o_custkey == cust_region.c_custkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            round6(
                F.sum(F.when(F.col("supp_nation") == "BRAZIL", vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share"),
            round6(F.sum(vol)).alias("region_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q76_ORACLE = f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region    ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE r_name = 'AMERICA'
)
SELECT o_year,
       {round6_sql("sum(CASE WHEN supp_nation = 'BRAZIL' THEN vol ELSE 0.0 END) / sum(vol)")} AS mkt_share,
       {round6_sql('sum(vol)')} AS region_revenue,
       count(*) AS n_items
FROM j
GROUP BY o_year
"""


from wetsa_cams_solrad_timeseries_spark.plans._spec import make_specs

SPECS = make_specs(
    [
        ("q74_large_volume_customers", q74_large_volume_customers, Q74_ORACLE, (), "TPC-H Q18 shape"),
        ("q75_disjunctive_revenue", q75_disjunctive_revenue, Q75_ORACLE, (), "TPC-H Q19 shape"),
        ("q76_market_share", q76_market_share, Q76_ORACLE, (), "TPC-H Q8 shape"),
    ]
)
