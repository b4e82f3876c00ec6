"""Salted aggregation transparency, stateful streaming vs batch oracle,
and physical-plan property assertions (pushdown / broadcast / shuffle
counts) that cement the SCALING.md claims in CI."""

import io
from contextlib import redirect_stdout

import pandas as pd
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.operators.skew import salted_aggregate
from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES


def test_salted_aggregate_matches_plain_groupby(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    got = salted_aggregate(
        ev,
        keys=["event_type"],
        measures={"value": ("sum", "count", "min", "max", "avg")},
        n_salts=8,
    )
    exp = ev.groupBy("event_type").agg(
        F.sum("value").alias("sum_value"),
        F.count("value").alias("count_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.avg("value").alias("avg_value"),
    )
    g = {r["event_type"]: r for r in got.collect()}
    e = {r["event_type"]: r for r in exp.collect()}
    assert set(g) == set(e)
    for k in g:
        assert g[k]["count_value"] == e[k]["count_value"]
        assert g[k]["min_value"] == e[k]["min_value"]
        assert g[k]["max_value"] == e[k]["max_value"]
        assert abs(g[k]["sum_value"] - e[k]["sum_value"]) < 1e-6
        assert abs(g[k]["avg_value"] - e[k]["avg_value"]) < 1e-9


def test_salted_aggregate_null_skipping_avg(spark):
    # avg must divide by the NON-NULL count, exactly like F.avg.
    pdf = pd.DataFrame({"k": ["a"] * 4, "v": [2.0, None, 4.0, None]})
    got = salted_aggregate(
        spark.createDataFrame(pdf), ["k"], {"v": ("avg", "count")}, n_salts=4
    ).first()
    assert got["count_v"] == 2
    assert got["avg_v"] == 3.0


def test_salted_aggregate_skewed_key(spark):
    # one key owns 90% of rows — the scenario salting exists for
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * 900 + [f"k{i}" for i in range(100)],
            "v": [float(i) for i in range(1000)],
        }
    )
    got = {
        r["k"]: r
        for r in salted_aggregate(
            spark.createDataFrame(pdf), ["k"], {"v": ("sum", "count")}, n_salts=4
        ).collect()
    }
    assert got["hot"]["count_v"] == 900
    assert abs(got["hot"]["sum_v"] - sum(range(900))) < 1e-6


def test_stateful_streaming_matches_batch(spark, sf_dir):
    from wetsa_cams_solrad_timeseries_spark.streaming.stateful import (
        streaming_running_totals,
    )

    got = streaming_running_totals(spark, f"{sf_dir}/events.parquet")
    ev = table(spark, sf_dir, "events")
    exp = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value") + F.lit(1e-9), 6).alias("sum_value"),
        F.max("ts").alias("last_ts"),
    )
    g = {r["user_id"]: r for r in got.collect()}
    e = {r["user_id"]: r for r in exp.collect()}
    assert set(g) == set(e)
    for k in g:
        assert g[k]["n_events"] == e[k]["n_events"]
        assert abs(g[k]["sum_value"] - e[k]["sum_value"]) < 1e-6
        assert g[k]["last_ts"] == e[k]["last_ts"]


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_plan_properties(spark):
    sf = "/root/testdata/sf0.001"
    # q01: predicate + projection reach the parquet scan
    p = _plan(QUERIES["q01_pricing_summary"].fn(spark, sf))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    assert "l_comment" not in p  # pruned (column not in this dataset anyway)
    assert "ReadSchema" in p and "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]
    # q03: every dimension join is broadcast, fact never shuffles pre-agg
    p3 = _plan(QUERIES["q03_star_join_revenue"].fn(spark, sf))
    assert p3.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p3
    # q15: sessionization reuses one partitioning — exactly one physical
    # Exchange node (windows + final aggregate share the user_id shuffle)
    import re

    p15 = _plan(QUERIES["q15_sessionize"].fn(spark, sf))
    assert len(re.findall(r"\(\d+\) Exchange", p15)) == 1
