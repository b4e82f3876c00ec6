"""Event-time-timeout stateful sessionization vs the batch gap
construction: every emitted session must be a real batch session, and all
sessions whose gap deadline precedes the final watermark must be emitted."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.streaming.sessions import (
    GAP_US,
    streaming_sessions,
)


def _batch_sessions(ev):
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn(
            "new_session",
            F.when(gap_us.isNull() | (gap_us > GAP_US), 1).otherwise(0),
        )
        .withColumn(
            "seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 6).alias("sum_value"),
        )
    )


def test_streaming_sessions_match_batch(spark, sf_dir):
    got = streaming_sessions(spark, f"{sf_dir}/events.parquet")
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    exp = _batch_sessions(ev)
    max_ts = ev.agg(F.max("ts")).first()[0]

    got_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in got.collect()
    }
    exp_rows = exp.collect()
    exp_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in exp_rows
    }
    # 1) Soundness: every emitted session is a true batch session.
    assert got_keys <= exp_keys, f"spurious sessions: {list(got_keys - exp_keys)[:3]}"
    # 2) Completeness: every session that must have closed (deadline
    #    before the final watermark = max event time) was emitted.
    import pandas as pd

    must_close = {
        k
        for k, r in zip(exp_keys, exp_rows)
        for k in [(r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])]
        if r["session_end"] + pd.Timedelta(microseconds=GAP_US) < max_ts
    }
    missing = must_close - got_keys
    assert not missing, f"unclosed due sessions: {list(missing)[:3]}"
    assert len(got_keys) > 0
