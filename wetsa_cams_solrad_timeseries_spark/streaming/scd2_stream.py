"""Streaming SCD2 (type-2 slowly-changing dimension) maintenance via
``foreachBatch``, with out-of-order interval close-out.

The hard part of SCD2-from-a-stream is that a LATE row can land in the
*middle* of an already-materialized validity interval: it must split that
interval, may merge away a later version (if its attribute equals the
late row's), and renumbers every subsequent version of that key. No
append-only plan expresses that — the standard production answer (Delta/
Iceberg MERGE pipelines do exactly this) is whole-key reconciliation:

  - keep an append-only per-key CHANGE-POINT LOG (every observed
    ``(ts, event_id, attr)`` point — consecutive-duplicate collapsing is
    NOT applied to the log, because a collapsed point can become a real
    version boundary once a late row lands between it and its
    predecessor; see the A@1,A@3 + late B@2 counterexample in
    tests/test_advanced_plans.py);
  - per micro-batch, recompute the version timeline ONLY for the keys
    the batch touched (log semi-joined to the batch's key set), and
    carry every untouched key's rows forward unchanged (anti-join).

Both the log update and the per-key rebuild are ordinary distributed
jobs; per-batch work is proportional to the touched keys' history, not
the table — the realistic incremental-MERGE cost model. With a
transactional table format the generation-swap below becomes the
format's commit; the merge body is identical.

The kernel asserts (a) more than one micro-batch ran and (b) at least
one batch actually delivered a LATE point (ts below a key's prior
high-water mark) — so the out-of-order close-out path is exercised on
every run, not just reachable.

Reference parity: the reference has no streaming surface; this extends
its time-series model (interval validity per station,
reference/code/compile-solrad.py's per-station time axes) to the
change-data-capture shape a 100 TB ingest needs.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import ts_fix_expr


def scd2_versions(points: DataFrame, key: str, ts_col: str, attr: str) -> DataFrame:
    """Version timeline from a change-point set: collapse consecutive
    same-attribute points per key, then derive [valid_from, valid_to)
    and a version ordinal. One window partitioned by key — per-key
    local, no global ordering anywhere."""
    w = Window.partitionBy(key).orderBy(ts_col, "event_id")
    ch = (
        points.withColumn("__prev", F.lag(attr).over(w))
        .where(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr)))
        .select(
            key,
            F.col(ts_col).alias("valid_from"),
            F.col("event_id").alias("from_event"),
            F.col(attr).alias("status"),
        )
    )
    wv = Window.partitionBy(key).orderBy("valid_from", "from_event")
    return ch.select(
        key,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "from_event",
        "status",
        F.row_number().over(wv).cast("long").alias("version"),
    )


def streaming_scd2_merge(
    spark: SparkSession,
    split_dir: str,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    attr: str = "event_type",
) -> DataFrame:
    """Drain a multi-file replay through the foreachBatch SCD2 merge and
    return the final version table (key, valid_from, valid_to,
    from_event, status, version)."""
    from wetsa_cams_solrad_timeseries_spark.streaming._drain import (
        drain_checkpoint_dir,
        drain_partitions,
        size_partitions,
    )

    batch_df = spark.read.parquet(split_dir)
    ts_fix = ts_fix_expr(dict(batch_df.dtypes).get(ts_col), ts_col)
    reader = (
        spark.readStream.schema(batch_df.schema)
        .option("pathGlobFilter", "part-*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(split_dir)
        .withColumn(ts_col, ts_fix)
    )

    root = os.path.join(tempfile.gettempdir(), f"wetsa_scd2_{uuid.uuid4().hex[:12]}")
    log_dir = os.path.join(root, "log")
    os.makedirs(log_dir, exist_ok=True)
    state = {"has_log": False, "versions": None, "batches": 0, "late_seen": False}

    def apply_batch(bdf: DataFrame, bid: int) -> None:
        delta = bdf.select(key, ts_col, "event_id", attr)
        touched = delta.select(key).distinct()
        if not state["has_log"]:
            log = None
        else:
            # The change-point log is APPEND-ONLY: each batch adds only
            # its own delta file, so per-batch log I/O is O(delta), not
            # O(table) — the cost model the docstring claims. Reads
            # semi-join to the touched keys before anything else, so the
            # scan prunes to the keys being reconciled.
            log = spark.read.parquet(log_dir)
            touched_log = log.join(touched, key, "left_semi")
            # Out-of-order detection: a delta point below a key's prior
            # high-water mark will split/renumber existing intervals.
            hwm = touched_log.groupBy(key).agg(F.max(ts_col).alias("__hwm"))
            n_late = (
                delta.join(hwm, key)
                .where(F.col(ts_col) < F.col("__hwm"))
                .limit(1)
                .count()
            )
            if n_late > 0:
                state["late_seen"] = True
        rebuild_points = (
            delta
            if log is None
            # Reuse the semi-join computed for the high-water-mark probe
            # — re-deriving it would plan and run the log scan twice per
            # batch.
            else touched_log.unionByName(delta)
        )
        new_versions = scd2_versions(rebuild_points, key, ts_col, attr)
        if state["versions"] is not None:
            carried = spark.read.parquet(state["versions"]).join(
                touched, key, "left_anti"
            )
            new_versions = carried.unionByName(new_versions)
        ver_path = os.path.join(root, f"ver_{bid}")
        new_versions.write.mode("overwrite").parquet(ver_path)
        delta.write.mode("append").parquet(log_dir)
        state["has_log"] = True
        state["versions"] = ver_path
        state["batches"] += 1

    ckpt = drain_checkpoint_dir()
    try:
        with drain_partitions(spark, size_partitions(spark, batch_df.count())):
            query = (
                reader.writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                query.processAllAvailable()
            finally:
                query.stop()
        if state["batches"] <= 1:
            raise RuntimeError(
                f"SCD2 merge expected >1 micro-batch, got {state['batches']}"
            )
        if not state["late_seen"]:
            raise RuntimeError(
                "SCD2 merge replay delivered no out-of-order point; the "
                "late close-out path was not exercised"
            )
        result = spark.read.parquet(state["versions"])
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
