"""Scalable dense-export sink: the partitioned twin of the NetCDF writer.

SURVEY §7.3.2 / SCALING.md name the NetCDF export's driver-collect cliff:
``sinks/netcdf.py`` pivots the compiled table on the driver, which is
right for the reference's ≤3.7 M-row artifact but not for a 100 TB grid.
This sink is the scale path — the same layout idea as Zarr (chunked
array storage + JSON attribute sidecars), expressed Spark-natively:

- data: parquet partitioned by ``station`` (one directory per chunk
  axis value), rows sorted by time within each partition, zstd — written
  fully distributed, no driver materialization;
- metadata: one small JSON sidecar (``_cf_attrs.json``) carrying the CF
  global/variable attributes + time encoding, the ``.zattrs`` analogue;
- manifest: per-station chunk stats (row count, time range) computed as
  one distributed aggregate and written as a single small JSON.

A reader gets O(1) chunk lookup by station (partition pruning) and the
CF metadata without touching data files — the two properties the NetCDF
artifact provided — while writes scale with executors.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.sinks.netcdf import (
    CF_GLOBAL_ATTRS,
    CF_VAR_ATTRS,
    TIME_ENCODING,
)


def write_dense_partitioned(
    compiled: DataFrame,
    path: str,
    partition_col: str = "station",
    time_col: str = "time_utc",
) -> dict[str, Any]:
    """Write the compiled long-form table as a station-chunked dense
    export; returns the manifest dict (also persisted next to the data).
    """
    (
        compiled.repartition(partition_col)
        .sortWithinPartitions(partition_col, time_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .option("compression", "zstd")
        .parquet(path)
    )

    # Manifest from the JUST-WRITTEN parquet, not the input frame:
    # re-aggregating `compiled` would re-execute its entire lineage (CSV
    # scan + joins) a second time, and the manifest should describe what
    # actually landed on disk anyway. The read-back scan is columnar,
    # partition-aware, and only touches two columns.
    spark = compiled.sparkSession
    chunk_rows = (
        spark.read.parquet(path)
        .groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(time_col).cast("string").alias("time_min"),
            F.max(time_col).cast("string").alias("time_max"),
        )
        .orderBy(partition_col)
        .collect()
    )
    manifest = {
        "format": "dense-partitioned-parquet/v1",
        "partition_col": partition_col,
        "time_col": time_col,
        "chunks": [r.asDict() for r in chunk_rows],
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    with open(os.path.join(path, "_cf_attrs.json"), "w") as fh:
        json.dump(
            {
                "global": CF_GLOBAL_ATTRS,
                "variables": CF_VAR_ATTRS,
                "time_encoding": TIME_ENCODING,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    return manifest


def read_dense_partitioned(spark, path: str, stations: list[str] | None = None):
    """Read the export back; ``stations`` prunes partitions at the scan
    (shows up as PartitionFilters in the plan). Returns (DataFrame,
    manifest, cf_attrs)."""
    df = spark.read.parquet(path)
    if stations:
        df = df.filter(F.col("station").isin(stations))
    with open(os.path.join(path, "_manifest.json")) as fh:
        manifest = json.load(fh)
    with open(os.path.join(path, "_cf_attrs.json")) as fh:
        attrs = json.load(fh)
    return df, manifest, attrs
