"""SparkSession factory.

Pins the configuration the engine's semantics depend on (SURVEY.md §4.3):

- ``spark.sql.session.timeZone=UTC`` — the reference localizes every
  timestamp to UTC before any join/aggregation
  (reference: code/solrad-compare.py:23-28, code/get-cams-solrad-ts.py:90);
  with UTC pinned, Spark timestamps collate identically to the DuckDB
  oracle's naive-UTC timestamps.
- ``spark.sql.ansi.enabled=false`` — pandas' ``errors='coerce'`` parse
  (reference: code/compile-solrad.py:113) and NaN-on-0-division
  (reference: code/solrad-compare.py:91) map to Spark's non-ANSI
  null-on-failure semantics. Spark 4 defaults ANSI on, so this must be
  explicit.
- AQE on (+ coalesce partitions + skew join): the scale story at 100 TB —
  runtime re-planning of shuffle partition counts, broadcast demotion, and
  skew splitting.
- Arrow on: every driver-side collect (NetCDF export, plotting layer) and
  every Pandas UDF crosses the JVM/Python boundary in columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Semantics-critical settings: these change query RESULTS, not just speed.
SEMANTIC_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    # The events table stores TIMESTAMP(NANOS) parquet, which Spark has no
    # native type for. Read the raw int64 nanos and truncate to micros in
    # the catalog (catalog.table), matching DuckDB's nanos→micros
    # truncation so both engines see identical instants.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# Performance settings, sized for local[N] testing but chosen to be the
# right defaults on a real cluster too (AQE re-sizes at runtime).
PERF_CONF: dict[str, str] = {
    # local[N] runs the whole engine in the driver JVM; the 1g default
    # heap causes GC churn across a multi-query session. Only effective
    # when THIS factory creates the JVM (ignored on attach).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local runs: match core count, not the 200 default. On a cluster this
    # is a starting point that AQE coalesces/splits as needed.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Managed-table warehouse (bucketed tables) outside the repo tree.
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"
    ),
}


def get_spark(
    app_name: str = "wetsa-cams-solrad-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so tests and the
    bench harness share one code path; on a real cluster, pass ``None``
    and set the master via spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    for k, v in {**SEMANTIC_CONF, **PERF_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session (e.g. the
    # driver's); re-assert the semantics-critical conf on it.
    for k, v in SEMANTIC_CONF.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("WARN")
    return spark
