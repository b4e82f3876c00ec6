"""Test-corpus catalog: loaders for the driver-provided parquet tables.

Tables (TESTDATA.md / FIXTURES.md F6): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file each under a
scale-factor directory.

At 100 TB these would be partitioned parquet/iceberg datasets; the loader
keeps the access path identical (``spark.read.parquet``) so only the path
changes. Schemas are declared in ``schemas.py`` and asserted on read so a
drifting input fails loudly instead of silently widening a type.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zone TimestampType.

    The driver's corpus has shipped ``events.ts`` in two physical shapes
    across rounds, and both must read identically:

    - TIMESTAMP(NANOS) + ``spark.sql.legacy.parquet.nanosAsLong`` →
      int64 nanos, truncated (not rounded) to microseconds — the same
      conversion DuckDB applies, so both engines agree on the instant;
    - naive ``timestamp[us]`` (isAdjustedToUTC=false) → TIMESTAMP_NTZ,
      cast to TimestampType. The session zone is pinned to UTC, so the
      cast is wall-clock- and instant-preserving, and matches DuckDB's
      naive-TIMESTAMP reading of the same file.

    Already-TimestampType columns pass through untouched.
    """
    for field in df.schema.fields:
        if field.name == col:
            df = df.withColumn(col, ts_fix_expr(field.dataType.simpleString(), col))
    return df


def ts_fix_expr(ts_dtype: str | None, col: str = "ts") -> F.Column:
    """The single physical-shape dispatch behind :func:`normalize_ts`,
    exposed for the streaming readers (which must declare a schema up
    front and so dispatch on the BATCH-peeked dtype string rather than a
    DataFrame). One helper, one place to add a third physical shape."""
    if ts_dtype == "bigint":  # nanos-as-long table
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    if ts_dtype == "timestamp_ntz":  # naive micros; session zone is UTC
        return F.col(col).cast("timestamp")
    return F.col(col)


def table(
    spark: SparkSession, sf_dir: str, name: str, validate: bool = True
) -> DataFrame:
    """Read one corpus table. Parquet scan → columnar, pushdown-capable.

    ``events.ts`` arrives in a per-round physical shape; ``normalize_ts``
    maps every shape to the same session-UTC TimestampType instants.

    Validation defaults ON — the module docstring promises "asserted on
    read", and the check is parquet-FOOTER metadata only (no data
    scan): a silently drifted input type corrupts every downstream
    query, which is far costlier than the microseconds this costs.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = normalize_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    if validate:
        from wetsa_cams_solrad_timeseries_spark.schemas import validate_schema

        validate_schema(df, name)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every corpus table as a dict of DataFrames."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
