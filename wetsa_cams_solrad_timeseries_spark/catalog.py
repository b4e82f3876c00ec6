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


def table(
    spark: SparkSession, sf_dir: str, name: str, validate: bool = False
) -> DataFrame:
    """Read one corpus table. Parquet scan → columnar, pushdown-capable.

    ``events.ts`` is physically TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as int64 nanos and
    is truncated (not rounded) to microseconds here — the same conversion
    DuckDB applies — so both engines agree on the instant.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
