"""Compile pipeline (EP2 — reference: code/compile-solrad.py).

Reference flow: glob processed CSVs → per-file driver loop (regex station
from filename, dimension probe, exclusion checks, CSV read, rename, time
parse, local time) → concat → xarray pivot → NetCDF.

Spark-first restructuring (SURVEY.md §3 EP2): ONE glob scan reads every
file; per-file identity comes from ``input_file_name()`` + regex (S5/S6);
the dimension probe, membership filter and exclusion all ride on one
broadcast join (J2/P6/P7); the union is free (it IS the scan). Zero
shuffles end-to-end — the plan is scan → project → broadcast-join →
project. The long-form table is the canonical output; the dense
(station × time) pivot exists only in the NetCDF export
(sinks/netcdf.py), which is a driver-side presentation step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wetsa_cams_solrad_timeseries_spark.operators.filters import exclude_keys
from wetsa_cams_solrad_timeseries_spark.functions.scalar import (
    clean_key,
    clean_key_str,
    local_time,
    parse_utc_offset,
)

PROCESSED_PATTERN = r"processed_10min_(.*?)_observed_cloud\.csv"

LOCATIONS_SCHEMA = T.StructType(
    [
        T.StructField("no", T.IntegerType()),
        T.StructField("station", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("elevation", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
    ]
)

PROCESSED_SCHEMA = T.StructType(
    [T.StructField("time", T.TimestampType())]
    + [
        T.StructField(c, T.DoubleType())
        for c in [
            "TOA", "Clear sky GHI", "Clear sky BHI", "Clear sky DHI",
            "Clear sky BNI", "GHI", "BHI", "DHI", "BNI", "Reliability",
            "Cloud coverage",
        ]
    ]
)


def read_locations(spark: SparkSession, path: str) -> DataFrame:
    """F1 fixture reader (schema per FIXTURES.md F1; the shipped reference
    CSV lacks the ``timezone`` column its own code requires —
    SURVEY.md §2.13.1 — so the schema here declares it explicitly).

    Validates the parsed UTC offsets EAGERLY: ``parse_utc_offset`` is a
    cast (null on 'UTC+05:30' or garbage), and a null offset would later
    null ``time_local`` and let ``compile_solar``'s na.drop silently
    delete the whole station — where the reference's ``astype(int)``
    fails loudly. The probe is a limit-5 collect over a ~35-row
    dimension table, so the eager action is free."""
    loc = (
        spark.read.option("header", True).schema(LOCATIONS_SCHEMA).csv(path)
        .withColumn("station_key", clean_key("station"))
        .withColumn("utc_offset", parse_utc_offset("timezone"))
    )
    bad = (
        loc.where(
            F.col("timezone").isNotNull() & F.col("utc_offset").isNull()
        )
        .select("station", "timezone")
        .limit(5)
        .collect()
    )
    if bad:
        raise ValueError(
            "unparseable integer UTC offsets in locations table "
            f"(reference supports whole hours only): {[tuple(r) for r in bad]}"
        )
    return loc


def compile_solar(
    spark: SparkSession,
    processed_glob: str,
    locations_path: str,
    exclude_stations: tuple[str, ...] = ("Sleman",),
) -> DataFrame:
    """The whole compile pipeline as one declarative plan.

    Column-pruned scan (S4: only time/GHI/DHI/BNI reach the parser),
    filename → station (S6), key normalization on both sides (J3/F6),
    broadcast dimension join carrying the membership filter (J2/P7),
    literal exclusion (P6 — reference hard-excludes 'Sleman',
    compile-solrad.py:207), local-time derivation (F4/F5), null-drop (P5).
    Output: the long-form compiled table (FIXTURES.md F5).
    """
    locations = read_locations(spark, locations_path)
    # Exclusion names normalize through clean_key_str — the driver-side
    # twin of the clean_key join-key derivation — so a name like
    # 'Mt. Merapi' actually matches its key ('mt merapi'); a partial
    # re-implementation here silently failed to exclude such names.
    excl_keys = [clean_key_str(k) for k in exclude_stations]

    fact = (
        spark.read.option("header", True).schema(PROCESSED_SCHEMA)
        .csv(processed_glob)
        .select(
            "time", "GHI", "DHI",
            F.col("BNI").alias("DNI"),  # P2 rename (compile-solrad.py:108)
            F.regexp_extract(F.input_file_name(), PROCESSED_PATTERN, 1).alias(
                "station_file"
            ),
        )
        .withColumn("station_key", clean_key("station_file"))
    )
    fact = exclude_keys(fact, "station_key", excl_keys)
    dim = locations.select(
        "station_key",
        F.col("station").alias("station"),
        "latitude", "longitude", "elevation", "utc_offset",
    )
    return (
        fact.join(F.broadcast(dim), on="station_key", how="inner")
        .withColumn("time_local", local_time("time", F.col("utc_offset")))
        .na.drop(subset=["time", "time_local"])
        .select(
            "station",
            F.col("time").alias("time_utc"),
            "time_local",
            "GHI", "DHI", "DNI",
            "latitude", "longitude", "elevation",
        )
    )


def write_compiled_parquet(df: DataFrame, path: str) -> None:
    """Canonical scale sink for the compiled table: parquet partitioned by
    station (≈3.7 M rows/yr at reference scale — SURVEY.md §6)."""
    df.write.mode("overwrite").partitionBy("station").parquet(path)
