"""Golden tests for the F1–F13 scalar chain (SURVEY.md §2.7) against
pure-Python reimplementations of the reference semantics."""

import re

from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.scalar import (
    clean_key,
    interval_start,
    local_time,
    null_safe_ratio,
    parse_utc_offset,
    sanitize_filename,
    wh_per_min_to_w,
)


def clean_station_name_py(name: str) -> str:
    # Python oracle mirroring reference semantics (compile-solrad.py:11-23):
    # underscores → spaces, strip non-alphanumerics, lower, collapse spaces.
    cleaned = name.replace("_", " ")
    cleaned = re.sub(r"[^a-zA-Z0-9\s]", "", cleaned)
    cleaned = cleaned.lower()
    cleaned = re.sub(r"\s+", " ", cleaned).strip()
    return cleaned


def test_clean_key_matches_reference_semantics(spark):
    names = [
        "Padang_Pariaman",
        "  Some-Station (A)!  ",
        "ALL_CAPS__DOUBLE",
        "déjà_vu",
        "x",
        "",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = [r[0] for r in df.select(clean_key("name")).collect()]
    assert got == [clean_station_name_py(n) for n in names]


def test_interval_start_parses_cams_observation_period(spark):
    df = spark.createDataFrame(
        [("2024-01-01T00:00:00.0/2024-01-01T00:01:00.0",), ("garbage",), (None,)],
        ["p"],
    )
    got = df.select(interval_start("p").alias("t")).collect()
    assert str(got[0]["t"]) == "2024-01-01 00:00:00"
    assert got[1]["t"] is None  # coerce-to-null, pandas errors='coerce' parity
    assert got[2]["t"] is None


def test_utc_offset_roundtrip_and_local_time(spark):
    df = spark.createDataFrame([("UTC+7", "2024-06-01 00:30:00")], ["tz", "t"])
    df = df.withColumn("t", F.to_timestamp("t"))
    row = df.select(
        parse_utc_offset("tz").alias("off"),
        local_time("t", parse_utc_offset("tz")).alias("lt"),
    ).first()
    assert row["off"] == 7
    assert str(row["lt"]) == "2024-06-01 07:30:00"


def test_unit_conversion_and_ratio(spark):
    df = spark.createDataFrame([(1.5, 0.0), (2.0, 4.0)], ["e", "d"])
    rows = df.select(
        wh_per_min_to_w("e").alias("w"),
        null_safe_ratio("e", "d").alias("r"),
    ).collect()
    assert rows[0]["w"] == 90.0
    assert rows[0]["r"] is None  # 0 denominator → null (np.nan parity)
    assert rows[1]["r"] == 0.5


def test_sanitize_filename(spark):
    df = spark.createDataFrame([("Pad ang/Par:iaman",)], ["n"])
    assert df.select(sanitize_filename("n")).first()[0] == "Pad_ang_Par_iaman"
