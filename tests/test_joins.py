"""Join operator semantics: as-of join vs pandas merge_asof, QC filter,
key-normalized join, anti/semi helpers."""

import pandas as pd
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.operators.filters import (
    exclude_keys,
    qc_flag_filter,
    require_columns,
)
from wetsa_cams_solrad_timeseries_spark.operators.joins import (
    asof_join,
    key_normalized_join,
)


def test_asof_join_matches_pandas_merge_asof(spark):
    left = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 3,
            "ts": pd.to_datetime(
                ["2024-01-01 00:05", "2024-01-01 00:10", "2024-01-01 00:20",
                 "2024-01-01 00:00",  # before any right row → null
                 "2024-01-01 00:07", "2024-01-01 00:09", "2024-01-01 00:30"]
            ),
            "lv": [1, 2, 3, 4, 5, 6, 7],
        }
    )
    right = pd.DataFrame(
        {
            "g": ["a", "a", "b", "b"],
            "rts": pd.to_datetime(
                ["2024-01-01 00:05", "2024-01-01 00:15",
                 "2024-01-01 00:08", "2024-01-01 00:25"]
            ),
            "rv": [10, 20, 30, 40],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_ts="ts", right_ts="rts", by=["g"], right_cols=["rv", "rts"],
        )
        .orderBy("g", "ts")
        .toPandas()
    )
    exp = pd.merge_asof(
        left.sort_values("ts"), right.rename(columns={"rts": "ts"}).sort_values("ts"),
        on="ts", by="g",
    ).sort_values(["g", "ts"]).reset_index(drop=True)
    assert list(got["rv"].fillna(-1)) == list(exp["rv"].fillna(-1))


def test_asof_join_rejects_column_collision(spark):
    left = spark.createDataFrame([("a", pd.Timestamp("2024-01-01"), 1)], ["g", "ts", "price"])
    right = spark.createDataFrame([("a", pd.Timestamp("2024-01-01"), 2)], ["g", "rts", "price"])
    try:
        asof_join(left, right, left_ts="ts", right_ts="rts", by=["g"], right_cols=["price"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "collide" in str(e)


def test_exclude_keys_keeps_null_keys(spark):
    df = spark.createDataFrame([("Sleman",), ("Bogor",), (None,)], ["station"])
    kept = [r["station"] for r in exclude_keys(df, "station", ["Sleman"]).collect()]
    assert sorted(kept, key=str) == ["Bogor", None]


def test_qc_flag_filter_handles_missing_columns_and_nulls(spark):
    pdf = pd.DataFrame(
        {
            "v": [1.0, 2.0, 3.0, 4.0],
            "flag_a": [0, 1, 0, 0],
            "flag_b": [0.0, 0.0, None, 1.0],  # null counts as 0 (NaN-skipping sum)
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = qc_flag_filter(sdf, ["flag_a", "flag_b", "flag_missing"])
    assert sorted(r["v"] for r in got.collect()) == [1.0, 3.0]
    # With no flag columns present the filter is the identity.
    assert qc_flag_filter(sdf.select("v"), ["flag_a"]).count() == 4


def test_key_normalized_join_and_exclusion(spark):
    fact = spark.createDataFrame(
        [("Padang_Pariaman", 1.0), ("SLEMAN!", 2.0), ("unknown", 3.0)], ["st", "v"]
    )
    dim = spark.createDataFrame(
        [("padang pariaman", -0.5), ("sleman", -7.8)], ["name", "lat"]
    )
    joined = key_normalized_join(fact, dim, fact_key="st", dim_key="name")
    # inner join drops the non-member (P7 semantics)
    assert joined.count() == 2
    kept = exclude_keys(joined, "join_key", ["sleman"])  # P6 semantics
    assert [r["join_key"] for r in kept.collect()] == ["padang pariaman"]


def test_require_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    require_columns(df, ["a", "b"])
    try:
        require_columns(df, ["a", "zz"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "zz" in str(e)
