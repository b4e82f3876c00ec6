"""Compare pipeline (EP3 — reference: code/solrad-compare.py).

Reference flow per location (29 sequential driver iterations): load ground
QC CSV → UTC localize → QC flag filter → load CAMS 10-min CSV → ×60 unit
conversion → rename → inner join on timestamp → bias/ratio columns →
3 scipy regressions → 8-panel PNG.

Spark-first restructuring (SURVEY.md §3 EP3, O3): ALL locations in one
job. Both sides carry a ``station`` column, the join adds it to the key,
and the regression layer is one grouped aggregation over
(station, component) — two shuffles total for every station at once,
versus 29 × (join + 3 regressions) sequential. The plotting layer stays a
driver-side presentation step over the tiny stats table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.scalar import (
    null_safe_ratio,
    to_utc_timestamp_lenient,
    wh_per_min_to_w,
)
from wetsa_cams_solrad_timeseries_spark.operators.filters import qc_flag_filter
from wetsa_cams_solrad_timeseries_spark.operators.regression import (
    regression_agg,
    with_stderr_pvalue,
)

GROUND_FLAG_COLS = [
    "flag_ghi", "flag_dhi", "flag_dni", "flag_ghi_rare",
    "flag_dhi_rare", "flag_dni_rare", "flag_comp1", "flag_comp2",
]
COMPONENTS = ("GHI", "DHI", "DNI")


def prepare_ground(df: DataFrame, ts_col: str = "Datetime (UTC)") -> DataFrame:
    """Ground side: UTC timestamp (F2/F3), QC gate over the flag columns
    that exist (P4 — solrad-compare.py:35-42), rename to *_ground (P2)."""
    out = df.withColumn("timestamp", to_utc_timestamp_lenient(F.col(ts_col)))
    out = qc_flag_filter(out, GROUND_FLAG_COLS)
    keep = ["timestamp"] + (["station"] if "station" in df.columns else [])
    return out.select(
        *keep,
        *[F.col(c).alias(f"{c}_ground") for c in COMPONENTS if c in df.columns],
    ).na.drop(subset=["timestamp"])


def prepare_cams(df: DataFrame, ts_col: str = "time") -> DataFrame:
    """CAMS side: UTC timestamp, Wh/m²-per-minute → W/m² (F8 ×60 —
    solrad-compare.py:61-66), BNI→DNI rename, *_cams suffix."""
    src = {"GHI": "GHI", "DHI": "DHI", "DNI": "BNI" if "BNI" in df.columns else "DNI"}
    out = df.withColumn("timestamp", to_utc_timestamp_lenient(F.col(ts_col)))
    keep = ["timestamp"] + (["station"] if "station" in df.columns else [])
    cols = [
        wh_per_min_to_w(F.col(src[c])).alias(f"{c}_cams")
        for c in COMPONENTS
        if src[c] in df.columns
    ]
    if "Cloud coverage" in df.columns:
        cols.append(F.col("Cloud coverage").alias("cloud_cover"))
    return out.select(*keep, *cols).na.drop(subset=["timestamp"])


def compare_join(ground: DataFrame, cams: DataFrame) -> DataFrame:
    """J1 inner join on timestamp (+station when present), full-row
    null-drop (P5 — solrad-compare.py:81), bias (F9), abs-bias (F11) and
    null-safe GHI/DHI ratio (F10) derivations."""
    g_has, c_has = "station" in ground.columns, "station" in cams.columns
    if g_has != c_has:
        # A timestamp-only fallback here would cross-match every station
        # against every other at equal timestamps — silently wrong stats.
        # One-sided station columns mean the caller mixed a multi-station
        # table with a per-station one; make them say which station.
        raise ValueError(
            "compare_join: 'station' present on only one side — join "
            "would multiply rows across stations; add the column to the "
            "other side or drop it from both"
        )
    keys = ["timestamp"] + (["station"] if g_has else [])
    merged = ground.join(cams, on=keys, how="inner").na.drop()
    for c in COMPONENTS:
        if f"{c}_cams" in merged.columns and f"{c}_ground" in merged.columns:
            merged = merged.withColumn(
                f"{c}_bias", F.col(f"{c}_cams") - F.col(f"{c}_ground")
            ).withColumn(f"{c}_abs_bias", F.abs(F.col(f"{c}_bias")))
    if "GHI_ground" in merged.columns and "DHI_ground" in merged.columns:
        merged = merged.withColumn(
            "GHI_DHI_ratio",
            null_safe_ratio(F.col("GHI_ground"), F.col("DHI_ground")),
        )
    return merged


def regression_stats(merged: DataFrame) -> list[dict]:
    """B1/B2 — per (station, component) OLS of cams on ground in ONE
    distributed pass (union of the three component frames → single
    grouped regr_* aggregation), then driver-side closed-form
    stderr/p-value (scipy parity; operators/regression.py)."""
    has_station = "station" in merged.columns
    frames = []
    for c in COMPONENTS:
        # BOTH sides must carry the component: prepare_ground/prepare_cams
        # each skip columns their input lacks, so a component can exist
        # cams-only (or ground-only) — selecting the missing twin would
        # throw AnalysisException instead of skipping like compare_join.
        if f"{c}_cams" not in merged.columns or f"{c}_ground" not in merged.columns:
            continue
        cols = [
            F.lit(c).alias("component"),
            F.col(f"{c}_ground").alias("x"),
            F.col(f"{c}_cams").alias("y"),
        ]
        if has_station:
            cols.insert(0, F.col("station"))
        frames.append(merged.select(*cols))
    if not frames:
        # reduce() over an empty list raises a bare TypeError that masks
        # the actual problem (no component survived on both sides).
        raise ValueError(
            "regression_stats: no component present on BOTH sides of the "
            f"merged frame (columns: {merged.columns})"
        )
    unioned = reduce(lambda a, b: a.unionByName(b), frames)
    group = (["station"] if has_station else []) + ["component"]
    rows = [
        r.asDict()
        for r in regression_agg(
            unioned, y="y", x="x", group_cols=group, extended=True
        ).collect()
    ]
    return with_stderr_pvalue(rows)


def run_compare(ground: DataFrame, cams: DataFrame) -> tuple[DataFrame, list[dict]]:
    """Full EP3: prepared sides → join/derive → regression stats."""
    merged = compare_join(prepare_ground(ground), prepare_cams(cams))
    return merged, regression_stats(merged)
