"""NetCDF/CF export (K2/R1/R2 — reference: code/compile-solrad.py:134-189).

Spark has no NetCDF sink; the reference's compiled table is small
(≤ ~3.7 M rows/yr — SURVEY.md §6), so the export collects the long-form
table to the driver via Arrow, pivots to the dense (station × time) grid,
attaches the CF metadata, and writes NETCDF4 — exactly the reference's
output contract (seconds-since-epoch time encoding, proleptic_gregorian,
cf_role=timeseries_id on station, per-variable units/standard_name).

This is a documented SCALE CLIFF: the canonical sink at 100 TB is the
partitioned parquet written by pipelines/compile.py (or Zarr, chunked by
(station, time)); the NetCDF file is an export artifact for downstream
scientific tooling, produced from an already-reduced table.

xarray/netCDF4 are not part of this environment's baked dependencies, so
the writer degrades: with xarray available it writes NetCDF; without it,
``to_dense_pandas`` still provides the pivoted grid + attrs (the full
computation), and ``write_netcdf`` raises ``NotImplementedError`` only at
the final serialization step.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

CF_GLOBAL_ATTRS = {
    "title": "Compiled CAMS solar radiation time series",
    "featureType": "timeSeries",
    "Conventions": "CF-1.8",
}
CF_VAR_ATTRS = {
    "GHI": {"units": "Wh m-2", "long_name": "Global Horizontal Irradiation"},
    "DHI": {"units": "Wh m-2", "long_name": "Diffuse Horizontal Irradiation"},
    "DNI": {"units": "Wh m-2", "long_name": "Direct Normal Irradiation"},
    "latitude": {"units": "degrees_north", "standard_name": "latitude"},
    "longitude": {"units": "degrees_east", "standard_name": "longitude"},
    "elevation": {"units": "m", "standard_name": "height_above_mean_sea_level"},
    "station": {"cf_role": "timeseries_id"},
}
TIME_ENCODING = {
    "units": "seconds since 1970-01-01 00:00:00",
    "calendar": "proleptic_gregorian",
}


def attach_cf_metadata(compiled: DataFrame) -> DataFrame:
    """R2 — carry the CF attributes on the schema itself
    (``StructField.metadata``), the Spark-native home for column-level
    metadata (SURVEY.md §1.1): parquet round-trips it, and the NetCDF
    writer reads it back instead of a side table."""
    out = compiled
    for name, attrs in CF_VAR_ATTRS.items():
        if name in out.columns:
            out = out.withMetadata(name, attrs)
    return out


def to_dense_pandas(compiled: DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Collect the long-form compiled table (Arrow path) and pivot to the
    dense (station × time) grid the NetCDF layout needs — missing
    (station, time) combos become NaN, matching the xarray pivot (R1).

    Returns (wide per-variable frame with MultiIndex columns, station
    coordinate table)."""
    pdf = compiled.toPandas()
    coords = (
        pdf[["station", "latitude", "longitude", "elevation"]]
        .drop_duplicates("station")
        .set_index("station")
        .sort_index()
    )
    wide = pdf.pivot_table(
        index="time_utc", columns="station", values=["GHI", "DHI", "DNI"],
        aggfunc="first", dropna=False,
    ).sort_index()
    return wide, coords


def write_netcdf(compiled: DataFrame, path: str) -> dict[str, Any]:
    """Export the compiled table as a CF NetCDF4 file; returns a summary
    dict (stations, times, variables) for logging/tests."""
    wide, coords = to_dense_pandas(compiled)
    summary = {
        "n_stations": len(coords),
        "n_times": len(wide),
        "variables": sorted({c[0] for c in wide.columns}),
    }
    try:
        import xarray as xr
    except ImportError as exc:
        raise NotImplementedError(
            "NetCDF serialization requires xarray/netCDF4 (not in this "
            "environment); the dense grid + CF attrs are available via "
            "to_dense_pandas()"
        ) from exc

    stations = coords.index.to_list()
    data_vars = {
        var: (
            ("time", "station"),
            wide[var].reindex(columns=stations).to_numpy(),
        )
        for var in summary["variables"]
    }
    ds = xr.Dataset(
        data_vars,
        coords={
            "time": wide.index.to_numpy(),
            "station": stations,
            "latitude": ("station", coords["latitude"].to_numpy()),
            "longitude": ("station", coords["longitude"].to_numpy()),
            "elevation": ("station", coords["elevation"].to_numpy()),
        },
        attrs=CF_GLOBAL_ATTRS,
    )
    for name, attrs in CF_VAR_ATTRS.items():
        if name in ds:
            ds[name].attrs.update(attrs)
    ds.to_netcdf(path, format="NETCDF4", encoding={"time": TIME_ENCODING})
    return summary
