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
    """Export the compiled table as a CF NetCDF file; returns a summary
    dict (stations, times, variables) for logging/tests.

    With xarray present the file is NETCDF4; without it (this
    environment) the pure-Python classic writer (sinks/netcdf3.py) emits
    a CDF-1 file with the same CF layout — so the final serialization hop
    always executes."""
    wide, coords = to_dense_pandas(compiled)
    summary = {
        "n_stations": len(coords),
        "n_times": len(wide),
        "variables": sorted({c[0] for c in wide.columns}),
    }
    try:
        import xarray as xr
    except ImportError:
        _write_netcdf3_classic(wide, coords, summary["variables"], path)
        summary["format"] = "NETCDF3_CLASSIC"
        return summary

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
    summary["format"] = "NETCDF4"
    return summary


def _write_netcdf3_classic(
    wide: pd.DataFrame, coords: pd.DataFrame, variables: list[str], path: str
) -> None:
    """CF layout via the pure-Python classic writer: time(time) double
    seconds-since-epoch, station(station, strlen) char, coordinate vars
    on (station,), data vars on (time, station) with NaN fill."""
    import math

    from wetsa_cams_solrad_timeseries_spark.sinks.netcdf3 import (
        NC_CHAR,
        NC_DOUBLE,
        write_netcdf3,
    )

    stations = coords.index.to_list()
    times = wide.index.to_list()
    # strlen counts ENCODED BYTES, not characters: the char variable's
    # payload is utf-8 bytes, so a non-ASCII station name is longer in
    # bytes than in characters and a char-based strlen under-sizes the
    # dimension (ljust then cannot pad and the payload-size check fails).
    enc = [str(s).encode("utf-8") for s in stations]
    strlen = max((len(e) for e in enc), default=1)
    dims = {"time": len(times), "station": len(stations), "name_strlen": strlen}

    def epoch_seconds(t) -> float:
        return pd.Timestamp(t).value / 1e9

    station_bytes = b"".join(e.ljust(strlen, b"\x00") for e in enc)
    nc_vars: list[dict[str, Any]] = [
        {
            "name": "time",
            "dims": ("time",),
            "nc_type": NC_DOUBLE,
            "values": [epoch_seconds(t) for t in times],
            "attrs": dict(TIME_ENCODING),
        },
        {
            "name": "station",
            "dims": ("station", "name_strlen"),
            "nc_type": NC_CHAR,
            "values": station_bytes,
            "attrs": CF_VAR_ATTRS["station"],
        },
    ]
    for cvar in ("latitude", "longitude", "elevation"):
        nc_vars.append(
            {
                "name": cvar,
                "dims": ("station",),
                "nc_type": NC_DOUBLE,
                "values": [float(v) for v in coords[cvar].to_list()],
                "attrs": CF_VAR_ATTRS.get(cvar, {}),
            }
        )
    for var in variables:
        grid = wide[var].reindex(columns=stations)
        flat = [
            float(v) if v is not None and not pd.isna(v) else math.nan
            for row in grid.to_numpy()
            for v in row
        ]
        nc_vars.append(
            {
                "name": var,
                "dims": ("time", "station"),
                "nc_type": NC_DOUBLE,
                "values": flat,
                "attrs": {**CF_VAR_ATTRS.get(var, {}), "_FillValue": math.nan},
            }
        )
    write_netcdf3(path, dims, nc_vars, global_attrs=CF_GLOBAL_ATTRS)
