"""Writers: CSV/parquet sinks plus the NetCDF/CF export path."""
