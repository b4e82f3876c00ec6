"""Declared query inventory (the correctness surface the driver hash-checks)."""

from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
