"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the reference's core operator — the
10-minute tumbling-window mean, SURVEY.md §2.5 A1) at sf0.001;
``queries`` / ``oracle_sql`` expose the full declared inventory from
``wetsa_cams_solrad_timeseries_spark.plans.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Driver-side import robustness: the harness may import this file from any
# cwd; the package lives next to it.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def _configure(spark: SparkSession) -> SparkSession:
    """Pin the semantics the engine depends on (UTC, ANSI off) on the
    driver-provided session, and ship the package zip to executor Python
    workers (addPyFile) so worker-side kernels import regardless of the
    harness's cwd; see wetsa_cams_solrad_timeseries_spark.session."""
    from wetsa_cams_solrad_timeseries_spark.session import (
        SEMANTIC_CONF,
        ship_package,
    )

    for k, v in SEMANTIC_CONF.items():
        spark.conf.set(k, v)
    ship_package(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES

    _configure(spark)
    return QUERIES["q02_tumbling_mean"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES

    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return QUERIES[name].fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: wrap(name) for name in QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops).

    Specs with a data-derived oracle (oracle_fn — q56's trained centroid
    literals) resolve LAZILY here for the driver's gate SF, so importing
    the plans package never pays the oracle-training cost."""
    from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES

    out: dict[str, str] = {}
    for name, spec in QUERIES.items():
        sql = spec.oracle
        if sql is None and spec.oracle_fn is not None:
            sql = spec.oracle_for("/root/testdata/sf0.01")
        if sql is not None:
            out[name] = sql
    return out
