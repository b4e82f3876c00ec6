"""Registry contract tests: every declared query runs at sf0.001 with a
stable schema, and the entry-point wiring matches the driver contract."""

import pytest

import __spark_entry__ as entry
from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES


def test_oracle_keys_subset_of_queries():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(QUERIES)


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_schema_stable(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    cols = df.columns
    assert len(cols) == len(set(cols)), "duplicate column names"
    df.limit(5).collect()  # executes the plan
