"""Declared-schema validation over every corpus table (M0 smoke +
generalized P8)."""

import pytest

from wetsa_cams_solrad_timeseries_spark.catalog import TABLES, table
from wetsa_cams_solrad_timeseries_spark.schemas import validate_schema


@pytest.mark.parametrize("name", TABLES)
def test_every_corpus_table_matches_declared_schema(spark, sf_dir, name):
    df = table(spark, sf_dir, name, validate=True)
    assert df.limit(1).count() >= 0


def test_validation_rejects_drift(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="column mismatch"):
        validate_schema(li.drop("l_tax"), "lineitem")
    with pytest.raises(ValueError, match="type"):
        validate_schema(
            li.withColumn("l_quantity", li.l_quantity.cast("float")), "lineitem"
        )
