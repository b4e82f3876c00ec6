"""Bucketed managed tables: shuffle-free co-located joins.

At 100 TB, repeated fact-fact joins on the same key (lineitem⋈orders on
orderkey every day) should not pay the shuffle every run. Writing both
sides bucketed on the join key pre-partitions AND pre-sorts the data on
disk, so subsequent sort-merge joins read co-located buckets with NO
exchange on either side — the bucketing replaces the shuffle once, at
write time.

Local-mode caveat: bucketed tables need the session catalog (managed
tables under ``spark.sql.warehouse.dir``), pinned outside the repo tree
in session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key. With matching
    bucket counts Catalyst plans a SortMergeJoin with zero Exchange
    operators — verify with ``.explain()`` (tests/test_bucketing.py
    asserts it)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
