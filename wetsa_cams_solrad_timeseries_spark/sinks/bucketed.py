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


def compact_bucketed_table(
    spark: SparkSession,
    table_name: str,
    n_buckets: int,
    bucket_col: str,
    sort_col: str | None = None,
    tombstones: DataFrame | None = None,
    tombstone_col: str | None = None,
) -> None:
    """Small-file compaction for an appended-into bucketed index — the
    maintenance step the cross-run index tables (q193 band rows, q197
    codes, q201 stats, q210 signatures) need after many incremental
    appends: every ``insertInto`` lays down its own file per bucket, so
    N daily appends = N files per bucket, and at 100 TB the scan's task
    count (and the NameNode/listing pressure) grows with append count
    instead of data size.

    Rewrites the table at one file per bucket WITHOUT changing the
    layout contract: ``repartition(n_buckets, bucket_col)`` aligns write
    tasks to buckets (Spark's bucket id — pmod(murmur3(col), n) — IS
    hashpartitioning's routing, so each task holds exactly its bucket),
    then the same bucketBy/sortBy spec writes one sorted file per
    bucket into a temp table that replaces the original via DROP +
    RENAME. Probe plans are byte-for-byte the same shape afterwards —
    still zero history-side Exchange (pytest-locked in
    tests/test_bucketing.py::test_compaction_restores_one_file_per_bucket).

    Crash tolerance: the DROP + RENAME pair is NOT atomic — a crash
    between the two statements leaves the data only under
    ``<name>__compacting``. Entry therefore RECOVERS before compacting:
    a stranded ``__compacting`` table with the original gone is a fully
    written compacted generation (saveAsTable completed before the DROP
    could run), so the rename is finished and the function returns; a
    stranded ``__compacting`` beside a LIVE original is a half-finished
    prior attempt (crash before or during its saveAsTable → before its
    DROP) and is discarded before recompacting from the live table.
    Either way the table is never lost for longer than one call
    (pytest-locked in test_compaction_crash_recovery).

    Deletes ride the same rewrite: pass ``tombstones`` (a frame whose
    ``tombstone_col`` lists deleted ids) and the compaction LEFT-ANTI
    joins them out while it rewrites — membership removal and small-file
    compaction are ONE pass over the index, which is how a 100 TB
    bucketed index honors takedown/right-to-be-forgotten without a
    second full rewrite. Until a compaction runs, deletes are served by
    probe-time anti-joins against the (parameter-sized, broadcast)
    tombstone set; after it, the anti-join is a no-op — so applying
    tombstones twice is idempotent and every crash window between
    "compacted" and "tombstones truncated" stays correct.

    Planner trap this codes around: reading via ``spark.table`` reports
    the scan's output partitioning as the table's own
    HashPartitioning(bucket, n), so EnsureRequirements ELIDES the
    explicit repartition — and then DisableUnnecessaryBucketedScan
    demotes the scan to plain per-file tasks, so the write lands one
    file per (input file x bucket), i.e. compaction that compacts
    nothing (observed: 9 files from a 4-bucket table). Reading the
    table's LOCATION as bare parquet carries no bucket metadata, so the
    repartition survives and each write task owns exactly one bucket.
    """
    from pyspark.sql import functions as F

    tmp = f"{table_name}__compacting"
    if spark.catalog.tableExists(tmp):
        if not spark.catalog.tableExists(table_name):
            # Prior run crashed between DROP and RENAME: the tmp table is
            # the complete compacted generation — finish its rename.
            spark.sql(f"ALTER TABLE {tmp} RENAME TO {table_name}")
            return
        # Prior run crashed before its DROP: the original is still live
        # and authoritative; discard the stale half-attempt.
        spark.sql(f"DROP TABLE {tmp}")
    location = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    src = spark.read.parquet(location)
    if tombstones is not None:
        key = tombstone_col or bucket_col
        src = src.join(
            F.broadcast(tombstones.select(key).distinct()),
            on=key,
            how="left_anti",
        )
    (
        src.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
        .saveAsTable(tmp)
    )
    spark.sql(f"DROP TABLE {table_name}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table_name}")
