"""Bucketed-table co-located join: the write-once-shuffle-never pattern.

Asserts the physical plan property that matters at scale: a join of two
tables bucketed on the join key contains NO Exchange (shuffle) operator.
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.sinks.bucketed import (
    bucketed_join,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    # SCALING.md claim: partitionBy writes enable partition pruning — a
    # filter on the partition column appears as PartitionFilters and scans
    # only the matching directory.
    from wetsa_cams_solrad_timeseries_spark.pipelines.ingest import (
        write_parquet_partitioned,
    )

    ev = table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet_partitioned(ev, out, partition_cols=("event_type",))
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_incremental_dedup_history_side_no_shuffle(spark, sf_dir):
    # q193's scale property: probing a NEW shard's LSH band rows against
    # the persisted history index (bucketed on `bucket`) shuffles ONLY
    # the probe side — the history side's bucketed layout already
    # satisfies the join distribution, so the plan contains exactly one
    # Exchange and it sits above the probe scan, never the index scan.
    import re

    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        lsh_band_rows,
        minhash_signatures,
        word_shingles,
    )

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 7

    def band_rows(part):
        sh = word_shingles(part, "doc_id", "text", n=2)
        return lsh_band_rows(
            minhash_signatures(sh, "doc_id", n_perm=16),
            "doc_id", n_perm=16, bands=4,
        )

    write_bucketed(
        band_rows(docs.filter(~is_new)), "t_lsh_hist_b", "bucket",
        n_buckets=8, sort_col="bucket",
    )
    # localCheckpoint cuts the probe pipeline's own lineage so the
    # inspected plan is just the join — the property under test.
    probe = band_rows(docs.filter(is_new)).localCheckpoint(eager=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = probe.hint("merge").join(spark.table("t_lsh_hist_b"), on="bucket")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) == 1, plan  # probe side only
        # and the single Exchange is not above the index scan: the scan
        # line for the bucketed table must not have an Exchange between
        # it and the join (tree lines for its branch are Exchange-free).
        tree = plan.split("(1) ")[0]
        hist_branch = [
            l for l in tree.splitlines() if "t_lsh_hist_b" in l
        ]
        assert hist_branch and all("Exchange" not in l for l in hist_branch)
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_lsh_hist_b")


def test_incremental_index_append_stays_shuffle_free(spark, sf_dir):
    # q193's cross-RUN claim: today's band rows APPEND into the same
    # bucketed index table (insertInto routes rows through the table's
    # bucketing spec), so tomorrow's probe sees history + today with the
    # same single-Exchange plan — no reorganization between runs.
    import re

    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        lsh_band_rows,
        minhash_signatures,
        word_shingles,
    )

    docs = table(spark, sf_dir, "documents")

    def band_rows(pred):
        sh = word_shingles(docs.filter(pred), "doc_id", "text", n=2)
        return lsh_band_rows(
            minhash_signatures(sh, "doc_id", n_perm=16),
            "doc_id", n_perm=16, bands=4,
        )

    day1 = F.col("doc_id") % 10 < 5
    day2 = (F.col("doc_id") % 10 >= 5) & (F.col("doc_id") % 10 != 7)
    probe_pred = F.col("doc_id") % 10 == 7
    write_bucketed(
        band_rows(day1), "t_lsh_inc_b", "bucket", n_buckets=8,
        sort_col="bucket",
    )
    band_rows(day2).select("doc_id", "band", "bucket").write.insertInto(
        "t_lsh_inc_b"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = spark.table("t_lsh_inc_b")
        # appended rows are visible...
        both = band_rows(day1 | day2)
        assert idx.count() == both.count()
        # ...and the probe plan is still single-Exchange (probe side).
        probe = band_rows(probe_pred).localCheckpoint(eager=True)
        plan = _plan(probe.hint("merge").join(idx, on="bucket"))
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        # candidate parity: probing the appended index equals probing a
        # from-scratch index over the union.
        inc = (
            probe.select(F.col("doc_id").alias("new_id"), "bucket")
            .join(idx.select(F.col("doc_id").alias("hist_id"), "bucket"),
                  on="bucket")
            .select("new_id", "hist_id").distinct()
        )
        full = (
            probe.select(F.col("doc_id").alias("new_id"), "bucket")
            .join(both.select(F.col("doc_id").alias("hist_id"), "bucket"),
                  on="bucket")
            .select("new_id", "hist_id").distinct()
        )
        assert sorted(map(tuple, inc.collect())) == sorted(
            map(tuple, full.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_lsh_inc_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "t_lineitem_b", "l_orderkey", n_buckets=8)
    write_bucketed(o, "t_orders_b", "l_orderkey", n_buckets=8)

    joined = bucketed_join(spark, "t_lineitem_b", "t_orders_b", on="l_orderkey")
    # Disable broadcast so the join strategy decision is about bucketing.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # and the result is still correct
        n = joined.count()
        exp = li.join(o, on="l_orderkey").count()
        assert n == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_incremental_postings_history_side_no_shuffle(spark, sf_dir):
    # q201's scale property: merging the NEW shard's postings stats into
    # the persisted history table (bucketed on `token`) shuffles ONLY
    # the delta side — the history side's bucketed layout already
    # satisfies the full-outer join distribution.
    import re

    from wetsa_cams_solrad_timeseries_spark.operators.text import (
        postings_stats,
    )

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 7

    def stats(part):
        return postings_stats(part, "doc_id", "text")

    write_bucketed(
        stats(docs.filter(~is_new)), "t_post_hist_b", "token",
        n_buckets=8, sort_col="token",
    )
    # localCheckpoint cuts the delta pipeline's own lineage so the
    # inspected plan is just the merge join — the property under test.
    delta = stats(docs.filter(is_new)).localCheckpoint(eager=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = delta.hint("merge").join(
            spark.table("t_post_hist_b"), on="token", how="full"
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) == 1, plan  # delta side only
        tree = plan.split("(1) ")[0]
        hist_branch = [
            l for l in tree.splitlines() if "t_post_hist_b" in l
        ]
        assert hist_branch and all("Exchange" not in l for l in hist_branch)
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_post_hist_b")


def test_hybrid_serve_reads_only_the_index(spark, sf_dir):
    # q207's scale property: the steady-state serving plan's lexical
    # side is a bucket-PRUNED scan of the persisted postings table — the
    # `term IN (...)` probe touches <=|terms| of the 16 buckets
    # (SelectedBucketsCount in the scan) — and the raw documents table
    # is never scanned at serve time (no per-query re-tokenization).
    import re

    from wetsa_cams_solrad_timeseries_spark.plans.vector import (
        q207_hybrid_from_index,
    )

    q207_hybrid_from_index(spark, sf_dir).count()  # build generation
    serve = q207_hybrid_from_index(spark, sf_dir)  # steady state
    plan = _plan(serve)
    assert "documents" not in plan, "serve plan re-tokenizes the corpus"
    picked = [
        int(m.group(1))
        for m in re.finditer(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    ]
    assert picked, "postings scan lost its bucket pruning:\n" + plan
    assert all(n <= 3 for n in picked), plan  # 3 query terms -> <=3 buckets
    assert serve.count() > 0


def test_incremental_phash_history_side_no_shuffle(spark, sf_dir):
    # q210's scale property: probing the NEW shard's dHash band rows
    # against the persisted history index (bucketed on `bkey`) shuffles
    # ONLY the probe side, and because the full signature is
    # denormalized onto every index row, the verify needs NO further
    # history access at all — the single Exchange hangs off the probe.
    import re

    from wetsa_cams_solrad_timeseries_spark.operators.multimodal import (
        attach_payload,
        dhash_bands,
    )
    from wetsa_cams_solrad_timeseries_spark.plans.vector import (
        _dhash_index_rows,
    )

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 7

    def rows(part):
        return _dhash_index_rows(dhash_bands(attach_payload(part, "doc_id", "text")))

    write_bucketed(
        rows(docs.filter(~is_new)), "t_phash_hist_b", "bkey",
        n_buckets=8, sort_col="bkey",
    )
    probe = rows(docs.filter(is_new)).localCheckpoint(eager=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = probe.hint("merge").join(
            spark.table("t_phash_hist_b").withColumnRenamed("doc_id", "hist_id")
            .withColumnRenamed("band0", "b0h").withColumnRenamed("band1", "b1h")
            .withColumnRenamed("band2", "b2h").withColumnRenamed("band3", "b3h"),
            on="bkey",
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) == 1, plan  # probe side only
        tree = plan.split("(1) ")[0]
        hist_branch = [l for l in tree.splitlines() if "t_phash_hist_b" in l]
        assert hist_branch and all("Exchange" not in l for l in hist_branch)
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_phash_hist_b")


def test_compaction_restores_one_file_per_bucket(spark, sf_dir):
    # Index-maintenance lifecycle: N incremental appends leave N files
    # per bucket; compaction rewrites to ONE sorted file per bucket and
    # the probe join plan keeps its zero-history-shuffle shape, with
    # identical contents.
    import os
    import re

    from wetsa_cams_solrad_timeseries_spark.sinks.bucketed import (
        compact_bucketed_table,
    )

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    t = "t_compact_b"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(ev.filter(F.col("user_id") % 3 == 0), t, "user_id",
                   n_buckets=4, sort_col="user_id")
    for day in (1, 2):
        ev.filter(F.col("user_id") % 3 == day).write.insertInto(t)

    def data_files():
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {t}")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        ).removeprefix("file:")
        return [
            f for f in os.listdir(loc)
            if not f.startswith(("_", "."))
        ]

    before_rows = sorted(tuple(r) for r in spark.table(t).collect())
    assert len(data_files()) > 4  # appends piled up multiple files/bucket

    compact_bucketed_table(spark, t, n_buckets=4, bucket_col="user_id",
                           sort_col="user_id")
    try:
        assert len(data_files()) <= 4  # one file per (non-empty) bucket
        after_rows = sorted(tuple(r) for r in spark.table(t).collect())
        assert after_rows == before_rows
        # the layout contract survives the rewrite: a probe join against
        # the compacted table still shuffles only the probe side
        probe = ev.limit(50).localCheckpoint(eager=True)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = probe.hint("merge").join(spark.table(t), on="user_id")
            plan = _plan(j)
            assert "SortMergeJoin" in plan
            import re as _re

            assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compaction_crash_recovery(spark, sf_dir):
    # The DROP+RENAME swap is not atomic; entry must recover BOTH
    # stranded states a crash can leave (sinks/bucketed.py docstring):
    #   (a) crash between DROP and RENAME — only <t>__compacting exists,
    #       holding the complete compacted generation → finish the rename;
    #   (b) crash before the DROP — original still live beside a stale
    #       half-attempt tmp → discard tmp, recompact from the original.
    from wetsa_cams_solrad_timeseries_spark.sinks.bucketed import (
        compact_bucketed_table,
    )

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    t = "t_crash_b"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql(f"DROP TABLE IF EXISTS {t}__compacting")
    write_bucketed(ev, t, "user_id", n_buckets=4, sort_col="user_id")
    rows = sorted(tuple(r) for r in spark.table(t).collect())
    try:
        # (a) simulate the post-DROP crash: the compacted generation sits
        # under the tmp name and the original is gone.
        spark.sql(f"ALTER TABLE {t} RENAME TO {t}__compacting")
        assert not spark.catalog.tableExists(t)
        compact_bucketed_table(spark, t, n_buckets=4, bucket_col="user_id",
                               sort_col="user_id")
        assert spark.catalog.tableExists(t)
        assert not spark.catalog.tableExists(f"{t}__compacting")
        assert sorted(tuple(r) for r in spark.table(t).collect()) == rows

        # (b) simulate the pre-DROP crash: a stale partial tmp beside the
        # live original must be discarded, not renamed over it.
        write_bucketed(
            ev.limit(3), f"{t}__compacting", "user_id",
            n_buckets=4, sort_col="user_id",
        )
        compact_bucketed_table(spark, t, n_buckets=4, bucket_col="user_id",
                               sort_col="user_id")
        assert not spark.catalog.tableExists(f"{t}__compacting")
        assert sorted(tuple(r) for r in spark.table(t).collect()) == rows
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}__compacting")


def test_postings_append_then_serve_equals_rebuild(spark, sf_dir):
    # q207's cross-RUN append path: a day's postings insertInto the same
    # bucketed layout (no reorganization), and serving from the appended
    # table returns exactly what a from-scratch rebuild serves — while
    # the probe keeps its bucket pruning.
    import re

    from wetsa_cams_solrad_timeseries_spark.functions.tokenize import (
        norm_words,
    )

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 7
    t = "t_postfull_append_b"
    spark.sql(f"DROP TABLE IF EXISTS {t}")

    def postings(part):
        words = part.select(F.col("doc_id"), norm_words("text").alias("ws"))
        dl = words.select("doc_id", F.size("ws").alias("dl"))
        return (
            words.select("doc_id", F.explode("ws").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
            .join(dl, on="doc_id")
        )

    write_bucketed(postings(docs.filter(~is_new)), t, "term",
                   n_buckets=16, sort_col="term")
    # append the day's shard through the table's own bucketing spec
    postings(docs.filter(is_new)).select(
        *[f.name for f in spark.table(t).schema.fields]
    ).write.insertInto(t)

    terms = ("vector", "stream", "merge")
    served = spark.table(t).filter(F.col("term").isin(*terms))
    rebuilt = postings(docs).filter(F.col("term").isin(*terms))
    got = sorted(tuple(r) for r in served.collect())
    exp = sorted(tuple(r) for r in rebuilt.collect())
    try:
        assert got == exp
        # Pruning must be asserted on the real serving shape (q207's
        # per-term df aggregate): a bare filter-only query hits
        # DisableUnnecessaryBucketedScan — no operator needs the bucket
        # distribution, the planner demotes the scan, and pruning goes
        # with it. The aggregate keyed on the bucket column retains both.
        plan = _plan(served.groupBy("term").count())
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) <= 3, plan  # pruning survives appends
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_multiday_append_compact_append_parity(spark, sf_dir):
    # The multi-day index maintenance SCHEDULE: day-1 build, day-2
    # append, nightly compaction, day-3 append, then serve — the served
    # result must equal a from-scratch rebuild over all three days, and
    # the post-schedule plan must keep both the bucketed layout (one
    # probe-side Exchange) and bucket pruning. This is the lifecycle a
    # production deployment actually runs (build is rare; append+compact
    # is steady state), exercised end-to-end rather than one transition
    # at a time.
    import re

    from wetsa_cams_solrad_timeseries_spark.sinks.bucketed import (
        compact_bucketed_table,
    )

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    t = "t_multiday_b"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    day = lambda d: ev.filter(F.col("user_id") % 3 == d)  # noqa: E731

    write_bucketed(day(0), t, "user_id", n_buckets=4, sort_col="user_id")
    day(1).write.insertInto(t)
    compact_bucketed_table(spark, t, n_buckets=4, bucket_col="user_id",
                           sort_col="user_id")
    day(2).write.insertInto(t)
    try:
        got = sorted(tuple(r) for r in spark.table(t).collect())
        exp = sorted(tuple(r) for r in ev.collect())
        assert got == exp
        # Layout contract after the full schedule: probe join shuffles
        # only the probe side.
        probe = ev.limit(50).localCheckpoint(eager=True)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = probe.hint("merge").join(spark.table(t), on="user_id")
            plan = _plan(j)
            assert "SortMergeJoin" in plan
            assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_phash_index_append_stays_shuffle_free(spark, sf_dir):
    # q210's cross-RUN claim (q193's append discipline on the pHash
    # index): today's band rows APPEND into the same bucketed layout
    # via insertInto, and tomorrow's probe over history+today keeps the
    # single probe-side Exchange.
    import re

    from wetsa_cams_solrad_timeseries_spark.operators.multimodal import (
        attach_payload,
        dhash_bands,
    )
    from wetsa_cams_solrad_timeseries_spark.plans.vector import (
        _dhash_index_rows,
    )

    docs = table(spark, sf_dir, "documents")

    def rows(pred):
        return _dhash_index_rows(
            dhash_bands(attach_payload(docs.filter(pred), "doc_id", "text"))
        )

    day1 = F.col("doc_id") % 10 < 5
    day2 = (F.col("doc_id") % 10 >= 5) & (F.col("doc_id") % 10 != 7)
    probe_pred = F.col("doc_id") % 10 == 7
    t = "t_phash_append_b"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(rows(day1), t, "bkey", n_buckets=8, sort_col="bkey")
    rows(day2).select(
        *[f.name for f in spark.table(t).schema.fields]
    ).write.insertInto(t)

    probe = rows(probe_pred).localCheckpoint(eager=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = probe.hint("merge").join(
            spark.table(t).withColumnRenamed("doc_id", "hist_id")
            .withColumnRenamed("band0", "b0h").withColumnRenamed("band1", "b1h")
            .withColumnRenamed("band2", "b2h").withColumnRenamed("band3", "b3h"),
            on="bkey",
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        # appended rows are probed: day-2 ids appear among the matches
        hist_ids = {r["hist_id"] for r in j.select("hist_id").distinct().collect()}
        assert any(i % 10 >= 5 for i in hist_ids)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivfsq_probe_partition_pruned(spark, sf_dir):
    # q227's layout claim: the history code table is directory-partitioned
    # BY CELL, and the steady-state probe's scan carries a PartitionFilter
    # on the probed cell set — the file-level inverted list (directory
    # partitioning prunes regardless of join strategy, unlike bucketing,
    # which DisableUnnecessaryBucketedScan demotes under a broadcast
    # probe side — the q207 lesson).
    import re

    from wetsa_cams_solrad_timeseries_spark.plans.vector import (
        q227_incremental_ivfsq_index,
    )

    df = q227_incremental_ivfsq_index(spark, sf_dir)
    assert df.count() > 0
    plan = _plan(q227_incremental_ivfsq_index(spark, sf_dir))
    # Catalyst renders small probe sets as IN (...) and larger ones as
    # INSET v, v, ... — accept both spellings of the same pruning.
    m = re.search(
        r"PartitionFilters: \[cell#\d+ (?:IN \(|INSET )([\d, ]+)", plan
    )
    assert m, plan
    # the probe touches a strict subset of the 16 cells
    cells = [x for x in m.group(1).split(",") if x.strip()]
    assert 0 < len(cells) < 16
