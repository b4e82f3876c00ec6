"""Distributed global rank/ntile (operators/rank.py): exactness vs the
single-partition window reference, partitioning invariance, and the
SQL-standard NTILE split rule."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.operators.rank import (
    global_ntile,
    global_rank,
)


def _reference_rank(df, cols):
    w = Window.orderBy(*cols)
    return df.withColumn("rank", F.row_number().over(w).cast("long"))


def test_global_rank_matches_window(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got = {
        r["doc_id"]: r["rank"]
        for r in global_rank(docs, ["n_chars", "doc_id"]).collect()
    }
    want = {
        r["doc_id"]: r["rank"]
        for r in _reference_rank(docs, ["n_chars", "doc_id"]).collect()
    }
    assert got == want


def test_global_rank_partitioning_invariant(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    a = {
        r["doc_id"]: r["rank"]
        for r in global_rank(
            docs, ["n_chars", "doc_id"], num_partitions=3
        ).collect()
    }
    b = {
        r["doc_id"]: r["rank"]
        for r in global_rank(
            docs, ["n_chars", "doc_id"], num_partitions=17
        ).collect()
    }
    assert a == b


def test_global_ntile_matches_window(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "value")
    got = {
        r["event_id"]: r["tile"]
        for r in global_ntile(ev, ["value", "event_id"], 7).collect()
    }
    w = Window.orderBy("value", "event_id")
    want = {
        r["event_id"]: r["tile"]
        for r in ev.withColumn("tile", F.ntile(7).over(w)).collect()
    }
    assert got == want


def test_global_ntile_fewer_rows_than_tiles(spark, sf_dir):
    """n < k: the SQL rule puts one row in each of the first n tiles."""
    na = table(spark, sf_dir, "nation").select("n_nationkey").limit(4)
    tiles = sorted(
        r["tile"]
        for r in global_ntile(na, ["n_nationkey"], 10).collect()
    )
    assert tiles == [1, 2, 3, 4]


def test_global_prefix_sum_matches_window(spark, sf_dir):
    from wetsa_cams_solrad_timeseries_spark.operators.rank import (
        global_prefix_sum,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got = {
        r["doc_id"]: r["cum"]
        for r in global_prefix_sum(
            docs, ["doc_id"], "n_chars", num_partitions=5
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["doc_id"]: r["cum"]
        for r in docs.withColumn("cum", F.sum("n_chars").over(w)).collect()
    }
    assert got == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    nparts=st.integers(2, 8),
)
@_SET
def test_global_rank_property_matches_sorted_position(spark, vals, nparts):
    """For ANY value multiset (ties included — id breaks them) and ANY
    partition count, global_rank equals the row's position in the fully
    sorted order."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, ["v", "id"], num_partitions=nparts).collect()
    }
    order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    want = {i: pos + 1 for pos, i in enumerate(order)}
    assert got == want


@given(
    vals=st.lists(st.integers(0, 100), min_size=1, max_size=60),
    nparts=st.integers(2, 8),
)
@_SET
def test_global_prefix_sum_property(spark, vals, nparts):
    from wetsa_cams_solrad_timeseries_spark.operators.rank import (
        global_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, w long"
    )
    got = {
        r["id"]: r["cum"]
        for r in global_prefix_sum(
            df, ["id"], "w", num_partitions=nparts
        ).collect()
    }
    run = 0
    for i, v in enumerate(vals):
        run += v
        assert got[i] == run


def test_global_rank_no_single_partition_data_window(spark, sf_dir):
    """The physical plan must not sort the DATA in one task: every Window
    over the full input runs after a range repartition (the only
    single-partition window is the per-partition offsets frame, bounded
    by partition count)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    plan = (
        global_rank(docs, ["n_chars", "doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
