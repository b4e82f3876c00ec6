"""Structural locks for the round-5 advanced surface (plans/advanced.py):
band-join plan shape + equivalence, non-associative fold invariance, the
SCD2 change-point-log counterexample, and the quality-audit report."""

import datetime

import pytest
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.operators.sequential import (
    capped_running_balance,
)
from wetsa_cams_solrad_timeseries_spark.plans.advanced import (
    _Q148_EPS,
    q148_band_join,
    q153_quality_audit,
)
from wetsa_cams_solrad_timeseries_spark.streaming.scd2_stream import scd2_versions


def test_band_join_banded_plan_and_equivalence(spark, sf_dir):
    df = q148_band_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan

    em = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.element_at("embedding", 1).cast("double").alias("x")
    )
    a, b = em.alias("a"), em.alias("b")
    brute = (
        a.crossJoin(b)
        .where(
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.abs(F.col("a.x") - F.col("b.x")) <= _Q148_EPS)
        )
        .select(
            F.col("a.vec_id").alias("vid_a"), F.col("b.vec_id").alias("vid_b")
        )
    )
    got = {(r.vid_a, r.vid_b) for r in df.collect()}
    want = {(r.vid_a, r.vid_b) for r in brute.collect()}
    assert got == want
    assert got  # nonempty at the smoke SF


def _deltas(spark, sf_dir):
    return (
        table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(-F.col("value"))
            .alias("delta"),
        )
    )


def test_capped_balance_partitioning_invariant_and_exact(spark, sf_dir):
    ev = _deltas(spark, sf_dir)
    r1 = capped_running_balance(ev.repartition(1), cap=200.0).collect()
    r13 = capped_running_balance(
        ev.repartition(13, "event_id"), cap=200.0
    ).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r13))

    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    ref = {}
    for uid, g in pdf.groupby("user_id"):
        bal, lo, hi = 0.0, 0, 0
        for d in g["delta"]:
            bal += d
            if bal < 0.0:
                bal, lo = 0.0, lo + 1
            elif bal > 200.0:
                bal, hi = 200.0, hi + 1
        ref[uid] = (bal, lo, hi, len(g))
    got = {
        r.user_id: (r.final_balance, r.n_clamp_low, r.n_clamp_high, r.n_steps)
        for r in r1
    }
    assert got.keys() == ref.keys()
    clamped = 0
    for uid, (bal, lo, hi, n) in ref.items():
        gb, glo, ghi, gn = got[uid]
        assert gb == pytest.approx(bal, abs=2e-6)
        assert (glo, ghi, gn) == (lo, hi, n)
        clamped += lo + hi
    assert clamped > 0  # the cap genuinely binds at the smoke SF


def test_scd2_log_must_keep_consecutive_duplicates(spark):
    """The A@1,A@3 + late-B@2 counterexample: a state that stores only
    COLLAPSED versions (dropping the consecutive-duplicate A@3) cannot
    recover the third version once the late B@2 lands between them —
    which is why streaming/scd2_stream.py keeps the full change-point
    log instead of merging into the collapsed timeline."""
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    t = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    full = spark.createDataFrame(
        [(1, t(1), 10, "A"), (1, t(2), 20, "B"), (1, t(3), 30, "A")], schema
    )
    truth = scd2_versions(full, "user_id", "ts", "event_type").collect()
    assert [r.status for r in sorted(truth, key=lambda r: r.version)] == [
        "A", "B", "A",
    ]

    early = spark.createDataFrame(
        [(1, t(1), 10, "A"), (1, t(3), 30, "A")], schema
    )
    collapsed = scd2_versions(early, "user_id", "ts", "event_type").select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.col("from_event").alias("event_id"),
        F.col("status").alias("event_type"),
    )
    assert collapsed.count() == 1  # A@3 was collapsed away
    late = spark.createDataFrame([(1, t(2), 20, "B")], schema)
    wrong = scd2_versions(
        collapsed.unionByName(late), "user_id", "ts", "event_type"
    ).collect()
    assert len(wrong) == 2  # the (t3, A) version is unrecoverable
    assert len(truth) == 3


def test_quality_audit_report_shape(spark, sf_dir):
    rep = {
        (r.table_name, r.check_name): r
        for r in q153_quality_audit(spark, sf_dir).collect()
    }
    assert len(rep) == 8
    n_orders = table(spark, sf_dir, "orders").count()
    pk = rep[("orders", "orders_pk_unique")]
    assert pk.n_rows == n_orders and pk.violations == 0 and pk.passed
    fk = rep[("lineitem", "lineitem_fk_orders")]
    assert fk.violations == 0 and fk.passed
    for r in rep.values():
        assert r.passed == (r.violations == 0)


def test_nearest_join_boundary_semantics(spark):
    """Locks the tie and boundary rules end-to-end on a synthetic frame:
    exact-timestamp match -> backward with gap 0; equidistant ->
    backward; beyond tolerance -> null."""
    import datetime

    from wetsa_cams_solrad_timeseries_spark.operators.joins import nearest_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + datetime.timedelta(seconds=sec)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 100, s(0)),    # exact match at s(0)
            (1, 101, s(50)),   # equidistant: right at s(0) and s(100)
            (1, 102, s(70)),   # nearer forward (s100, gap 30 vs 70)
            (2, 103, s(0)),    # only right at s(500) -> out of tolerance
        ],
        "k long, lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, s(0)), (1, 901, s(100)), (2, 902, s(500))],
        "k long, rid long, rts timestamp",
    )
    out = {
        r.lid: (r.rid, r.direction, r.gap_s)
        for r in nearest_join(
            left, right, "lts", "rts", ["k"], ["rid"], tolerance_seconds=200
        ).collect()
    }
    assert out[100] == (900, "backward", 0.0)
    assert out[101] == (900, "backward", 50.0)   # tie -> backward
    assert out[102] == (901, "forward", 30.0)
    assert out[103] == (None, None, None)


def test_chrono_split_is_time_ordered(spark, sf_dir):
    """The outer-join replay depends on part-0000i files covering
    ascending, non-overlapping time ranges."""
    import glob
    import os

    from wetsa_cams_solrad_timeseries_spark.streaming.outer_join_stream import (
        chrono_split,
    )

    split = chrono_split(spark, sf_dir)
    files = sorted(glob.glob(os.path.join(split, "part-*.parquet")))
    assert len(files) >= 2
    prev_max = None
    total = 0
    for f in files:
        pdf = spark.read.parquet(f).toPandas()
        total += len(pdf)
        assert len(pdf) > 0
        if prev_max is not None:
            assert pdf["ts"].min() >= prev_max
        prev_max = pdf["ts"].max()
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_events_replay_source_offsets_and_restart(spark, sf_dir):
    """The custom streaming source replays deterministic slices: a fresh
    query over the same path+options sees identical batches, and the
    slice assignment is content-stable (event_id % slices), so committed
    offsets mean the same rows on every run."""
    import json
    import shutil

    from pyspark.sql import functions as F

    from wetsa_cams_solrad_timeseries_spark.sources.replay_stream import (
        register_events_replay_source,
    )
    from wetsa_cams_solrad_timeseries_spark.streaming._drain import (
        drain_checkpoint_dir,
        drain_partitions,
    )

    register_events_replay_source(spark)

    def run(tag):
        src = (
            spark.readStream.format("events_replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("slices", "3")
            .load()
        )
        ckpt = drain_checkpoint_dir()
        with drain_partitions(spark, 4):
            q = (
                src.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .writeStream.outputMode("complete")
                .format("memory")
                .queryName(f"rps_{tag}")
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
                per_batch = [
                    json.loads(p.json).get("numInputRows", 0)
                    for p in q.recentProgress
                ]
            finally:
                q.stop()
                shutil.rmtree(ckpt, ignore_errors=True)
        rows = {
            r.event_type: r.n for r in spark.table(f"rps_{tag}").collect()
        }
        return [n for n in per_batch if n > 0], rows

    b1, r1 = run("a")
    b2, r2 = run("b")
    assert len(b1) == 3 and b1 == b2  # deterministic batch sizes
    assert r1 == r2
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(b1) == total


def test_events_replay_source_checkpoint_restart(spark, sf_dir):
    """Stop the custom-source query after its first micro-batch, restart
    from the SAME checkpoint: the resumed query must process only the
    remaining slices (offsets resume from the commit log, never
    re-announcing consumed slices) and finish with the full-replay
    state."""
    import json
    import shutil

    from pyspark.sql import functions as F

    from wetsa_cams_solrad_timeseries_spark.sources.replay_stream import (
        register_events_replay_source,
    )
    from wetsa_cams_solrad_timeseries_spark.streaming._drain import (
        drain_checkpoint_dir,
        drain_partitions,
    )

    register_events_replay_source(spark)

    def start(tag, ckpt):
        src = (
            spark.readStream.format("events_replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("slices", "3")
            .load()
        )
        return (
            src.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(f"rpr_{tag}")
            .option("checkpointLocation", ckpt)
            .start()
        )

    ckpt = drain_checkpoint_dir()
    try:
        with drain_partitions(spark, 4):
            q1 = start("a", ckpt)
            try:
                # Wait for at least one committed batch, then kill.
                import time

                deadline = time.time() + 60
                while time.time() < deadline:
                    if any(
                        json.loads(p.json).get("numInputRows", 0) > 0
                        for p in q1.recentProgress
                    ):
                        break
                    time.sleep(0.2)
            finally:
                q1.stop()
            q2 = start("b", ckpt)
            try:
                q2.processAllAvailable()
                resumed_rows = sum(
                    json.loads(p.json).get("numInputRows", 0)
                    for p in q2.recentProgress
                )
            finally:
                q2.stop()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    final = {r.event_type: r.n for r in spark.table("rpr_b").collect()}
    want = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == want          # resumed state completes the replay
    assert resumed_rows < total   # and did NOT reprocess everything


def test_range_offset_source_prunes_and_replays(spark, sf_dir):
    """The RANGE-offset source: (a) offset advance is IDEMPOTENT between
    commits (an engine probing latestOffset twice must not merge
    slices); (b) the boundary ranges partition the table exactly (batch
    totals equal the parquet row count, each slice non-empty); (c) the
    reader-side pyarrow range filter returns precisely the rows of each
    [lo, hi) slice — the pruning predicate and the replay agree."""
    import json
    import shutil

    from pyspark.sql import functions as F

    from wetsa_cams_solrad_timeseries_spark.sources.replay_stream import (
        EventsRangeStreamReader,
        register_events_replay_source,
    )
    from wetsa_cams_solrad_timeseries_spark.streaming._drain import (
        drain_checkpoint_dir,
        drain_partitions,
    )

    path = f"{sf_dir}/events.parquet"

    # (a) idempotence + advance-on-commit, engine-free.
    rd = EventsRangeStreamReader({"path": path, "slices": "2"})
    assert rd.initialOffset() == {"i": 0}
    assert rd.latestOffset() == {"i": 1}
    assert rd.latestOffset() == {"i": 1}  # probe again: same answer
    rd.commit({"i": 1})
    assert rd.latestOffset() == {"i": 2}
    assert rd.latestOffset() == {"i": 2}
    rd.commit({"i": 2})
    assert rd.latestOffset() == {"i": 2}  # exhausted: never past n_slices

    # (c) reader partitions reproduce each slice exactly.
    parts = rd.partitions({"i": 0}, {"i": 1})
    n_first = sum(
        sum(b.num_rows for b in rd.read(p)) for p in parts
    )
    assert 0 < n_first

    # (b) full replay through the engine: batch totals == table count.
    register_events_replay_source(spark)
    src = (
        spark.readStream.format("events_range_replay")
        .option("path", path)
        .option("slices", "2")
        .load()
    )
    ckpt = drain_checkpoint_dir()
    with drain_partitions(spark, 4):
        q = (
            src.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("range_replay_probe")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            fed = [
                json.loads(p.json).get("numInputRows", 0)
                for p in q.recentProgress
                if json.loads(p.json).get("numInputRows", 0) > 0
            ]
        finally:
            q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)
    total = spark.read.parquet(path).count()
    assert len(fed) == 2, fed  # one micro-batch per time slice
    assert fed[0] == n_first  # engine batch == reader-side slice read
    assert sum(fed) == total
    got = {
        r.event_type: r.n
        for r in spark.table("range_replay_probe").collect()
    }
    want = {
        r.event_type: r.n
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_greedy_pack_semantics_and_invariance(spark):
    """No-span packing: exact bin assignment on a hand-checked sequence,
    oversized items take a bin alone, and the result is invariant to
    input partitioning (the fold sorts per key)."""
    from wetsa_cams_solrad_timeseries_spark.operators.sequential import (
        greedy_pack,
    )

    rows = [
        # key a, budget 10: [4, 5] -> bin0 (9), [3] -> bin1, [12] -> bin2
        # (oversized, alone), [2, 8] -> bin3 (10, exact fit boundary)
        ("a", 1, 4), ("a", 2, 5), ("a", 3, 3), ("a", 4, 12),
        ("a", 5, 2), ("a", 6, 8),
        ("b", 1, 10),  # exact-budget single item -> bin0
        ("b", 2, 1),   # does not fit after a full bin -> bin1
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_chars long")
    got = {
        (r.lang, r.doc_id): r.bin_id
        for r in greedy_pack(df, budget=10).collect()
    }
    want = {
        ("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("a", 4): 2,
        ("a", 5): 3, ("a", 6): 3,
        ("b", 1): 0, ("b", 2): 1,
    }
    assert got == want, got
    got_shuffled = {
        (r.lang, r.doc_id): r.bin_id
        for r in greedy_pack(df.repartition(7), budget=10).collect()
    }
    assert got_shuffled == want


def test_modulo_replay_latest_offset_idempotent(sf_dir):
    """ADVICE regression lock: latestOffset must return the same answer
    however many times the engine probes it between commits — a
    counter-mutating implementation silently merges two slices into one
    micro-batch on a double probe. Engine-free contract check."""
    from wetsa_cams_solrad_timeseries_spark.sources.replay_stream import (
        EventsReplayStreamReader,
    )

    rd = EventsReplayStreamReader(
        {"path": f"{sf_dir}/events.parquet", "slices": "3"}
    )
    assert rd.initialOffset() == {"slice": 0}
    assert rd.latestOffset() == {"slice": 1}
    assert rd.latestOffset() == {"slice": 1}  # probe again: no advance
    rd.partitions({"slice": 0}, {"slice": 1})  # batch planned, uncommitted
    assert rd.latestOffset() == {"slice": 2}  # planned watermark advances
    assert rd.latestOffset() == {"slice": 2}
    rd.commit({"slice": 1})
    assert rd.latestOffset() == {"slice": 2}
    rd.commit({"slice": 2})
    assert rd.latestOffset() == {"slice": 3}
    rd.commit({"slice": 3})
    assert rd.latestOffset() == {"slice": 3}  # exhausted: never past n


def test_keyed_replay_latest_offset_idempotent(sf_dir):
    """Same contract for the per-partition offset-map reader: each keyed
    log's position advances by its own step once per commit, never on a
    repeated probe, and caps at its end position."""
    from wetsa_cams_solrad_timeseries_spark.sources.replay_stream import (
        EventsKeyedStreamReader,
    )

    rd = EventsKeyedStreamReader(
        {"path": f"{sf_dir}/events.parquet", "partitions": "4",
         "batches": "2"}
    )
    zero = rd.initialOffset()
    assert zero == {str(p): 0 for p in range(4)}
    first = rd.latestOffset()
    assert first == rd.latestOffset()  # idempotent between commits
    assert all(0 < int(v) <= rd._ends[int(k)] for k, v in first.items())
    rd.commit(first)
    second = rd.latestOffset()
    assert second == {str(p): rd._ends[p] for p in range(4)}  # 2 batches
    rd.commit(second)
    assert rd.latestOffset() == second  # exhausted, stable
