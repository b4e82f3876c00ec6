"""Golden explain snapshots — one representative query per plan family.

PLANS.json counters can stay EQUAL across a broadcast→SortMergeJoin flip
or a lost bucket-pruned scan; these snapshots pin the operator-tree
SHAPE (tools/plan_snapshot.normalize_plan) so that class of silent
re-plan fails a test. Regenerate intentionally with
``UPDATE_PLAN_SNAPSHOTS=1 pytest tests/test_plan_snapshots.py``; the
diff then goes through review like any code change.

The meta-test at the bottom proves the net actually catches the flip it
exists for: with the broadcast threshold disabled, the dim-join plan
must STOP matching its snapshot.
"""

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from plan_snapshot import formatted_plan, normalize_plan  # noqa: E402

from wetsa_cams_solrad_timeseries_spark.catalog import table  # noqa: E402
from wetsa_cams_solrad_timeseries_spark.plans.registry import (  # noqa: E402
    QUERIES,
)

SNAP = Path(__file__).resolve().parent / "snapshots"

# (snapshot name, query) — one per family the shuffle-budget counters
# cannot fully protect: dimension broadcast join, banded LSH self-join,
# incremental bucketed-index probe, gate-tuned ANN serving.
CASES = [
    ("dim_join", "q03_star_join_revenue"),
    ("banded_self_join", "q33_minhash_lsh"),
    ("incremental_probe", "q193_incremental_dedup"),
    ("tuned_serving", "q216_ann_serving_sla"),
    # Postings serving: the SelectedBucketsCount marker in this snapshot
    # is the bucket-pruning guarantee — a lost pruned scan changes it.
    ("postings_serving", "q207_hybrid_from_index"),
    # Multimodal kernel chain: Arrow hash pass + banded candidates +
    # popcount verify (the checkpointed-subtree shape).
    ("phash_neardup", "q208_phash_neardup"),
    # Round-11 families.
    # Incremental graph serve: persisted edge-table scan + bounded-
    # candidate broadcast scoring + the rank window (a broadcast→SMJ
    # flip here is exactly what the counters can miss).
    ("graph_incremental_serve", "q238_incremental_graph_ann"),
    # PCA projection: scan → fold projection, NO exchange/join/Python —
    # the snapshot pins that the whole query stays one codegen stage.
    ("pca_projection", "q241_pca_projection"),
    # Banding SLA: 3 rung subplans (band explode + bucket self-join +
    # audit join) over one checkpointed signature scan + the pick join.
    ("banding_sla", "q246_banding_sla"),
]


def _check(name: str, got: str) -> None:
    path = SNAP / f"{name}.txt"
    if os.environ.get("UPDATE_PLAN_SNAPSHOTS"):
        SNAP.mkdir(exist_ok=True)
        path.write_text(got)
        return
    assert path.exists(), (
        f"missing golden snapshot {path} — create it with "
        "UPDATE_PLAN_SNAPSHOTS=1"
    )
    want = path.read_text()
    assert got == want, (
        f"plan shape changed for {name}:\n--- golden ---\n{want}\n"
        f"--- current ---\n{got}"
    )


@pytest.mark.parametrize("name,query", CASES)
def test_plan_snapshot(spark, sf_dir, name, query):
    df = QUERIES[query].fn(spark, sf_dir)
    _check(name, normalize_plan(formatted_plan(df)))


def test_streaming_stateful_snapshot(spark, sf_dir, tmp_path):
    # The streaming-stateful family: watermarked tumbling window over a
    # multi-file replay — the snapshot pins the StateStore operator
    # sandwich (restore → partial agg → save) and the watermark node.
    ev = table(spark, sf_dir, "events").select("ts", "user_id", "value")
    src = str(tmp_path / "split")
    ev.repartition(2).write.parquet(src)
    reader = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("pathGlobFilter", "part-*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        reader.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        buf = io.StringIO()
        with redirect_stdout(buf):
            q.explain()
        got = normalize_plan(buf.getvalue())
    finally:
        q.stop()
    assert "StateStoreSave" in got  # sanity: it IS the stateful plan
    # StreamingQuery.explain() renders the LAST executed micro-batch; a
    # trailing watermark-commit batch has an empty source
    # (LocalTableScan <empty>) instead of the file scan, so pin only the
    # stateful sandwich ABOVE the watermark node — that is the plan
    # shape this family exists to protect.
    lines = got.splitlines()
    cut = next(
        i for i, ln in enumerate(lines) if "EventTimeWatermark" in ln
    )
    got = "\n".join(lines[: cut + 1]) + "\n"
    _check("streaming_stateful", got)


def test_snapshot_catches_broadcast_demotion(spark, sf_dir):
    # Deliberate red case: with the broadcast threshold disabled the
    # dim-join must plan differently (maybe_broadcast is threshold-
    # gated), and the snapshot must catch it — the exact failure mode
    # this layer was added for.
    golden = (SNAP / "dim_join.txt").read_text()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q03_star_join_revenue"].fn(spark, sf_dir)
        got = normalize_plan(formatted_plan(df))
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert got != golden
    assert "SortMergeJoin" in got or "BroadcastHashJoin" not in got
