"""Streaming token-budget mixer: q226's per-source quota as cross-batch
state, with EXACT batch equivalence from a monotonicity theorem.

q226's batch semantics: per source, documents sort by the deterministic
shuffle key and the greedy prefix with running token total ≤ budget is
selected. On a stream, a late arrival with a SMALL key re-orders the
prefix — so naive arrival-order admission is order-dependent and wrong
against the batch truth. But the batch rule has two structural facts:

1. With non-negative token counts the running total is non-decreasing
   in sort order, so the selected set is a PREFIX of the per-source
   order — every rejected doc sorts after every selected doc.
2. Adding documents can only INCREASE the running total at any fixed
   position, so ``selected(S ∪ N) ⊆ selected(S) ∪ N``: a doc the batch
   rule ever rejected can never come back.

Together: per-source state = the CURRENTLY SELECTED rows only (bounded
by budget / min-doc-tokens rows — never corpus-sized), and each batch
merges its new docs into the state of the TOUCHED sources, re-sorts,
re-takes the prefix. By induction the drained state is exactly
``q226 WHERE selected`` — independent of batch boundaries and arrival
order. Rejected docs are dropped forever, which is what keeps the
state bounded at 100 TB (the watermark-state argument, in quota form).

At-least-once: one state generation per batch (touched sources' full
replacement lists), ``_SUCCESS``-gated, latest-generation-wins per
source; a re-executed batch reads only prior committed generations and
rewrites its own deterministically.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mix_keyed(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tokens, shuffle_key) — q226's projection, the
    shared scan-stage prep for batch and stream."""
    from wetsa_cams_solrad_timeseries_spark.functions.hashing import hash32

    trimmed = F.trim(F.col("text"))
    ws_tokens = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"[ \t\n\r]+"))
    )
    return docs.select(
        "doc_id",
        "source",
        ws_tokens.cast("long").alias("n_tokens"),
        hash32(F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )


def streaming_token_mix(
    spark: SparkSession, split_dir: str, budget: int
) -> DataFrame:
    """Drain the document replay through the quota state machine and
    return the selected rows ``(doc_id, source, n_tokens, shuffle_key,
    cum_tokens)`` — provably q226's batch selection. Asserts >1
    committed micro-batch."""
    from pyspark.sql import Window

    from wetsa_cams_solrad_timeseries_spark._artifacts import register_cleanup
    from wetsa_cams_solrad_timeseries_spark.streaming._drain import (
        drain_checkpoint_dir,
        drain_partitions,
        size_partitions,
    )

    batch_df = spark.read.parquet(split_dir)
    reader = (
        spark.readStream.schema(batch_df.schema)
        .option("pathGlobFilter", "part-*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(split_dir)
    )
    root = register_cleanup(
        os.path.join(
            tempfile.gettempdir(), f"wetsa_mixstream_{uuid.uuid4().hex[:12]}"
        )
    )
    os.makedirs(root, exist_ok=True)

    w = (
        Window.partitionBy("source")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def _committed() -> list[str]:
        return sorted(
            os.path.join(root, name)
            for name in os.listdir(root)
            if name.startswith("batch_")
            and os.path.exists(os.path.join(root, name, "_SUCCESS"))
        )

    def _latest(paths: list[str]) -> DataFrame:
        allrows = spark.read.parquet(*paths)
        return allrows.join(
            allrows.groupBy("source").agg(F.max("gen").alias("gen")),
            on=["source", "gen"],
        )

    def apply_batch(bdf: DataFrame, bid: int) -> None:
        out = os.path.join(root, f"batch_{bid}")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            return  # re-executed batch: generation already committed
        keyed = mix_keyed(bdf).localCheckpoint(eager=True)
        touched = [r["source"] for r in keyed.select("source").distinct().collect()]
        prior = _committed()
        if prior:
            state = (
                _latest(prior)
                .filter(F.col("source").isin(touched))
                .select("doc_id", "source", "n_tokens", "shuffle_key")
            )
            merged = state.unionByName(keyed)
        else:
            merged = keyed
        selected = (
            merged.withColumn(
                "cum_tokens", F.sum("n_tokens").over(w).cast("long")
            )
            .filter(F.col("cum_tokens") <= budget)
            .withColumn("gen", F.lit(bid).cast("long"))
        )
        selected.write.mode("overwrite").parquet(out)

    ckpt = drain_checkpoint_dir()
    try:
        with drain_partitions(spark, size_partitions(spark, batch_df.count())):
            query = (
                reader.writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                query.processAllAvailable()
            finally:
                query.stop()
        committed = _committed()
        if len(committed) <= 1:
            raise RuntimeError(
                f"streaming mix drained in {len(committed)} micro-batch(es)"
                " — the cross-batch quota lifecycle was not exercised"
            )
        return _latest(committed).select(
            "doc_id", "source", "n_tokens", "shuffle_key", "cum_tokens"
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
