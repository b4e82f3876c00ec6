"""Block-nested-loop pairing for all-pairs kernels (dense Jaccard,
embedding near-dup): shard the corpus into ``n_blocks`` row blocks and
route every unordered block pair (i ≤ j) to one ``applyInPandas`` task
that runs a numpy/BLAS kernel over the two blocks.

This is the distributed form of "matrix × matrixᵀ": no driver collect of
the corpus, no Spark broadcast of the corpus — each task sees exactly two
row blocks. Data replication factor is (n_blocks + 1)× (each row joins
n_blocks − b A-groups and b + 1 B-groups), the classic block nested-loop
trade: n_blocks scales with corpus size so a block always fits an
executor's memory, while per-task compute stays one BLAS matmul.

At 100 TB: pick n_blocks ≈ corpus_bytes / target_block_bytes; the shuffle
moves (n_blocks + 1) copies of the (id, payload) rows — still linear in
corpus size per round, vs the driver-OOM of a collect-and-broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_block_pairs(df: DataFrame, block_col: str, n_blocks: int) -> DataFrame:
    """Replicate rows so ``groupBy("ba", "bb")`` yields every unordered
    block pair with both blocks present, distinguished by ``side``
    (0 = the ba block, 1 = the bb block). The diagonal group (b, b)
    carries the block twice — its kernel handles within-block pairs.
    """
    blk = F.col(block_col).cast("int")
    a_keys = F.transform(
        F.sequence(blk, F.lit(n_blocks - 1)),
        lambda j: F.struct(
            blk.alias("ba"), j.cast("int").alias("bb"), F.lit(0).alias("side")
        ),
    )
    b_keys = F.transform(
        F.sequence(F.lit(0), blk),
        lambda i: F.struct(
            i.cast("int").alias("ba"), blk.alias("bb"), F.lit(1).alias("side")
        ),
    )
    tagged = df.withColumn("__pair", F.explode(F.concat(a_keys, b_keys)))
    return tagged.select(
        F.col("__pair.ba").alias("ba"),
        F.col("__pair.bb").alias("bb"),
        F.col("__pair.side").alias("side"),
        *[c for c in df.columns if c != block_col],
    )


def pair_masks(a_ids, b_ids, hit_mask, diagonal: bool):
    """Resolve a block-pair hit matrix into (id_a < id_b) pairs.

    Off-diagonal groups hold disjoint blocks, so every unordered pair
    appears exactly once as (A-row, B-row) — but the A id is not always
    the smaller one; orient with min/max. Diagonal groups hold the same
    block on both sides, so keep the strict upper triangle only.
    Returns (id_a, id_b, ai, bi) index arrays into the hit matrix.
    """
    import numpy as np

    if diagonal:
        hit_mask = hit_mask & (a_ids[:, None] < b_ids[None, :])
        ai, bi = np.nonzero(hit_mask)
        return a_ids[ai], b_ids[bi], ai, bi
    ai, bi = np.nonzero(hit_mask)
    ia, ib = a_ids[ai], b_ids[bi]
    lo = np.minimum(ia, ib)
    hi = np.maximum(ia, ib)
    return lo, hi, ai, bi
