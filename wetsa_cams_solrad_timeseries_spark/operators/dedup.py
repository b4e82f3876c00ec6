"""Deduplication operators for LLM-training-data pipelines: exact,
n-gram Jaccard, MinHash + LSH, SimHash.

Design for 100 TB (the north-star scale):

- Shingles are hashed to fixed-width 32-bit integers (cross-engine
  ``hash32``) *before* any shuffle, so join/group keys are 8 bytes, not
  strings.
- The all-pairs Jaccard join is quadratic in the worst case; it exists as
  the verification stage. At scale, candidate generation ALWAYS goes
  through MinHash-LSH banding first (``minhash_signatures`` →
  ``lsh_candidate_pairs``), which is linear in documents × bands and only
  pairs documents that share a band bucket. Hot buckets (boilerplate
  shingles) are the skew risk — AQE skew-join handles the join, and
  ``max_bucket_size`` drops degenerate buckets outright (the standard
  near-dup trade-off).
- SimHash is a single grouped aggregation (no pairwise stage): each doc
  gets a 32-bit signature; near-dup candidates share signatures within a
  Hamming radius, found by multi-probe or band rotation downstream.

All hashing is MD5-derived (functions/hashing.py) so results are
bit-identical in Spark, DuckDB, and Python — engine-native hashes would be
faster but unverifiable across engines; swap via the ``hash_fn`` parameter
for a pure-production deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.tokenize import (
    norm_words,
    word_ngrams,
)
from wetsa_cams_solrad_timeseries_spark.functions.hashing import hash32, hash32_py


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: one hash-aggregate on the content digest; lowest id
    survives. Shuffle key is the 32-char digest, not the document body."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_md5")).agg(
        F.min(id_col).alias("keep_" + id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


# Tokenization is SHARED with operators/text.py (functions/tokenize.py):
# shingles and fingerprints must stay bit-identical on normalization.
_norm_words = norm_words


def word_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    out_col: str = "shingle_hash",
) -> DataFrame:
    """Distinct word n-gram shingles per document, hashed to 32-bit ints.

    Documents with fewer than ``n`` words contribute their whole
    (normalized) text as a single shingle, so every doc has ≥1 shingle.
    Pure array expressions (split/transform/slice/explode) — no UDF; the
    explode multiplies rows but never leaves the executor.

    The input is repartitioned to the session's default parallelism first:
    document corpora often arrive as few large files, and the shingle
    explode is the compute-heavy stage — without the spread, one task
    shingles everything (observed 1-file → 1-task on the test corpus).
    """
    # Unconditional round-robin spread (touching df.rdd just to READ the
    # partition count would force a full RDD conversion — worse than the
    # one narrow shuffle this costs when the input was already spread).
    # Project to the two consumed columns BEFORE the shuffle: a corpus
    # row can carry wide payloads (metadata structs, binary columns) the
    # shingle pipeline never reads — shuffling them would multiply the
    # spread's cost by the full row width.
    #
    # Tokenize BEFORE the shuffle, and shuffle the words ARRAY: the
    # n-gram transform is a higher-order function, which Catalyst always
    # evaluates interpreted (CodegenFallback), re-evaluating its
    # argument expression per lambda element — inlining
    # split(lower(trim(text))) there costs words-count regex splits per
    # document instead of one, and routes lower() through the
    # interpreted path, whose first evaluation initializes Spark 4's ICU
    # collation tables (see session.warm_collation: all task threads
    # serialize on that class-init when they hit it together). With the
    # words array materialized at the shuffle boundary, the lambda only
    # slices an attribute — O(tokens) per doc, no case mapping in
    # interpreted code at all.
    df = df.select(
        F.col(id_col), _norm_words(text_col).alias("__words")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    words = F.col("__words")
    shingles = word_ngrams(words, n)
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("__sh"))
        .select(F.col(id_col), hash32(F.col("__sh")).alias(out_col))
        .distinct()
    )


def jaccard_pairs(
    shingle_df: DataFrame,
    id_col: str,
    threshold: float = 0.0,
    shingle_col: str = "shingle_hash",
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity via a self-join on shingle hash.

    VERIFICATION-STAGE operator: at scale, feed it candidate pairs from
    LSH instead of the full corpus (see module docstring). Returns
    (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.

    ``max_df`` drops shingles occurring in more than that many documents
    before the join — stop-shingle removal, the standard similarity-join
    mitigation for the c² pair blowup of boilerplate shingles (a shingle
    in c docs emits c² join rows). It changes the measure to "Jaccard
    over informative shingles": sizes are counted AFTER the drop so the
    result is still a true Jaccard of the retained sets.
    """
    if max_df is not None:
        keep = (
            shingle_df.groupBy(shingle_col)
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select(shingle_col)
        )
        shingle_df = shingle_df.join(keep, on=shingle_col, how="left_semi")
    a = shingle_df.select(
        F.col(id_col).alias("id_a"), F.col(shingle_col).alias("__h")
    )
    b = shingle_df.select(
        F.col(id_col).alias("id_b"), F.col(shingle_col).alias("__h")
    )
    common = (
        a.join(b, on="__h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("sz_b"))
    jac = F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
    return (
        common.join(sa, on="id_a")
        .join(sb, on="id_b")
        .select("id_a", "id_b", F.round(jac + F.lit(1e-9), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_dense(
    shingle_df: DataFrame,
    id_col: str,
    threshold: float = 0.0,
    shingle_col: str = "shingle_hash",
    n_blocks: int = 8,
    max_vocab: int | None = 65536,
) -> DataFrame:
    """All-pairs Jaccard for the DENSE-VOCABULARY regime: when the distinct
    shingle vocabulary is small (boilerplate-heavy corpora, templated
    text), the shingle self-join degenerates to Σc² rows (c = per-shingle
    doc frequency) — quadratic in practice. Here each doc becomes a
    0/1 vector over the vocabulary and common-shingle counts come from one
    BLAS matmul per partition block (doc-block × broadcast corpusᵀ),
    mirroring similarity.neardup_pairs_blocked.

    Counts are exact integers, so jaccard = c/(sa+sb−c) is bit-identical
    to the join formulation — same results, ~20× the throughput at 5k
    docs × 931 vocab. Use the join form (``jaccard_pairs``) when the
    vocabulary is large/sparse (normal web-scale text), this form when
    profiling shows Σc² blowup.

    Distribution: the corpus shards into ``n_blocks`` row blocks and each
    unordered block pair runs one bitmap matmul in an applyInPandas task
    (operators/blocked.py) — no driver materialization of the corpus. The
    only driver pull is the VOCABULARY (distinct shingle hashes), which is
    small by the dense-regime precondition itself — the same bounded-side
    rule as broadcasting a dimension table.

    ``max_vocab`` is the REGIME GUARD that makes that precondition safe
    on any corpus: the vocabulary probe collects at most ``max_vocab + 1``
    distinct hashes (a bounded pull even on a 100 TB corpus), and if the
    limit truncated — the vocabulary is larger than the dense regime
    allows — the call transparently falls back to the sparse self-join
    ``jaccard_pairs``, which computes the identical measure. Pass
    ``max_vocab=None`` to skip the guard (kernel-only benchmarking)."""
    import numpy as np
    import pandas as pd

    from wetsa_cams_solrad_timeseries_spark.operators.blocked import (
        pair_masks,
        tag_block_pairs,
    )

    spark = shingle_df.sparkSession
    vocab_df = shingle_df.select(shingle_col).distinct()
    if max_vocab is not None:
        probe = vocab_df.limit(max_vocab + 1).collect()
        if len(probe) > max_vocab:
            return jaccard_pairs(
                shingle_df, id_col, threshold=threshold, shingle_col=shingle_col
            )
        vocab = sorted(r[0] for r in probe)
    else:
        vocab = sorted(r[0] for r in vocab_df.collect())
    vidx = {h: i for i, h in enumerate(vocab)}
    bc_vidx = spark.sparkContext.broadcast(vidx)

    docs = (
        shingle_df.groupBy(id_col)
        .agg(F.collect_list(shingle_col).alias("hs"))
        .withColumn("__blk", F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int"))
    )
    tagged = tag_block_pairs(docs, "__blk", n_blocks)

    def to_bitmap(pdf):
        vmap = bc_vidx.value
        mat = np.zeros((len(pdf), len(vmap)), dtype=np.float32)
        for ri, hs in enumerate(pdf["hs"]):
            for h in hs:
                mat[ri, vmap[h]] = 1.0
        return mat

    def kernel(key, pdf):
        ba, bb = int(key[0]), int(key[1])
        a_pdf = pdf[pdf["side"] == 0]
        b_pdf = pdf[pdf["side"] == 1]
        if a_pdf.empty or b_pdf.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "jaccard": np.float64}
            )
        a_ids = a_pdf[id_col].to_numpy(dtype=np.int64)
        b_ids = b_pdf[id_col].to_numpy(dtype=np.int64)
        a_mat, b_mat = to_bitmap(a_pdf), to_bitmap(b_pdf)
        common = np.rint(a_mat @ b_mat.T).astype(np.int64)
        a_sizes = a_mat.sum(axis=1).astype(np.int64)
        b_sizes = b_mat.sum(axis=1).astype(np.int64)
        union = a_sizes[:, None] + b_sizes[None, :] - common
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.round(common / union + 1e-9, 6)
        # Require a shared shingle (common > 0), matching the sparse
        # self-join form, which by construction only produces pairs that
        # co-occur under some shingle: without this, threshold <= 0
        # would emit every zero-overlap pair here but not there —
        # breaking the documented bit-identical fallback AND exploding
        # the output quadratically.
        hits = (common > 0) & (jac >= threshold)
        id_a, id_b, ai, bi = pair_masks(a_ids, b_ids, hits, diagonal=ba == bb)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "jaccard": jac[ai, bi]})

    return tagged.groupBy("ba", "bb").applyInPandas(
        kernel, schema="id_a long, id_b long, jaccard double"
    )


MINHASH_PRIME = (1 << 31) - 1  # Mersenne prime 2^31−1


def minhash_perm_coeffs(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for the universal-hash
    permutation family mh_p(h) = (a_p·h + b_p) mod (2³¹−1), derived from
    the portable hash so Spark, DuckDB, and Python agree. a is kept odd
    and < 2¹⁹ so a·h < 2⁵¹ stays exact in int64 (and in a double)."""
    return [
        ((hash32_py(f"a{p}") % (1 << 19)) | 1, hash32_py(f"b{p}") % MINHASH_PRIME)
        for p in range(n_perm)
    ]


def minhash_signatures(
    shingle_df: DataFrame,
    id_col: str,
    n_perm: int = 16,
    shingle_col: str = "shingle_hash",
) -> DataFrame:
    """MinHash signature per document: permutation p takes the minimum of
    a universal-hash re-map of each shingle hash. One grouped aggregation
    computes the whole signature (n_perm min-aggregates) — signatures are
    n_perm × 8 bytes regardless of document size, which is the whole
    point at 100 TB.

    The permutations are integer arithmetic over the base 32-bit shingle
    hash ((a·h+b) mod 2³¹−1) rather than n_perm further MD5 invocations —
    one cryptographic hash per shingle total, the rest is codegen'd
    multiply-add (the classic universal-hashing construction)."""
    coeffs = minhash_perm_coeffs(n_perm)
    h = F.col(shingle_col)
    salted = [
        F.min((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{p}")
        for p, (a, b) in enumerate(coeffs)
    ]
    return shingle_df.groupBy(id_col).agg(*salted)


def lsh_band_rows(
    sig_df: DataFrame,
    id_col: str,
    n_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bucket) rows of the LSH banding — the persistable form
    of the index (q193 writes these bucketed on ``bucket`` as the
    cross-run dedup state table). The band id is hashed INTO the bucket
    digest, so ``bucket`` alone is a complete join key: probing on the
    single column lets a bucketed layout satisfy the join's distribution
    requirement with zero history-side shuffle."""
    if n_perm % bands != 0:
        raise ValueError(
            f"n_perm={n_perm} must divide evenly into bands={bands}; "
            "trailing permutations would silently drop from the banding"
        )
    rows_per_band = n_perm // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + i}") for i in range(rows_per_band)]
        digest = F.md5(F.concat_ws("_", F.lit(str(b)), *[c.cast("string") for c in cols]))
        band_structs.append(
            F.struct(F.lit(b).alias("band"), digest.alias("bucket"))
        )
    return sig_df.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("__b")
    ).select(id_col, "__b.band", "__b.bucket")


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    n_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows of
    ``n_perm/bands`` values, bucket by the band digest, and emit distinct
    document pairs sharing ≥1 bucket.

    The band explode is bands× row growth of *signatures* (tiny); the
    bucket self-join is the only shuffle and its keys are uniform unless
    the corpus has boilerplate — AQE skew-join covers that.
    """
    banded = lsh_band_rows(sig_df, id_col, n_perm=n_perm, bands=bands)
    a = banded.select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    b_ = banded.select(
        F.col(id_col).alias("id_b"), "band", "bucket"
    )
    return (
        a.join(b_, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_br_sweep(n_perm: int, thresholds=(0.5, 0.7, 0.8, 0.9)) -> list[dict]:
    """Tuning table for the LSH banding trade-off: for every (bands b,
    rows-per-band r) split of ``n_perm`` permutations, the s-curve
    candidate probability P(s) = 1 − (1 − s^r)^b and its threshold
    (the similarity where P crosses ~0.5, ≈ (1/b)^(1/r)).

    Pure closed-form math (the standard MinHash-LSH analysis): at 100 TB
    you pick (b, r) from this table so the threshold sits at your dedup
    cutoff — more bands = more recall + more candidate volume; the sweep
    makes that trade explicit instead of folklore. Driver-side; no Spark.
    """
    out = []
    for bands in range(1, n_perm + 1):
        if n_perm % bands:
            continue
        rows = n_perm // bands
        row = {
            "bands": bands,
            "rows_per_band": rows,
            "threshold": round((1.0 / bands) ** (1.0 / rows), 4),
        }
        for s in thresholds:
            row[f"p_at_{s}"] = round(1.0 - (1.0 - s**rows) ** bands, 4)
        out.append(row)
    return out


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
) -> DataFrame:
    """SimHash signature: hash every word occurrence, take the per-bit
    majority vote over the document, pack votes into a ``bits``-wide
    integer. One explode + one grouped aggregation (``bits`` conditional
    sums) — no pairwise computation, embarrassingly parallel.

    Near-dup detection downstream: signatures within small Hamming
    distance (``bit_count(a XOR b)``) — see q34's pairing use.
    """
    words = _norm_words(text_col)
    exploded = df.select(F.col(id_col), F.explode(words).alias("__w")).select(
        F.col(id_col), hash32(F.col("__w")).alias("__h")
    )
    votes = [
        F.sum(
            F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    sig = None
    agg = exploded.groupBy(id_col).agg(*votes)
    for b in range(bits):
        term = F.when(F.col(f"v{b}") >= 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return agg.select(F.col(id_col), sig.alias("simhash"))


def cap_bucket_occupancy(
    band_df: DataFrame,
    id_col: str,
    bucket_col: str = "bucket",
    cap: int = 8,
) -> DataFrame:
    """Hot-bucket occupancy cap for the LSH index — the boilerplate-skew
    lever SCALING.md names beside AQE skew-join: web corpora have
    buckets holding millions of near-identical boilerplate documents,
    and the within-bucket pair join is quadratic in occupancy, so ONE
    hot bucket can dominate the whole candidate stage. Keep the ``cap``
    LOWEST-id rows per bucket (deterministic retention — the survivor
    convention every dedup operator here uses), turning the worst-case
    per-bucket work from O(n²) into O(cap²).

    Recall trade-off is explicit, not folklore: a capped bucket of size
    n keeps C(min(n,cap),2) of its C(n,2) candidate pairs — see
    :func:`bucket_cap_pair_retention` (pytest-verified against direct
    enumeration). Duplicates lost here are still caught by any OTHER
    band the pair collides in (the q33 banding), which is why capping
    beats sampling: retention is deterministic and replayable.

    Scale shape: the cap's row_number window partitions BY BUCKET — the
    same key the candidate join shuffles on — so under the corpus-scale
    sort-merge join the window's hash partitioning satisfies the join
    distribution and the capped plan spends ZERO extra Exchanges over
    the uncapped one (pytest-locked in tests/test_dedup_text.py with
    broadcast disabled). Better still, Catalyst plants a
    ``WindowGroupLimit`` BEFORE the window's shuffle: each map partition
    pre-prunes to its local top-``cap`` per bucket, so a 10M-row hot
    bucket ships at most ``cap``·n_map_partitions rows across the wire
    instead of 10M — the cap executes mostly map-side.
    """
    w = Window.partitionBy(bucket_col).orderBy(id_col)
    return (
        band_df.withColumn("__occ", F.row_number().over(w))
        .filter(F.col("__occ") <= cap)
        .drop("__occ")
    )


def bucket_cap_pair_retention(bucket_sizes, cap: int) -> float:
    """Fraction of within-bucket candidate pairs a ``cap`` retains over
    the given bucket-occupancy histogram: Σ C(min(n,cap),2) / Σ C(n,2).
    Pure math (no Spark) — the tuning companion to
    :func:`cap_bucket_occupancy`, the same way lsh_br_sweep tunes the
    banding itself. Returns 1.0 for a pairless histogram."""
    kept = sum(min(n, cap) * (min(n, cap) - 1) // 2 for n in bucket_sizes)
    total = sum(n * (n - 1) // 2 for n in bucket_sizes)
    return kept / total if total else 1.0
