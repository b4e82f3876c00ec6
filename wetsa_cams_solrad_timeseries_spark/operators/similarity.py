"""Similarity search over embedding columns (``array<float>``).

Three tiers, matching how ANN is actually deployed at scale:

1. ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
   set against the corpus; one scan, no index. The correctness baseline
   and the right answer whenever |queries| × |corpus| fits a pass.
2. ``hyperplane_buckets`` + ``ann_topk_lsh`` — random-hyperplane (SRP)
   LSH: each vector gets sign-bit bucket keys from deterministic
   hyperplanes; candidates are bucket-mates only. Corpus-linear, index
   build is a single scan, lookup joins are equi-joins on bucket strings
   — the 100 TB path (band count / bits per band trade recall vs
   candidate volume).
3. ``neardup_pairs`` — all-pairs cosine ≥ τ for embedding-based
   dedup; quadratic, so at scale it runs on LSH candidates (same
   composition as MinHash→Jaccard in operators/dedup.py).

Determinism: hyperplane coefficients derive from the cross-engine MD5
hash (functions/hashing.py) — Spark literals, DuckDB SQL, and Python
produce identical planes; cosines are computed on double-cast arrays and
rounded to 6 digits before any threshold/ranking so engine ULP noise
cannot flip a comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.arrays import to_double_array
from wetsa_cams_solrad_timeseries_spark.functions.hashing import hash32_py


def hyperplane_coefs(n_planes: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim, derived from
    the portable hash: coef[p][i] = hash32(f"{p}_{i}") / (2^32−1) · 2 − 1.
    Reproducible in any engine that has MD5 (see the DuckDB oracle twin in
    plans/llm_ops.py)."""
    return [
        [hash32_py(f"{p}_{i}") / 4294967295.0 * 2 - 1 for i in range(dim)]
        for p in range(n_planes)
    ]


def spread_for_scoring(df: DataFrame) -> DataFrame:
    """Round-robin the corpus side of a pair-scoring broadcast join out
    to the session's default parallelism when its scan would otherwise
    run in fewer tasks.

    The embedding corpus is byte-LIGHT (id + fixed-width vector) but the
    stage consuming it does O(|corpus| x |queries|) distance evaluations
    — compute skew the byte-based planner cannot see (guide §2.5). A
    single-row-group parquet file gives the scan ONE split, so without
    this the whole scoring stage runs on 1-2 cores (profiled: 8.5 s
    two-task stages in the descent-family truth builders at sf0.1 on 32
    cores). The exchange moves only the narrow scoring projection; when
    the input already has >= default-parallelism partitions (any real
    cluster corpus) this returns the frame untouched — no exchange, so
    the change is scale-adaptive, not a local[32] constant."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism)


def brute_force_topk(
    emb_df: DataFrame,
    queries_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    spread: bool = False,
) -> DataFrame:
    """Exact cosine top-k: broadcast-cross-join queries × corpus, rank by
    (rounded cosine desc, id) per query. The corpus side streams — no
    shuffle of the big table; the only wide op is the per-query top-k
    window over |corpus| rows, which Spark executes as partial top-k.

    ``spread=True`` round-robins the corpus projection to default
    parallelism first (see :func:`spread_for_scoring`) — opt in at call
    sites whose |queries| x |corpus| pair count makes the scoring stage
    compute-bound (measured: q282's 400-query gate 5.0 -> 1.4 s at
    sf0.1; small-|Q| callers LOSE ~0.3 s to the extra exchange, so the
    default stays off).

    The COSINE kernels take no ``dim`` and always use the fold spelling
    (round-13 ADVICE: the previously-accepted-but-ignored parameter is
    dropped so the contract is explicit): the round-13 final-session A-B
    measured the dim-unroll SLOWER in every cosine shape (q282 10.4 s
    unrolled vs 5.3 s fold; q38 1.05 vs 0.6; q40 1.15 vs 0.63 at sf0.1).
    Two mechanisms: (a) the unrolled ``l2_norm`` lives in the same select
    as the ``cast(embedding)`` alias, so each of its 128 element
    references re-inlines the full-array cast (258 copies in q282's
    plan); (b) the per-pair unrolled dot fused into the cross-join stage
    still lost to the fold (8 s vs 5.3 s measured with norms already
    fixed). The unroll only pays on the l2 family, where the scorer
    consumes post-join/checkpointed attribute columns
    (``brute_force_topk_l2``, ``l2sq_cols`` descent sites — q239 11 s
    unrolled vs 16-24 s fold)."""
    from wetsa_cams_solrad_timeseries_spark.functions.arrays import dot_product, l2_norm

    qv = to_double_array(F.col(emb_col))
    q = queries_df.select(
        F.col(id_col).alias(query_id_col),
        qv.alias("__qv"),
        l2_norm(qv).alias("__qn"),
    )
    c = emb_df.select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("__cv"),
        l2_norm(qv).alias("__cn"),
    )
    if spread:
        c = spread_for_scoring(c)
    cos = dot_product(F.col("__qv"), F.col("__cv")) / F.nullif(
        F.col("__qn") * F.col("__cn"), F.lit(0.0)
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", F.round(cos + F.lit(1e-9), 6).alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_buckets(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Sign-random-projection bucket keys: one row per (vector, band);
    bucket = band index + the band's sign bits. Pure array expressions;
    the hyperplanes are broadcast as literals (16 × 64 doubles)."""
    coefs = hyperplane_coefs(n_planes, dim)
    v = to_double_array(F.col(emb_col))
    bits = []
    for p in range(n_planes):
        # Interpreted fold, NOT the dim-unroll: all 16 plane dots land
        # inside the explode's array argument, which Catalyst generates
        # as ONE expression blob in the Generate stage — unrolled that is
        # 16×64 inlined multiply-adds in a single generated method, which
        # exceeds janino's 64 KB method limit, so EVERY execution paid a
        # doomed whole-stage-codegen compile attempt and then ran the
        # giant tree interpreted anyway (measured: q39 1.3→10 s,
        # q73 1.5→13 s, q219 2.3→10 s at sf0.1; "Code grows beyond
        # 64 KB" in the logs). The site is also row-LINEAR (one hash
        # pass per vector, not per candidate pair), which is exactly
        # where the round-13 A-B measurement says the fold is the right
        # spelling.
        plane = F.array(*[F.lit(c) for c in coefs[p]])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    per_band = n_planes // bands
    band_keys = [
        F.concat(F.lit(f"{b}:"), *bits[b * per_band : (b + 1) * per_band])
        for b in range(bands)
    ]
    return emb_df.select(
        F.col(id_col),
        F.explode(F.array(*band_keys)).alias("bucket"),
    )


def ann_topk_lsh(
    emb_df: DataFrame,
    query_ids_pred,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 3,
    n_planes: int = 16,
    bands: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates are bucket-mates of the query under
    SRP-LSH, then exact-scored and ranked. ``query_ids_pred`` is a Column
    predicate selecting the query subset (e.g. ``F.col('vec_id') < 50``)."""
    buckets = hyperplane_buckets(emb_df, id_col, emb_col, n_planes, bands, dim)
    qb = buckets.filter(query_ids_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "bucket"
    )
    cand = (
        qb.join(buckets.withColumnRenamed(id_col, "neighbor_id"), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_cosine_rank(emb_df, cand, query_ids_pred, id_col, emb_col, k)


def _exact_cosine_rank(
    emb_df: DataFrame,
    cand: DataFrame,
    query_ids_pred,
    id_col: str,
    emb_col: str,
    k: int,
) -> DataFrame:
    """Exact-cosine scoring + per-query top-k over a candidate-pair frame
    — the verify tail shared by the SRP-LSH probers (single-probe
    ``ann_topk_lsh`` and multiprobe ``ann_topk_lsh_multiprobe``), so the
    two probers differ ONLY in candidate generation. No ``dim``: the
    cosine kernels always fold (see ``brute_force_topk`` — the unroll
    measured slower in every cosine shape, and this tail is
    candidate-BOUNDED besides)."""
    from wetsa_cams_solrad_timeseries_spark.functions.arrays import dot_product, l2_norm

    vd = to_double_array(F.col(emb_col))
    vecs = emb_df.select(F.col(id_col), vd.alias("__v"), l2_norm(vd).alias("__n"))
    cos = dot_product(F.col("__qv"), F.col("__cv")) / F.nullif(
        F.col("__qn") * F.col("__cn"), F.lit(0.0)
    )
    scored = (
        cand.join(
            # Broadcast ONLY the query subset — broadcasting the whole
            # corpus here would collect every vector to the driver and
            # scale with the corpus, not the query set (the join on
            # query_id can only ever match predicate-selected ids, so
            # pre-filtering is result-neutral).
            F.broadcast(
                vecs.filter(query_ids_pred(F.col(id_col))).select(
                    F.col(id_col).alias("query_id"),
                    F.col("__v").alias("__qv"),
                    F.col("__n").alias("__qn"),
                )
            ),
            on="query_id",
        )
        .join(
            vecs.select(
                F.col(id_col).alias("neighbor_id"),
                F.col("__v").alias("__cv"),
                F.col("__n").alias("__cn"),
            ),
            on="neighbor_id",
        )
        .select("query_id", "neighbor_id", F.round(cos + F.lit(1e-9), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k)


def multiprobe_query_buckets(
    q_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Multiprobe SRP-LSH probe keys (Lv et al., VLDB 2007): per band,
    the query's own bucket PLUS every Hamming-distance-1 perturbation —
    a vector whose band signature disagrees with the query's on exactly
    one plane is the single most likely place a missed near neighbor
    sits (each extra disagreeing plane multiplies the miss probability
    by θ/π < 1), so probing the 1-flip buckets buys recall WITHOUT more
    tables or bands: probe volume per query is (1 + bits/band) × bands
    keys, corpus memory unchanged. Bits are the same sign expressions
    ``hyperplane_buckets`` emits, so a query's unflipped keys are
    byte-identical to its single-probe keys (the superset property
    tests/test_serving_sla.py relies on). Runs only over the bounded
    query side."""
    coefs = hyperplane_coefs(n_planes, dim)
    v = to_double_array(F.col(emb_col))
    # Each plane's hyperplane dot product is evaluated ONCE per row, in
    # its own projection; the key-building select below references the
    # materialized bit columns. CollapseProject keeps the barrier because
    # the aggregate-fold expressions are non-cheap and multiply
    # referenced — previously the flipped bits re-evaluated all 16 dots a
    # second time (32 fold subtrees per row) for what is just a negated
    # sign test (round-10 ADVICE).
    sel = [F.col(id_col)]
    for p in range(n_planes):
        # Same interpreted-fold plane dot as ``hyperplane_buckets`` (and
        # for the same reason: whole-stage codegen fuses this Project
        # with the key explode + bucket join + candidate distinct into
        # one stage, and 16 unrolled 64-term dots inlined there push the
        # fused aggregate method past janino's 64 KB limit — q219's
        # stage 5 failed to compile and ran interpreted after a doomed
        # compile attempt per execution. The site is also query-side
        # BOUNDED, where the round-13 A-B measurement keeps the fold.)
        plane = F.array(*[F.lit(c) for c in coefs[p]])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        sel.append(
            F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")).alias(f"__b{p}")
        )
    base = q_df.select(*sel)
    bits = [F.col(f"__b{p}") for p in range(n_planes)]
    flipped = [
        F.when(F.col(f"__b{p}") == "1", F.lit("0")).otherwise(F.lit("1"))
        for p in range(n_planes)
    ]
    per_band = n_planes // bands
    keys = []
    for b in range(bands):
        seg = bits[b * per_band : (b + 1) * per_band]
        keys.append(F.concat(F.lit(f"{b}:"), *seg))
        for j in range(per_band):
            probe = list(seg)
            probe[j] = flipped[b * per_band + j]
            keys.append(F.concat(F.lit(f"{b}:"), *probe))
    return base.select(
        F.col(id_col), F.explode(F.array(*keys)).alias("bucket")
    )


def ann_topk_lsh_multiprobe(
    emb_df: DataFrame,
    query_ids_pred,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 3,
    n_planes: int = 16,
    bands: int = 2,
    dim: int = 64,
) -> DataFrame:
    """:func:`ann_topk_lsh` with multiprobe candidate generation: the
    CORPUS is hashed exactly once into exactly the same buckets (no
    index change), only the query side fans out to its 1-flip probe
    keys. Candidate volume rises by at most the probe count factor;
    the exact-verify tail is shared verbatim with the single prober."""
    buckets = hyperplane_buckets(emb_df, id_col, emb_col, n_planes, bands, dim)
    qb = multiprobe_query_buckets(
        emb_df.filter(query_ids_pred(F.col(id_col))),
        id_col, emb_col, n_planes, bands, dim,
    ).select(F.col(id_col).alias("query_id"), "bucket")
    cand = (
        qb.join(buckets.withColumnRenamed(id_col, "neighbor_id"), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_cosine_rank(emb_df, cand, query_ids_pred, id_col, emb_col, k)


def brute_force_topk_l2(
    emb_df: DataFrame,
    queries_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    dim: int | None = None,
    spread: bool = False,
) -> DataFrame:
    """Exact squared-L2 top-k — :func:`brute_force_topk`'s metric twin
    for the PQ family, whose ADC approximates SQUARED L2 (not cosine):
    the honest baseline for a PQ/IVF-PQ recall gate must rank by the
    same metric the index approximates. Same plan shape: queries
    broadcast, corpus streamed, per-query partial top-k; distances
    round6 before ranking with the (dist asc, neighbor_id) tie-break
    the ADC rankers use. ``dim`` selects the unrolled codegen distance
    (see :func:`l2sq_cols`); ``spread`` opts the corpus projection into
    :func:`spread_for_scoring` for compute-bound |Q| x |corpus| sites."""
    qv = to_double_array(F.col(emb_col))
    q = queries_df.select(
        F.col(id_col).alias(query_id_col), qv.alias("__qv")
    )
    c = emb_df.select(F.col(id_col).alias("neighbor_id"), qv.alias("__cv"))
    if spread:
        c = spread_for_scoring(c)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            l2sq_cols(F.col("__qv"), F.col("__cv"), dim).alias("dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def ivf_assign(
    emb_df: DataFrame,
    centroids,  # list[list[float]] — normalized centroid matrix
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids (max
    cosine) — the IVF coarse quantizer (n_probe=1) and query-side cell
    prober (n_probe>1) in one kernel.

    Implementation note: a literal-expression argmax over k centroids
    builds O(k·dim) Catalyst trees per reference (measured: minutes of
    analysis time at k=16, dim=64), so this is a numpy mapInPandas kernel
    with the centroid matrix in the closure — one BLAS matmul per Arrow
    batch, no shuffle, the same pattern as the blocked similarity ops.
    Output: one row per (vector, probed cell), ``probe_rank`` 0-based.

    The similarity matrix round6s BEFORE the argmax (the repo's
    cross-engine resync): the oracles replay this assignment with DuckDB
    list-fold cosines, and near a centroid tie a ULP flip in the
    unrounded BLAS-vs-fold comparison would silently change cell
    membership (and with it the whole probed row set). Rounding both
    engines to the same nudged 1e-6 grid makes the argmax ordering —
    including its (sim, cell) tie-break — identical by construction.
    """
    import numpy as np
    import pandas as pd

    cent = np.array(centroids, dtype=np.float64)
    probe = n_probe

    def kernel(batches):
        for pdf in batches:
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = np.round((mat / norms) @ cent.T + 1e-9, 6)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :probe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), probe),
                    "cell": order.ravel().astype("int32"),
                    "probe_rank": np.tile(np.arange(probe, dtype="int32"), n),
                }
            )

    return emb_df.mapInPandas(
        kernel, schema=f"{id_col} long, cell int, probe_rank int"
    )


def hash_bounded_sample(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_train: int = 65536,
):
    """Deterministic bounded training sample, shared by ALL index
    trainers (IVF + PQ): min-``max_train`` by the portable hash32 of the
    id — a uniform pseudo-random subset with a hard row bound (never
    corpus-sized) — then id order so seeding is stable. Every engine and
    every rerun selects the same rows regardless of corpus size or
    partitioning; the oracle replays the identical selection in Python
    via hash32_py. Returns the sample as an id-ordered float64 matrix."""
    import numpy as np

    from wetsa_cams_solrad_timeseries_spark.functions.hashing import hash32

    rows = (
        emb_df.select(id_col, to_double_array(F.col(emb_col)).alias("v"))
        .withColumn("__hk", hash32(F.col(id_col).cast("string")))
        .orderBy("__hk", id_col)
        .limit(max_train)
        .drop("__hk")
        .orderBy(id_col)
        .toPandas()
    )
    return np.array(list(rows["v"]), dtype=np.float64)


def hash_bounded_sample_py(ids, mat, max_train: int = 65536):
    """Python/numpy twin of :func:`hash_bounded_sample` for oracle
    replays: given id-ordered ids + matrix (e.g. read via DuckDB), apply
    the SAME hash32 min-k cap + id reorder. Bit-identical row selection
    to the Spark side for any corpus size."""
    import numpy as np

    from wetsa_cams_solrad_timeseries_spark.functions.hashing import hash32_py

    if len(ids) <= max_train:
        return mat
    order = sorted(range(len(ids)), key=lambda i: (hash32_py(str(ids[i])), ids[i]))
    keep = sorted(order[:max_train])
    return mat[np.array(keep)]


def ivf_train_centroids(
    emb_df: DataFrame,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_train: int = 65536,
):
    """Deterministic IVF training: seeds = the k lowest-id vectors, then
    ``n_iter`` Lloyd iterations on normalized vectors (spherical k-means).

    Index TRAINING always runs on a bounded sample (even FAISS trains IVF
    on ~1% of vectors) — see :func:`hash_bounded_sample`. ASSIGNMENT (the
    data-sized pass) stays distributed (``ivf_assign``)."""
    import numpy as np

    mat = hash_bounded_sample(emb_df, id_col, emb_col, max_train)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0  # zero vectors stay zero instead of NaN-poisoning
    mat /= norms
    cent = mat[:k].copy()
    for _ in range(n_iter):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cent[c] = m / norm
    return [[float(x) for x in row] for row in cent]


def ivf_train_centroids_mllib(
    emb_df: DataFrame,
    k: int = 16,
    n_iter: int = 20,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 7,
):
    """Fully distributed IVF training via MLlib KMeans — the cluster-scale
    alternative to the driver-side spherical k-means
    (``ivf_train_centroids``): training itself shuffles nothing to the
    driver beyond k centroids. Vectors are L2-normalized first so
    Euclidean k-means approximates spherical k-means (on the unit sphere,
    ‖a−b‖² = 2−2cos); centroids are re-normalized on return so
    ``ivf_assign``'s max-cosine probe applies unchanged."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    norm = F.sqrt(
        F.aggregate(
            to_double_array(F.col(emb_col)),
            F.lit(0.0),
            lambda a, x: a + x * x,
        )
    )
    unit = F.transform(
        to_double_array(F.col(emb_col)), lambda x: x / F.nullif(norm, F.lit(0.0))
    )
    feats = emb_df.select(array_to_vector(unit).alias("features")).na.drop()
    model = KMeans(k=k, maxIter=n_iter, seed=seed).fit(feats)
    out = []
    for c in model.clusterCenters():
        import math

        n = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        out.append([float(x) / n for x in c])
    return out


def ann_topk_ivf(
    emb_df: DataFrame,
    query_ids_pred,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    candidate_pred=None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into ``n_cells``
    inverted lists, probe each query's ``n_probe`` nearest cells, exact-
    score only those candidates. Candidate volume ≈ corpus × n_probe /
    n_cells; the candidate join is an equi-join on the cell id — the
    second of the two standard ANN scale paths next to SRP-LSH
    (``ann_topk_lsh``).

    ``candidate_pred`` (a Column predicate over ``emb_df``'s columns)
    restricts the inverted lists — FILTERED ANN in its PRE-filter form:
    the predicate applies before cell assignment, so it pushes down into
    the corpus scan (at scale: partition/stats pruning on the metadata
    column) and every probed candidate already satisfies it. The
    quantizer still trains on the FULL corpus (the filter changes per
    query family; the index is shared). The alternative — post-filtering
    an unfiltered top-k — silently returns < k rows whenever the filter
    is selective; this form keeps k results at the same probe budget."""
    from wetsa_cams_solrad_timeseries_spark.functions.arrays import dot_product, l2_norm

    centroids = ivf_train_centroids(emb_df, k=n_cells)
    # Inverted lists: every (qualifying) corpus vector in its 1 nearest
    # cell — the candidate filter prunes BEFORE assignment.
    list_src = (
        emb_df.filter(candidate_pred) if candidate_pred is not None else emb_df
    )
    assigned = ivf_assign(list_src, centroids, id_col, emb_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"), "cell"
    )
    # Query side: probe the n_probe nearest cells.
    q_src = emb_df.filter(query_ids_pred(F.col(id_col)))
    probes = ivf_assign(q_src, centroids, id_col, emb_col, n_probe=n_probe).select(
        F.col(id_col).alias("query_id"), "cell"
    )

    v = to_double_array(F.col(emb_col))
    vecs = emb_df.select(
        F.col(id_col), v.alias("__v"), l2_norm(v).alias("__n")
    )
    cand = (
        probes.join(assigned, on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
        .join(
            # Query-subset broadcast only (see ann_topk_lsh) — never the
            # full corpus vector table.
            F.broadcast(
                vecs.filter(query_ids_pred(F.col(id_col))).select(
                    F.col(id_col).alias("query_id"),
                    F.col("__v").alias("__qv"),
                    F.col("__n").alias("__qn"),
                )
            ),
            on="query_id",
        )
        .join(
            vecs.select(
                F.col(id_col).alias("neighbor_id"),
                F.col("__v").alias("__cv"),
                F.col("__n").alias("__cn"),
            ),
            on="neighbor_id",
        )
    )
    cos = dot_product(F.col("__qv"), F.col("__cv")) / F.nullif(
        F.col("__qn") * F.col("__cn"), F.lit(0.0)
    )
    # No second distinct: cand is already distinct on (query_id,
    # neighbor_id) and both vector joins are 1:1 on the id, so a
    # re-dedup would only add a full extra shuffle of the scored set.
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cos + F.lit(1e-9), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(F.col("rank") <= k)


def neardup_pairs(
    emb_df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold with id_a < id_b (embedding near-dup
    detection). Quadratic verification stage — at 100 TB feed it LSH
    candidates (``hyperplane_buckets`` self-join) instead of the raw
    cross join used here for exactness.

    Norms are precomputed per ROW (not per pair): one fold per vector +
    one fold per pair, a 3× saving over the naive cosine — same formula
    ``dot / (‖a‖·‖b‖)`` as the oracle, identical sequential folds.
    No ``dim``: the cosine kernels always fold (see
    ``brute_force_topk`` — the unroll measured slower in every cosine
    shape, q40 1.15→0.63 s on the revert)."""
    from wetsa_cams_solrad_timeseries_spark.functions.arrays import dot_product, l2_norm

    vd = to_double_array(F.col(emb_col))
    v = emb_df.select(
        F.col(id_col), vd.alias("__v"), l2_norm(vd).alias("__n")
    )
    a = v.select(F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb"))
    cos = dot_product(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos + F.lit(1e-9), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def neardup_pairs_lsh(
    emb_df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup via SRP-LSH prefilter: candidates are bucket
    mates only (corpus-linear), then exact cosine ≥ threshold on the
    candidate set — the sparse-similarity scale path next to the exact
    block-pair kernel (``neardup_pairs_blocked``); same composition as
    MinHash→Jaccard (q62). Approximate by construction: pairs whose sign
    bits differ in every band are never scored (recall is tuned by
    bands × bits — see ``dedup.lsh_br_sweep`` for the same analysis)."""
    from wetsa_cams_solrad_timeseries_spark.functions.arrays import dot_product, l2_norm

    buckets = hyperplane_buckets(emb_df, id_col, emb_col, n_planes, bands, dim)
    cand = (
        buckets.select(F.col(id_col).alias("id_a"), "bucket")
        .join(buckets.select(F.col(id_col).alias("id_b"), "bucket"), on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Fold spelling throughout the cosine verify (``dim`` kept only for
    # the SRP key derivation above) — see ``brute_force_topk``.
    vd = to_double_array(F.col(emb_col))
    vecs = emb_df.select(F.col(id_col), vd.alias("__v"), l2_norm(vd).alias("__n"))
    cos = dot_product(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        cand.join(
            vecs.select(
                F.col(id_col).alias("id_a"),
                F.col("__v").alias("__va"),
                F.col("__n").alias("__na"),
            ),
            on="id_a",
        )
        .join(
            vecs.select(
                F.col(id_col).alias("id_b"),
                F.col("__v").alias("__vb"),
                F.col("__n").alias("__nb"),
            ),
            on="id_b",
        )
        .select("id_a", "id_b", F.round(cos + F.lit(1e-9), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def neardup_pairs_blocked(
    emb_df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Blocked-matrix all-pairs cosine: the corpus shards into ``n_blocks``
    row blocks (block = id mod n_blocks) and every unordered block pair is
    routed to one applyInPandas task that runs a single BLAS matmul — the
    block nested-loop form of matrix × matrixᵀ (operators/blocked.py).

    Nothing is collected to or broadcast from the driver: the only wide op
    is the (n_blocks + 1)× row replication shuffle, linear in corpus size;
    n_blocks grows with the corpus so two blocks always fit one task.
    Values are rounded to 6 digits, so the float-summation-order
    difference vs the oracle's sequential fold (≲1e-13 relative) cannot
    flip the comparison."""
    import numpy as np
    import pandas as pd

    from wetsa_cams_solrad_timeseries_spark.operators.blocked import (
        pair_masks,
        tag_block_pairs,
    )

    src = emb_df.select(
        F.col(id_col),
        to_double_array(F.col(emb_col)).alias("v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("__blk"),
    )
    tagged = tag_block_pairs(src, "__blk", n_blocks)

    def kernel(key, pdf):
        ba, bb = int(key[0]), int(key[1])
        a_pdf = pdf[pdf["side"] == 0]
        b_pdf = pdf[pdf["side"] == 1]
        if a_pdf.empty or b_pdf.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "cosine": np.float64}
            )
        a_ids = a_pdf[id_col].to_numpy(dtype=np.int64)
        b_ids = b_pdf[id_col].to_numpy(dtype=np.int64)
        a_mat = np.array(list(a_pdf["v"]), dtype=np.float64)
        b_mat = np.array(list(b_pdf["v"]), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
            b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
            sims = np.round(a_mat @ b_mat.T + 1e-9, 6)
        hits = sims >= threshold
        id_a, id_b, ai, bi = pair_masks(a_ids, b_ids, hits, diagonal=ba == bb)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": sims[ai, bi]})

    return tagged.groupBy("ba", "bb").applyInPandas(
        kernel, schema="id_a long, id_b long, cosine double"
    )


# --------------------------------------------------------------------------
# Product quantization (PQ): compressed codes + asymmetric distance (ADC)
# --------------------------------------------------------------------------


def pq_train_codebooks(
    emb_df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    max_train: int = 65536,
):
    """Deterministic PQ training: split each vector into ``m`` contiguous
    subvectors of ``dim/m`` dims; per subspace run EUCLIDEAN k-means
    (seeds = the subvectors of the first ``ksub`` sample rows, then
    ``n_iter`` Lloyd iterations). Classic PQ (Jégou et al., TPAMI 2011)
    trains on raw (unnormalized) vectors with L2 distance — kept here so
    ADC approximates true squared-L2.

    Sampling is :func:`hash_bounded_sample` (the shared trainer
    discipline); the Lloyd loop is :func:`pq_lloyd` — ONE numpy core
    that both this trainer and the q195 oracle replay call, so the two
    can never drift.

    Returns ``codebooks[m][ksub][dim/m]`` floats."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible into m={m} subspaces")
    mat = hash_bounded_sample(emb_df, id_col, emb_col, max_train)
    return pq_lloyd(mat, m=m, ksub=ksub, n_iter=n_iter)


def pq_lloyd(mat, m: int, ksub: int, n_iter: int):
    """The PQ k-means core on an id-ordered sample matrix — shared
    verbatim by the Spark-side trainer and the oracle's numpy replay
    (same input matrix ⇒ bit-identical codebooks). Seeds = the first
    ``ksub`` rows' subvectors; per iteration, assignment = argmin exact
    squared L2 (ties → lower code: np.argmin picks the first minimum),
    empty clusters keep their previous centroid."""
    import numpy as np

    dsub = mat.shape[1] // m
    books = []
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        cent = sub[:ksub].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append([[float(x) for x in row] for row in cent])
    return books


def _pq_subdist_matrix(mat, cent):
    """round6(squared L2) from every row of an (n, dsub) matrix to every
    centroid of a (ksub, dsub) codebook — the kernel-side twin of the
    DuckDB oracle's per-element fold.

    Cross-engine parity argument (measured, not assumed): NO numpy
    spelling reproduces DuckDB's ``list_sum`` bit-for-bit — a tensor
    ``.sum(axis=2)`` uses pairwise summation (matches duck on only ~28%
    of random 64-dim entries, max |Δ| 1.4e-13), so the reduction here is
    an explicit SEQUENTIAL fold in element order, the closest alignment
    available (~76% exact, max |Δ| 5.7e-14 on the same trial). The
    residual ULP noise is defended the same way as every float compare
    in this repo: the +1e-9 nudge relocates the round-to-6 tie set away
    from data-producible values, so a digit flip needs the true value
    within ~1e-13 of the SHIFTED boundary — and an argmin/rank flip
    additionally needs a competitor within one 1e-6 grid step of the
    flipped value. Incidence observed across the 197-query gates at
    three SFs: zero."""
    import numpy as np

    d2 = np.zeros((mat.shape[0], cent.shape[0]))
    for i in range(mat.shape[1]):
        d2 += (mat[:, None, i] - cent[None, :, i]) ** 2
    return np.round(d2 + 1e-9, 6)


def pq_encode(
    emb_df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Distributed PQ encoding → LONG form ``(id, sub, code)``: for each
    subspace, code = argmin over the codebook of round6(squared L2),
    ties to the lower code (np.argmin = first minimum ≡ the oracle's
    row_number ORDER BY d, code). Arrow-batched numpy kernel, the
    ivf_assign discipline — the codebooks ride in the closure (~8 KB).

    Why a kernel and not codegen: the expression-tree spelling (m·ksub
    = 128 fold subtrees per row) costs ~6 s of Janino compilation PER
    ACTION at any data size (measured at sf0.1 — compile time, not
    compute); the kernel is one vectorized distance tensor per batch.
    Output is m rows per vector whose payload is one small int — the
    16× compression that lets a 100 TB corpus's index live in RAM."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cents = [np.array(b, dtype=np.float64) for b in codebooks]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            for s in range(m):
                d2 = _pq_subdist_matrix(mat[:, s * dsub : (s + 1) * dsub], cents[s])
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "sub": np.full(len(ids), s, dtype=np.int32),
                        "code": np.argmin(d2, axis=1).astype(np.int32),
                    }
                )

    src = emb_df.select(id_col, to_double_array(F.col(emb_col)).alias(emb_col))
    return src.mapInPandas(kernel, schema=f"{id_col} long, sub int, code int")


def pq_query_luts(
    q_df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-query ADC lookup tables → ``(query_id, sub, code, d)``:
    d = round6 squared-L2 from the query's RAW subvector to each
    centroid. Same kernel math as ``pq_encode`` (shared
    ``_pq_subdist_matrix``); runs only over the (bounded) query set."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    ksub = len(codebooks[0])
    cents = [np.array(b, dtype=np.float64) for b in codebooks]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            for s in range(m):
                d2 = _pq_subdist_matrix(mat[:, s * dsub : (s + 1) * dsub], cents[s])
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(ids, ksub),
                        "sub": np.full(len(ids) * ksub, s, dtype=np.int32),
                        "code": np.tile(
                            np.arange(ksub, dtype=np.int32), len(ids)
                        ),
                        "d": d2.ravel(),
                    }
                )

    src = q_df.select(id_col, to_double_array(F.col(emb_col)).alias(emb_col))
    return src.mapInPandas(
        kernel, schema="query_id long, sub int, code int, d double"
    )


def ann_topk_pq(
    emb_df: DataFrame,
    query_ids_pred,
    k: int = 3,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """PQ + asymmetric distance (ADC) top-k: corpus vectors live as m
    small-int codes; each query builds a lookup table LUT[sub][code] =
    round6 squared-L2 from its RAW subvector to that centroid, and the
    approximate distance to any corpus vector is the SUM of m LUT
    entries selected by the vector's codes — 8 adds per candidate
    instead of 64 multiplies, over 8 logical bytes instead of 256.

    Plan shape: the data-sized side is the code table (m rows/vector);
    the LUT (queries × m × ksub rows — bounded by the query set) joins
    in as a BROADCAST on (sub, code); one groupBy (query, neighbor)
    sums the m entries. No corpus broadcast, no pairwise vector math.
    At 100 TB the code table is also the PERSISTED index (write it
    bucketed like q193's band rows); re-encoding never re-touches raw
    vectors."""
    codebooks = pq_train_codebooks(
        emb_df, m=m, ksub=ksub, id_col=id_col, emb_col=emb_col, dim=dim
    )
    codes = pq_encode(emb_df, codebooks, id_col, emb_col).select(
        F.col(id_col).alias("neighbor_id"), "sub", "code"
    )
    q_src = emb_df.filter(query_ids_pred(F.col(id_col)))
    luts = pq_query_luts(q_src, codebooks, id_col, emb_col)
    return adc_topk(codes, luts, k)


def adc_topk(codes: DataFrame, luts: DataFrame, k: int) -> DataFrame:
    """ADC search over an ALREADY-ENCODED code table — the stage shared
    by q195 (encode-inline) and q197 (persisted incremental index):
    code table ⋈ BROADCAST LUT on (sub, code), one (query, neighbor)
    groupBy summing the m entries, per-query rank window. ``codes`` has
    columns (neighbor_id, sub, code); ``luts`` has
    (query_id, sub, code, d)."""
    adc = (
        codes.join(F.broadcast(luts), on=["sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("d") + F.lit(1e-9), 6).alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id"))
    return adc.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def ivfpq_train(mat, cells: int, m: int, ksub: int, n_iter: int = 2):
    """IVF-PQ training core (Jégou et al.'s IVFADC), shared verbatim by
    the Spark trainer and the oracle replay (same sample matrix ⇒
    bit-identical artifacts): the coarse quantizer is plain L2 k-means
    over the FULL vector — exactly ``pq_lloyd`` with one subspace — and
    the product codebooks are trained on the RESIDUALS v − c[assign(v)]
    of the same sample. Returns ``(coarse[cells][dim],
    books[m][ksub][dim/m])``."""
    import numpy as np

    coarse = pq_lloyd(mat, m=1, ksub=cells, n_iter=n_iter)[0]
    ca = np.array(coarse, dtype=np.float64)
    assign = np.argmin(_pq_subdist_matrix(mat, ca), axis=1)
    books = pq_lloyd(mat - ca[assign], m=m, ksub=ksub, n_iter=n_iter)
    return coarse, books


def ivfpq_encode(
    emb_df: DataFrame,
    coarse,
    books,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Distributed IVF-PQ encoding → ``(id, cell, sub, code)``: coarse
    cell = argmin round6 squared-L2 over the coarse centroids (ties →
    lower cell, matching the oracle's row_number), then PQ codes of the
    RESIDUAL v − c[cell]. One Arrow kernel pass; both codebooks ride in
    the closure (~40 KB)."""
    import numpy as np
    import pandas as pd

    m = len(books)
    dsub = len(books[0][0])
    ca = np.array(coarse, dtype=np.float64)
    cents = [np.array(b, dtype=np.float64) for b in books]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            cell = np.argmin(_pq_subdist_matrix(mat, ca), axis=1)
            resid = mat - ca[cell]
            for s in range(m):
                d2 = _pq_subdist_matrix(
                    resid[:, s * dsub : (s + 1) * dsub], cents[s]
                )
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "cell": cell.astype(np.int32),
                        "sub": np.full(len(ids), s, dtype=np.int32),
                        "code": np.argmin(d2, axis=1).astype(np.int32),
                    }
                )

    src = emb_df.select(id_col, to_double_array(F.col(emb_col)).alias(emb_col))
    return src.mapInPandas(
        kernel, schema=f"{id_col} long, cell int, sub int, code int"
    )


def ivfpq_query_luts(
    q_df: DataFrame,
    coarse,
    books,
    n_probe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-query IVF-PQ ADC lookup tables → ``(query_id, cell, sub,
    code, d)``: for each of the query's ``n_probe`` nearest coarse cells
    (round6 distance, (d, cell) tie order — the oracle's row_number),
    d = round6 squared-L2 from the query's residual IN THAT CELL to each
    product centroid. Runs only over the (bounded) query set; the LUT
    row count is queries × n_probe × m × ksub."""
    import numpy as np
    import pandas as pd

    m = len(books)
    dsub = len(books[0][0])
    ksub = len(books[0])
    ca = np.array(coarse, dtype=np.float64)
    cents = [np.array(b, dtype=np.float64) for b in books]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            dc = _pq_subdist_matrix(mat, ca)
            # stable (d asc, cell asc) order — np.lexsort's last key is
            # primary, ties broken by the cell index key before it
            # (tests/test_pq.py::test_ivfpq_probe_tie_breaks_to_lower_cell).
            order = np.lexsort(
                (np.broadcast_to(np.arange(dc.shape[1]), dc.shape), dc),
                axis=1,
            )[:, :n_probe]
            # Flatten the (query, probed cell) pairs and run each
            # subspace as ONE batched distance tensor — the same
            # np.repeat/np.tile assembly as pq_query_luts.
            qidx = np.repeat(np.arange(len(ids)), n_probe)
            cells = order.ravel()
            resid = mat[qidx] - ca[cells]
            n_pairs = len(qidx)
            for s in range(m):
                d2 = _pq_subdist_matrix(
                    resid[:, s * dsub : (s + 1) * dsub], cents[s]
                )
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(ids[qidx], ksub),
                        "cell": np.repeat(cells.astype(np.int32), ksub),
                        "sub": np.full(n_pairs * ksub, s, dtype=np.int32),
                        "code": np.tile(
                            np.arange(ksub, dtype=np.int32), n_pairs
                        ),
                        "d": d2.ravel(),
                    }
                )

    src = q_df.select(id_col, to_double_array(F.col(emb_col)).alias(emb_col))
    return src.mapInPandas(
        kernel,
        schema="query_id long, cell int, sub int, code int, d double",
    )


def _pq_reconstruct(rot, books):
    """Decode-of-encode under the given codebooks: each subvector is
    replaced by its nearest centroid — the X̂ of OPQ's alternating
    minimization. Pure numpy, shared by trainer and oracle replay."""
    import numpy as np

    m = len(books)
    dsub = len(books[0][0])
    out = np.empty_like(rot)
    for s in range(m):
        sub = rot[:, s * dsub : (s + 1) * dsub]
        cent = np.array(books[s], dtype=np.float64)
        d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        out[:, s * dsub : (s + 1) * dsub] = cent[np.argmin(d2, axis=1)]
    return out


def opq_core(mat, m: int, ksub: int, n_iter: int = 2, n_opq_iter: int = 3):
    """OPQ training core (Ge et al., CVPR 2013 — the non-parametric
    alternating solver): learn an ORTHOGONAL rotation R that aligns the
    data with the product-quantizer's axis-aligned subspace grid before
    encoding, shrinking quantization error that plain PQ pays when
    variance straddles subspace boundaries. R₀ = I; each round trains
    codebooks on the rotated sample (the shared :func:`pq_lloyd` core),
    reconstructs X̂, and solves the orthogonal Procrustes problem
    min_R ‖X·R − X̂‖_F via SVD(Xᵀ·X̂) → R = U·Vᵀ; a final codebook
    retrain lands on the final R. Deterministic for a fixed sample
    matrix (numpy SVD on identical input), so the oracle replay — which
    calls THIS function on THE SAME hash-bounded sample — reproduces
    both artifacts bit-for-bit. Returns ``(R[dim][dim], books)``."""
    import numpy as np

    R = np.eye(mat.shape[1], dtype=np.float64)
    for _ in range(n_opq_iter):
        rot = mat @ R
        books = pq_lloyd(rot, m=m, ksub=ksub, n_iter=n_iter)
        xhat = _pq_reconstruct(rot, books)
        u, _, vt = np.linalg.svd(mat.T @ xhat)
        R = u @ vt
    books = pq_lloyd(mat @ R, m=m, ksub=ksub, n_iter=n_iter)
    return [[float(x) for x in row] for row in R], books


def opq_train(
    emb_df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    max_train: int = 65536,
):
    """OPQ trainer on the shared hash-bounded sample (the q56/q195
    discipline: every index trainer sees the same deterministic,
    size-capped subset, and the oracle replays the identical selection
    Python-side)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible into m={m} subspaces")
    mat = hash_bounded_sample(emb_df, id_col, emb_col, max_train)
    return opq_core(mat, m=m, ksub=ksub)


def rotate_vectors(
    emb_df: DataFrame,
    rotation,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """round6(v @ R) as ``array<double>`` — the OPQ rotation as a
    scan-stage Arrow kernel (R rides the closure, ~32 KB at dim=64; one
    BLAS matmul per batch, no shuffle). The rotated COORDINATES are
    nudge-rounded before anything downstream compares them: the oracle
    recomputes the rotation as a per-element SQL fold, and rounding both
    engines onto the same 1e-6 grid here means every later distance /
    argmin consumes identical inputs — the ivf_assign resync applied one
    stage earlier."""
    import numpy as np
    import pandas as pd

    rmat = np.array(rotation, dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            rot = np.round(mat @ rmat + 1e-9, 6)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    emb_col: list(rot),
                }
            )

    src = emb_df.select(id_col, to_double_array(F.col(emb_col)).alias(emb_col))
    return src.mapInPandas(
        kernel, schema=f"{id_col} long, {emb_col} array<double>"
    )


def ivf_cell_ranks(
    q_df: DataFrame,
    coarse,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Full coarse-cell probe ordering per query → ``(query_id, cell,
    crank)``: every cell ranked 1..n_cells by round6 squared-L2 from the
    query, (d asc, cell asc) ties — the SAME ordering ``ivfpq_query_luts``
    truncates to ``n_probe``, materialized in full so a recall gate can
    sweep EVERY probe width from one pass (candidate recall at width p =
    fraction of true neighbors whose cell ranks ≤ p). Runs only over the
    bounded query set; output is queries × n_cells rows."""
    import numpy as np
    import pandas as pd

    ca = np.array(coarse, dtype=np.float64)
    n_cells = ca.shape[0]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            dc = _pq_subdist_matrix(mat, ca)
            order = np.lexsort(
                (np.broadcast_to(np.arange(n_cells), dc.shape), dc), axis=1
            )
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, n_cells),
                    "cell": order.ravel().astype(np.int32),
                    "crank": np.tile(
                        np.arange(1, n_cells + 1, dtype=np.int32), len(ids)
                    ),
                }
            )

    src = q_df.select(id_col, to_double_array(F.col(emb_col)).alias(emb_col))
    return src.mapInPandas(
        kernel, schema="query_id long, cell int, crank int"
    )


def pick_n_probe(cell_ranks, n_pairs: int, target: float, n_cells: int) -> int:
    """Decision rule closing the q211-style gate loop: given the coarse-
    cell rank of each true top-k neighbor's cell within its query's probe
    ordering (one entry per exact pair; ``ivf_cell_ranks`` supplies the
    ordering), return the SMALLEST probe width p whose candidate recall
    (#ranks ≤ p / n_pairs) meets ``target``. Comparison is exact rational
    arithmetic — no float-boundary flakiness between the Spark derivation
    and the oracle's numpy replay. p = n_cells always meets any target
    ≤ 1 (every cell probed ⇒ candidate recall 1)."""
    from fractions import Fraction

    t = Fraction(str(target))
    for p in range(1, n_cells + 1):
        if sum(1 for r in cell_ranks if r <= p) >= t * n_pairs:
            return p
    return n_cells


def pick_rerank_depth(adc_ranks, n_pairs: int, target: float, k: int) -> int:
    """Decision rule closing the q212-style gate loop: given the ADC rank
    (within the probed candidate set) of each true top-k neighbor that IS
    a candidate — non-candidates are simply absent; they can never be
    served — return the smallest screen depth R from the ladder k·2^j at
    which serving recall (#adc ranks ≤ R / n_pairs) meets ``target``.
    Exact rerank of the R survivors restores exact order among them, so
    a true neighbor is served iff candidate AND adc rank ≤ R — the
    measured ladder IS the serving recall curve. Caller must pick the
    probe width first (``pick_n_probe``) so that candidate recall ≥
    target; the ladder then provably terminates at R ≤ max observed
    rank."""
    from fractions import Fraction

    t = Fraction(str(target))
    if sum(1 for _ in adc_ranks) < t * n_pairs:
        raise ValueError(
            "candidate recall below target — raise n_probe before sizing "
            "the rerank depth"
        )
    r = k
    while sum(1 for a in adc_ranks if a <= r) < t * n_pairs:
        r *= 2
    return r


def l2sq_cols(a, b, dim: int | None = None):
    """Round6'd squared-L2 between two array<double> Columns — the JVM
    fold spelling every L2-family kernel and oracle replays (the fold
    vs BLAS ULP gap is absorbed by the +1e-9 nudge, the q56 argument).

    ``dim`` set = the fold unrolled to the identical left-association
    over ``a[i]``/``b[i]`` — same IEEE value, but codegen-compiled
    instead of the interpreted HOF-lambda path (guide §4: measured
    4× on the NN-descent candidate-scoring stage at sf0.1, which is
    nearly pure distance evaluation). Requires both arrays exactly
    ``dim`` long (embeddings are; projected vectors pass their own
    width)."""
    if dim is None:
        d2 = F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    else:
        d2 = F.lit(0.0)
        for i in range(dim):
            d2 = d2 + (a[i] - b[i]) * (a[i] - b[i])
    return F.round(d2 + F.lit(1e-9), 6)


def cell_cosine_sims(
    emb_df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Round6'd cosine of every vector against every centroid —
    ``ivf_assign``'s EXACT kernel arithmetic (normalize, one BLAS
    matmul per Arrow batch, round6 nudge) emitting the SIM VALUES
    instead of the argmax cell, for consumers that rank by similarity
    (medoid selection). The expression-tree spelling (16 fold subtrees
    per row over a broadcast centroid frame) measured ~5 s at sf0.1;
    one matmul per batch does the identical arithmetic in milliseconds."""
    import numpy as np
    import pandas as pd

    cent = np.array(centroids, dtype=np.float64)
    n_cells = len(cent)

    def kernel(batches):
        for pdf in batches:
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = np.round((mat / norms) @ cent.T + 1e-9, 6)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_cells),
                    "cell": np.tile(
                        np.arange(n_cells, dtype="int32"), n
                    ),
                    "sim": sims.ravel(),
                }
            )

    return emb_df.mapInPandas(
        kernel, schema=f"{id_col} long, cell int, sim double"
    )


def cell_knn_edges(
    emb_df: DataFrame,
    centroids,
    m: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Directed within-cell k-NN edges ``(src, dst)`` — each vector's m
    nearest (round6 squared-L2, (d, dst) ties) cell-mates under the IVF
    coarse partition. The graph-build compute is Σ|cell|², the SemDeDup
    bound — cell-bounded, never corpus-quadratic; production builds
    refine this with NN-descent, which only RE-WIRES edges and leaves
    the search kernel (beam over a neighbor table) unchanged.

    Kernel form: ONE applyInPandas group per cell, pairwise distances
    as one BLAS matmul (``_pq_subdist_matrix``) and the per-src top-m
    as a numpy lexsort — the q40 blocked-similarity pattern. The
    expression-tree spelling (cell self-join + 64-term fold per pair +
    corpus window) measured 6–12 s at sf0.1; the blocked kernel does
    the identical arithmetic in a few BLAS calls. round6 + (d, dst)
    lexsort keep the edge set bit-identical to the oracle's fold-based
    replay (the ivf_assign BLAS-vs-fold parity argument)."""
    import numpy as np
    import pandas as pd

    assigned = ivf_assign(emb_df, centroids, id_col, emb_col, n_probe=1)
    nodes = assigned.join(
        emb_df.select(
            F.col(id_col), to_double_array(F.col(emb_col)).alias("__v")
        ),
        on=id_col,
    ).select(F.col(id_col).alias("nid"), "cell", "__v")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["nid"].to_numpy()
        mat = np.array(list(pdf["__v"]), dtype=np.float64)
        d = _pq_subdist_matrix(mat, mat)  # round6'd squared L2
        np.fill_diagonal(d, np.inf)  # no self edges
        k = min(m, len(ids) - 1)
        if k <= 0:
            return pd.DataFrame({"src": ids[:0], "dst": ids[:0]})
        # row-wise argsort with (d, dst-id) tie order (last key primary)
        order = np.lexsort(
            (np.broadcast_to(ids, d.shape), d), axis=1
        )[:, :k]
        return pd.DataFrame(
            {
                "src": np.repeat(ids, k),
                "dst": ids[order.ravel()],
            }
        )

    return nodes.groupBy("cell").applyInPandas(kernel, schema="src long, dst long")


def cell_knn_edges_incremental(
    emb_df: DataFrame,
    new_pred,
    centroids,
    m: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    with_dist: bool = False,
) -> DataFrame:
    """Directed top-m edges for the NEW nodes only (rows satisfying
    ``new_pred``), each against ALL its cell-mates — history AND new —
    under a FROZEN coarse quantizer: the graph-INSERT kernel of the
    incremental graph-ANN lifecycle (HNSW-style insertion: a new node
    links to its nearest existing neighbors; reverse links come from the
    serve-time symmetrization, exactly as real HNSW adds bidirectional
    edges on insert).

    Cost shape: per cell ONE (|new ∩ cell| × |cell|) BLAS block — the
    insert pays |new|·|cell| distances, never the base build's Σ|cell|²;
    history-history edges are NEVER recomputed (they live in the
    persisted edge table). Same round6 + (d, dst) lexsort arithmetic as
    :func:`cell_knn_edges`, so the oracle's fold-based replay stays
    bit-identical, and a cell with every node new degrades exactly to
    the base kernel's edge set for those nodes."""
    import numpy as np
    import pandas as pd

    assigned = ivf_assign(emb_df, centroids, id_col, emb_col, n_probe=1)
    nodes = assigned.join(
        emb_df.select(
            F.col(id_col),
            new_pred.alias("__isnew"),
            to_double_array(F.col(emb_col)).alias("__v"),
        ),
        on=id_col,
    ).select(F.col(id_col).alias("nid"), "cell", "__isnew", "__v")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["nid"].to_numpy()
        isnew = pdf["__isnew"].to_numpy()
        srcs = np.where(isnew)[0]
        k = min(m, len(ids) - 1)
        if len(srcs) == 0 or k <= 0:
            out = {"src": ids[:0], "dst": ids[:0]}
            if with_dist:
                out["d"] = np.zeros(0)
            return pd.DataFrame(out)
        mat = np.array(list(pdf["__v"]), dtype=np.float64)
        d = _pq_subdist_matrix(mat[srcs], mat)  # round6'd squared L2
        d[np.arange(len(srcs)), srcs] = np.inf  # no self edges
        order = np.lexsort(
            (np.broadcast_to(ids, d.shape), d), axis=1
        )[:, :k]
        out = {
            "src": np.repeat(ids[srcs], k),
            "dst": ids[order.ravel()],
        }
        if with_dist:
            # The streaming displacement merge (q257) needs the edge
            # weights: top-m(top-m(S₁) ∪ S₂) = top-m(S₁ ∪ S₂) only
            # works when the stored list carries its (d, dst) sort key.
            out["d"] = np.take_along_axis(d, order, axis=1).ravel()
        return pd.DataFrame(out)

    schema = "src long, dst long" + (", d double" if with_dist else "")
    return nodes.groupBy("cell").applyInPandas(kernel, schema=schema)


def cell_medoids(
    emb_df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-cell medoid ``(cell, medoid)`` — the member with max cosine
    to its own centroid ((sim desc, id) ties): the graph's layer-1
    hubs. n_cells rows."""
    sims = cell_cosine_sims(emb_df, centroids, id_col, emb_col)
    assigned = ivf_assign(emb_df, centroids, id_col, emb_col, n_probe=1)
    member = sims.join(assigned, on=[id_col, "cell"])
    w = Window.partitionBy("cell").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        member.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("cell", F.col(id_col).alias("medoid"))
    )


def fused_topk_from_ranks(
    bm_ranks: dict,
    vec_ranks: dict,
    bm_depth: int,
    vec_depth: int,
    topk: int,
    rrf_k: int,
) -> list:
    """Reciprocal-rank-fusion top-k computed from two already-ranked
    candidate lists ``{doc_id: rank}`` truncated at ``(bm_depth,
    vec_depth)`` — the driver-side twin of the hybrid serve tail
    (plans/vector.py::_hybrid_fuse): a doc is a candidate iff it
    survives EITHER truncation; its score is the round6'd sum of the
    surviving 1/(rrf_k + rank) terms (ranks are small integers, so the
    IEEE-double divisions and the +1e-9 rounding are bit-identical
    across Python, the JVM, and DuckDB); ties break on doc_id. Shared
    by ``pick_hybrid_depths``, the q228 oracle twin, and the minimality
    pytest, so the decision rule and every replay fuse identically."""
    scores: dict = {}
    for d, r in bm_ranks.items():
        if r <= bm_depth:
            scores[d] = scores.get(d, 0.0) + 1.0 / (rrf_k + r)
    for d, r in vec_ranks.items():
        if r <= vec_depth:
            scores[d] = scores.get(d, 0.0) + 1.0 / (rrf_k + r)
    ranked = sorted(
        ((round(s + 1e-9, 6), d) for d, s in scores.items()),
        key=lambda t: (-t[0], t[1]),
    )
    return [d for _, d in ranked[:topk]]


def pick_hybrid_depths(
    bm_ranks: dict,
    vec_ranks: dict,
    ladder,
    target: float,
    topk: int,
    rrf_k: int,
) -> tuple[int, int]:
    """Decision rule closing the hybrid-retrieval gate loop (the q216
    discipline applied to BM25+RRF): given both FULL candidate rankings
    measured once at the ladder maximum, return the cheapest ``(bm_depth,
    vec_depth)`` ladder pair whose fused top-k recalls ≥ ``target`` of
    the truth list (the fusion at max depth on both sides). Cost order is
    total candidate volume ``bm + vec`` (what serving actually pays:
    posting rows scored + vectors compared), then the smaller max, then
    the smaller bm side — a total order, so the pick is deterministic.
    Recall comparison is exact rational arithmetic (hit and truth counts
    are integers); the fused lists themselves use the round6'd double
    scoring serving uses, so the gate measures exactly what will ship.
    The max-ladder pair always meets any target ≤ 1 (it IS the truth)."""
    from fractions import Fraction

    t = Fraction(str(target))
    dmax = max(ladder)
    truth = fused_topk_from_ranks(
        bm_ranks, vec_ranks, dmax, dmax, topk, rrf_k
    )
    tset = set(truth)
    for db, dv in sorted(
        ((db, dv) for db in ladder for dv in ladder),
        key=lambda p: (p[0] + p[1], max(p), p[0]),
    ):
        served = fused_topk_from_ranks(
            bm_ranks, vec_ranks, db, dv, topk, rrf_k
        )
        if Fraction(sum(1 for d in served if d in tset), len(truth)) >= t:
            return db, dv
    return dmax, dmax


def sq8_train(mat):
    """Scalar-quantizer training (FAISS SQ8): per-dimension ``(vmin,
    step)`` from the hash-bounded sample — code_j = clip(round((v_j −
    vmin_j) / step_j), 0, 255), reconstruction v̂_j = vmin_j + code_j ·
    step_j. Pure numpy on the shared sample matrix, called by BOTH the
    Spark query (values inlined as array literals into JVM expressions)
    and the oracle replay — bit-identical artifacts, the q56/q195
    literalization discipline. ``step`` is round6'd once here so both
    engines multiply by the exact same grid-aligned double; a zero step
    (constant dimension) encodes to code 0 and reconstructs to vmin."""
    import numpy as np

    vmin = mat.min(axis=0)
    vmax = mat.max(axis=0)
    step = np.round((vmax - vmin) / 255.0 + 1e-9, 6)
    return [float(x) for x in vmin], [float(x) for x in step]


def ivfsq_train(mat, cells: int, n_iter: int = 2):
    """IVF-SQ training core (the FAISS IVFSQ composite): coarse L2
    k-means over the full vector (pq_lloyd with one subspace — the
    ivfpq_train coarse stage, shared verbatim), then SQ8 (vmin, step)
    trained on the RESIDUALS v − c[assign(v)] of the same sample —
    residuals are smaller-normed than raw vectors, so the same 8-bit
    budget quantizes finer (the q205 argument with a scalar quantizer
    in place of product codebooks). Returns ``(coarse, vmin, step)``;
    pure numpy, called by both the Spark trainer and the oracle
    replay."""
    import numpy as np

    coarse = pq_lloyd(mat, m=1, ksub=cells, n_iter=n_iter)[0]
    ca = np.array(coarse, dtype=np.float64)
    assign = np.argmin(_pq_subdist_matrix(mat, ca), axis=1)
    vmin, step = sq8_train(mat - ca[assign])
    return coarse, vmin, step


def ivfsq_encode(
    emb_df: DataFrame,
    coarse,
    vmin,
    step,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Distributed IVF-SQ encoding → ``(id, cell, cd array<int>)``:
    coarse cell = argmin round6 squared-L2 (ties → lower cell, the
    ivfpq_encode convention), then the residual's per-dimension 8-bit
    code: clip(floor(round6((r_j − vmin_j)/step_j) + 0.5), 0, 255),
    zero-step dimensions encode 0. The scaled value round6s BEFORE the
    +0.5/floor so both engines clamp identical doubles (q220's
    discipline). One Arrow kernel pass; artifacts ride the closure."""
    import numpy as np
    import pandas as pd

    ca = np.array(coarse, dtype=np.float64)
    mn = np.array(vmin, dtype=np.float64)
    st = np.array(step, dtype=np.float64)
    safe_st = np.where(st == 0, 1.0, st)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            cell = np.argmin(_pq_subdist_matrix(mat, ca), axis=1)
            resid = mat - ca[cell]
            scaled = np.round((resid - mn) / safe_st + 1e-9, 6)
            cd = np.clip(np.floor(scaled + 0.5), 0, 255).astype(np.int32)
            cd[:, st == 0] = 0
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "cell": cell.astype(np.int32),
                    "cd": list(cd),
                }
            )

    src = emb_df.select(id_col, to_double_array(F.col(emb_col)).alias(emb_col))
    return src.mapInPandas(
        kernel, schema=f"{id_col} long, cell int, cd array<int>"
    )
