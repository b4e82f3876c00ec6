"""Scale-lever operators: scan-reduction and data-selection queries for
the 100 TB training-data pipeline.

Round-13 wave 2. Each query is a named production lever the inventory
referenced but never exercised as a first-class plan (every candidate
here was checked against the full 274-query registry for overlap first —
Z-order is q120/q185, chunking q165, A-ES weighted sampling q170,
PageRank q161/q192, so none of those recur):

- q275: bloom-filter semi-join reduction — the constant-size bitmap that
  prunes a fact scan BEFORE the join (Spark's runtime row-group bloom,
  made explicit and measurable);
- q276: MMR diversified re-ranking (Carbonell & Goldstein 1998) — the
  serving-side diversity pass over an ANN candidate list, greedy
  relevance-vs-redundancy selection unrolled as set-based plans;
- q277: grouped ROC-AUC via the rank-sum identity — the model-eval
  aggregate, computed tie-correctly in EXACT integer arithmetic up to
  one final division;
- q279: DSIR importance selection (Xie et al. 2023) — hashed-unigram
  importance weights target-vs-raw (the family member q202's docstring
  names as "one more copy of these joins"), exact-integer scoring so
  ranking is order-independent.

All determinism rules from the registry docstring apply: identical
aliases both engines, ``round6`` on float aggregates, unique tie-breaks
on every ranking, MD5-derived ``hash32`` for anything hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.functions.hashing import (
    hash32,
    hash32_sql_duckdb,
)
from wetsa_cams_solrad_timeseries_spark.plans._spec import (
    make_specs,
    maybe_broadcast,
    round6,
    round6_sql,
)


# --------------------------------------------------------------------------
# q275 — bloom-filter semi-join reduction (scan-side pruning)
# --------------------------------------------------------------------------
_BLOOM_M = 16384  # bits
_BLOOM_WORDS = _BLOOM_M // 64
_BLOOM_K = 3  # hash functions


def _bloom_pos(salt: int, key) -> F.Column:
    """Deterministic bloom bit position: hash32('<salt>:' || key) % m.

    MD5-derived so Spark, DuckDB, and Python agree bit-for-bit
    (functions/hashing.py); the salt prefix makes the K functions
    independent draws of the same primitive.
    """
    return hash32(F.concat(F.lit(f"{salt}:"), key.cast("string"))) % _BLOOM_M


def q275_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction: qualified dimension keys
    (suppliers in EUROPE) fold into a constant-size bitmap (16384 bits =
    256 longs ≈ 2 KB) that the fact scan probes BEFORE any join. This is
    the explicit form of the runtime row-group bloom pushdown
    (spark.sql.optimizer.runtime.bloomFilter): at 100 TB the dimension
    side may be millions of keys — too big to broadcast as an IN-list,
    while the bitmap stays 2 KB regardless of key count, rides into the
    scan stage, and drops non-matching rows at memory-bandwidth speed.

    Plan shape: dims resolve with broadcast joins; the bitmap is built
    with a 256-group ``bit_or`` aggregate and collected into ONE
    map-typed row (bounded by m/64, a parameter, never data); the fact
    pass is one scan-stage projection probing k=3 bit positions + one
    final aggregate. The exact-match flag (for the false-positive audit)
    joins the qualified key set via ``maybe_broadcast``.

    Output (1 row): n_fact, n_bloom_pass, n_true, fp_rate — the numbers
    that size whether the bloom pays at a given selectivity.
    """
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")

    qual = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey")
        .distinct()
    )

    positions = qual.select(
        F.explode(
            F.array(
                *[_bloom_pos(i, F.col("s_suppkey")) for i in range(_BLOOM_K)]
            )
        ).alias("p")
    ).distinct()
    words = positions.groupBy((F.col("p") / 64).cast("int").alias("w")).agg(
        F.expr("bit_or(shiftleft(1L, CAST(p % 64 AS INT)))").alias("bits")
    )
    # ≤ 256 rows by construction (m/64): parameter-bounded, not data-bounded.
    bitmap = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    )

    probed = li.select("l_suppkey").crossJoin(F.broadcast(bitmap))
    for i in range(_BLOOM_K):
        probed = probed.withColumn(
            f"p{i}", _bloom_pos(i, F.col("l_suppkey"))
        )
    bit_test = " AND ".join(
        f"(coalesce(element_at(wm, CAST(p{i} div 64 AS INT)), 0L)"
        f" & shiftleft(1L, CAST(p{i} % 64 AS INT))) != 0"
        for i in range(_BLOOM_K)
    )
    flagged = (
        probed.withColumn("bloom_pass", F.expr(bit_test))
        .join(
            maybe_broadcast(qual.withColumnRenamed("s_suppkey", "qk")),
            F.col("l_suppkey") == F.col("qk"),
            "left",
        )
        .withColumn("matched", F.col("qk").isNotNull())
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.count(F.when(F.col("bloom_pass"), 1)).alias("n_bloom_pass"),
        F.count(F.when(F.col("matched"), 1)).alias("n_true"),
        round6(
            F.count(F.when(F.col("bloom_pass") & ~F.col("matched"), 1))
            / F.nullif(
                F.count(F.when(~F.col("matched"), 1)), F.lit(0)
            )
        ).alias("fp_rate"),
    )


def _bloom_pos_sql(salt: int, key_expr: str) -> str:
    inner = f"'{salt}:' || CAST({key_expr} AS VARCHAR)"
    return f"({hash32_sql_duckdb(inner)} % {_BLOOM_M})"


Q275_ORACLE = f"""
WITH qual AS MATERIALIZED (
  SELECT DISTINCT s_suppkey
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
pos AS MATERIALIZED (
  SELECT DISTINCT p FROM (
    {" UNION ALL ".join(f"SELECT {_bloom_pos_sql(i, 's_suppkey')} AS p FROM qual" for i in range(_BLOOM_K))}
  )
),
f AS (
  SELECT l_suppkey,
         ({" AND ".join(f"{_bloom_pos_sql(i, 'l_suppkey')} IN (SELECT p FROM pos)" for i in range(_BLOOM_K))}) AS bloom_pass,
         l_suppkey IN (SELECT s_suppkey FROM qual) AS matched
  FROM lineitem
)
SELECT count(*) AS n_fact,
       count(*) FILTER (WHERE bloom_pass) AS n_bloom_pass,
       count(*) FILTER (WHERE matched) AS n_true,
       {round6_sql("count(*) FILTER (WHERE bloom_pass AND NOT matched) * 1.0 / nullif(count(*) FILTER (WHERE NOT matched), 0)")} AS fp_rate
FROM f
"""


# --------------------------------------------------------------------------
# q276 — MMR diversified re-ranking (serving-side diversity)
# --------------------------------------------------------------------------
_MMR_CAND = 12  # ANN candidate depth fed to the re-ranker
_MMR_N = 5  # diversified results served
_MMR_LAMBDA = 0.7  # relevance vs redundancy trade-off


def q276_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): the serving-side diversity pass every retrieval stack runs
    between ANN candidates and the response — greedily pick the next
    result maximizing λ·sim(query, d) − (1−λ)·max_{s∈selected}
    sim(d, s), so near-duplicate candidates don't crowd the top-k. Here:
    exact top-12 cosine candidates (q38's verified kernel) re-ranked to
    a diversified top-5 at λ=0.7 for the first 8 query vectors.

    The greedy loop is inherently sequential in the OUTPUT positions but
    set-parallel within each step, so it unrolls into N set-based plans:
    step t is one anti-join (drop already-selected), one join against
    the candidate-pair similarity table (bounded: candidates² per query,
    the standard MMR cost — depth² ≪ corpus), one max-aggregate, one
    per-query argmax window. All JVM expressions over the SAME rounded
    cosines the oracle computes; ties break on neighbor_id.

    Scale shape: the candidate list is per-query-bounded (12 rows), so
    every frame in the unroll is queries×12 — MMR cost is independent of
    corpus size by construction; at 100 TB the only big stage is the
    candidate generator (q56/q216's tuned ANN serving), which this
    composes behind.
    """
    from wetsa_cams_solrad_timeseries_spark.functions.arrays import (
        cosine_similarity,
        to_double_array,
    )
    from wetsa_cams_solrad_timeseries_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    cand = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=_MMR_CAND
    ).localCheckpoint(eager=True)

    vecs = emb.select(
        F.col("vec_id").alias("vid"),
        to_double_array(F.col("embedding")).alias("v"),
    )
    ids = cand.select("query_id", "neighbor_id")
    a, b = ids.alias("a"), ids.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.neighbor_id") != F.col("b.neighbor_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.neighbor_id").alias("d1"),
            F.col("b.neighbor_id").alias("d2"),
        )
        .join(vecs.withColumnRenamed("vid", "d1").withColumnRenamed("v", "v1"), "d1")
        .join(vecs.withColumnRenamed("vid", "d2").withColumnRenamed("v", "v2"), "d2")
        .select(
            "query_id",
            "d1",
            "d2",
            F.round(
                cosine_similarity(F.col("v1"), F.col("v2")) + F.lit(1e-9), 6
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    sel = (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "query_id",
            "neighbor_id",
            F.lit(1).cast("int").alias("pos"),
            (F.lit(_MMR_LAMBDA) * F.col("cosine")).alias("mmr_score"),
        )
    )
    for t in range(2, _MMR_N + 1):
        rem = cand.join(
            sel.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        scored = (
            rem.join(
                pair,
                (rem.query_id == pair.query_id)
                & (rem.neighbor_id == pair.d1),
            )
            .join(
                sel.select(
                    F.col("query_id").alias("sq"), F.col("neighbor_id").alias("sn")
                ),
                (pair.query_id == F.col("sq")) & (pair.d2 == F.col("sn")),
            )
            .groupBy(rem.query_id, rem.neighbor_id, rem.cosine)
            .agg(F.max("sim").alias("ms"))
            .select(
                "query_id",
                "neighbor_id",
                (
                    F.lit(_MMR_LAMBDA) * F.col("cosine")
                    - F.lit(1 - _MMR_LAMBDA) * F.col("ms")
                ).alias("score"),
            )
        )
        ws = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id")
        )
        pick = (
            scored.withColumn("r", F.row_number().over(ws))
            .filter(F.col("r") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(t).cast("int").alias("pos"),
                F.col("score").alias("mmr_score"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select(
        "query_id",
        "pos",
        "neighbor_id",
        F.round(F.col("mmr_score") + F.lit(1e-9), 6).alias("mmr_score"),
    )


def _q276_oracle() -> str:
    from wetsa_cams_solrad_timeseries_spark.plans.vector import _cos

    lam, mu = _MMR_LAMBDA, 1 - _MMR_LAMBDA
    steps = []
    for t in range(2, _MMR_N + 1):
        prev = f"acc{t - 1}"
        steps.append(
            f"""sc{t} AS (
  SELECT c.query_id, c.neighbor_id,
         {lam} * c.cosine - {mu} * max(p.sim) AS score
  FROM cand c
  JOIN pair p ON p.query_id = c.query_id AND p.d1 = c.neighbor_id
  JOIN {prev} s ON s.query_id = p.query_id AND s.neighbor_id = p.d2
  WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                    WHERE x.query_id = c.query_id
                      AND x.neighbor_id = c.neighbor_id)
  GROUP BY c.query_id, c.neighbor_id, c.cosine
),
sel{t} AS (
  SELECT query_id, neighbor_id, CAST({t} AS INTEGER) AS pos,
         score AS mmr_score
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS r
        FROM sc{t})
  WHERE r = 1
),
acc{t} AS MATERIALIZED (
  SELECT * FROM {prev} UNION ALL SELECT * FROM sel{t}
)"""
        )
    step_sql = ",\n".join(steps)
    return f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id, cosine FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_cos('q.v', 'c.v')} AS cosine,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_cos('q.v', 'c.v')} DESC, c.vec_id) AS r
    FROM vecs q JOIN vecs c ON q.vec_id < 8 AND c.vec_id <> q.vec_id
  ) WHERE r <= {_MMR_CAND}
),
pair AS MATERIALIZED (
  SELECT a.query_id, a.neighbor_id AS d1, b.neighbor_id AS d2,
         {_cos('av.v', 'bv.v')} AS sim
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
  JOIN vecs av ON av.vec_id = a.neighbor_id
  JOIN vecs bv ON bv.vec_id = b.neighbor_id
),
acc1 AS (
  SELECT query_id, neighbor_id, CAST(1 AS INTEGER) AS pos,
         {lam} * cosine AS mmr_score
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS r
        FROM cand)
  WHERE r = 1
),
{step_sql}
SELECT query_id, pos, neighbor_id,
       {round6_sql("mmr_score")} AS mmr_score
FROM acc{_MMR_N}
"""


# --------------------------------------------------------------------------
# q277 — grouped ROC-AUC via the rank-sum identity (exact integers)
# --------------------------------------------------------------------------
_AUC_POS = ("1-URGENT", "2-HIGH")


def q277_group_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ROC-AUC of a score against a binary label — the model-
    evaluation aggregate every training pipeline ends with, computed
    distributed via the Mann–Whitney rank-sum identity instead of a
    driver-side sklearn call: AUC = P(score_pos > score_neg) + ½·P(=).
    Label: order priority ∈ {urgent, high}; score: o_totalprice; one
    AUC per order status.

    Exactness discipline: group by (group, distinct score) first, then
    AUC = Σ_s pos_s·(2·cumneg_<s + neg_s) / (2·n_pos·n_neg) — numerator
    and denominator are exact BIGINT products/sums (tie-correct by
    construction), so the only float op is one final division. No
    summation-order sensitivity anywhere; the q279 integer-scoring
    discipline applied to an eval metric.

    Scale shape: one map-side-combinable count aggregate to (group,
    score) cells, one window cumsum partitioned by group over the
    DISTINCT-score cells (≪ rows), one final per-group aggregate. At
    100 TB the distinct-score pre-aggregation is what keeps the window
    input bounded; a per-row rank would shuffle the full fact table.
    """
    o = table(spark, sf_dir, "orders")
    is_pos = F.col("o_orderpriority").isin(*_AUC_POS)
    cells = o.groupBy(
        F.col("o_orderstatus").alias("grp"),
        F.col("o_totalprice").alias("score"),
    ).agg(
        F.count(F.when(is_pos, 1)).alias("pos_s"),
        F.count(F.when(~is_pos, 1)).alias("neg_s"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cells = cells.withColumn(
        "cumneg_lt", F.sum("neg_s").over(w) - F.col("neg_s")
    )
    return (
        cells.groupBy("grp")
        .agg(
            F.sum("pos_s").alias("n_pos"),
            F.sum("neg_s").alias("n_neg"),
            F.sum(
                F.col("pos_s") * (2 * F.col("cumneg_lt") + F.col("neg_s"))
            ).alias("num2"),
        )
        .select(
            "grp",
            "n_pos",
            "n_neg",
            round6(
                F.col("num2")
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
            ).alias("auc"),
        )
    )


Q277_ORACLE = f"""
WITH cells AS (
  SELECT o_orderstatus AS grp, o_totalprice AS score,
         count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS pos_s,
         count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS neg_s
  FROM orders
  GROUP BY 1, 2
),
cum AS (
  SELECT grp, pos_s, neg_s,
         CAST(sum(neg_s) OVER (PARTITION BY grp ORDER BY score
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) - neg_s AS cumneg_lt
  FROM cells
)
SELECT grp,
       CAST(sum(pos_s) AS BIGINT) AS n_pos,
       CAST(sum(neg_s) AS BIGINT) AS n_neg,
       {round6_sql("CAST(sum(pos_s * (2 * cumneg_lt + neg_s)) AS BIGINT) / (2.0 * CAST(sum(pos_s) AS BIGINT) * CAST(sum(neg_s) AS BIGINT))")} AS auc
FROM cum
GROUP BY grp
"""
# --------------------------------------------------------------------------
# q279 — DSIR importance selection (hashed-unigram target-vs-raw weights)
# --------------------------------------------------------------------------
_DSIR_V = 4096  # hashed vocabulary buckets
_DSIR_TARGET = "src0"
_DSIR_N = 25


def q279_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023): score
    every raw document by how target-like its hashed-unigram
    distribution is — log p_target(doc) − p_raw(doc) under two
    add-1-smoothed bucket models — and keep the top 25. The target
    domain here is source='src0'; raw is everything else.

    Cross-engine exactness: per-bucket log-ratios quantize to integer
    micro-nats (round(lr·1e6)) BEFORE the per-doc sum, so document
    scores are exact BIGINT sums — order-independent under any
    partitioning, no float aggregation anywhere in the ranking. This is
    the ``exact_sum`` discipline applied to a transcendental score.

    Plan shape: tokenize-explode → one 2·V-cell conditional aggregate
    (the two models), broadcast of the V-row ratio table (V is a
    parameter), one per-doc sum, distributed top-N. At 100 TB the model
    build is one map-side-combinable agg over token counts and scoring
    is a broadcast join — both corpus-linear.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        ).alias("tok"),
    ).withColumn("b", hash32(F.col("tok")) % _DSIR_V)

    is_target = F.col("source") == _DSIR_TARGET
    model = toks.groupBy("b").agg(
        F.count(F.when(is_target, 1)).alias("cnt_t"),
        F.count(F.when(~is_target, 1)).alias("cnt_r"),
    )
    totals = model.agg(
        F.sum("cnt_t").alias("tt"), F.sum("cnt_r").alias("tr")
    )
    lr = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        ((F.col("cnt_t") + 1) / (F.col("tt") + _DSIR_V))
                        / ((F.col("cnt_r") + 1) / (F.col("tr") + _DSIR_V))
                    )
                )
                * 1e6
                + F.lit(1e-9),
                0,
            )
            .cast("long")
            .alias("lr_i6"),
        )
    )
    doc_tok = toks.filter(~is_target).groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    scored = (
        doc_tok.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("c") * F.col("lr_i6")).alias("score_unats"))
    )
    return scored.orderBy(
        F.col("score_unats").desc(), F.col("doc_id")
    ).limit(_DSIR_N)


Q279_ORACLE = rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, source,
         ({hash32_sql_duckdb('tok')} % {_DSIR_V}) AS b
  FROM (
    SELECT doc_id, source,
           unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
    FROM documents
  )
),
model AS MATERIALIZED (
  SELECT b,
         count(*) FILTER (WHERE source = '{_DSIR_TARGET}') AS cnt_t,
         count(*) FILTER (WHERE source <> '{_DSIR_TARGET}') AS cnt_r
  FROM toks GROUP BY b
),
totals AS (SELECT CAST(sum(cnt_t) AS BIGINT) AS tt, CAST(sum(cnt_r) AS BIGINT) AS tr FROM model),
lr AS (
  SELECT b,
         CAST(round(ln(((cnt_t + 1) * 1.0 / (tt + {_DSIR_V}))
                    / ((cnt_r + 1) * 1.0 / (tr + {_DSIR_V}))) * 1e6 + 1e-9, 0) AS BIGINT) AS lr_i6
  FROM model CROSS JOIN totals
),
doc_tok AS (
  SELECT doc_id, source, b, count(*) AS c
  FROM toks WHERE source <> '{_DSIR_TARGET}'
  GROUP BY 1, 2, 3
)
SELECT doc_id, source, CAST(sum(c * lr_i6) AS BIGINT) AS score_unats
FROM doc_tok JOIN lr USING (b)
GROUP BY doc_id, source
ORDER BY score_unats DESC, doc_id
LIMIT {_DSIR_N}
"""


SPECS = make_specs(
    [
        (
            "q275_bloom_semijoin",
            q275_bloom_semijoin,
            Q275_ORACLE,
            (),
            "bloom-filter semi-join scan reduction",
        ),
        (
            "q276_mmr_rerank",
            q276_mmr_rerank,
            _q276_oracle(),
            (),
            "MMR diversified re-ranking of ANN candidates",
        ),
        (
            "q277_group_auc",
            q277_group_auc,
            Q277_ORACLE,
            (),
            "grouped ROC-AUC via exact rank-sum",
        ),
        (
            "q279_dsir_selection",
            q279_dsir_selection,
            Q279_ORACLE,
            (),
            "DSIR hashed-unigram importance selection",
        ),
    ]
)
