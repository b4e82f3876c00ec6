"""Deletion lifecycle for the persisted incremental indexes.

Every cross-run index family in this repo (q193 LSH bands, q197 PQ
codes, q201 postings, q210 pHash, q227 IVF-SQ8 cells, q238 graph edges)
covered INSERT-only maintenance through round 11; a production LLM
corpus also takes DELETES — takedown notices, robots.txt revocations,
right-to-be-forgotten — and a 100 TB index cannot answer them with a
full rebuild. This module is the delete side of the lifecycle, in the
two phases every log-structured system uses:

1. **Tombstone** (q253, q255): deletion ids land in a parameter-sized
   tombstone table; the serve path anti-joins them out (broadcast — a
   takedown list is thousands of ids, never corpus-sized). The index
   bytes are untouched: delete latency is one small write, and the only
   serve-side cost is a broadcast anti-join.
2. **Compaction** (q254, q259): the next maintenance rewrite folds the
   tombstones into the index — membership removal and small-file
   compaction as ONE pass (sinks/bucketed.compact_bucketed_table) or as
   a cell-local directory rewrite (q259) — then truncates the tombstone
   set. Anti-joins against an already-compacted id are no-ops, so every
   crash window between "rewritten" and "truncated" stays correct, and
   serving DURING the window double-applies deletes harmlessly.

The correctness contract for both phases is the same batch-equivalence
theorem the insert side proves: tombstone-filtered serve ≡ compacted
serve ≡ the batch recompute over the surviving corpus — q253 and q254
share ONE oracle (the q33/q193 SQL with the takedown predicate woven
in), so the driver gate itself certifies that the two phases agree.

Graph-family deletes (q255/q256) follow hnswlib's two phases:
``markDelete`` (q255 — tombstoned nodes keep ROUTING, the beam may pass
through them, they just cannot be RESULTS: deleting a hub must not
disconnect the graph) and repair (q256 — affected survivors re-link,
after which the edge set provably equals a from-scratch build over the
survivors, so routing quality is fully restored without Σ|cell|² work).

Reference scope note: the reference pipelines re-run from raw CSV each
time (code/compile-solrad.py), so deletion = "remove the input file";
this module is the extension-surface form the north star requires.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.catalog import table
from wetsa_cams_solrad_timeseries_spark.plans._spec import make_specs, round6

_DEL_TOKEN = __import__("uuid").uuid4().hex[:12]
_DEL_PERM, _DEL_BANDS, _DEL_BUCKETS = 16, 4, 16
# The takedown list: history docs with doc_id ≡ 4 (mod 13) — arrives
# AFTER the index was built over the full history (that ordering is the
# point: the index contains the deleted docs' rows until a compaction).
_TAKEDOWN_MOD, _TAKEDOWN_RES = 13, 4


def _is_new():
    return F.col("doc_id") % 10 == 7


def _is_takedown():
    return (F.col("doc_id") % 10 != 7) & (
        F.col("doc_id") % _TAKEDOWN_MOD == _TAKEDOWN_RES
    )


def _hist_band_rows(docs: DataFrame) -> DataFrame:
    """Band rows over the FULL history (including soon-to-be-deleted
    docs — deletes arrive after the build)."""
    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        lsh_band_rows,
        minhash_signatures,
        word_shingles,
    )

    return lsh_band_rows(
        minhash_signatures(
            word_shingles(docs.filter(~_is_new()), "doc_id", "text", n=2),
            "doc_id",
            n_perm=_DEL_PERM,
        ),
        "doc_id",
        n_perm=_DEL_PERM,
        bands=_DEL_BANDS,
    )


def _ensure_lsh_delete_artifacts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, str | None]:
    """(band_index, tombstones, index_table_name) — the shared q253/q254
    fixture. The band index persists bucketed on ``bucket`` (q193's
    layout); the tombstone table holds the takedown ids. table_name is
    None when the catalog is unavailable (plain-frame fallback — q253
    still correct via the anti-join; q254 falls back to tombstone-
    filtered serve, which its shared oracle proves equivalent)."""
    from wetsa_cams_solrad_timeseries_spark.sinks.bucketed import write_bucketed

    docs = table(spark, sf_dir, "documents")
    tombs = docs.filter(_is_takedown()).select("doc_id")
    tag = "".join(c for c in os.path.basename(sf_dir.rstrip("/")) if c.isalnum())
    idx_t = f"wetsa_lshdel_{tag}_{_DEL_TOKEN}"
    tomb_t = f"wetsa_lshtomb_{tag}_{_DEL_TOKEN}"
    try:
        from wetsa_cams_solrad_timeseries_spark._artifacts import (
            claim_warehouse_table,
        )

        for fam, tname in (
            (f"wetsa_lshdel_{tag}_*", idx_t),
            (f"wetsa_lshtomb_{tag}_*", tomb_t),
        ):
            claim_warehouse_table(spark, fam, _DEL_TOKEN, tname)
    except Exception:  # noqa: BLE001 — cleanup is best-effort only
        pass
    try:
        if not spark.catalog.tableExists(idx_t):
            write_bucketed(
                _hist_band_rows(docs), idx_t, "bucket",
                n_buckets=_DEL_BUCKETS, sort_col="bucket",
            )
            # Tombstones registered AFTER the index exists (the arrival
            # order deletes actually have). Overwrite = idempotent: a
            # re-registered id already compacted away anti-joins to
            # nothing.
            tombs.write.mode("overwrite").saveAsTable(tomb_t)
        elif not spark.catalog.tableExists(tomb_t):
            tombs.write.mode("overwrite").saveAsTable(tomb_t)
        return spark.table(idx_t), spark.table(tomb_t), idx_t
    except Exception:  # noqa: BLE001 — catalog unavailable: plain frames
        return _hist_band_rows(docs), tombs, None


def _probe_and_verify(
    spark: SparkSession,
    sf_dir: str,
    hist_idx: DataFrame,
    tombstones: DataFrame | None,
) -> DataFrame:
    """New-shard probe of the band index → candidate pairs → exact-
    Jaccard verify (q193's serve shape), with the OPTIONAL tombstone
    anti-join on the candidate stream. The anti-join sits AFTER the
    bucket join and BEFORE the (explode-heavy) verify, so a deleted
    history doc costs neither candidate verification nor a shingle pass
    — and it broadcasts, so the index side's shuffle-freeness is
    untouched."""
    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        lsh_band_rows,
        minhash_signatures,
        word_shingles,
    )

    docs = table(spark, sf_dir, "documents")
    new_sh = word_shingles(
        docs.filter(_is_new()), "doc_id", "text", n=2
    ).localCheckpoint(eager=True)
    probe = lsh_band_rows(
        minhash_signatures(new_sh, "doc_id", n_perm=_DEL_PERM),
        "doc_id",
        n_perm=_DEL_PERM,
        bands=_DEL_BANDS,
    )
    cand = (
        probe.select(F.col("doc_id").alias("new_id"), "bucket")
        .join(
            hist_idx.select(F.col("doc_id").alias("hist_id"), "bucket"),
            on="bucket",
        )
        .select("new_id", "hist_id")
    )
    if tombstones is not None:
        cand = cand.join(
            F.broadcast(
                tombstones.select(F.col("doc_id").alias("hist_id"))
            ),
            on="hist_id",
            how="left_anti",
        )
    cand = cand.distinct().localCheckpoint(eager=True)
    hist_cand_docs = docs.filter(~_is_new()).join(
        cand.select(F.col("hist_id").alias("doc_id")).distinct(),
        on="doc_id",
        how="semi",
    )
    hist_sh = word_shingles(hist_cand_docs, "doc_id", "text", n=2)
    a = new_sh.select(
        F.col("doc_id").alias("new_id"), F.col("shingle_hash").alias("h")
    )
    bsh = hist_sh.select(
        F.col("doc_id").alias("hist_id"), F.col("shingle_hash").alias("h")
    )
    common = (
        cand.join(a, on="new_id")
        .join(bsh, on=["hist_id", "h"])
        .groupBy("new_id", "hist_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_new = new_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_new"))
    sz_hist = hist_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_hist"))
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    return (
        cand.join(common, on=["new_id", "hist_id"], how="left")
        .join(sz_new.withColumnRenamed("doc_id", "new_id"), on="new_id")
        .join(sz_hist.withColumnRenamed("doc_id", "hist_id"), on="hist_id")
        .select(
            "new_id",
            "hist_id",
            round6(
                nc / (F.col("sz_new") + F.col("sz_hist") - nc)
            ).alias("jaccard"),
        )
    )


def q253_lsh_tombstone_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 1 of the delete lifecycle on the LSH dedup index: the
    takedown ids are TOMBSTONED (one parameter-sized table write — the
    index's bucketed bytes are untouched) and the q193 incremental-dedup
    probe anti-joins them out of the candidate stream before the verify
    stage, so a deleted history document can never surface as a near-dup
    partner — the moment the tombstone lands, not after a rebuild.

    Scale shape: identical to q193's steady state (delta-sized probe
    into the bucketed, shuffle-free index scan) plus ONE broadcast
    anti-join on the candidate stream; delete cost is O(|takedown|)
    regardless of index size. Placing the anti-join before the verify
    also refunds the deleted docs' shingle/verify work.

    Oracle: the batch LSH dedup over the SURVIVING history — q193's SQL
    with the takedown predicate in the candidate join — shared verbatim
    with q254, so the driver gate itself certifies tombstone-serve ≡
    compacted-serve ≡ batch-over-survivors."""
    hist_idx, tombs, _ = _ensure_lsh_delete_artifacts(spark, sf_dir)
    return _probe_and_verify(spark, sf_dir, hist_idx, tombs)


def q254_lsh_tombstone_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Phase 2: the maintenance rewrite folds the tombstones INTO the
    bucketed index — membership removal and small-file compaction as one
    pass (sinks/bucketed.compact_bucketed_table with ``tombstones=``),
    preserving the bucketed layout contract (probe plans stay
    shuffle-free on the index side, pytest-locked) — then truncates the
    tombstone table. The post-compaction probe runs with NO anti-join:
    the deletes are physical now.

    Crash windows are all safe: compaction itself recovers via the
    DROP+RENAME protocol (test_compaction_crash_recovery); a crash
    after the rename but before the truncate leaves tombstones that
    anti-join against ids no longer present — a no-op; re-registering a
    takedown id after its compaction is equally a no-op. Delete
    application is IDEMPOTENT end to end.

    Oracle: shared verbatim with q253 — the equivalence of the two
    phases IS the checked contract."""
    from wetsa_cams_solrad_timeseries_spark.sinks.bucketed import (
        compact_bucketed_table,
    )

    hist_idx, tombs, idx_t = _ensure_lsh_delete_artifacts(spark, sf_dir)
    if idx_t is None:
        # Catalog unavailable: no physical compaction possible — serve
        # the tombstone-filtered view, which the shared oracle proves
        # equivalent.
        return _probe_and_verify(spark, sf_dir, hist_idx, tombs)
    compact_bucketed_table(
        spark,
        idx_t,
        n_buckets=_DEL_BUCKETS,
        bucket_col="bucket",
        sort_col="bucket",
        tombstones=tombs,
        tombstone_col="doc_id",
    )
    # Truncate AFTER the rewrite committed (overwrite with empty self —
    # schema preserved). A crash before this line leaves stale
    # tombstones whose anti-join is a no-op.
    tomb_t = idx_t.replace("wetsa_lshdel_", "wetsa_lshtomb_")
    empty = spark.table(tomb_t).filter(F.lit(False)).localCheckpoint()
    empty.write.mode("overwrite").saveAsTable(tomb_t)
    return _probe_and_verify(spark, sf_dir, spark.table(idx_t), None)


def _lsh_survivor_oracle() -> str:
    """q193's batch-equivalence SQL with the takedown exclusion — the
    shared q253/q254 oracle (shared fragments with q33/q193/q244 so the
    index and every lifecycle phase can never drift apart)."""
    from wetsa_cams_solrad_timeseries_spark.plans.llm_ops import (
        _BAND_LIST,
        _MINHASH_COLS,
        _SHINGLES_SQL,
    )

    return f"""
WITH {_SHINGLES_SQL},
sigs AS (
  SELECT doc_id,
         {_MINHASH_COLS}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST}]) AS bucket
  FROM sigs
),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id
  FROM banded n JOIN banded h ON n.bucket = h.bucket
  WHERE n.doc_id % 10 = 7 AND h.doc_id % 10 <> 7
    AND h.doc_id % {_TAKEDOWN_MOD} <> {_TAKEDOWN_RES}
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
co AS (
  SELECT c.new_id, c.hist_id, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.new_id
  JOIN sh b ON b.doc_id = c.hist_id AND b.h = a.h
  GROUP BY 1, 2
)
SELECT c.new_id, c.hist_id,
       round(coalesce(co.n_common, 0) * 1.0
             / (sn.sz + sh2.sz - coalesce(co.n_common, 0)) + 1e-9, 6)
         AS jaccard
FROM cand c
LEFT JOIN co ON co.new_id = c.new_id AND co.hist_id = c.hist_id
JOIN sizes sn ON sn.doc_id = c.new_id
JOIN sizes sh2 ON sh2.doc_id = c.hist_id
"""


Q253_ORACLE = _lsh_survivor_oracle()
Q254_ORACLE = Q253_ORACLE


SPECS = make_specs(
    [
        ("q253_lsh_tombstone_serve", q253_lsh_tombstone_serve, Q253_ORACLE,
         (), "index delete phase 1: tombstoned serve (broadcast anti-join)"),
        ("q254_lsh_tombstone_compaction", q254_lsh_tombstone_compaction,
         Q254_ORACLE, (),
         "index delete phase 2: tombstone-folding compaction"),
    ]
)
