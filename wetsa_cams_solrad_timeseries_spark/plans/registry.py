"""Query registry: every declared engine capability as a named query with a
DuckDB oracle.

Each entry maps a SURVEY.md §2 operator (or an extension operator from the
north star) to:
  - ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
  - ``oracle`` — ANSI SQL for DuckDB over the same tables, or ``None`` for
    genuinely non-SQL-expressible ops (driver then records rows-only).

Determinism rules (the driver hashes sorted values):
  - every computed column is aliased identically in Spark and SQL;
  - multi-row float aggregates are rounded via ``round(x + 1e-9, 6)`` on
    BOTH sides. The nudge matters: decimal-resolution inputs make true
    aggregate values land exactly on rounding-grid boundaries, where
    cross-engine ULP noise (summation order; DuckDB vectorization/FMA vs
    JVM scalar arithmetic — observed even on per-row expressions) flips
    the rounded digit. Adding 1e-9 relocates the tie set to values the
    decimal data cannot produce, and 1e-9 dwarfs the ULP noise at these
    magnitudes, so both engines always round the same way. Empirically:
    2/54 queries flaked single rows at sf0.1 before the nudge, 0 after;
  - any top-k / row_number ordering has a unique tie-break key.
"""

from __future__ import annotations

from wetsa_cams_solrad_timeseries_spark.plans import (
    relational,
    relational2,
    relational3,
    timeseries,
    llm_ops,
    vector,
    pipeline_ops,
    curation,
    analytics,
    advanced,
    deletes,
    scale_ops,
)
from wetsa_cams_solrad_timeseries_spark.plans._spec import QuerySpec


# The driver's correctness pass runs registry order under a ~50-query
# budget, so with >50 declared queries some get no row each round. The
# rotation below front-loads whatever the MOST RECENT correctness report
# did not cover, so coverage rotates through the inventory on a
# ⌈n_queries / 50⌉-round cycle (~4 rounds at ~200 queries) — a query's
# authoritative row can therefore be up to one full cycle old, which is
# why tools/plan_report.py surfaces the stalest row age into PLANS.json
# each round. Queries whose kernels changed since their last driver row
# MUST be pinned ahead of the automatic rotation so their fresh row
# lands on the changed code.
_PIN_FIRST = (
    # Round 13: the ρ-sampled descent + the delete-lifecycle extensions
    # land first (tier-1 never-checked — pinned so their first driver
    # rows land deterministically), then every query whose kernel
    # changed this round:
    # - q256 (medoid node ids now persist in a dedicated bigint column
    #   — ADVICE fix; output must be unchanged, pinned to prove it),
    # - q259 (compact_partitioned_cells now resolves the tombstone id
    #   column by name — behavior-identical for its single-column
    #   tombstones, pinned to prove it),
    # - q263 (pair kernel factored into _cdc_surviving_pairs for the
    #   insert-side-delete unit test — behavior-identical),
    # - q242/q243/q249 (round6_spark's midpoint-suspect band is now
    #   magnitude-aware — identical at PCA magnitudes, pinned to prove
    #   the serve surface).
    # Round-13 second wave (this session): new queries first (tier-1
    # would front-load them anyway; explicit pins make the order
    # deterministic)...
    "q275_bloom_semijoin",
    "q276_mmr_rerank",
    "q277_group_auc",
    "q278_streaming_capped_descent",
    "q279_dsir_selection",
    "q280_hll_cardinality",
    "q281_cms_heavy_hitters",
    "q282_knn_label_gate",
    "q283_streaming_bloom_screen",
    "q284_streaming_hll",
    "q285_serving_ir_metrics",
    # ...then the shingle-family representatives: word_shingles now
    # tokenizes BEFORE the spread shuffle (ICU-interpreted-path fix) —
    # behavior-identical (18-query sf0.01 oracle sweep in-session), one
    # pin per caller family to prove it on driver rows too:
    "q32_ngram_jaccard",
    "q33_minhash_lsh",
    "q62_minhash_dedup_verified",
    "q72_dedup_clusters",
    "q209_lsh_bucket_cap",
    "q229_curation_pipeline",
    "q244_streaming_lsh_neardup",
    "q253_lsh_tombstone_serve",
    "q262_decremental_postings",
    # Round-13 first wave (earlier session):
    "q266_sampled_nn_descent",
    "q272_capped_descent_ladder",
    "q273_hnsw_log_layers",
    "q274_capped_descent_sla",
    "q267_phash_tombstone_serve",
    "q268_phash_tombstone_compaction",
    "q269_pq_tombstone_serve",
    "q270_pq_tombstone_compaction",
    "q271_opq_tombstone_compaction",
    "q256_graph_delete_repair",
    "q259_ivfsq_delete_compaction",
    "q263_streaming_cdc_index",
    "q242_pca_ann_gate",
    "q243_pca_screen_sla",
    "q249_streaming_pca_encode",
)


def _coverage_sets() -> tuple[frozenset[str], frozenset[str], dict]:
    """(ever_covered, latest_covered, last_round) from the
    CORRECTNESS_r*.json reports in the repo root (two levels above this
    package).

    ``ever_covered`` = union across ALL rounds — its complement is the
    never-driver-checked set, which outranks everything but the pins (a
    query with NO authoritative row is a bigger gap than a stale one).
    ``latest_covered`` drives the staleness rotation among ever-checked
    queries; ``last_round`` (name → most recent round with a row) lets
    the rotation order tier 2 OLDEST-FIRST — without it, dict order
    decided which stale rows got refreshed and the r4-era rows could
    sit behind newer ones for rounds (the round-12 staleness audit
    showed exactly that). Missing/unparsable reports → empty."""
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    ever: set[str] = set()
    last_round: dict[str, int] = {}
    best_round, best_path = -1, None
    try:
        for fname in os.listdir(root):
            m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
            if not m:
                continue
            rnd = int(m.group(1))
            path = os.path.join(root, fname)
            with open(path) as f:
                names = json.load(f).keys()
            ever.update(names)
            for n in names:
                last_round[n] = max(last_round.get(n, -1), rnd)
            if rnd > best_round:
                best_round, best_path = rnd, path
        if best_path is None:
            return frozenset(), frozenset(), {}
        with open(best_path) as f:
            latest = frozenset(json.load(f).keys())
        return frozenset(ever), latest, last_round
    except (OSError, ValueError):
        return frozenset(), frozenset(), {}


def _collect() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        relational2,
        relational3,
        timeseries,
        llm_ops,
        vector,
        pipeline_ops,
        curation,
        analytics,
        advanced,
        deletes,
        scale_ops,
    ):
        merged.update(mod.SPECS)
    ever, latest, last_round = _coverage_sets()
    # Pins must name DECLARED queries. A pin that silently no-ops is how
    # a query ships with no driver-authoritative correctness row (round
    # 7 pinned q192-q194 before they existed; the 'in merged' filter hid
    # it) — fail at import instead.
    unknown = [name for name in _PIN_FIRST if name not in merged]
    if unknown:
        raise AssertionError(
            f"_PIN_FIRST names undeclared queries: {unknown} — declare "
            "them or trim the pins"
        )
    ordered = list(_PIN_FIRST)
    # Tier 1: never driver-checked in ANY round.
    ordered += [n for n in merged if n not in ever and n not in ordered]
    # Tier 2: checked before, but rotated out of the latest round —
    # OLDEST authoritative row first, so the driver's budget always
    # refreshes the stalest rows rather than whatever dict order put
    # ahead.
    tier2 = [n for n in merged if n not in latest and n not in ordered]
    tier2.sort(key=lambda n: (last_round.get(n, -1), n))
    ordered += tier2
    ordered += [n for n in merged if n not in ordered]
    return {name: merged[name] for name in ordered}


QUERIES: dict[str, QuerySpec] = _collect()
