"""Dedup + text operators vs pure-Python oracles (same MD5-derived hash,
so results must match bit-for-bit)."""

import itertools

from wetsa_cams_solrad_timeseries_spark.functions.hashing import hash32_py
from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    word_shingles,
)
from wetsa_cams_solrad_timeseries_spark.operators.text import fingerprints, lang_scores

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "completely different words entirely here now"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (5, "tiny"),  # fewer words than shingle width
]


def _shingles_py(text, n=2):
    ws = text.strip().lower().split()
    if len(ws) >= n:
        grams = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
    else:
        grams = {" ".join(ws)}
    return {hash32_py(g) for g in grams}


def _docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark):
    out = {
        r["text_md5"]: (r["keep_doc_id"], r["n_copies"])
        for r in exact_dedup(_docs_df(spark), "doc_id", "text").collect()
    }
    assert len(out) == 4  # docs 1 and 4 collapse
    assert (1, 2) in out.values()


def test_word_shingles_match_python(spark):
    got = word_shingles(_docs_df(spark), "doc_id", "text", n=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["shingle_hash"])
    for doc_id, text in DOCS:
        assert by_doc[doc_id] == _shingles_py(text), doc_id


def test_jaccard_pairs_match_python(spark):
    sh = word_shingles(_docs_df(spark), "doc_id", "text", n=2)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, "doc_id", threshold=0.0).collect()
    }
    sets = {d: _shingles_py(t) for d, t in DOCS}
    exp = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            exp[(a, b)] = round(inter / len(sets[a] | sets[b]) + 1e-9, 6)
    assert got == exp
    assert got[(1, 4)] == 1.0  # exact dup
    assert 0.5 < got[(1, 2)] < 1.0  # near dup


def test_jaccard_pairs_dense_matches_join_form(spark):
    """The blocked bitmap-matmul kernel (block-pair applyInPandas, no
    driver corpus materialization) must reproduce the join form exactly —
    including across blocks (n_blocks=3 < n_docs forces off-diagonal
    block pairs where the A-side id can exceed the B-side id)."""
    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        jaccard_pairs_dense,
    )

    sh = word_shingles(_docs_df(spark), "doc_id", "text", n=2)
    exp = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, "doc_id", threshold=0.0).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_dense(sh, "doc_id", threshold=0.0, n_blocks=3).collect()
    }
    # The join form only emits pairs with ≥1 common shingle; the dense
    # kernel also emits 0-common pairs at threshold 0 — compare on >0.
    assert {k: v for k, v in got.items() if v > 0} == exp


def test_jaccard_dense_regime_guard_falls_back_to_sparse(spark):
    """With max_vocab below the corpus vocabulary, jaccard_pairs_dense
    must take the sparse self-join fallback — and the result must still
    match the join form exactly (it IS the join form then). The probe
    collects at most max_vocab+1 rows, so the guard itself is safe on an
    arbitrarily large vocabulary."""
    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        jaccard_pairs_dense,
    )

    sh = word_shingles(_docs_df(spark), "doc_id", "text", n=2)
    vocab_n = sh.select("shingle_hash").distinct().count()
    assert vocab_n > 3  # the guard below must actually trip
    exp = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, "doc_id", threshold=0.0).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_dense(
            sh, "doc_id", threshold=0.0, max_vocab=3
        ).collect()
    }
    assert got == exp  # sparse fallback: no 0-common pairs, exact match


def _minhash_py(shingle_hashes, n_perm=16):
    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_perm_coeffs,
    )

    return [
        min((a * h + b) % MINHASH_PRIME for h in shingle_hashes)
        for a, b in minhash_perm_coeffs(n_perm)
    ]


def test_minhash_lsh_candidates_match_python(spark):
    sh = word_shingles(_docs_df(spark), "doc_id", "text", n=2)
    sigs = {
        r["doc_id"]: [r[f"mh{p}"] for p in range(16)]
        for r in minhash_signatures(sh, "doc_id", n_perm=16).collect()
    }
    for doc_id, text in DOCS:
        assert sigs[doc_id] == _minhash_py(_shingles_py(text)), doc_id
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(sh, "doc_id"), "doc_id"
        ).collect()
    }
    assert (1, 4) in got  # identical signature → all bands collide
    assert (1, 3) not in got


def test_simhash_deterministic_and_near(spark):
    got = {r["doc_id"]: r["simhash"] for r in simhash(_docs_df(spark), "doc_id", "text").collect()}
    assert got[1] == got[4]
    ham_near = bin(got[1] ^ got[2]).count("1")
    ham_far = bin(got[1] ^ got[3]).count("1")
    assert ham_near < ham_far
    assert all(0 <= v < 2**32 for v in got.values())


def test_fingerprints(spark):
    got = {r["doc_id"]: r for r in fingerprints(_docs_df(spark), "doc_id", "text").collect()}
    assert got[1]["fp_md5"] == got[4]["fp_md5"]
    assert got[1]["fp_min_shingle"] == got[4]["fp_min_shingle"]
    assert got[5]["n_shingles"] == 1  # short doc → whole-text shingle
    sets1 = {hash32_py(" ".join("the quick brown fox jumps over the lazy dog".split()[i:i+5])) for i in range(5)}
    assert got[1]["fp_min_shingle"] == min(sets1)


def test_tfidf_matches_python(spark):
    import math

    from wetsa_cams_solrad_timeseries_spark.operators.text import tfidf

    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf(_docs_df(spark), "doc_id", "text", min_df=2).collect()
    }
    # python oracle: smoothed sklearn-style idf over whitespace terms
    docs = {d: t.strip().lower().split() for d, t in DOCS}
    n = len(docs)
    from collections import Counter

    dfreq = Counter()
    for terms in docs.values():
        for t in set(terms):
            dfreq[t] += 1
    exp = {}
    for d, terms in docs.items():
        tf = Counter(terms)
        for t, c in tf.items():
            if dfreq[t] >= 2:
                idf = math.log((n + 1) / (dfreq[t] + 1)) + 1
                exp[(d, t)] = (c, dfreq[t], round(c * idf + 1e-9, 6))
    assert got == exp
    assert got[(1, "the")][0] == 2  # 'the' twice in doc 1


def test_connected_components_transitive(spark):
    """A~B, B~C, and a separate D~E: min-label propagation must produce
    two clusters with min-id representatives, including the transitive
    (A, C) link that no pair ever stated."""
    from wetsa_cams_solrad_timeseries_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(3, 1), (1, 2), (10, 11), (2, 7)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_lsh_br_sweep_properties():
    from wetsa_cams_solrad_timeseries_spark.operators.dedup import lsh_br_sweep

    rows = lsh_br_sweep(16)
    assert [r["bands"] for r in rows] == [1, 2, 4, 8, 16]
    for r in rows:
        assert r["bands"] * r["rows_per_band"] == 16
        assert 0 < r["threshold"] <= 1
        # P(s) is monotone in s for fixed (b, r)
        assert r["p_at_0.5"] <= r["p_at_0.7"] <= r["p_at_0.9"]
    # more bands → lower threshold (higher recall)
    ths = [r["threshold"] for r in rows]
    assert ths == sorted(ths, reverse=True)
    # the declared q33 config (16 perms, 4 bands) targets ~0.7 similarity
    assert abs(next(r for r in rows if r["bands"] == 4)["threshold"] - 0.7) < 0.05


def test_lang_scores_pred(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el perro de la casa y el gato"),
            (3, "qwerty zxcvb"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in lang_scores(df, "doc_id", "text").collect()}
    assert got[1]["lang_pred"] == "en"
    assert got[2]["lang_pred"] == "es"
    assert got[3]["lang_pred"] == "und"


def test_bucket_cap_retention_math_matches_enumeration():
    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        bucket_cap_pair_retention,
    )

    sizes = [1, 2, 3, 4, 7, 1, 5]
    for cap in (1, 2, 3, 8, 100):
        kept = 0
        total = 0
        for n in sizes:
            ids = list(range(n))
            total += len(list(itertools.combinations(ids, 2)))
            kept += len(list(itertools.combinations(ids[:cap], 2)))
        assert bucket_cap_pair_retention(sizes, cap) == (
            kept / total if total else 1.0
        )
    assert bucket_cap_pair_retention([1, 1], 5) == 1.0  # pairless
    assert bucket_cap_pair_retention([], 5) == 1.0


def test_cap_bucket_occupancy_deterministic_and_plan_free(spark):
    # Correctness: keep the cap lowest ids per bucket; pairs from the
    # capped index are a SUBSET of the uncapped pairs. Scale (asserted
    # under the corpus-scale SMJ shape, broadcast disabled): the cap's
    # window partitions by the join's own shuffle key, so the capped
    # candidate plan spends NO additional Exchange over the uncapped
    # one, and the cap itself runs map-side via WindowGroupLimit
    # pre-shuffle pruning.
    import io
    import re
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        cap_bucket_occupancy,
    )

    rows = [(i, f"b{i % 3}") for i in range(12)]  # buckets of 4
    banded = spark.createDataFrame(rows, "doc_id long, bucket string")
    capped = cap_bucket_occupancy(banded, "doc_id", cap=2)
    got = sorted((r["bucket"], r["doc_id"]) for r in capped.collect())
    exp = sorted(
        (f"b{b}", i)
        for b in range(3)
        for i in sorted(x for x in range(12) if x % 3 == b)[:2]
    )
    assert got == exp

    def pairs(src):
        a = src.select(F.col("doc_id").alias("id_a"), "bucket")
        b_ = src.select(F.col("doc_id").alias("id_b"), "bucket")
        return (
            a.join(b_, on="bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    def n_exchanges(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return len(re.findall(r"\(\d+\) Exchange", buf.getvalue()))

    capped_pairs = {tuple(r) for r in pairs(capped).collect()}
    uncapped_pairs = {tuple(r) for r in pairs(banded).collect()}
    assert capped_pairs < uncapped_pairs  # strict subset: the cap binds

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cp, up = pairs(capped), pairs(banded)
        assert n_exchanges(cp) == n_exchanges(up)  # cap is shuffle-free
        buf = io.StringIO()
        with redirect_stdout(buf):
            cp.explain("formatted")
        plan = buf.getvalue()
        # map-side pre-pruning: a WindowGroupLimit sits BELOW the
        # window's Exchange, so hot buckets never ship their full
        # occupancy across the wire.
        assert "WindowGroupLimit" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_dedup_gate_scurve_bends(spark):
    # q221's gate on a CONSTRUCTED corpus with mid-similarity pairs:
    # recall must be monotone non-decreasing in tau (the LSH S-curve —
    # high-similarity pairs collide in some band with higher probability
    # than mid-similarity ones), and the low-tau end must actually lose
    # pairs here (the corpus is built so some true 0.3-pairs sit below
    # the banding's collision knee).
    from pyspark.sql import functions as F

    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        jaccard_pairs_dense,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    words = [f"w{i}" for i in range(40)]
    docs = []
    # 30 base docs of 12 words; each gets a partner overlapping in
    # 4..11 of its 12 bigram positions -> true Jaccard spread over
    # roughly 0.2..0.9.
    for d in range(30):
        base = [words[(d * 7 + j) % 40] for j in range(12)]
        docs.append((2 * d, " ".join(base)))
        overlap = 4 + d % 8
        partner = base[:overlap] + [
            f"x{d}_{j}" for j in range(12 - overlap)
        ]
        docs.append((2 * d + 1, " ".join(partner)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sh = word_shingles(df, "doc_id", "text", n=2)
    exact = jaccard_pairs_dense(sh, "doc_id", threshold=0.2)
    cand = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            minhash_signatures(sh, "doc_id", n_perm=16),
            "doc_id", n_perm=16, bands=4,
        ).collect()
    }
    truth = [
        ((r["id_a"], r["id_b"]), r["jaccard"]) for r in exact.collect()
    ]
    assert truth, "constructed corpus produced no true pairs"

    def recall(tau):
        t = [p for p, j in truth if j >= tau]
        if not t:
            return None
        return sum(1 for p in t if p in cand) / len(t)

    rs = [r for r in (recall(t) for t in (0.2, 0.4, 0.6, 0.8)) if r is not None]
    assert len(rs) >= 3
    assert all(a <= b + 1e-12 for a, b in zip(rs, rs[1:])), rs  # monotone
    assert rs[0] < 1.0, rs  # the low end genuinely loses pairs
    assert rs[-1] > rs[0], rs  # and the curve actually bends upward


def test_incremental_curation_steady_state_never_rebuilds(
    spark, sf_dir, monkeypatch
):
    # q245's lifecycle contract: once the state generation exists
    # (history md5 set + bucketed band index), a steady-state run loads
    # both tables and never re-runs the history build. write_bucketed
    # is build-path-only, so with it bombed the second run must still
    # produce the identical attrition audit.
    from wetsa_cams_solrad_timeseries_spark.plans.curation import (
        q245_incremental_curation,
    )

    first = sorted(
        tuple(r) for r in q245_incremental_curation(spark, sf_dir).collect()
    )
    assert len(first) == 5 and first[0][2] > 0, first

    import wetsa_cams_solrad_timeseries_spark.sinks.bucketed as bucketed

    def boom(*a, **k):
        raise AssertionError("steady-state run rebuilt the curation state")

    monkeypatch.setattr(bucketed, "write_bucketed", boom)
    second = sorted(
        tuple(r) for r in q245_incremental_curation(spark, sf_dir).collect()
    )
    assert second == first


def test_incremental_curation_attrition_is_monotone(spark, sf_dir):
    # Every stage only removes documents: n_docs and n_tokens are
    # non-increasing in stage order.
    from wetsa_cams_solrad_timeseries_spark.plans.curation import (
        q245_incremental_curation,
    )

    rows = sorted(
        q245_incremental_curation(spark, sf_dir).collect(),
        key=lambda r: r["stage_ord"],
    )
    docs = [r["n_docs"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert docs == sorted(docs, reverse=True), docs
    assert toks == sorted(toks, reverse=True), toks


def test_banding_ladder_nests_and_pick_is_minimal(spark, sf_dir):
    # q246's structural contracts: candidate sets NEST across the
    # banding ladder (a coarser band block's equality implies equality
    # of its finer halves), so recall is monotone in band count; the
    # picked rung is the cheapest met one.
    from wetsa_cams_solrad_timeseries_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )
    from wetsa_cams_solrad_timeseries_spark.plans.llm_ops import (
        _N_PERM,
        _Q246_BANDINGS,
        _Q246_TARGET,
        q246_banding_sla,
    )
    from wetsa_cams_solrad_timeseries_spark.plans.relational import table

    docs = table(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        word_shingles(docs, "doc_id", "text", n=2), "doc_id", n_perm=_N_PERM
    ).localCheckpoint(eager=True)
    sets = {
        b: {
            (r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs(
                sigs, "doc_id", n_perm=_N_PERM, bands=b
            ).collect()
        }
        for b in _Q246_BANDINGS
    }
    for coarse, fine in zip(_Q246_BANDINGS, _Q246_BANDINGS[1:]):
        assert sets[coarse] <= sets[fine], (coarse, fine)

    rows = sorted(
        q246_banding_sla(spark, sf_dir).collect(), key=lambda r: r["bands"]
    )
    assert [r["bands"] for r in rows] == list(_Q246_BANDINGS)
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls), recalls
    met = [r for r in rows if r["met"]]
    picked = [r for r in rows if r["picked"]]
    if met:
        assert len(picked) == 1
        assert picked[0]["bands"] == min(r["bands"] for r in met)
        assert picked[0]["recall"] >= _Q246_TARGET
    else:
        assert not picked
