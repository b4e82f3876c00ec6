"""Property tests (hypothesis) for the semantics corners SURVEY.md §5.2.4
flags: empty buckets, all-null columns, duplicate timestamps through the
J1 join, flag-column subsets (P4), zero denominators (F10)."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.scalar import (
    clean_key,
    null_safe_ratio,
)
from wetsa_cams_solrad_timeseries_spark.operators.filters import qc_flag_filter
from wetsa_cams_solrad_timeseries_spark.operators.joins import timestamp_join
from wetsa_cams_solrad_timeseries_spark.operators.window_agg import tumbling_mean

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def sparse_series(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    offsets = draw(
        st.lists(st.integers(min_value=0, max_value=500), min_size=n, max_size=n)
    )
    values = draw(
        st.lists(
            st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
            min_size=n,
            max_size=n,
        )
    )
    t0 = pd.Timestamp("2024-03-01 00:00:00")
    return pd.DataFrame(
        {
            "time": [t0 + pd.Timedelta(minutes=o) for o in offsets],
            "v": [np.nan if x is None else x for x in values],
        }
    )


@given(sparse_series())
@SET
def test_tumbling_mean_always_matches_pandas(spark, pdf):
    sdf = spark.createDataFrame(pdf)
    got = (
        tumbling_mean(sdf, ts_col="time", value_cols=["v"])
        .orderBy("bucket_start")
        .toPandas()
    )
    exp = pdf.set_index("time").resample("10min").mean().dropna(how="all")
    # Spark emits a row for every non-empty bucket (even all-null buckets
    # yield a null mean only when at least one row exists there).
    exp_nonempty = pdf.set_index("time").resample("10min").count()
    keep = exp_nonempty["v"].index[
        pdf.set_index("time").resample("10min").size() > 0
    ]
    exp_full = pdf.set_index("time").resample("10min").mean().loc[keep]
    assert list(got["bucket_start"]) == list(exp_full.index)
    np.testing.assert_allclose(
        got["v"].to_numpy(), exp_full["v"].to_numpy(), rtol=1e-9, equal_nan=True
    )


@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=25),
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=25),
)
@SET
def test_timestamp_join_duplicate_key_cardinality(spark, lkeys, rkeys):
    # J1 many-to-many semantics: |join| = Σ_k count_L(k)·count_R(k).
    t0 = pd.Timestamp("2024-01-01")
    left = spark.createDataFrame(
        pd.DataFrame({"ts": [t0 + pd.Timedelta(minutes=k) for k in lkeys], "l": 1})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"ts": [t0 + pd.Timedelta(minutes=k) for k in rkeys], "r": 1})
    )
    got = timestamp_join(left, right, ts_col="ts").count()
    from collections import Counter

    cl, cr = Counter(lkeys), Counter(rkeys)
    assert got == sum(cl[k] * cr[k] for k in cl)


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 1)),
            st.one_of(st.none(), st.integers(0, 1)),
        ),
        min_size=1,
        max_size=30,
    ),
    st.booleans(),
)
@SET
def test_qc_flag_filter_matches_nan_skipping_sum(spark, rows, drop_second_col):
    # P4: row survives iff the NaN-skipping sum of PRESENT flags == 0.
    pdf = pd.DataFrame(rows, columns=["flag_a", "flag_b"]).astype("float")
    pdf["v"] = range(len(pdf))
    cols = ["flag_a"] if drop_second_col else ["flag_a", "flag_b"]
    sdf = spark.createDataFrame(pdf[cols + ["v"]])
    got = sorted(r["v"] for r in qc_flag_filter(sdf, ["flag_a", "flag_b"]).collect())
    exp = sorted(pdf.loc[pdf[cols].sum(axis=1, skipna=True) == 0, "v"])
    assert got == exp


@given(
    st.floats(-1e9, 1e9, allow_nan=False),
    st.floats(-1e9, 1e9, allow_nan=False),
)
@SET
def test_null_safe_ratio_never_errors(spark, num, den):
    row = (
        spark.createDataFrame([(num, den)], ["n", "d"])
        .select(null_safe_ratio("n", "d").alias("r"))
        .first()
    )
    if den == 0:
        assert row["r"] is None
    else:
        assert row["r"] == num / den


@st.composite
def asof_inputs(draw):
    n_left = draw(st.integers(1, 15))
    n_right = draw(st.integers(0, 10))
    t0 = pd.Timestamp("2024-01-01")
    lts = draw(st.lists(st.integers(0, 2000), min_size=n_left, max_size=n_left, unique=True))
    rts = draw(st.lists(st.integers(0, 2000), min_size=n_right, max_size=n_right, unique=True))
    groups = draw(st.lists(st.sampled_from(["a", "b"]), min_size=n_left, max_size=n_left))
    rgroups = draw(st.lists(st.sampled_from(["a", "b"]), min_size=n_right, max_size=n_right))
    left = pd.DataFrame(
        {"g": groups, "ts": [t0 + pd.Timedelta(minutes=m) for m in lts],
         "lid": range(n_left)}
    )
    right = pd.DataFrame(
        {"g": rgroups, "rts": [t0 + pd.Timedelta(minutes=m) for m in rts],
         "rv": [m * 10 for m in range(n_right)]}
    )
    return left, right


@given(asof_inputs())
@SET
def test_asof_join_always_matches_merge_asof(spark, inputs):
    from wetsa_cams_solrad_timeseries_spark.operators.joins import asof_join

    left, right = inputs
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right)
            if len(right)
            else spark.createDataFrame(right, "g string, rts timestamp, rv long"),
            left_ts="ts", right_ts="rts", by=["g"], right_cols=["rv", "rts"],
        ).collect()
    }
    if len(right) == 0:
        # pandas merge_asof can't type an empty object-dtype key; the
        # semantic answer is trivially "no match for anyone".
        assert got == {lid: None for lid in left["lid"]}
        return
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.rename(columns={"rts": "ts"}).sort_values("ts"),
        on="ts", by="g",
    ).set_index("lid")["rv"]
    for lid in left["lid"]:
        e = exp.loc[lid]
        if pd.isna(e):
            assert got[lid] is None
        else:
            assert got[lid] == e


@given(st.text(min_size=0, max_size=40))
@SET
def test_clean_key_idempotent_and_canonical(spark, s):
    import re

    df = spark.createDataFrame([(s,)], "name string")
    once = df.select(clean_key("name").alias("k"))
    twice = once.select(clean_key("k").alias("k"))
    a, b = once.first()["k"], twice.first()["k"]
    assert a == b  # normalization is idempotent (safe to apply on both join sides)
    assert not re.search(r"[A-Z]|^\s|\s$|\s{2,}", a or "")


@st.composite
def nearest_inputs(draw):
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(1, 10))
    t0 = pd.Timestamp("2024-01-01")
    lts = draw(st.lists(st.integers(0, 500), min_size=n_left, max_size=n_left,
                        unique=True))
    rts = draw(st.lists(st.integers(0, 500), min_size=n_right,
                        max_size=n_right, unique=True))
    groups = draw(st.lists(st.sampled_from(["a", "b"]), min_size=n_left,
                           max_size=n_left))
    rgroups = draw(st.lists(st.sampled_from(["a", "b"]), min_size=n_right,
                            max_size=n_right))
    tol_min = draw(st.integers(1, 200))
    left = pd.DataFrame(
        {"g": groups, "ts": [t0 + pd.Timedelta(minutes=m) for m in lts],
         "lid": range(n_left)}
    )
    right = pd.DataFrame(
        {"g": rgroups, "rts": [t0 + pd.Timedelta(minutes=m) for m in rts],
         "rv": [m * 10 for m in range(n_right)]}
    )
    return left, right, tol_min


@given(nearest_inputs())
@SET
def test_nearest_join_matches_pandas_merge_asof_nearest(spark, inputs):
    """operators/joins.py::nearest_join ≡ pandas merge_asof
    direction='nearest' (which also prefers the backward row on
    equidistant ties), for any grouping, spacing, and tolerance."""
    from wetsa_cams_solrad_timeseries_spark.operators.joins import nearest_join

    left, right, tol_min = inputs
    got = {
        r["lid"]: r["rv"]
        for r in nearest_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_ts="ts", right_ts="rts", by=["g"], right_cols=["rv"],
            tolerance_seconds=tol_min * 60,
        ).collect()
    }
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.rename(columns={"rts": "ts"}).sort_values("ts"),
        on="ts", by="g", direction="nearest",
        tolerance=pd.Timedelta(minutes=tol_min),
    ).set_index("lid")["rv"]
    for lid in left["lid"]:
        e = exp.loc[lid]
        if pd.isna(e):
            assert got[lid] is None
        else:
            assert got[lid] == e


@st.composite
def skyline_inputs(draw):
    n = draw(st.integers(1, 40))
    prices = draw(st.lists(st.integers(0, 15), min_size=n, max_size=n))
    sizes = draw(st.lists(st.integers(0, 15), min_size=n, max_size=n))
    return pd.DataFrame(
        {"pid": range(n), "price": [float(p) for p in prices],
         "size": sizes}
    )


@given(skyline_inputs())
@SET
def test_skyline_matches_quadratic_reference(spark, pdf):
    """operators/skyline.py two-phase prune ≡ the O(n^2) dominance
    definition, including duplicate points (mutually non-dominating) and
    any partitioning."""
    from wetsa_cams_solrad_timeseries_spark.operators.skyline import skyline_2d

    got = {
        r.pid
        for r in skyline_2d(
            spark.createDataFrame(pdf).repartition(3),
            min_col="price", max_col="size",
        ).collect()
    }
    want = set()
    rows = list(pdf.itertuples(index=False))
    for p in rows:
        dominated = any(
            q.price <= p.price and q.size >= p.size
            and (q.price < p.price or q.size > p.size)
            for q in rows
        )
        if not dominated:
            want.add(p.pid)
    assert got == want


# --------------------------------------------------------------------------
# q198's repeated_spans vs a brute-force reference (random tiny-vocab
# corpora maximize repeated grams and adjacency edge cases: multiple
# islands per doc, spans at doc boundaries, intra-doc-only repeats).
# --------------------------------------------------------------------------
@st.composite
def _doc_corpus(draw):
    n_docs = draw(st.integers(min_value=2, max_value=5))
    return [
        (
            i,
            " ".join(
                draw(
                    st.lists(
                        st.sampled_from(["a", "b", "c"]),
                        min_size=0,
                        max_size=12,
                    )
                )
            ),
        )
        for i in range(n_docs)
    ]


def _ref_spans(docs, w, min_docs):
    grams, per_doc = {}, {}
    for did, text in docs:
        toks = [t for t in text.strip().split() if t]
        gs = [
            (i + 1, " ".join(toks[i : i + w]))
            for i in range(len(toks) - w + 1)
        ]
        per_doc[did] = gs
        for _, g in gs:
            grams.setdefault(g, set()).add(did)
    rep = {g for g, ds in grams.items() if len(ds) >= min_docs}
    spans = []
    for did, gs in per_doc.items():
        pos = sorted(p for p, g in gs if g in rep)
        start = prev = None
        for p in pos:
            if prev is not None and p == prev + 1:
                prev = p
                continue
            if prev is not None:
                spans.append((did, start, prev + w - 1, prev + w - 1 - start + 1))
            start = prev = p
        if prev is not None:
            spans.append((did, start, prev + w - 1, prev + w - 1 - start + 1))
    return sorted(spans)


@given(docs=_doc_corpus())
@SET
def test_repeated_spans_match_reference(spark, docs):
    from wetsa_cams_solrad_timeseries_spark.operators.text import repeated_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in repeated_spans(df, "doc_id", "text", w=2).collect()
    )
    assert got == _ref_spans(docs, w=2, min_docs=2)


# --------------------------------------------------------------------------
# q201's merge algebra at the operator level: postings stats of ANY
# disjoint doc split, merged additively (+ struct-max), equal the
# whole-corpus stats — the invariance that makes the postings index
# incrementally maintainable.
# --------------------------------------------------------------------------
@given(docs=_doc_corpus(), pivot=st.integers(min_value=0, max_value=5))
@SET
def test_postings_stats_merge_equals_whole(spark, docs, pivot):
    from wetsa_cams_solrad_timeseries_spark.operators.text import postings_stats

    df = spark.createDataFrame(docs, "doc_id long, text string")
    whole = {
        r["token"]: (r["df"], r["total_tf"], tuple(r["top"]))
        for r in postings_stats(df, "doc_id", "text").collect()
    }
    a = postings_stats(df.filter(F.col("doc_id") < pivot), "doc_id", "text")
    b = postings_stats(df.filter(F.col("doc_id") >= pivot), "doc_id", "text")
    merged = {}
    for part in (a.collect(), b.collect()):
        for r in part:
            df_, tt, top = merged.get(r["token"], (0, 0, None))
            cand = tuple(r["top"])
            merged[r["token"]] = (
                df_ + r["df"],
                tt + r["total_tf"],
                cand if top is None else max(top, cand),
            )
    assert merged == whole
