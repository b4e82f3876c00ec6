"""B1/B2 regression aggregates vs scipy.stats.linregress (the reference's
exact call — code/solrad-compare.py:131)."""

import numpy as np
import pandas as pd
import pytest

from wetsa_cams_solrad_timeseries_spark.operators.regression import (
    regression_agg,
    with_stderr_pvalue,
)

def test_regression_agg_matches_numpy(spark):
    rng = np.random.RandomState(42)
    x = rng.uniform(0, 1000, 500)
    y = 0.93 * x + 12.0 + rng.normal(0, 25, 500)
    pdf = pd.DataFrame({"x": x, "y": y, "g": ["s1"] * 250 + ["s2"] * 250})
    sdf = spark.createDataFrame(pdf)
    got = {
        r["g"]: r
        for r in regression_agg(sdf, y="y", x="x", group_cols=("g",)).collect()
    }
    for g in ("s1", "s2"):
        sub = pdf[pdf.g == g]
        slope, intercept = np.polyfit(sub.x, sub.y, 1)
        r2 = np.corrcoef(sub.x, sub.y)[0, 1] ** 2
        assert got[g]["slope"] == pytest.approx(slope, rel=1e-9)
        assert got[g]["intercept"] == pytest.approx(intercept, rel=1e-9)
        assert got[g]["r2"] == pytest.approx(r2, rel=1e-9)
        assert got[g]["n"] == len(sub)


def test_stderr_pvalue_closed_form_matches_scipy(spark):
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.RandomState(7)
    x = rng.uniform(0, 100, 200)
    y = 1.7 * x + rng.normal(0, 40, 200)
    exp = scipy_stats.linregress(x, y)
    pdf = pd.DataFrame({"x": x, "y": y})
    row = regression_agg(spark.createDataFrame(pdf), y="y", x="x").first()
    enriched = with_stderr_pvalue([row.asDict()])[0]
    assert enriched["stderr"] == pytest.approx(exp.stderr, rel=1e-6)
    assert enriched["p_value"] == pytest.approx(exp.pvalue, rel=1e-6, abs=1e-300)


def test_stderr_finite_at_exact_fit(spark):
    # r² == 1 exactly: scipy gives stderr=0, p=0 — not None.
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "y": [2.0, 4.0, 6.0, 8.0]})
    row = regression_agg(
        spark.createDataFrame(pdf), y="y", x="x", extended=True
    ).first()
    enriched = with_stderr_pvalue([row.asDict()])[0]
    assert enriched["stderr"] == 0.0
    assert enriched["p_value"] == 0.0


def test_regression_excludes_null_pairs(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, None, 4.0], "y": [2.0, None, 3.0, 8.0]})
    row = regression_agg(spark.createDataFrame(pdf), y="y", x="x").first()
    assert row["n"] == 2  # only complete pairs, matching dropna (P5)
