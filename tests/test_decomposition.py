"""Contracts of the PCA operator family (operators/decomposition.py).

The determinism chain the q241/q242 oracles rely on: the trainer is a
TOTAL deterministic function of its input rows (eigh + stable descending
eigenvalue order + largest-component-positive sign), the projected
coordinates agree across the two projection paths (JVM fold vs Arrow
BLAS) within the round6 grid, and the cluster-scale moments path
(`gram_moments`) reproduces the sample path's covariance to float ULP.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.arrays import to_double_array
from wetsa_cams_solrad_timeseries_spark.operators.decomposition import (
    gram_moments,
    pca_core,
    pca_core_from_moments,
    pca_fit,
    pca_project_batches,
    pca_project_cols,
)
from wetsa_cams_solrad_timeseries_spark.plans.relational import table


def _emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


def test_pca_core_basis_contract():
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(200, 16))
    mean, comps, evr = pca_core(mat, 4)
    w = np.array(comps)
    # Orthonormal rows.
    assert np.allclose(w @ w.T, np.eye(4), atol=1e-9)
    # Sign rule: each component's largest-|w| entry is positive.
    for row in w:
        assert row[np.abs(row).argmax()] > 0
    # Explained variance descending, within (0, 1].
    assert evr == sorted(evr, reverse=True)
    assert 0 < sum(evr) <= 1 + 1e-12
    # Total determinism: a second run is bit-identical.
    mean2, comps2, evr2 = pca_core(mat.copy(), 4)
    assert mean == mean2 and comps == comps2 and evr == evr2


def test_projection_paths_agree(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    mean, comps, _ = pca_fit(emb, n_components=4)
    cols = pca_project_cols(to_double_array(F.col("embedding")), mean, comps)
    fold = {
        r["vec_id"]: tuple(r[f"c{j}"] for j in range(4))
        for r in emb.select(
            "vec_id", *[c.alias(f"c{j}") for j, c in enumerate(cols)]
        ).collect()
    }
    blas = {
        r["vec_id"]: tuple(r["p"])
        for r in pca_project_batches(emb, mean, comps).collect()
    }
    assert fold.keys() == blas.keys()
    # The batch kernel accumulates one AXPY per input dim — the same
    # IEEE op sequence as the JVM fold — and rounds with Spark's exact
    # HALF_UP-on-repr semantics, so the two paths are bit-identical.
    # q242/q243/q249 serve the batch path while their oracles replay
    # the fold; any nonzero gap here is a latent oracle flake.
    worst = max(
        abs(a - b)
        for vid in fold
        for a, b in zip(fold[vid], blas[vid])
    )
    assert worst == 0.0, worst


def test_gram_moments_matches_sample_covariance(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    rows = gram_moments(emb).collect()
    d = 64
    mean_m, comps_m, evr_m = pca_core_from_moments(rows, d, 2)

    from wetsa_cams_solrad_timeseries_spark.operators.similarity import (
        hash_bounded_sample,
    )

    mat = hash_bounded_sample(emb)
    mean_s, comps_s, evr_s = pca_core(mat, 2)
    # At test SFs the bounded sample IS the corpus, so the two trainer
    # inputs are identical up to summation order; the derived basis must
    # agree to numerical precision.
    assert np.allclose(mean_m, mean_s, atol=1e-9)
    assert np.allclose(np.array(comps_m), np.array(comps_s), atol=1e-7)
    assert np.allclose(evr_m, evr_s, atol=1e-9)


def test_gram_moments_is_parameter_sized(spark, sf_dir):
    n_rows = gram_moments(_emb(spark, sf_dir)).count()
    assert n_rows == 64 * 64 + 64 + 1  # d² + d + 1, never corpus-sized


def test_pca_screen_recall_beats_nothing_and_is_bounded(spark, sf_dir):
    from wetsa_cams_solrad_timeseries_spark.plans.vector import (
        q242_pca_ann_gate,
    )

    row = q242_pca_ann_gate(spark, sf_dir).collect()[0]
    assert row["n_queries"] > 0
    assert 0.0 <= row["min_recall"] <= row["avg_recall"] <= 1.0 + 1e-9


def test_round6_spark_matches_decimal_rule_at_large_magnitude():
    # Round-12 ADVICE: the midpoint-suspect band must widen with
    # magnitude — at |value| > ~9e3 half an ulp of value*1e6 exceeds a
    # fixed 1e-6 band, so near-midpoint doubles there escaped the exact
    # HALF_UP-on-repr recompute. The contract is elementwise equality
    # with the Decimal rule; exercise it exactly where the fixed band
    # under-detected.
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from wetsa_cams_solrad_timeseries_spark.operators.decomposition import (
        round6_spark,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(9_000, 200_000, size=500).astype(np.float64)
    micros = rng.randint(0, 1_000_000, size=500).astype(np.float64)
    vals = base + micros / 1e6 + 5e-7  # parked on the rounding midpoint
    got = round6_spark(vals.copy())
    q = Decimal("0.000001")
    want = np.array(
        [
            float(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP))
            for v in vals
        ]
    )
    assert (got == want).all()
