"""Principal-component decomposition over embedding columns.

The missing DIMENSION-REDUCTION member of the index-transform family
(rotation = OPQ `operators/similarity.opq_train`, scalar grids = SQ8,
subspace codebooks = PQ): a corpus-level orthogonal basis that (a) gives
2-D analytic projections of an embedding table and (b) screens ANN
candidates in a cheap low-rank space before an exact full-dim rerank.

Training discipline matches every other trainer in this repo (see
``operators/similarity.hash_bounded_sample``): the fit runs driver-side
numpy on the hash-bounded deterministic sample — index training is
parameter-sized by design (FAISS trains on ~1% too), and the oracle twin
(``hash_bounded_sample_py`` + :func:`pca_core`) replays the identical
rows through the identical numpy steps, so the learned (mean, loadings)
are bit-identical across engines with no rounding defence needed in
training. PROJECTION — the data-sized pass — stays distributed, either
as JVM fold expressions (few components) or one BLAS matmul per Arrow
batch (``pca_project_batches``), both round6'd so the DuckDB list-fold
replay agrees (the ``ivf_assign`` BLAS-vs-fold parity argument).

For clusters where even the bounded sample should not leave the
executors, :func:`gram_moments` computes the exact full-corpus
(count, sum, Gram) via a scan-stage Arrow kernel + one (i, j)-keyed
aggregation — d²+d+1 rows, parameter-sized — from which the same
:func:`pca_core` math applies; pytest locks its agreement with the
numpy covariance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wetsa_cams_solrad_timeseries_spark.functions.arrays import to_double_array


def round6_spark(arr):
    """Round a float64 ndarray to 6 places with EXACTLY Spark's
    ``F.round(double, 6)`` semantics — HALF_UP over the double's
    shortest decimal representation (``BigDecimal.valueOf``), not
    numpy's scale/rint/divide, which can disagree at grid boundaries
    on the very same input double. Vectorized over the off-grid
    residue only, so the common already-6dp case stays numpy-fast."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")
    fast = np.round(arr, 6)
    # np.round and HALF_UP-on-repr can only disagree within half an
    # ulp-of-scaling of the midpoint grid; re-do only suspects exactly.
    # The suspect band must be magnitude-aware: half an ulp of
    # ``scaled`` is eps·|scaled|/2, which exceeds a FIXED 1e-6 once
    # |value| passes ~9e3 (|scaled| ~9e9) — a fixed band under-detects
    # there and the two rounding rules could disagree undetected
    # (round-12 ADVICE). max() keeps the cheap fixed band at small
    # magnitudes and widens it with the ulp where the grid coarsens.
    scaled = arr * 1e6
    frac = np.abs(scaled - np.floor(scaled) - 0.5)
    band = np.maximum(1e-6, 8.0 * np.finfo(np.float64).eps * np.abs(scaled))
    suspects = np.argwhere(frac < band)
    for idx in suspects:
        t = tuple(idx)
        fast[t] = float(
            Decimal(repr(float(arr[t]))).quantize(q, rounding=ROUND_HALF_UP)
        )
    return fast


def pca_core(mat, n_components: int):
    """(mean, loadings, explained_variance_ratio) from an (n, d) float64
    matrix — the numpy steps shared bit-for-bit by the Spark trainer and
    the oracle twin. Eigenvectors of the biased covariance, sorted by
    descending eigenvalue ((value, index) ties toward the lower index),
    each sign-canonicalized so its largest-|w| component is positive
    (first index on ties) — a total deterministic rule, so identical
    input matrices yield identical loadings on any replay."""
    import numpy as np

    mat = np.asarray(mat, dtype=np.float64)
    n = mat.shape[0]
    mean = mat.mean(axis=0)
    x = mat - mean
    cov = (x.T @ x) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:n_components]
    comps = []
    for idx in order:
        w = evecs[:, idx].copy()
        j = int(np.abs(w).argmax())
        if w[j] < 0:
            w = -w
        comps.append([float(v) for v in w])
    total = float(evals.sum())
    evr = [float(evals[i]) / total if total > 0 else 0.0 for i in order]
    return [float(v) for v in mean], comps, evr


def pca_fit(
    emb_df: DataFrame,
    n_components: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_train: int = 65536,
):
    """Deterministic PCA fit on the hash-bounded training sample —
    the trainer-side entry point; see module docstring."""
    from wetsa_cams_solrad_timeseries_spark.operators.similarity import (
        hash_bounded_sample,
    )

    return pca_core(
        hash_bounded_sample(emb_df, id_col, emb_col, max_train), n_components
    )


def pca_project_cols(v_col, mean, comps):
    """One round6'd JVM fold Column per component: pc_j = Σ_i (v_i -
    mean_i)·w_ji — the few-component projection path (whole-stage
    codegen, no Python). Element order matches the DuckDB list-fold
    replay; the +1e-9 nudge absorbs the residual ULP gap (the l2sq_cols
    argument)."""
    out = []
    for w in comps:
        # Unrolled codegen fold — identical left-association IEEE value
        # as the aggregate over zip_with(zip_with(v, mean, a−b), w, a·b)
        # (guide §4.1; the r13 dim-unroll). Literal mean/weight elements
        # fold into the expression tree directly, so the two broadcast
        # literal arrays disappear too.
        dot = F.lit(0.0)
        for i, (m, x) in enumerate(zip(mean, w)):
            dot = dot + (v_col[i] - F.lit(float(m))) * F.lit(float(x))
        out.append(F.round(dot + F.lit(1e-9), 6))
    return out


def pca_project_batches(
    emb_df: DataFrame,
    mean,
    comps,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Distributed projection to ``len(comps)`` dims vectorized per
    Arrow batch — the many-component path (r fold trees of d terms
    each would bloat codegen, the ``cell_knn_edges`` lesson). The
    accumulation is one AXPY per input dim (``acc += (v_i-μ_i)·w_i``),
    NOT a blocked matmul, so every projected element is produced by
    exactly the same sequence of IEEE ops as the JVM fold /
    DuckDB list-fold replay — the two paths are bit-identical
    (pytest asserts worst == 0), not merely within a round6 nudge."""
    import numpy as np
    import pandas as pd

    mu = np.asarray(mean, dtype=np.float64)
    wt = np.asarray(comps, dtype=np.float64).T  # (d, r)

    def kernel(batches):
        for pdf in batches:
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            if mat.size == 0:
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "p": []})
                continue
            acc = np.zeros((mat.shape[0], wt.shape[1]))
            for i in range(wt.shape[0]):
                acc += (mat[:, i] - mu[i])[:, None] * wt[i][None, :]
            proj = round6_spark(acc + 1e-9)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "p": list(proj)}
            )

    return emb_df.mapInPandas(kernel, schema=f"{id_col} long, p array<double>")


def gram_moments(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Exact full-corpus (n, Σv, VᵀV) via a scan-stage Arrow kernel
    emitting per-batch partials keyed (i, j) — one d²-key aggregation,
    d²+d+1 result rows (parameter-sized), never a driver-side corpus
    pass: the cluster-scale alternative trainer input for corpora whose
    bounded sample is still too skewed. Row encoding: (-1, -1) → count,
    (i, -1) → Σv_i, (i, j) → Σ v_i·v_j."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            mat = np.array(list(pdf[emb_col]), dtype=np.float64)
            if mat.size == 0:
                continue
            d = mat.shape[1]
            g = mat.T @ mat
            s = mat.sum(axis=0)
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        ([-1], np.arange(d), ii.ravel())
                    ).astype("int32"),
                    "j": np.concatenate(
                        ([-1], np.full(d, -1), jj.ravel())
                    ).astype("int32"),
                    "v": np.concatenate(
                        ([float(len(mat))], s, g.ravel())
                    ),
                }
            )

    return (
        emb_df.select(id_col, emb_col)
        .mapInPandas(kernel, schema="i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )


def pca_core_from_moments(rows, d: int, n_components: int):
    """:func:`pca_core`'s math from collected :func:`gram_moments` rows
    — assemble (n, mean, covariance) then reuse the eigh/sign rule.
    The moments are exact sums, so up to float-summation ULP this
    matches the sample path on the same rows (pytest-locked)."""
    import numpy as np

    n = 0.0
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        i, j, v = r["i"], r["j"], r["v"]
        if i == -1:
            n = v
        elif j == -1:
            s[i] = v
        else:
            g[i, j] = v
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:n_components]
    comps = []
    for idx in order:
        w = evecs[:, idx].copy()
        jmax = int(np.abs(w).argmax())
        if w[jmax] < 0:
            w = -w
        comps.append([float(v) for v in w])
    total = float(evals.sum())
    evr = [float(evals[i]) / total if total > 0 else 0.0 for i in order]
    return [float(v) for v in mean], comps, evr
