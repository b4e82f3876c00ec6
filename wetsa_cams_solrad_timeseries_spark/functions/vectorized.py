"""Arrow-vectorized scalar UDFs — the engine's ONLY sanctioned Python
scalar path (row-at-a-time ``@udf`` is banned; see README design rules).

NOTE: no ``from __future__ import annotations`` here on purpose —
``pandas_udf`` resolves the type hints at decoration time, and PEP-563
stringified annotations defeat that.
"""

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot_literal(weights: list) -> "callable":
    """Build a pandas_udf computing ``w · x`` for a fixed weight vector:
    one float64 BLAS matmul per Arrow batch, zero per-row Python. The
    float32 array column is widened to float64 BEFORE the product so the
    result matches engines that compute in double throughout."""
    import numpy as np

    w = np.asarray(weights, dtype=np.float64)

    @pandas_udf("double")
    def _dot(v: pd.Series) -> pd.Series:
        # Per-row isolation: a NULL or wrong-dimension embedding yields a
        # NaN score instead of a np.vstack ValueError that fails the
        # whole task (the same O2 contract as the multimodal kernels).
        dim = len(w)
        rows = [
            np.asarray(x, dtype=np.float64)
            if x is not None and len(x) == dim
            else np.full(dim, np.nan)
            for x in v
        ]
        mat = np.vstack(rows) if rows else np.empty((0, dim))
        return pd.Series(mat @ w)

    return _dot


def sigmoid(col: Column) -> Column:
    """JVM-side logistic — keeps everything but the dot product out of
    Python."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))
