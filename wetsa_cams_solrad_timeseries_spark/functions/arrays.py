"""Array/vector math over ``array<float>`` embedding columns.

All pure JVM-side expressions (``zip_with`` + ``aggregate``) — no Python
UDF in the hot path. The fold is a sequential left fold, which makes the
floating-point result deterministic for a given row (important for the
correctness oracle; see operators/similarity.py).

Embeddings arrive as ``array<float>``; every computation first casts to
``array<double>`` so Spark and the DuckDB oracle accumulate at the same
precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    """``array<float>`` → ``array<double>`` element-wise."""
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two ``array<double>`` columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity with a null result for zero-norm inputs."""
    return dot_product(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
