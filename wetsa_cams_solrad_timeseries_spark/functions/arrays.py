"""Array/vector math over ``array<float>`` embedding columns.

All pure JVM-side expressions — no Python UDF in the hot path. Two
spellings per kernel, chosen by whether the array length is statically
known:

- ``dim=None`` (default): a sequential left fold via ``zip_with`` +
  ``aggregate``. Works for any length — but higher-order-function
  lambdas ALWAYS evaluate on the interpreted expression path (no
  whole-stage codegen), costing ~20-50× per element (round-13
  optimization measurement: the NN-descent candidate scorer spent
  10-47 s in a 2-task stage at sf0.1, nearly all of it interpreted
  fold evaluation).
- ``dim=k``: the fold unrolled to the EXACT same left-association
  ``((0.0 + t0) + t1) + …`` over ``a[i]``/``b[i]`` element accesses —
  bit-identical IEEE result by construction (floating-point adds are
  never reassociated by Catalyst), but a plain codegen-able expression
  tree that runs compiled inside WholeStageCodegen. Use it whenever the
  arrays are the fixed-width embedding columns (the corpus is
  ``_DIM``-wide by schema; every oracle already indexes
  ``range(1, dim+1)`` and so assumes exactly that width).

Embeddings arrive as ``array<float>``; every computation first casts to
``array<double>`` so Spark and the DuckDB oracle accumulate at the same
precision. The cast is spelled ``CAST(col AS array<double>)`` — a
native, codegen-able element-wise Cast — rather than an interpreted
``transform`` lambda doing the identical per-element cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    """``array<float>`` → ``array<double>`` element-wise (native Cast)."""
    return col.cast("array<double>")


def _fold_sum(terms) -> Column:
    """((0.0 + t0) + t1) + … — the exact association order of
    ``F.aggregate(…, lit(0.0), acc + x)``, as a codegen-able tree."""
    total = F.lit(0.0)
    for t in terms:
        total = total + t
    return total


def dot_product(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product of two ``array<double>`` columns.
    With ``dim`` set, the fold is unrolled (same value, codegen path);
    both arrays must then be exactly ``dim`` long (shorter arrays yield
    NULL via out-of-bounds element access instead of a partial sum)."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    return _fold_sum(a[i] * b[i] for i in range(dim))


def l2_norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot_product(a, a, dim))


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity with a null result for zero-norm inputs."""
    return dot_product(a, b, dim) / F.nullif(
        l2_norm(a, dim) * l2_norm(b, dim), F.lit(0.0)
    )
