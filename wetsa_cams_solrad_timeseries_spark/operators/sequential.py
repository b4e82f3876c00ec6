"""Per-key ORDERED, NON-ASSOCIATIVE folds — the operator class that
window functions and grouped aggregates cannot express.

A capped running balance ``bal := clamp(bal + delta, 0, cap)`` is the
canonical example: the clamp makes the fold non-associative, so there is
no partial-aggregate / merge decomposition and no window-frame rewrite —
prefix sums, segment trees, and ``sum() OVER`` all compute the WRONG
answer the moment one intermediate clamps. The only faithful plan is a
per-key sequential scan.

Spark shape: ``groupBy(key).applyInPandas`` — the shuffle partitions by
key (the scale dimension: millions of independent keys → full cluster
width), and each task folds its keys' rows in event order. The Python
fold is a per-row loop over an Arrow-delivered batch; at 100 TB the same
kernel body compiles under Numba/Cython without changing the plan. State
per key is O(1) (balance + two counters), so arbitrarily long histories
stream through without memory growth — only the sort within each group
is O(n log n) local work.

Reference parity: the reference's per-station sequential passes
(reference/code/compile-solrad.py's per-file loops) are this shape with
an associative body; this operator covers the non-associative remainder.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_running_balance(
    df: DataFrame,
    *,
    key: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    delta_col: str = "delta",
    cap: float = 200.0,
) -> DataFrame:
    """Fold each key's rows in ``order_cols`` order through
    ``bal = min(max(bal + delta, 0), cap)`` starting at 0; return one
    row per key: final balance, clamp counts, and step count.

    Determinism: ``order_cols`` must be a per-key-unique ordering (the
    caller includes a tiebreak column); the fold then visits rows in one
    well-defined order regardless of input partitioning — locked by
    tests/test_advanced_plans.py's partitioning-invariance case.
    """
    # Derive the key field's type from the input schema — a hardcoded
    # `long` would silently miscast (or fail in applyInPandas) for
    # string/int keys despite the generic signature.
    key_type = df.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_type}, final_balance double, n_clamp_low long, "
        "n_clamp_high long, n_steps long"
    )
    order = list(order_cols)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        bal, lo, hi = 0.0, 0, 0
        for d in pdf[delta_col].to_numpy():
            bal += d
            if bal < 0.0:
                bal, lo = 0.0, lo + 1
            elif bal > cap:
                bal, hi = cap, hi + 1
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "final_balance": [bal],
                "n_clamp_low": [lo],
                "n_clamp_high": [hi],
                "n_steps": [len(pdf)],
            }
        )

    cols = [key, delta_col, *order]
    slim = df.select(*dict.fromkeys(cols))
    return _fold_by_key(slim, key, fold, out_schema).withColumn(
        "final_balance", F.round(F.col("final_balance") + F.lit(1e-9), 6)
    )


def greedy_pack(
    df: DataFrame,
    *,
    key: str = "lang",
    order_col: str = "doc_id",
    size_col: str = "n_chars",
    budget: int = 2048,
) -> DataFrame:
    """Greedy sequence packing WITHOUT item spanning: walk each key's
    items in ``order_col`` order; an item joins the current bin iff it
    fits (``fill + size <= budget``), else it OPENS a new bin (items
    larger than the budget get a bin of their own). One row per item:
    ``(key, order_col, size_col, bin_id)``.

    This is the packing SFT/training pipelines use when documents must
    not cross an example boundary — and it is a NON-associative fold
    (the bin boundary depends on the running remainder), so no prefix
    sum or window frame expresses it; contrast q114's concat-and-chunk
    sharding, which spans items and IS a closed-form over the prefix
    sum. Same distributed shape as :func:`capped_running_balance`:
    shuffle by key, per-key ordered scan with O(1) state.
    """
    key_t = df.schema[key].dataType.simpleString()
    order_t = df.schema[order_col].dataType.simpleString()
    size_t = df.schema[size_col].dataType.simpleString()
    out_schema = (
        f"{key} {key_t}, {order_col} {order_t}, {size_col} {size_t}, "
        "bin_id long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        bins = []
        bin_id, fill = 0, None
        for c in pdf[size_col].to_numpy():
            if fill is None:
                fill = c
            elif fill + c <= budget:
                fill += c
            else:
                bin_id += 1
                fill = c
            bins.append(bin_id)
        return pdf.assign(bin_id=bins)[
            [key, order_col, size_col, "bin_id"]
        ]

    slim = df.select(*dict.fromkeys([key, order_col, size_col]))
    return _fold_by_key(slim, key, fold, out_schema)


def _fold_by_key(slim: DataFrame, key: str, fold, out_schema: str) -> DataFrame:
    # Task-count sizing: pre-partition by key so the groupBy reuses the
    # partitioning (no second exchange) and the task count tracks input
    # volume instead of spark.sql.shuffle.partitions — each grouped-map
    # task carries fixed Python-worker/Arrow overhead that dominates on
    # small inputs (measured 4x at sf0.1). Volume comes from CATALYST'S
    # size estimate (the maybe_broadcast idiom), NOT a count() — a count
    # would be a full extra job re-executing the operator's entire
    # upstream lineage just to pick a partition number. Production at
    # 100 TB lands at full cluster width either way.
    spark = slim.sparkSession
    hi = max(4, spark.sparkContext.defaultParallelism)
    bytes_per_part = 4 * 1024 * 1024  # ~50k fold rows at ~80 B/row
    try:
        est = slim._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        est = int(est if isinstance(est, int) else est.toString())
        n_parts = max(4, min(hi, est // bytes_per_part + 1))
    except Exception:
        n_parts = hi
    return (
        slim.repartition(n_parts, key)
        .groupBy(key)
        .applyInPandas(fold, schema=out_schema)
    )
