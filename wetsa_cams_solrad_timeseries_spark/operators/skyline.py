"""Distributed 2-D skyline (Pareto frontier): minimize one column,
maximize the other, return every non-dominated row.

Skyline has no SQL rewrite cheaper than the quadratic NOT EXISTS
dominance test, but it IS distribution-friendly: the skyline of a union
is contained in the union of the skylines, so the classic two-phase plan
applies —

  phase 1: per-partition local skyline (mapInPandas sweep, O(n log n)
           per partition) prunes the overwhelming majority of rows;
  phase 2: the surviving candidates (expected O(polylog n) for
           independent dimensions) are folded to one partition and swept
           once more.

At 100 TB phase 1 runs at full cluster width and phase 2's input is the
concatenation of ~num_partitions tiny frontiers. For ADVERSARIAL
(anti-correlated) data the skyline itself can be O(n) and no algorithm
avoids a large phase 2; the standard mitigation is grid/angular
partitioning so phase 2 is again parallel — documented here as the
fallback, not implemented, because the output itself is the bottleneck
in that regime.

The sweep: sort by (min_col asc, max_col desc); a row survives iff its
max_col strictly exceeds every earlier price-group's best AND equals its
own price-group's best. Equal (min_col, max_col) duplicates are mutually
non-dominating and all survive.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _sweep(pdf: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    if pdf.empty:
        return pdf
    pdf = pdf.sort_values([min_col, max_col], ascending=[True, False],
                          kind="mergesort")
    # Group max per min_col value, then running strict-max over groups.
    gmax = pdf.groupby(min_col, sort=True)[max_col].transform("max")
    keep_in_group = pdf[max_col].to_numpy() == gmax.to_numpy()
    grp = pdf.groupby(min_col, sort=True)[max_col].max()
    prev_best = grp.cummax().shift(1)
    ok_groups = grp[prev_best.isna() | (grp > prev_best)].index
    return pdf[keep_in_group & pdf[min_col].isin(ok_groups)]


def skyline_2d(df: DataFrame, *, min_col: str, max_col: str) -> DataFrame:
    """Rows of ``df`` not dominated by any other row (minimize
    ``min_col``, maximize ``max_col``; domination requires >= on both
    with > on at least one). Partitioning-invariant: the two-phase prune
    returns exactly the global skyline for any input split."""
    schema = df.schema

    def local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-Arrow-batch sweep: any subset's skyline is a valid prune.
        for pdf in it:
            yield _sweep(pdf, min_col, max_col)

    def merge(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Final pass must see the WHOLE candidate set at once (a
        # per-batch sweep would only prune within batches), so the single
        # partition's batches are concatenated before the sweep.
        parts = [pdf for pdf in it if not pdf.empty]
        if parts:
            yield _sweep(pd.concat(parts, ignore_index=True), min_col, max_col)

    candidates = df.mapInPandas(local, schema=schema)
    return candidates.repartition(1).mapInPandas(merge, schema=schema)
