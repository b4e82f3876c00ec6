"""Shuffle-budget regression net.

Each entry pins the EXCHANGE COUNT budget of a representative declared
query's physical plan (plus required/forbidden operators). A refactor
that silently adds a shuffle — the dominant cost at 100 TB — fails here
long before it shows up as a bench regression. Budgets are upper bounds
(<=), so beneficial re-plans don't break the test; structural
requirements (broadcast joins, TakeOrderedAndProject, no cartesian
product) are exact.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from wetsa_cams_solrad_timeseries_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


# (query, max exchanges, required substrings, forbidden substrings)
BUDGETS = [
    # Grouped agg: one shuffle on the group keys, nothing else.
    ("q01_pricing_summary", 1, [], []),
    # Star joins: all dimensions broadcast; fact shuffles only for the agg.
    ("q03_star_join_revenue", 1, ["BroadcastHashJoin"], ["SortMergeJoin"]),
    ("q57_event_enrichment", 2, ["BroadcastHashJoin"], ["SortMergeJoin"]),
    # Global top-k: per-partition top-k + merge, never a global sort.
    ("q21_shipping_priority", 2, ["TakeOrderedAndProject"], []),
    ("q65_returned_items", 2, ["TakeOrderedAndProject"], []),
    ("q88_bigram_topk", 1, ["TakeOrderedAndProject"], []),
    # Selective single-pass aggregate: partial+final over one exchange.
    ("q47_revenue_forecast", 1, [], ["Join"]),
    # Curation funnel: dedup + rollup(+countDistinct expand) shuffles only.
    ("q90_curation_funnel", 3, [], ["Join"]),
    # Stratified sample: map-side prune, one shuffle on the stratum key.
    ("q87_stratified_sample", 1, [], []),
    # Windowed analytics reuse one partitioning.
    ("q43_analytic_windows", 1, [], []),
    # Anti/semi joins stay broadcast at dimension scale.
    ("q19_anti_join", 1, ["Broadcast"], ["CartesianProduct"]),
    ("q20_semi_join", 1, ["Broadcast"], ["CartesianProduct"]),
]


@pytest.mark.parametrize("name,max_ex,required,forbidden", BUDGETS)
def test_shuffle_budget(spark, name, max_ex, required, forbidden):
    plan = _plan(QUERIES[name].fn(spark, SF))
    n = _n_exchanges(plan)
    assert n <= max_ex, f"{name}: {n} exchanges > budget {max_ex}\n{plan[:2000]}"
    for s in required:
        assert s in plan, f"{name}: expected {s} in plan\n{plan[:2000]}"
    for s in forbidden:
        assert s not in plan, f"{name}: forbidden {s} in plan\n{plan[:2000]}"
    assert "CartesianProduct" not in plan, name
