"""Convergence-loop semantics of operators/graph.py::pagerank — the
early-stop behaviors the q192 oracle cannot see from values alone:

- a fast-converging graph stops BEFORE the cap (the loop is a real
  convergence loop, not a fixed-iteration unroll in disguise);
- eps below reachable movement runs to the cap and reports it;
- an empty edge list raises instead of dividing by zero.

q192's driver-checked oracle proves cross-engine value parity including
the shared stop round; this file locks the loop mechanics engine-side.
"""

import math

import pytest
from pyspark.sql import functions as F  # noqa: F401 — session warm import

from wetsa_cams_solrad_timeseries_spark.operators.graph import pagerank


def test_fast_graph_stops_early(spark):
    # Complete graph K8 is rank-uniform from the start: the power method
    # is (numerically) stationary at r0, so round 1's delta is ~1e-17
    # and the loop must stop immediately — far short of the cap.
    edges = spark.createDataFrame(
        [(u, v) for u in range(8) for v in range(8) if u < v],
        "u int, v int",
    )
    ranks, n_iters = pagerank(edges, eps=1e-9, max_iters=10)
    assert n_iters < 10, "cap bound on a graph that converges in 1 round"
    rows = {r["node"]: r["r"] for r in ranks.collect()}
    assert len(rows) == 8
    for v in rows.values():
        assert math.isclose(v, 1.0 / 8, rel_tol=1e-9)
    assert math.isclose(sum(rows.values()), 1.0, rel_tol=1e-9)


def test_unreachable_eps_binds_cap(spark):
    # Path graph mixes slowly; eps=0 is unreachable (delta >= 0), so the
    # loop must run exactly max_iters rounds and report that.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "u int, v int"
    )
    ranks, n_iters = pagerank(edges, eps=0.0, max_iters=3)
    assert n_iters == 3
    assert ranks.count() == 31


def test_empty_edge_list_raises(spark):
    empty = spark.createDataFrame([], "u int, v int")
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(empty)
