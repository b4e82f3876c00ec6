"""Lifecycle contracts of the incremental graph-ANN index (q238) and the
NN-descent round ladder (q239).

q238's docstring claims: once the generation exists, steady state loads
the frozen (centroids, medoids) off the params table and the persisted
directed base edges off the edge table — neither the trainer, nor the
batch edge kernel, nor the medoid picker ever re-runs. The bomb test
makes that structural. q239's docstring claims per-round edge recall is
non-decreasing by construction — locked here on the real corpus.
"""

import pytest
from pyspark.sql import functions as F


def _served(spark, sf_dir):
    from wetsa_cams_solrad_timeseries_spark.plans.vector import (
        q238_incremental_graph_ann,
    )

    return sorted(
        tuple(r) for r in q238_incremental_graph_ann(spark, sf_dir).collect()
    )


def test_graph_steady_state_never_rebuilds(spark, sf_dir, monkeypatch):
    first = _served(spark, sf_dir)
    assert first, "q238 served no neighbors"

    import wetsa_cams_solrad_timeseries_spark.operators.similarity as sim

    def boom(*a, **k):
        raise AssertionError("steady-state run re-ran a base-build stage")

    # Frozen artifacts: the coarse trainer, the Σ|cell|² batch edge
    # kernel, and the medoid picker are all base-build-only. Steady
    # state must serve identically with all three bombed (the insert
    # path uses cell_knn_edges_incremental, which stays live).
    monkeypatch.setattr(sim, "ivf_train_centroids", boom)
    monkeypatch.setattr(sim, "cell_knn_edges", boom)
    monkeypatch.setattr(sim, "cell_medoids", boom)
    second = _served(spark, sf_dir)
    assert second == first


def test_graph_params_table_is_the_commit_gate(spark, sf_dir):
    _served(spark, sf_dir)  # ensure the generation exists
    params = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("wetsa_graphparams_")
    ]
    edges = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("wetsa_graphedges_")
    ]
    assert params and edges, "q238 did not persist its generation"
    # The frozen artifacts are complete: 16 centroids + ≤16 medoids
    # (one per non-empty history cell), and every directed base edge
    # endpoint is a history node (vec_id % 10 != 7) — new-shard edges
    # never leak into the persisted base generation.
    pdf = spark.table(params[0])
    assert pdf.filter(F.col("kind") == "cent").count() == 16
    n_med = pdf.filter(F.col("kind") == "medoid").count()
    assert 1 <= n_med <= 16
    edf = spark.table(edges[0])
    leaked = edf.filter(
        (F.col("src") % 10 == 7) | (F.col("dst") % 10 == 7)
    ).count()
    assert leaked == 0


def test_nn_descent_recall_is_monotone(spark, sf_dir):
    from wetsa_cams_solrad_timeseries_spark.plans.vector import (
        _Q239_ROUNDS,
        q239_nn_descent_rounds,
    )

    rows = {
        r["round"]: r["edge_recall"]
        for r in q239_nn_descent_rounds(spark, sf_dir).collect()
    }
    assert sorted(rows) == list(range(_Q239_ROUNDS + 1))
    ladder = [rows[r] for r in sorted(rows)]
    assert ladder == sorted(ladder), f"recall regressed across rounds: {ladder}"
    # Round 1 must match q237's single-round refinement measurement —
    # the ladder's first rung IS q237 (same candidate algebra).
    from wetsa_cams_solrad_timeseries_spark.plans.vector import (
        q237_nn_descent_refine,
    )

    q237 = q237_nn_descent_refine(spark, sf_dir).collect()[0]
    assert rows[0] == pytest.approx(q237["recall_before"], abs=1e-9)
    assert rows[1] == pytest.approx(q237["recall_after"], abs=1e-9)
