"""Connected components over a pair graph (duplicate-cluster resolution).

Near-dup detection emits PAIRS; choosing one canonical survivor per
duplicate GROUP needs the transitive closure — A~B, B~C must collapse to
one cluster even though (A, C) was never emitted. This is the standard
last stage of a dedup pipeline and is missing from pairwise-only
toolkits.

Algorithm: iterative min-label propagation (HashMin): every node starts
labeled with its own id; each round every node takes the min of its own
label and its neighbors' labels; converges to (node → min id in its
component) in O(graph diameter) rounds. Each round is one shuffle join +
one grouped min — all DataFrame ops, no driver materialization of nodes
or edges; only the scalar convergence count comes back per round.

Each round pairs neighbor-min with a pointer jump (label := label of
label), so even adversarial long-chain graphs converge in O(log
diameter) rounds; each round's shuffle is |edges|. Lineage is truncated
per round with localCheckpoint so the plan does not grow with
iterations (the pointer jump is a self-join — with lineage kept, the
logical plan would double every round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    = the minimum node id reachable through the pair graph.

    Per-round cost is ONE job: the round's frame is marked for local
    checkpointing lazily and the convergence count is the action that
    materializes it — no separate count-then-reuse pass. Edge duplicates
    are harmless under min-propagation, so the symmetric union skips a
    distinct (one less shuffle)."""
    # localCheckpoint (not persist): the per-round pointer-jump SELF-JOIN
    # doubles the logical plan each round if lineage is kept — Catalyst
    # analysis then grows exponentially with rounds (measured: minutes).
    # Checkpointing truncates the plan so every round plans in O(1).
    #
    # Checkpoint the DIRECTED edges first, THEN build the symmetric
    # union from the checkpoint: the union's two branches would otherwise
    # each recompute the caller's whole pair pipeline (for q72 that is
    # all of q62 — shingle → MinHash → LSH → verify) into the eager
    # checkpoint, doubling the most expensive stage of the query.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Size the loop's shuffles by |edges|: the verified-pair graph is
    # orders of magnitude smaller than the corpus, and the harness's
    # vanilla session (no AQE, 200 shuffle partitions) would otherwise
    # pay 200-partition fixed costs EVERY round. Same volume-based rule
    # as streaming/_drain.size_partitions; restored on exit.
    spark = edges.sparkSession
    n_edges = 2 * e.count()  # cheap scan of the checkpointed edges
    parallelism = spark.sparkContext.defaultParallelism
    loop_parts = max(4, min(parallelism, n_edges // 100_000 + 1))
    conf_key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(conf_key)
    spark.conf.set(conf_key, str(loop_parts))
    changed = -1
    try:
        for _ in range(max_iter):
            # Neighbor-min (HashMin step) ...
            neigh_min = (
                sym.join(labels, sym.dst == labels.node)
                .groupBy("src")
                .agg(F.min("comp").alias("neigh_comp"))
                .withColumnRenamed("src", "node")
            )
            m = labels.join(neigh_min, on="node", how="left").select(
                "node",
                F.col("comp").alias("old_comp"),
                F.least(F.col("comp"), F.coalesce("neigh_comp", "comp")).alias(
                    "c1"
                ),
            )
            # ... then pointer jump (label := label of label): halves the
            # remaining distance to the component min each round, so long
            # duplicate CHAINS converge in O(log diameter) rounds instead
            # of O(diameter) — measured 25+ rounds → a handful on a
            # chainy near-dup graph. Labels only decrease, so both steps
            # are monotone and the combined fixpoint is the component min.
            jump = m.select(F.col("node").alias("c1"), F.col("c1").alias("c2"))
            # Lazy checkpoint + count = ONE job per round: the count is
            # the action that computes every partition, and local
            # checkpointing happens as a side effect of that computation.
            # (An eager checkpoint followed by a count was two jobs.)
            stepped = (
                m.join(jump, on="c1", how="left")
                .select(
                    "node",
                    F.coalesce("c2", "c1").alias("new_comp"),
                    (F.coalesce("c2", "c1") < F.col("old_comp")).alias("changed"),
                )
                .localCheckpoint(eager=False)
            )
            changed = stepped.filter(F.col("changed")).count()
            labels = stepped.select("node", F.col("new_comp").alias("comp"))
            if changed == 0:
                break
        if changed != 0:
            # Partially-converged labels are silently WRONG clusters;
            # surface it. (Pointer jumping converges in O(log diameter)
            # rounds, so hitting this means a pathological graph or a
            # max_iter set far too low.)
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                f"({changed} labels still moving); raise max_iter"
            )
        # Materialize the result while the loop sizing is still active;
        # callers then build on a checkpointed frame.
        return labels.select("node", "comp").localCheckpoint(eager=True)
    finally:
        spark.conf.set(conf_key, old_parts)


def pagerank(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    damping: float = 0.85,
    base: float = 0.15,
    eps: float = 1.5e-6,
    max_iters: int = 8,
    resync=None,
) -> tuple[DataFrame, int]:
    """Power-method PageRank over an UNDIRECTED edge list, looped to
    CONVERGENCE: iterate until the 1-row aggregate ``max|Δr|`` drops
    below ``eps`` or ``max_iters`` is hit; returns ``(ranks, n_iters)``
    with ranks = (node, r). The driver-side loop pattern every iterative
    operator here shares: per round ONE edge-sized contribution shuffle
    + one node-sized aggregate, lineage truncated per round via
    localCheckpoint, and the only thing ever collected is the scalar
    delta — rank state itself never leaves the executors.

    ``resync`` (e.g. plans/_spec.round6) is applied to each round's
    contribution sum and new rank so two engines iterating in lockstep
    re-synchronize every round instead of compounding summation-order
    ULP drift — the q161 convention; pass None for engine-local use.

    The fixed-iteration form (q161) exists for oracle expressibility;
    this is the production form: on a fast-converging graph it stops
    early (tests/test_graph_convergence.py), on a slow one the cap
    bounds the cost. Scale: identical per-round plan to GraphX/Pregel —
    convergence adds one 1-row collect per round, nothing else."""
    ident = resync if resync is not None else (lambda c: c)
    # Checkpoint the DIRECTED edges first, THEN build the symmetric union
    # from the checkpoint (the connected_components discipline): the
    # union's two branches and the deg/bd materializations would
    # otherwise each recompute the caller's whole edge pipeline — for
    # q192 that is the lineitem co-purchase self-join, the most
    # expensive stage of the query, evaluated once per consumer.
    e0 = edges.select(
        F.col(u_col).alias("src"), F.col(v_col).alias("dst")
    ).localCheckpoint(eager=True)
    b = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = (
        b.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list — no nodes to rank")
    bd = b.join(deg, "src").localCheckpoint(eager=True)
    # No checkpoint on the initial rank state: it is one projection over
    # the checkpointed deg, so each of iteration 1's two consumers just
    # re-reads the checkpoint.
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("r"))
    n_iters = 0
    for i in range(1, max_iters + 1):
        contrib = (
            bd.join(ranks, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(ident(F.sum(F.col("r") / F.col("outdeg"))).alias("s"))
        )
        # Lazy checkpoint + delta collect = ONE job per round (the
        # connected_components trick): the 1-row delta aggregate is the
        # action that computes every partition, and local checkpointing
        # happens as a side effect — an eager checkpoint followed by the
        # delta collect was two jobs per round.
        new_ranks = (
            deg.select(F.col("src").alias("node"))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                ident(
                    F.lit(base / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
        delta_row = (
            new_ranks.alias("a")
            .join(ranks.alias("o"), on="node")
            .agg(F.max(F.abs(F.col("a.r") - F.col("o.r"))).alias("d"))
            .collect()
        )
        ranks = new_ranks
        n_iters = i
        delta = delta_row[0]["d"]
        if delta is not None and delta < eps:
            break
    return ranks, n_iters
