"""Iterative graph computation: PageRank by power iteration.

Together with ``dedup.dedup_clusters`` (iterative min-label propagation)
this covers the two iterative-algorithm shapes a DataFrame engine needs:
monotone label convergence and damped numeric fixed-point.

Cross-engine determinism: each iteration's per-node contribution sum is
order-dependent in floats, so contributions are quantized to integers
(floor(r/outdeg · 1e12 + 0.5) summed as BIGINT) and the new rank is
re-quantized to 12 dp — both engines then carry bit-identical ranks into
the next iteration, which makes a fixed-iteration unrolled-CTE DuckDB
twin value-exact.

Scale notes: one shuffle per iteration (contributions aggregate on dst);
the rank frame is node-sized, edges are the big side. ``localCheckpoint``
after every iteration truncates lineage (same pattern as
dedup_clusters) — without it the plan doubles each round. On a cluster
the edge table is persisted once, pre-partitioned on dst, and every
iteration reuses that partitioning; ranks broadcast when nodes ≪ edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITERS = 5
PR_SCALE = int(1e12)
PR_TOP_K = 20


# A/B-measured at sf0.1 (quiet machine, best of 2): every-2 7.85s,
# every-1 9.22s, never 10.36s. Without truncation each iteration's
# broadcast build re-walks the previous iterations' nested plan, so
# periodic lineage truncation wins despite its eager materialization jobs.
PR_CHECKPOINT_EVERY = 2


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
    top_k: int = PR_TOP_K,
    checkpoint_every: int = PR_CHECKPOINT_EVERY,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (``src``,
    ``dst``). The node set is src ∪ dst, so sink nodes (in-edges only)
    receive rank rows like any other node; nodes with no out-edges simply
    contribute nothing (standard dangling-mass simplification). Symmetrize
    beforehand for undirected graphs.
    Returns the top_k nodes by final rank (rank-desc, node tiebreak).

    ``checkpoint_every`` controls how often the rank frame is
    materialized (0 = never). Measured, not guessed: never-checkpoint is
    ~30% SLOWER than every-2 at sf0.1 — each iteration's broadcast is
    built by a driver job over the previous iterations' nested plan, and
    without truncation that chain deepens every round (plan/optimizer
    cost grows superlinearly even though shuffle outputs are reused).
    localCheckpoint every 2 iterations keeps the plan shallow at the cost
    of one eager materialization job per truncation — the net win."""
    edges = edges.select("src", "dst").distinct()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # out-degree is joined into the edge list ONCE, outside the loop —
    # the iterations then never shuffle the (big) edge side again
    edges_w = edges.join(outdeg, "src").localCheckpoint()
    # node universe = src ∪ dst, so the implementation is self-consistent
    # for any input (the union-into-aggregate below emits a row per dst;
    # a src-only node set would silently grow the output for graphs with
    # sink nodes while n_nodes counted fewer — a divergence from the
    # oracle twin for non-symmetrized inputs)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # scalar: node-count frame only, never edges
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("r"))
    base = 1.0 - damping
    for it in range(1, iters + 1):
        # ranks are node-sized — broadcast into the (big) edge side so
        # each iteration's only exchange is the map-side-combined
        # partial-sum shuffle of the contribution aggregate. Nodes with
        # no in-edges are handled by unioning a zero-contribution row
        # per node INTO that same aggregate (sum(q)+0 ≡ the left-join +
        # coalesce(qs,0) form, one operator cheaper: no second join, no
        # second broadcast). At node counts beyond broadcast reach, drop
        # the hint: the join falls back to the classic
        # shuffle-per-iteration PageRank shape.
        contrib_in = edges_w.join(
            F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
        ).select(
            "dst",
            F.floor(
                (F.col("r") / F.col("outdeg")) * PR_SCALE + F.lit(0.5)
            ).cast("long").alias("q"),
        )
        zero = nodes.select(
            F.col("node").alias("dst"), F.lit(0).cast("long").alias("q")
        )
        ranks = (
            contrib_in.unionByName(zero)
            .groupBy("dst")
            .agg(F.sum("q").alias("qs"))
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    (base / n_nodes + damping * (F.col("qs") / PR_SCALE))
                    * PR_SCALE
                    + F.lit(0.5)
                ).cast("long").alias("qr"),
            )
            .select("node", (F.col("qr") / PR_SCALE).alias("r"))
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < iters:
            ranks = ranks.localCheckpoint()
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(top_k)
        .select("node", F.col("r").alias("rank_score"))
    )
