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


PR_CHECKPOINT_EVERY = 2


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
    top_k: int = PR_TOP_K,
    checkpoint_every: int = PR_CHECKPOINT_EVERY,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (``src``,
    ``dst``; every node must appear as a src — symmetrize beforehand if
    the graph is undirected, which also removes dangling nodes).
    Returns the top_k nodes by final rank (rank-desc, node tiebreak).

    ``checkpoint_every`` controls how often the rank frame is
    materialized: iterations form one DAG (no branch reuses an
    intermediate rank), so skipping checkpoints never recomputes work —
    it only deepens the plan. Every k-th iteration truncates lineage so
    optimizer time stays bounded at high iteration counts; per-iteration
    (k=1) is only needed when iters is large or memory-pressure demands
    eager release."""
    edges = edges.select("src", "dst").distinct()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # out-degree is joined into the edge list ONCE, outside the loop —
    # the iterations then never shuffle the (big) edge side again
    edges_w = edges.join(outdeg, "src").localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n_nodes = nodes.count()  # scalar: node-count frame only, never edges
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("r"))
    base = 1.0 - damping
    for it in range(1, iters + 1):
        # ranks/contrib are node-sized — broadcast both sides so each
        # iteration's only exchange is the map-side-combined partial-sum
        # shuffle of the contribution aggregate. (At node counts beyond
        # broadcast reach, drop the hints: the joins fall back to the
        # classic shuffle-per-iteration PageRank shape.)
        contrib = (
            edges_w.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .select(
                "dst",
                F.floor(
                    (F.col("r") / F.col("outdeg")) * PR_SCALE + F.lit(0.5)
                ).cast("long").alias("q"),
            )
            .groupBy("dst")
            .agg(F.sum("q").alias("qs"))
        )
        ranks = (
            nodes.join(
                F.broadcast(contrib.withColumnRenamed("dst", "node")), "node", "left"
            )
            .select(
                "node",
                F.floor(
                    (
                        base / n_nodes
                        + damping * (F.coalesce(F.col("qs"), F.lit(0)) / PR_SCALE)
                    )
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
