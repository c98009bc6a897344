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


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
    top_k: int = PR_TOP_K,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (``src``,
    ``dst``; every node must appear as a src — symmetrize beforehand if
    the graph is undirected, which also removes dangling nodes).
    Returns the top_k nodes by final rank (rank-desc, node tiebreak)."""
    edges = edges.select("src", "dst").distinct().localCheckpoint()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # scalar: node-count frame only, never edges
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("r")).localCheckpoint()
    base = 1.0 - damping
    for _ in range(iters):
        contrib = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
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
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
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
            .localCheckpoint()
        )
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(top_k)
        .select("node", F.col("r").alias("rank_score"))
    )
