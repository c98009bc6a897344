"""Dump NON-vacuous superstep plans for the graph iteratives (VERDICT r14
item 5: the final frames are localCheckpoint'd, so their explain() shows
only `Scan ExistingRDD` — instead capture the plan of ONE superstep's
output frame, before any truncation, where the join strategy, exchange
count and join-key types are visible).

    python tools/r15_superstep_plans.py --suffix after
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cocktailsdb_spark.session import get_spark
from cocktailsdb_spark.tables import load
import cocktailsdb_spark.operators.graph as G


def _fmt(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", required=True)
    args = ap.parse_args()
    spark = get_spark("r15_superstep_plans")
    plans = Path(__file__).resolve().parent.parent / "plans" / "r15"
    plans.mkdir(parents=True, exist_ok=True)
    sf = args.sf
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")

    # ---- pagerank superstep (one _iterate over the persisted edge cache)
    try:
        pairs = l.join(o, l.l_orderkey == o.o_orderkey).select(
            G.lexpack(0, F.col("o_custkey")).alias("c"),
            G.lexpack(1, F.col("l_suppkey")).alias("s"),
        )
    except AttributeError:  # pre-r15 tree: string node ids
        pairs = l.join(o, l.l_orderkey == o.o_orderkey).select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    rep = edges.repartition(nparts, "src").dropDuplicates(["src", "dst"])
    outdeg = rep.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_w = rep.join(F.broadcast(outdeg), "src").persist()
    edges_w.count()
    nodes = edges_w.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    step = G._iterate(edges_w, ranks, n, 0.15, 0.85, 0.15 / n)
    (plans / f"pagerank_superstep_{args.suffix}.txt").write_text(_fmt(step))
    edges_w.unpersist()

    # ---- lpa superstep (votes + argmax labels of round 1)
    try:
        gb = [
            G.lexpack(0, F.col("o_custkey")).alias("c"),
            G.lexpack(1, F.col("l_suppkey")).alias("s"),
        ]
    except AttributeError:
        gb = [
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        ]
    pw = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(*gb).agg(
        F.count("*").alias("w")
    )
    e = pw.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w").unionByName(
        pw.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    edges_p = e.repartition(nparts, "dst").persist()
    edges_p.count()
    labels = edges_p.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    contrib = edges_p.join(
        labels.select(F.col("node").alias("dst"), F.col("label").alias("nl")), "dst"
    ).select(
        F.col("src").alias("node"), F.col("nl").alias("label"), F.col("w").alias("wt")
    )
    votes = (
        contrib.unionByName(
            labels.select("node", "label", F.lit(1).cast("long").alias("wt"))
        )
        .repartition(nparts, "node")
        .groupBy("node", "label")
        .agg(F.sum("wt").alias("wt"))
    )
    pick = Window.partitionBy("node").orderBy(F.desc("wt"), F.asc("label"))
    step_l = (
        votes.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("node", "label")
    )
    (plans / f"lpa_superstep_{args.suffix}.txt").write_text(_fmt(step_l))
    edges_p.unpersist()
    print("wrote", plans / f"pagerank_superstep_{args.suffix}.txt")
    print("wrote", plans / f"lpa_superstep_{args.suffix}.txt")


if __name__ == "__main__":
    main()
