"""Synthesize an sf1-scale fixture (~6M lineitem / 1.5M orders) from the
driver's sf0.1 parquet by replicating the FACT tables 10x with disjoint
order keys (dimensions unchanged — TPC-H dims grow sublinearly and the 8
bench headliners stress the fact-side joins/aggregations). Used for the
BASELINE.md scaling-trend run only; correctness sweeps stay on the
driver-generated SFs.

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1] [--dst /tmp/cdbspark_sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from cocktailsdb_spark.session import get_spark
from cocktailsdb_spark.tables import TABLES, load

REPLICAS = 10
FACTS = {"orders": "o_orderkey", "lineitem": "l_orderkey", "documents": "doc_id"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/cdbspark_sf1")
    args = ap.parse_args()

    spark = get_spark("make_sf1")
    os.makedirs(args.dst, exist_ok=True)
    stride = (
        load(spark, args.src, "orders").agg(F.max("o_orderkey")).first()[0] + 1
    )
    for t in TABLES:
        out = os.path.join(args.dst, f"{t}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        df = load(spark, args.src, t)
        if t == "events":
            # disjoint event_ids AND user_ids per replica: a clean 10×
            # user population (same per-user behavior), not 10 duplicate
            # event streams on the same users
            user_stride = df.agg(F.max("user_id")).first()[0] + 1
            rep = spark.range(REPLICAS).select(
                (F.col("id") * stride).alias("_off"),
                (F.col("id") * user_stride).alias("_uoff"),
            )
            df = (
                df.crossJoin(F.broadcast(rep))
                .withColumn("event_id", F.col("event_id") + F.col("_off"))
                .withColumn("user_id", F.col("user_id") + F.col("_uoff"))
                .drop("_off", "_uoff")
            )
        elif t in FACTS:
            key = FACTS[t]
            rep = spark.range(REPLICAS).select(
                (F.col("id") * stride).alias("_off")
            )
            df = (
                df.crossJoin(F.broadcast(rep))
                .withColumn(key, F.col(key) + F.col("_off"))
                .drop("_off")
            )
        df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
