"""BM25 stored-index probe at the 4th decade (VERDICT r8 task 8).

The stored postings probe was measured flat sf0.1 -> sf10 (0.99 s at
sf10 vs 13.7 s for the in-plan re-tokenizer). This tool pushes the index
to a ~5M-doc corpus (sf100-equivalent for documents: sf0.1 docs x 1000
replicas, make_sf1.py's salting scheme) and records build + probe times
at each corpus size, certifying the bucket-pruned probe stays
corpus-size-independent: PASS = 5M-doc probe within 2x of the sf10
probe.

Usage: python tools/bm25_scale_probe.py [--replicas 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from cocktailsdb_spark.operators import retrieval  # noqa: E402
from cocktailsdb_spark.session import get_spark  # noqa: E402
from cocktailsdb_spark.tables import load  # noqa: E402

SRC = "/root/testdata/sf0.1"
DOCS_DIR = "/tmp/cdbspark_docs5m"
SF10_DIR = "/tmp/cdbspark_sf10"


def build_docs(spark, replicas: int) -> str:
    out = os.path.join(DOCS_DIR, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    os.makedirs(DOCS_DIR, exist_ok=True)
    df = load(spark, SRC, "documents")
    stride = df.agg(F.max("doc_id")).first()[0] + 1
    rep = spark.range(replicas).select(
        F.col("id").alias("_rep"), (F.col("id") * stride).alias("_off")
    )
    big = (
        df.crossJoin(F.broadcast(rep))
        .withColumn("doc_id", F.col("doc_id") + F.col("_off"))
        .withColumn(
            "text",
            F.when(
                (F.col("_rep") == 0) | F.col("text").isNull(), F.col("text")
            ).otherwise(
                F.concat_ws(
                    " ", F.col("text"), F.concat(F.lit("zrep"), F.col("_rep"))
                )
            ),
        )
        .drop("_rep", "_off")
    )
    # 64 part files: the sf0.1 source is 1-2 input splits, and crossJoin
    # preserves that — an un-repartitioned write would hand the index
    # build ONE task for 5M docs (at real scale the corpus arrives as
    # thousands of splits; this mirrors that)
    big.repartition(64).write.mode("overwrite").parquet(out)
    return out


def timed_probe(spark, ix: str, reps: int = 3) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        retrieval.bm25_rank_stored(spark, ix).write.mode("overwrite").format(
            "noop"
        ).save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=1000)
    ap.add_argument("--fresh", action="store_true", help="rebuild indexes")
    args = ap.parse_args()

    spark = get_spark("bm25-scale-probe")
    result: dict[str, dict] = {}

    # --- sf10 point (500k docs) ---------------------------------------
    sf10_ix = "/tmp/cdbspark_sf10_postings_ix"
    if args.fresh and os.path.isdir(sf10_ix):
        shutil.rmtree(sf10_ix)
    src10 = os.path.join(SF10_DIR, "documents.parquet")
    t0 = time.perf_counter()
    if not retrieval.postings_index_fresh(sf10_ix, src10):
        retrieval.postings_index_write(
            spark, load(spark, SF10_DIR, "documents"), sf10_ix, src10
        )
    build10 = round(time.perf_counter() - t0, 3)
    reps10 = timed_probe(spark, sf10_ix)
    result["sf10_500k_docs"] = {
        "build_sec": build10,
        "probe_reps": reps10,
        "probe_best": min(reps10),
    }

    # --- 5M-doc point (sf100-equivalent for documents) ----------------
    docs_src = build_docs(spark, args.replicas)
    ix5m = "/tmp/cdbspark_docs5m_postings_ix"
    if args.fresh and os.path.isdir(ix5m):
        shutil.rmtree(ix5m)
    docs5m = spark.read.parquet(docs_src)
    t0 = time.perf_counter()
    if not retrieval.postings_index_fresh(ix5m, docs_src):
        retrieval.postings_index_write(spark, docs5m, ix5m, docs_src)
    build5m = round(time.perf_counter() - t0, 3)
    reps5m = timed_probe(spark, ix5m)
    result["sf100eq_5m_docs"] = {
        "n_docs": docs5m.count(),
        "build_sec": build5m,
        "probe_reps": reps5m,
        "probe_best": min(reps5m),
    }
    ratio = round(
        result["sf100eq_5m_docs"]["probe_best"]
        / max(result["sf10_500k_docs"]["probe_best"], 1e-9),
        3,
    )
    result["probe_ratio_5m_vs_500k"] = ratio
    result["pass_within_2x"] = ratio <= 2.0
    print(json.dumps(result))


if __name__ == "__main__":
    main()
