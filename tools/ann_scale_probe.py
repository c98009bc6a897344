"""ANN scale probe: brute-force vs IVF-Flat at 100× the embedding corpus.

The fixture embeddings table is fixed at 2,000 vectors, so the scaling
sweep cannot exercise the ANN axis. This probe synthesizes a 100× corpus
(200k × 64-dim) by replicating the fixture vectors with deterministic
md5-derived per-(replica, dim) perturbation — replicas are genuinely
distinct points, not duplicates — and measures, for the same query set:

  * exact brute-force cosine top-k wall-clock,
  * IVF-Flat (kmeans coarse quantizer) wall-clock at the default and a
    widened n_probe,
  * recall@k of each IVF run against the brute-force truth.

Writes the measurements into scaling_r6.json under "ann_100x".

    python tools/ann_scale_probe.py [--replicas 100]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7]
K = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--out", default=str(ROOT / "scaling_r6.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cocktailsdb_spark.operators import similarity as S
    from cocktailsdb_spark.session import get_spark
    from cocktailsdb_spark.tables import load

    spark = get_spark("ann_scale_probe")
    emb = load(spark, args.sf, "embeddings")
    n0 = emb.count()
    stride = emb.agg(F.max("vec_id")).first()[0] + 1
    rep = spark.range(args.replicas).select(F.col("id").alias("_rep"))
    # deterministic per-(vec, replica, dim) perturbation in [-0.05, 0.05):
    # md5 over the triple, 4 hex chars → uniform; replica 0 keeps the
    # original vector so QUERY_IDS reference unchanged query points
    noise = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("vec_id"),
                        F.col("_rep"),
                        F.col("_d"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(16**4))
        - F.lit(0.5)
    ) * F.lit(0.1)
    big = (
        emb.crossJoin(F.broadcast(rep))
        .select(
            (F.col("vec_id") + F.col("_rep") * stride).alias("vec_id"),
            F.col("label"),
            F.col("_rep"),
            F.posexplode("embedding").alias("_d", "_x"),
        )
        .select(
            "vec_id",
            "label",
            "_d",
            F.when(F.col("_rep") == 0, F.col("_x"))
            .otherwise(F.col("_x") + noise)
            .cast("float")
            .alias("_x"),
        )
        .groupBy("vec_id", "label")
        .agg(F.array_sort(F.collect_list(F.struct("_d", "_x"))).alias("_p"))
        .select(
            "vec_id",
            F.transform("_p", lambda s: s["_x"]).alias("embedding"),
            "label",
        )
    )
    big = big.repartition(32).persist()
    n = big.count()
    print(f"corpus: {n0} -> {n} vectors")

    def run(fn, label):
        t0 = time.perf_counter()
        rows = fn().collect()
        dt = round(time.perf_counter() - t0, 2)
        res = {(r["query_id"], r["vec_id"]) for r in rows}
        print(f"{label}: {dt}s, {len(rows)} result rows")
        return dt, res

    t_bf, truth = run(lambda: S.cosine_topk(big, QUERY_IDS, k=K), "brute-force")
    out = {"n_vectors": n, "k": K, "n_queries": len(QUERY_IDS), "brute_force_sec": t_bf}
    for n_probe in (2, 8):
        t_ivf, got = run(
            lambda: S.ivf_kmeans_topk(big, QUERY_IDS, k=K, n_probe=n_probe),
            f"ivf n_probe={n_probe}",
        )
        recall = round(len(got & truth) / len(truth), 3)
        out[f"ivf_probe{n_probe}"] = {
            "sec": t_ivf,
            "recall_at_k": recall,
            "speedup_vs_bf": round(t_bf / t_ivf, 2),
        }
        print(f"  recall@{K}: {recall}")
    data = json.loads(Path(args.out).read_text())
    data["ann_100x"] = out
    Path(args.out).write_text(json.dumps(data, indent=1) + "\n")
    print(f"updated {args.out}")


if __name__ == "__main__":
    main()
