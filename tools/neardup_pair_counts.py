"""Normalize the near-dup scaling rows by their OUTPUT size.

The sf10 fixture replicates each document 100× with a one-token salt;
that salt keeps replicas DISTINCT but still genuinely near-duplicate
(Jaccard ≈ n/(n+1)), so the verified-pair output of the banded-minhash
and prefix-filtered Jaccard operators grows ~quadratically in the replica
count while the input grows linearly. Their wall-clock is therefore
output-bound, and raw sec-per-SF reads as super-linear when the honest
claim is "linear in candidate/verified pairs" (VERDICT r5, X2 table).

This tool records verified-pair counts per SF and sec/1k-pairs into
scaling_r6.json under "neardup_pairs" so the two rows are adjudicable.

    python tools/neardup_pair_counts.py
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

QUERIES = ["minhash_banded_pairs", "ngram_jaccard_prefix"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs",
        default="/root/testdata/sf0.1,/tmp/cdbspark_sf1,/tmp/cdbspark_sf10",
    )
    ap.add_argument("--labels", default="sf0.1,sf1,sf10")
    ap.add_argument("--out", default=str(ROOT / "scaling_r6.json"))
    ap.add_argument("--ops", default=",".join(QUERIES),
                    help="comma-separated subset of the diagnostic queries")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from cocktailsdb_spark.session import get_spark

    spark = get_spark("neardup_pairs")
    qs = entrymod.queries()
    result = json.loads(Path(args.out).read_text()) if Path(args.out).exists() else {}
    section = result.setdefault("neardup_pairs", {})
    ops = [o for o in args.ops.split(",") if o]
    for label, d in zip(args.labels.split(","), args.dirs.split(",")):
        for name in ops:
            t0 = time.perf_counter()
            n = qs[name](spark, d).count()
            dt = time.perf_counter() - t0
            # candidate (pre-verification) pairs — the number that
            # separates "output grew quadratically" from "plan degraded"
            from cocktailsdb_spark.operators import dedup
            from cocktailsdb_spark.tables import load

            docs = load(spark, d, "documents")
            n_docs = docs.count()
            if name == "minhash_banded_pairs":
                n_cand = dedup.minhash_banded_candidates(docs).count()
            else:
                n_cand = dedup.ngram_prefix_candidates(docs).count()
            rec = section.setdefault(name, {})
            rec[label] = {
                "docs": n_docs,
                "candidates": n_cand,
                "pairs": n,
                "cand_per_doc": round(n_cand / max(n_docs, 1), 2),
                "sec": round(dt, 2),
                "sec_per_1k_pairs": round(dt / max(n, 1) * 1000, 4),
                "sec_per_1k_cand": round(dt / max(n_cand, 1) * 1000, 4),
            }
            print(
                f"{label} {name}: {n_cand} candidates -> {n} pairs "
                f"({n_docs} docs) in {dt:.1f}s"
            )
            Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(f"updated {args.out}")


if __name__ == "__main__":
    main()
