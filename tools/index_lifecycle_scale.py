"""Three-decade scaling evidence for the AT-REST index lifecycle entries
(VERDICT r10 task 1): the five entries carrying the repo's "100 TB index"
claims — ``ann_index_upsert_probe``, ``bm25_rank_stored``,
``bm25_incremental_stored``, ``bm25_compacted_stored``,
``neardup_incremental_pairs`` — had no row in any scaling_r*.json. This
tool measures BUILD, UPSERT, COMPACT, and PROBE **separately** (the
registered entries amortize the build behind an mtime cache, so their
bench rows conflate phases) at sf0.1 → sf1 → sf10 on the corrected
multi-file fixture layout, into ``scaling_r11.json``.

What the claims predict, and what this certifies:

* build cost is linear in corpus size (one partitioned write);
* upsert cost is DELTA-sized, not corpus-sized (the whole point of the
  at-rest maintenance path);
* probe cost is near-flat per decade — the ANN probe prunes to n_probe
  cell partitions (plan-asserted: the sf10 probe plan must contain a
  dynamicpruning subquery), the BM25 probe reads only the query terms'
  term_bucket partitions, the near-dup probe equi-joins a delta-sized
  banded batch against band partitions. The near-dup probe output grows
  with the replicated corpus (salted replicas stay genuine
  near-duplicates — make_sf1.py docstring), so that row also records
  pair counts and sec-per-1k-pairs, the round-6 normalization.

Embeddings are replicated since round 11 (make_sf1.py: 2k → 20k → 200k
vectors, replica-0-preserving md5 perturbation), which is what gives the
ANN rows a real corpus axis.

Each SF runs in a FRESH interpreter (subprocess) so JVM/codegen caches
never leak across scales; index dirs under /tmp/cdbspark_ixscale are
removed up-front so build cost is always measured, never a cache hit.

    python tools/make_sf1.py --dst /tmp/cdbspark_sf1
    python tools/make_sf1.py --replicas 100 --dst /tmp/cdbspark_sf10
    python tools/index_lifecycle_scale.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

IX_ROOT = "/tmp/cdbspark_ixscale"
PROBE_REPS = 3


def _timed(fn, reps: int = 1) -> tuple[float, object]:
    best, last = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        last = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), last


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def run_single(label: str, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__  # noqa: F401 — establishes registry import order
    from cocktailsdb_spark import registry_ops as R
    from cocktailsdb_spark.operators import dedup, retrieval, similarity
    from cocktailsdb_spark.session import get_spark
    from cocktailsdb_spark.tables import load

    spark = get_spark(f"ix-lifecycle-{label}")
    base_dir = os.path.join(IX_ROOT, label)
    shutil.rmtree(base_dir, ignore_errors=True)
    os.makedirs(base_dir, exist_ok=True)
    out: dict = {}

    # --- ANN IVF lifecycle (ann_index_upsert_probe) --------------------
    e = load(spark, sf_dir, "embeddings")
    n_vec = e.count()
    ebase = e.filter(F.col("vec_id") % 20 != 19)
    edelta = e.filter(F.col("vec_id") % 20 == 19)
    src_e = os.path.join(sf_dir, "embeddings.parquet")
    d_ann = os.path.join(base_dir, "ann_ix")
    t_build, _ = _timed(
        lambda: similarity.ivf_index_write(spark, ebase, d_ann, src_e)
    )
    t_upsert, _ = _timed(lambda: similarity.ivf_index_upsert(spark, d_ann, edelta))
    probe = similarity.stored_index_probe(
        spark, d_ann, R.QUERY_IDS, k=R.TOPK, n_probe=R.N_PROBE
    )
    t_probe, _ = _timed(lambda: _noop(probe), reps=PROBE_REPS)
    plan = probe._jdf.queryExecution().executedPlan().toString().lower()
    out["ann_ivf"] = {
        "n_vectors": n_vec,
        "build_sec": t_build,
        "upsert_sec": t_upsert,
        "probe_best_sec": t_probe,
        "probe_plan_has_dpp": "dynamicpruning" in plan,
    }

    # --- BM25 postings lifecycle ---------------------------------------
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    is_delta = F.col("doc_id") % R.BM25_DELTA_MOD == R.BM25_DELTA_RESIDUE
    dbase, ddelta = docs.filter(~is_delta), docs.filter(is_delta)
    src_d = os.path.join(sf_dir, "documents.parquet")

    # full build -> probe (= bm25_rank_stored)
    d_full = os.path.join(base_dir, "postings_full")
    t_build, _ = _timed(
        lambda: retrieval.postings_index_write(spark, docs, d_full, src_d)
    )
    t_probe, _ = _timed(
        lambda: _noop(retrieval.bm25_rank_stored(spark, d_full)), reps=PROBE_REPS
    )
    out["bm25_stored"] = {
        "n_docs": n_docs,
        "build_sec": t_build,
        "probe_best_sec": t_probe,
    }

    # base build -> upsert -> probe (= bm25_incremental_stored), then
    # compact -> probe (= bm25_compacted_stored) on the same lifecycle dir
    d_incr = os.path.join(base_dir, "postings_incr")
    t_bb, _ = _timed(
        lambda: retrieval.postings_index_write(spark, dbase, d_incr, src_d)
    )
    t_up, _ = _timed(lambda: retrieval.postings_index_upsert(spark, d_incr, ddelta))
    t_probe2, _ = _timed(
        lambda: _noop(retrieval.bm25_rank_stored(spark, d_incr)), reps=PROBE_REPS
    )
    out["bm25_incremental"] = {
        "base_build_sec": t_bb,
        "upsert_sec": t_up,
        "probe_best_sec": t_probe2,
    }
    t_cpt, _ = _timed(lambda: retrieval.postings_index_compact(spark, d_incr))
    t_probe3, _ = _timed(
        lambda: _noop(retrieval.bm25_rank_stored(spark, d_incr)), reps=PROBE_REPS
    )
    out["bm25_compacted"] = {
        "compact_sec": t_cpt,
        "probe_best_sec": t_probe3,
    }

    # --- MinHash band-table lifecycle (neardup_incremental_pairs) ------
    nd_delta = F.col("doc_id") % R.NEARDUP_DELTA_MOD == R.NEARDUP_DELTA_RESIDUE
    nbase, ndelta = docs.filter(~nd_delta), docs.filter(nd_delta)
    d_mh = os.path.join(base_dir, "minhash_band_ix")
    t_build, _ = _timed(
        lambda: dedup.minhash_index_write(spark, nbase, d_mh, src_d, n=R.MB_N)
    )
    t_upsert, _ = _timed(
        lambda: dedup.minhash_index_upsert(spark, d_mh, ndelta, n=R.MB_N)
    )
    pairs = dedup.minhash_index_probe(
        spark, d_mh, ndelta, threshold=R.MB_T, n=R.MB_N
    )
    t_probe, _ = _timed(lambda: _noop(pairs), reps=PROBE_REPS)
    n_pairs = pairs.count()
    out["neardup_incremental"] = {
        "build_sec": t_build,
        "upsert_sec": t_upsert,
        "probe_best_sec": t_probe,
        "n_pairs": n_pairs,
        "probe_sec_per_1k_pairs": round(t_probe / max(n_pairs / 1000.0, 1e-9), 4),
    }
    print(json.dumps(out))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs",
        default="/root/testdata/sf0.1,/tmp/cdbspark_sf1,/tmp/cdbspark_sf10",
    )
    ap.add_argument("--labels", default="sf0.1,sf1,sf10")
    ap.add_argument("--out", default=str(ROOT / "scaling_r11.json"))
    ap.add_argument("--single", default=None, help="internal: label,sf_dir")
    args = ap.parse_args()

    if args.single:
        label, sf_dir = args.single.split(",", 1)
        run_single(label, sf_dir)
        return

    result: dict = {
        "note": (
            "at-rest index lifecycle (VERDICT r10 task 1): build / upsert / "
            "compact / probe measured separately per SF, fresh interpreter "
            "per SF, fresh index dirs (never a cache hit). Embeddings "
            "replicated since r11 (make_sf1.py, 2k->20k->200k vectors); "
            "near-dup probe rows normalized by output pair count "
            "(salted replicas are genuine near-duplicates)."
        ),
    }
    for label, d in zip(args.labels.split(","), args.dirs.split(",")):
        print(f"== {label}: {d}", flush=True)
        proc = subprocess.run(
            [sys.executable, __file__, "--single", f"{label},{d}"],
            capture_output=True,
            text=True,
            cwd=str(ROOT),
        )
        if proc.returncode != 0:
            print(proc.stdout[-2000:])
            print(proc.stderr[-4000:])
            raise SystemExit(f"single run failed for {label}")
        result[label] = json.loads(proc.stdout.strip().splitlines()[-1])
        Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
        print(json.dumps(result[label], indent=1), flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
