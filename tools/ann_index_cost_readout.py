"""At-rest ANN index storage/cost readout across four decades (r13, r14).

Round 14 extends the readout to measure BOTH rule kinds side by side —
the sign-at-zero ADAPTIVE assignment and the conditional-median BALANCED
trees (similarity.ivf_index_write_balanced) — because the r13 numbers
made per-cell population skew the one structural axis trending the wrong
way with scale (max/mean 1.09 → 9.32 across the four decades): the hot
cell was on course to become the probe straggler at the next decade. The
balanced kind's whole reason to exist is this table; each decade row now
carries the skew dial for both kinds plus a warmed probe timing, so the
"materially below 9.32 at 2M, probe still flat" claim is a number, not
an adjective. Results land in scaling_r14.json under
"ann_index_cost_kinds".

The capacity-planning face of scaling_r12.json: the r12 tool pinned the
TIME axis of the adaptive-cell index (build/upsert/probe/delete/compact
flat through the 4th decade); this one pins the SPACE axis an operator
sizes a deployment with — bytes, files, cells, and per-cell population
skew versus corpus size, at the same three operating points of the
count-derived plane gate (p=0 at 2k, p=4 at 20k, p=7 at 200k, p=8 at 2M).

Questions it answers with numbers instead of hand-waving:
- storage overhead: index bytes / raw corpus bytes (the index stores the
  vectors themselves plus layout — overhead is metadata + parquet framing
  per cell file, so it RISES when cells outnumber what the corpus fills);
- file-count pressure: files ≈ populated cells (one per cell after the
  repartition(cell) write) — the number a 100 TB object store bills for
  LIST/GET on, and the reason the write path repartitions by cell at all;
- quantizer bytes: centroid side table + manifest (both must stay
  request-/quantizer-sized — they ride the driver and the broadcast);
- population skew: max/mean cell population under the frozen rule — the
  dial that says whether probe cost stays bounded per cell (the point of
  cells ∝ N) or one hot cell quietly becomes a scan.

    python tools/ann_index_cost_readout.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

DECADES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/cdbspark_sf1"),
    ("sf10", "/tmp/cdbspark_sf10"),
    ("sf100", "/tmp/cdbspark_emb2m"),
]
IX_ROOT = "/tmp/cdbspark_ixcost"


def du_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def measure_decade(spark, tag: str, sf_dir: str, kind: str = "adaptive") -> dict:
    from pyspark.sql import functions as F

    from cocktailsdb_spark.operators import similarity
    from cocktailsdb_spark.sources.formats import _read_manifest
    from cocktailsdb_spark.tables import load

    if tag == "sf100":  # pre-replicated corpus, plain parquet dir
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        src = os.path.join(sf_dir, "embeddings.parquet", "_SUCCESS")
    else:
        e = load(spark, sf_dir, "embeddings")
        src = os.path.join(sf_dir, "embeddings.parquet")
    n = e.count()
    raw_path = os.path.join(sf_dir, "embeddings.parquet")
    raw_bytes = (
        du_bytes(raw_path) if os.path.isdir(raw_path) else os.path.getsize(raw_path)
    )

    ix = os.path.join(IX_ROOT, f"{tag}_{kind}")
    shutil.rmtree(ix, ignore_errors=True)
    build = (
        similarity.ivf_index_write_adaptive
        if kind == "adaptive"
        else similarity.ivf_index_write_balanced
    )
    t0 = time.perf_counter()
    build(spark, e, ix, src)
    t_build = round(time.perf_counter() - t0, 3)

    m = _read_manifest(ix, similarity.INDEX_MANIFEST)
    n_cells_quant = len(m["centroids"]["labels"])
    cell_dirs = [d for d in os.listdir(ix) if d.startswith("cell=")]
    data_files = 0
    data_bytes = 0
    for d in cell_dirs:
        cd = os.path.join(ix, d)
        for f in os.listdir(cd):
            if f.endswith(".parquet"):
                data_files += 1
                data_bytes += os.path.getsize(os.path.join(cd, f))
    cent_bytes = du_bytes(os.path.join(ix, similarity.CENTROID_DIR))
    manifest_bytes = sum(
        os.path.getsize(os.path.join(ix, f))
        for f in os.listdir(ix)
        if f.startswith("_MANIFEST")
    )

    # population dial straight off the stored layout (identical to
    # recomputing the rule — upsert ≡ rebuild is a layout identity)
    pops = (
        spark.read.parquet(ix)
        .groupBy("cell")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.avg("count").alias("mean"),
            F.expr("percentile(count, 0.99)").alias("p99"),
        )
        .collect()[0]
    )

    return {
        "n_vectors": n,
        "planes": len(m["planes"]),
        "cells_quantizer": n_cells_quant,
        "cells_populated": len(cell_dirs),
        "data_files": data_files,
        "data_bytes": data_bytes,
        "raw_corpus_bytes": raw_bytes,
        "storage_overhead": round(data_bytes / raw_bytes, 3),
        "bytes_per_vector": round(data_bytes / n, 1),
        "centroid_table_bytes": cent_bytes,
        "manifest_bytes": manifest_bytes,
        "cell_pop_max": int(pops["mx"]),
        "cell_pop_mean": round(float(pops["mean"]), 1),
        "cell_pop_p99": round(float(pops["p99"]), 1),
        "cell_skew_max_over_mean": round(float(pops["mx"]) / float(pops["mean"]), 2),
        "build_sec": t_build,
        "probe_warmed_sec": _probe_time(spark, ix, e),
    }


def _probe_time(spark, ix: str, e) -> float:
    """Warmed wall time of the standard 5-query k=3 n_probe=2 probe
    (first rep absorbs JVM/codegen warmup and is discarded — the
    measurement-trap convention every decade tool here follows)."""
    from cocktailsdb_spark.operators import similarity

    reps = []
    for _ in range(2):
        t0 = time.perf_counter()
        similarity.stored_index_probe(
            spark, ix, [0, 1, 2, 3, 4], k=3, n_probe=2, queries=e
        ).collect()
        reps.append(time.perf_counter() - t0)
    return round(reps[-1], 3)


def main() -> None:
    from cocktailsdb_spark.session import get_spark

    spark = get_spark("ann-index-cost")
    out = {}
    for tag, sf_dir in DECADES:
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing (rebuild via tools/make_sf1.py "
                  f"/ ann_lifecycle_4th_decade.build_corpus)", file=sys.stderr)
            continue
        out[tag] = {}
        for kind in ("adaptive", "balanced"):
            out[tag][kind] = measure_decade(spark, tag, sf_dir, kind)
            print(tag, kind, json.dumps(out[tag][kind]))

    dst = ROOT / "scaling_r14.json"
    existing = json.loads(dst.read_text()) if dst.exists() else {}
    existing["ann_index_cost_kinds"] = out
    dst.write_text(json.dumps(existing, indent=2) + "\n")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
