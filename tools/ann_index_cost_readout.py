"""At-rest ANN index storage/cost readout across four decades (round 13).

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

Results land in scaling_r13.json under "ann_index_cost".

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


def measure_decade(spark, tag: str, sf_dir: str) -> dict:
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

    ix = os.path.join(IX_ROOT, tag)
    shutil.rmtree(ix, ignore_errors=True)
    t0 = time.perf_counter()
    similarity.ivf_index_write_adaptive(spark, e, ix, src)
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

    pops = (
        e.withColumn(
            "cell",
            similarity.adaptive_cell(
                similarity._as_double(F.col("embedding")),
                F.col("label"),
                m["planes"],
            ),
        )
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
    }


def main() -> None:
    from cocktailsdb_spark.session import get_spark

    spark = get_spark("ann-index-cost")
    out = {}
    for tag, sf_dir in DECADES:
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing (rebuild via tools/make_sf1.py "
                  f"/ ann_lifecycle_4th_decade.build_corpus)", file=sys.stderr)
            continue
        out[tag] = measure_decade(spark, tag, sf_dir)
        print(tag, json.dumps(out[tag]))

    dst = ROOT / "scaling_r13.json"
    existing = json.loads(dst.read_text()) if dst.exists() else {}
    existing["ann_index_cost"] = out
    dst.write_text(json.dumps(existing, indent=2) + "\n")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
