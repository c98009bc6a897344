"""The plane-count knob on semantic_dedup_scaled, measured (round 11).

The registered entry runs the oracle-shared 4-plane default; its sf10
point (336 s, scaling_r11_s2.json) shows exactly what a FIXED partition
cardinality does under a growing corpus — within-partition pairs grow
quadratically. The operator's scale contract is "+1 plane per corpus
doubling keeps the per-partition population, and therefore the
quadratic factor, constant"; this probe measures the same operator at
wider plane sets per SF (4 → 7 → 10: one extra plane per ~doubling,
constants.make_planes' two-family generator) and records wall-clock
plus the max partition population, certifying the knob flattens the
curve.

    python tools/semdedup_planes_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CONFIGS = [
    ("sf0.1", "/root/testdata/sf0.1", 4),
    ("sf1", "/tmp/cdbspark_sf1", 7),
    ("sf10", "/tmp/cdbspark_sf10", 10),
]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__  # noqa: F401 — registry import order
    from cocktailsdb_spark.constants import make_planes
    from cocktailsdb_spark.operators import dedup
    from cocktailsdb_spark.registry_ops import SEMDEDUP_T
    from cocktailsdb_spark.session import get_spark
    from cocktailsdb_spark.tables import load

    spark = get_spark("semdedup-planes-probe")
    out: dict[str, dict] = {}
    for label, sf_dir, n_planes in CONFIGS:
        emb = load(spark, sf_dir, "embeddings")
        planes = make_planes(n_planes)
        res = dedup.semantic_dedup_scaled(emb, threshold=SEMDEDUP_T, planes=planes)
        t0 = time.perf_counter()
        res.write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        pop = (
            res.groupBy("cell", "bucket")
            .count()
            .agg(F.max("count").alias("mx"), F.count("*").alias("nparts"))
            .first()
        )
        out[label] = {
            "n_planes": n_planes,
            "n_vectors": emb.count(),
            "sec": dt,
            "n_nonempty_partitions": pop["nparts"],
            "max_partition_pop": pop["mx"],
        }
        print(label, json.dumps(out[label]), flush=True)
    data = json.loads((ROOT / "scaling_r11_s2.json").read_text())
    data["semantic_dedup_scaled_planes_knob"] = out
    (ROOT / "scaling_r11_s2.json").write_text(json.dumps(data, indent=1) + "\n")
    print("updated scaling_r11_s2.json")


if __name__ == "__main__":
    main()
