"""Round-14 stage-level profiler: run one registry query with the Spark UI
enabled and print per-stage task counts + executor runtime plus the SQL
node row counts — the data the optimization guide's empirical loop needs
(guide §1.1/§7.1) on a box where the long-lived bench session keeps the
UI off.

    python tools/r14_stageprof.py --only name [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from cocktailsdb_spark.session import get_spark  # noqa: E402
from cocktailsdb_spark.tables import TABLES, load  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", required=True)
    ap.add_argument("--port", type=int, default=4040)
    args = ap.parse_args()

    spark = get_spark("r14_stageprof", extra_conf={"spark.ui.enabled": "true"})
    for t in TABLES:
        try:
            load(spark, args.sf, t).count()
        except Exception:  # noqa: BLE001
            pass
    queries = entrymod.queries()
    for warm in ("exact_dedup_hash", "tpch_q1_pricing"):
        queries[warm](spark, args.sf).write.mode("overwrite").format("noop").save()

    for name in args.only.split(","):
        t0 = time.perf_counter()
        df = queries[name](spark, args.sf)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        print(f"=== {name}: build {t1 - t0:.2f}s exec {t2 - t1:.2f}s")

    app = spark.sparkContext.applicationId
    base = f"http://localhost:{args.port}/api/v1/applications/{app}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    rows = [
        (s["stageId"], s["numCompleteTasks"], s["executorRunTime"], s["name"][:50])
        for s in stages
    ]
    print("-- top stages by executor runtime --")
    for r in sorted(rows, key=lambda x: -x[2])[:15]:
        print(f"stage {r[0]:4} tasks {r[1]:3} runtime_ms {r[2]:8} {r[3]}")
    sqls = json.load(
        urllib.request.urlopen(f"{base}/sql?details=true&length=200")
    )
    print("-- SQL executions (big row counts) --")
    for s in sqls:
        heavy = []
        for n in s.get("nodes", []):
            mets = {m["name"]: m["value"] for m in n.get("metrics", [])}
            raw = mets.get("number of output rows", "")
            try:
                val = int(str(raw).replace(",", ""))
            except ValueError:
                continue
            if val >= 1_000_000:
                heavy.append((val, n["nodeId"], n["nodeName"]))
        if heavy:
            print(f"SQL {s['id']} ({s['duration']} ms): {s['description'][:40]}")
            for val, nid, nm in sorted(heavy, reverse=True)[:8]:
                print(f"   node {nid:3} {nm[:44]:44} rows={val:,}")


if __name__ == "__main__":
    main()
