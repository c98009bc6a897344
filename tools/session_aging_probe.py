"""Session-aging probe (round-9 task 1, VERDICT r8).

Measures whether per-query fixed cost grows as a single local[32] JVM
session executes more queries — the suspected cause of the r8 bench
artifact's uniform ~1.8-2.3x drift on sub-second rows.

Protocol: time a probe set (best-of-3 via the bench noop-sink rep) fresh,
then run N diverse registry queries once each, re-time the probe set,
repeat. If probe times grow with executed-query count, the drift is
session aging (JVM/listener/codegen-cache state), not plan regressions.

Usage: python tools/session_aging_probe.py [chunk_size]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from cocktailsdb_spark.session import get_spark  # noqa: E402
from cocktailsdb_spark.tables import TABLES, load  # noqa: E402

PROBES = ["exact_dedup_hash", "dedup_latest_wins", "window_tumbling_hour"]
SF_DIR = "/root/testdata/sf0.1"


def rep(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def time_probes(queries, spark) -> dict[str, float]:
    return {
        name: round(min(rep(queries[name], spark) for _ in range(3)), 3)
        for name in PROBES
    }


def main() -> None:
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    import __spark_entry__ as entrymod

    spark = get_spark("aging-probe")
    for t in TABLES:
        load(spark, SF_DIR, t).count()

    def _ident(batches):
        yield from batches

    spark.range(128).repartition(32).mapInPandas(_ident, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    queries = entrymod.queries()
    # filler = every bench query except the probes and streaming rows
    # (streaming rows carry their own multi-second lifecycle cost)
    import bench

    filler = [
        q
        for q in bench.BENCH_QUERIES
        if q not in PROBES and not q.startswith("streaming_")
    ]

    checkpoints = []
    executed = 0
    checkpoints.append({"after_n_queries": 0, "probe_sec": time_probes(queries, spark)})
    for start in range(0, len(filler), chunk):
        for name in filler[start : start + chunk]:
            try:
                queries[name](spark, SF_DIR).write.mode("overwrite").format(
                    "noop"
                ).save()
                executed += 1
            except Exception as exc:  # noqa: BLE001
                print(f"filler {name} failed: {exc}", file=sys.stderr)
        checkpoints.append(
            {"after_n_queries": executed, "probe_sec": time_probes(queries, spark)}
        )
        print(json.dumps(checkpoints[-1]), flush=True)

    print(json.dumps({"checkpoints": checkpoints}))


if __name__ == "__main__":
    main()
