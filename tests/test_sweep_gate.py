"""Sweep-on-the-closing-tree gate (VERDICT r8 task 4).

Round 8 shipped two registry entries AFTER the last committed oracle
sweep, so they reached the judge with zero committed evidence. This gate
makes the sweep contract mechanical: every ``queries()`` entry must have
a record in ``selfcheck_ledger.json`` (written by tools/selfcheck.py)
whose captured source hash matches the entry's CURRENT source — i.e. the
oracle check ran on the code as it exists now, not on an older version.

Failing this test means: run ``python tools/selfcheck.py --only <names>``
(or a full sweep) and commit the updated ledger with the code change.

No SparkSession needed — this is pure registry/ledger bookkeeping.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _ledger() -> dict:
    path = ROOT / "selfcheck_ledger.json"
    assert path.exists(), (
        "selfcheck_ledger.json missing — run tools/selfcheck.py (full sweep) "
        "once to create it"
    )
    return json.loads(path.read_text())


def test_every_entry_has_current_oracle_evidence():
    from cocktailsdb_spark.registry import QUERIES, entry_source_hash

    ledger = _ledger()
    never_checked = sorted(set(QUERIES) - set(ledger))
    assert not never_checked, (
        f"{len(never_checked)} registry entries have NO committed oracle "
        f"evidence: {never_checked} — run tools/selfcheck.py --only "
        f"{','.join(never_checked)} and commit the ledger"
    )
    stale = sorted(
        name
        for name in QUERIES
        if ledger[name].get("source_hash") != entry_source_hash(name)
    )
    assert not stale, (
        f"{len(stale)} entries were edited after their last oracle check "
        f"(ledger hash is stale): {stale} — re-run tools/selfcheck.py --only "
        f"{','.join(stale)} and commit the ledger"
    )


def test_no_entry_is_failing_in_ledger():
    from cocktailsdb_spark.registry import QUERIES

    ledger = _ledger()
    failing = sorted(
        name for name in QUERIES if ledger.get(name, {}).get("status") == "FAIL"
    )
    assert not failing, f"entries whose LAST committed oracle check failed: {failing}"
