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


def test_cell_is_type_faithful_int_vs_float():
    """VERDICT r9: a bare %.10g rendered BIGINT 1496 and DOUBLE 1496.0
    identically, so the sweep gate passed two survival entries the
    driver's stricter value hash failed. The normalizer must keep the
    numeric KIND distinct."""
    import numpy as np

    from tools.selfcheck import _cell

    assert _cell(1496) != _cell(1496.0)
    assert _cell(np.int64(1496)) != _cell(np.float64(1496.0))
    # width is deliberately NOT distinguished (int32 vs int64 both fine)
    assert _cell(np.int32(7)) == _cell(np.int64(7))
    # float formatting tolerance retained within the float kind
    assert _cell(0.1 + 0.2) == _cell(0.3)


def test_driver_coverage_sla():
    """README 'Verification-coverage SLA' rule 1 (VERDICT r9 item 8): the
    backlog of entries that have NEVER appeared in any driver
    CORRECTNESS_r*.json must fit in one driver round's ~50-entry sample
    plus a small registration allowance (5), so every entry gets
    independent driver evidence within at most two rounds of registration
    and the backlog fully drains on any round that registers few entries.
    Registering more new entries than the driver can verify fails the
    suite — velocity is capped at verification capacity."""
    from cocktailsdb_spark.registry import QUERIES

    checked: set[str] = set()
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        checked |= set(json.loads(path.read_text()))
    never = sorted(set(QUERIES) - checked)
    assert len(never) <= 55, (
        f"{len(never)} entries have never been driver-checked (> 55 = one "
        f"round's sampling capacity + allowance): {never} — stop "
        f"registering new entries until the driver catches up"
    )


def test_no_entry_is_failing_in_ledger():
    from cocktailsdb_spark.registry import QUERIES

    ledger = _ledger()
    failing = sorted(
        name for name in QUERIES if ledger.get(name, {}).get("status") == "FAIL"
    )
    assert not failing, f"entries whose LAST committed oracle check failed: {failing}"
