"""SCD2 / merge-upsert semantics: version ranges chain correctly and a
matched update row wins wholesale (including legitimate NULLs)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cocktailsdb_spark.operators import scd  # noqa: E402


def test_scd2_ranges_chain_and_flag_current(spark):
    recs = spark.createDataFrame(
        [
            ("a", "2021-01-01", "x1"),
            ("a", "2021-02-01", "x2"),
            ("a", "2021-03-01", "x3"),
            ("b", "2021-01-15", "y1"),
        ],
        "k string, modified string, payload string",
    )
    out = scd.scd2_history(recs, "k", "modified", "payload")
    a = {r["version"]: r for r in out.filter("k = 'a'").collect()}
    assert [a[v]["payload"] for v in (1, 2, 3)] == ["x1", "x2", "x3"]
    # each version's valid_to == next version's valid_from; last is open
    assert a[1]["valid_to"] == a[2]["valid_from"]
    assert a[2]["valid_to"] == a[3]["valid_from"]
    assert a[3]["valid_to"] is None and a[3]["is_current"]
    assert not a[1]["is_current"] and not a[2]["is_current"]
    b = out.filter("k = 'b'").collect()
    assert len(b) == 1 and b[0]["is_current"] and b[0]["version"] == 1


def test_merge_update_row_wins_including_nulls(spark):
    current = spark.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0)], "id long, name string, price double"
    )
    updates = spark.createDataFrame(
        [(1, None, 11.0), (3, "new", 30.0)], "id long, name string, price double"
    )
    out = {r["id"]: r for r in scd.merge_upsert(current, updates, "id").collect()}
    assert len(out) == 3
    assert out[1]["name"] is None and out[1]["price"] == 11.0  # whole row wins
    assert out[2]["name"] == "keep" and out[2]["price"] == 20.0
    assert out[3]["name"] == "new"


def test_merge_duplicate_update_keys_collapse_deterministically(spark):
    current = spark.createDataFrame([(1, "old", 10.0)], "id long, name string, price double")
    updates = spark.createDataFrame(
        [(1, "dup_a", 11.0), (1, "dup_b", 12.0), (2, "n", 1.0), (2, "n", 2.0)],
        "id long, name string, price double",
    )
    out = {r["id"]: r for r in scd.merge_upsert(current, updates, "id").collect()}
    # duplicate update keys collapse to ONE row (no full-outer fan-out)
    assert len(out) == 2
    # deterministic winner: greatest under (name DESC, price DESC)
    assert out[1]["name"] == "dup_b" and out[1]["price"] == 12.0
    assert out[2]["price"] == 2.0
