"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are sane."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "dayOfSale", "drink", "price", "bar", "strGlass", "drinkCount", "stock", "comment",
    ]


def test_oracle_keys_subset_of_queries():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 45


# --- driver-sweep rotation (round-5 judge directive 2) ----------------------


def test_rotation_prioritizes_changed_and_never_checked():
    """Registry order must put entries with no driver evidence, or whose
    implementation hash drifted from the recorded one, ahead of entries
    with current driver-green rows; the green tail is oldest-round-first."""
    import json
    from pathlib import Path

    from cocktailsdb_spark.registry import QUERIES, entry_source_hash

    ev_path = Path(__file__).resolve().parent.parent / "driver_evidence.json"
    evidence = json.loads(ev_path.read_text())
    names = list(QUERIES)

    def is_front(n):
        rec = evidence.get(n)
        return rec is None or rec.get("hash") != entry_source_hash(n)

    flags = [is_front(n) for n in names]
    # all front entries strictly precede all evidence-green ones
    if True in flags and False in flags:
        first_green = flags.index(False)
        assert not any(flags[first_green:]), (
            "changed/never-checked entry sorted behind a green one: "
            + str([n for n, f in zip(names[first_green:], flags[first_green:]) if f])
        )
        # green tail ascending by last driver round
        rounds = [evidence[n]["last_round"] for n in names[first_green:]]
        assert rounds == sorted(rounds)


def test_entry_source_hash_is_deterministic():
    from cocktailsdb_spark.registry import QUERIES, entry_source_hash

    for name in list(QUERIES)[:10]:
        assert entry_source_hash(name) == entry_source_hash(name)


def test_entry_source_hash_ignores_runtime_cache_state(spark, sf_dir):
    """Building/running a plan that fills a module-level memo (e.g. the
    kmeans centroid cache) must NOT change any entry's source hash —
    hashes capture code, not process state. Regression: _CENTROID_MEMO
    filling during a plan build flipped three ANN entries to the re-check
    front mid-session."""
    from cocktailsdb_spark.operators import similarity
    from cocktailsdb_spark.registry import QUERIES, entry_source_hash

    names = [
        "kmeans_assign_centroid",
        "embedding_topk_ivf_kmeans",
        "embedding_topk_pq",
    ]
    before = {n: entry_source_hash(n) for n in names}
    similarity._CENTROID_MEMO.clear()
    # build + touch one plan so the memo fills
    QUERIES["embedding_topk_ivf_kmeans"](spark, sf_dir).schema
    assert similarity._CENTROID_MEMO, "fixture no longer fills the memo"
    after = {n: entry_source_hash(n) for n in names}
    assert after == before


def test_driver_rotation_refresh_workflow(tmp_path, monkeypatch):
    """tools/driver_rotation.py refresh: bumps last_round for new
    full-pass rows, re-captures hashes ONLY for those entries, leaves
    already-current evidence untouched, and treats rows-only
    (err='no_oracle' with rows) as green."""
    import json

    from tools import driver_rotation as dr

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True, "spark_rows": 5, "err": None},
        "b": {"rows_match": None, "schema_match": None, "hash_match": None, "spark_rows": 7, "err": "no_oracle"},
        "c": {"rows_match": True, "schema_match": True, "hash_match": False, "spark_rows": 5, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True, "hash_match": True, "spark_rows": 5, "err": None},
        "d": {"rows_match": None, "schema_match": None, "hash_match": None, "spark_rows": 0, "err": "no_oracle"},
    }))
    monkeypatch.setattr(dr, "ROOT", tmp_path)
    monkeypatch.setattr(dr, "EVIDENCE", tmp_path / "driver_evidence.json")
    monkeypatch.setattr(
        dr, "current_hashes", lambda: {"a": "HA", "b": "HB", "c": "HC", "d": "HD"}
    )
    dr.refresh()
    ev = json.loads((tmp_path / "driver_evidence.json").read_text())
    assert ev["a"] == {"last_round": 2, "hash": "HA"}
    # rows-only counts as green, but its round predates the newest file,
    # so the hash is UNKNOWN ("") — the entry stays in the re-check front
    # until the driver sees it again (history replay must not mark
    # edited-but-never-rechecked entries current)
    assert ev["b"] == {"last_round": 1, "hash": ""}
    assert "c" not in ev  # hash mismatch is NOT a full pass
    assert "d" not in ev  # zero rows is NOT green
    # idempotent: second refresh with unchanged rounds changes nothing
    dr.refresh()
    assert json.loads((tmp_path / "driver_evidence.json").read_text()) == ev
