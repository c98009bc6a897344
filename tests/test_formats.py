"""Source/sink format roundtrips, compaction, and sketch error bounds."""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cocktailsdb_spark.registry import QUERIES  # noqa: E402
from cocktailsdb_spark.sources import formats  # noqa: E402
from cocktailsdb_spark.tables import load  # noqa: E402


def test_json_roundtrip_preserves_timestamps(spark, sf_dir):
    out = formats.json_roundtrip(spark, sf_dir)
    src = load(spark, sf_dir, "events").filter(F.col("event_type") != "view")
    assert out.count() == src.count()
    # µs-precision timestamps survive the ISO-8601 string roundtrip
    assert out.agg(F.max("ts")).first()[0] == src.agg(F.max("ts")).first()[0]


def test_orc_roundtrip_matches_parquet_source(spark, sf_dir):
    out = formats.orc_roundtrip(spark, sf_dir)
    expected = (
        load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000).count()
    )
    assert out.count() == expected


def test_compaction_reduces_file_count(spark, sf_dir):
    work = tempfile.mkdtemp(prefix="cdbspark_compact_")
    path = os.path.join(work, "frag")
    # simulate a micro-batch sink: 24 tiny files
    load(spark, sf_dir, "events").repartition(24).write.mode("overwrite").parquet(path)
    n_before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_before == 24
    n_target = formats.compact_small_files(spark, path, target_file_mb=128)
    # compaction swaps in place: SAME path now holds the compacted files
    n_after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_after == n_target == 1  # tiny fixture → single file
    assert spark.read.parquet(path).count() == load(spark, sf_dir, "events").count()
    assert not os.path.exists(path + "_precompact")  # staging dirs cleaned up
    assert not os.path.exists(path + "_compacting")


def test_approx_distinct_within_error_bound(spark, sf_dir):
    rows = QUERIES["approx_distinct_users"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert err <= 0.05, f"{r['event_type']}: {err:.3f}"


def test_approx_percentile_within_rank_error(spark, sf_dir):
    """GK-sketch percentiles: each reported value must sit within ±1% RANK
    of the requested quantile (the sketch's accuracy contract at 10k)."""
    approx = {r["o_orderstatus"]: r for r in QUERIES["approx_percentile_price"](spark, sf_dir).collect()}
    orders = load(spark, sf_dir, "orders")
    for status, r in approx.items():
        prices = sorted(
            x["o_totalprice"]
            for x in orders.filter(F.col("o_orderstatus") == status).collect()
        )
        n = len(prices)
        assert r["n"] == n
        for q, val in ((0.5, r["p50"]), (0.95, r["p95"]), (0.99, r["p99"])):
            lo = prices[max(0, int((q - 0.01) * n) - 1)]
            hi = prices[min(n - 1, int((q + 0.01) * n))]
            assert lo <= val <= hi, f"{status} q={q}: {val} not in [{lo}, {hi}]"
