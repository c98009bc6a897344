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
    # SAME table root serves the compacted files through the manifest
    data_dir, manifest = formats.resolve_data_dir(path)
    n_after = sum(f.endswith(".parquet") for f in os.listdir(data_dir))
    assert n_after == n_target == 1  # tiny fixture → single file
    expected = load(spark, sf_dir, "events").count()
    assert formats.read_table(spark, path).count() == expected
    # rows recorded from the write job's Observation metric, no re-read
    assert manifest["rows"] == expected


def test_compaction_swap_is_reader_atomic(spark, sf_dir):
    """The swap is one atomic pointer flip: an in-flight reader that
    resolved BEFORE a later compaction still reads its (retained) version;
    a crash that leaves a fully-written but uncommitted version dir is
    invisible to readers; repeated compactions vacuum older versions."""
    work = tempfile.mkdtemp(prefix="cdbspark_compact_")
    path = os.path.join(work, "frag")
    load(spark, sf_dir, "events").repartition(8).write.mode("overwrite").parquet(path)
    expected = load(spark, sf_dir, "events").count()

    formats.compact_small_files(spark, path, target_file_mb=128)
    dir_v2, m2 = formats.resolve_data_dir(path)
    assert m2["version"] == 2  # v1 = adopted originals, v2 = compacted

    # in-flight reader: resolves now, consumes after the NEXT compaction
    inflight = formats.read_table(spark, path)
    formats.compact_small_files(spark, path, target_file_mb=128)
    dir_v3, m3 = formats.resolve_data_dir(path)
    assert m3["version"] == 3 and dir_v3 != dir_v2
    assert os.path.isdir(dir_v2)  # predecessor retained for in-flight reads
    assert inflight.count() == expected  # reader is unaffected by the swap
    assert not os.path.isdir(os.path.join(path, "v_00000001"))  # vacuumed

    # crash simulation: next-version dir fully written, pointer flip never
    # happened — readers keep resolving the committed version
    orphan = os.path.join(path, "v_99999999")
    os.makedirs(orphan)
    d, m = formats.resolve_data_dir(path)
    assert m["version"] == 3 and "v_99999999" not in d
    assert formats.read_table(spark, path).count() == expected

    # at no point does the table root itself disappear (the dir-rename
    # design had a no-directory window between its two renames)
    assert os.path.isdir(path)


def test_time_travel_and_vacuum(spark, sf_dir):
    work = tempfile.mkdtemp(prefix="cdbspark_tt_")
    path = os.path.join(work, "tbl")
    load(spark, sf_dir, "events").repartition(6).write.mode("overwrite").parquet(path)
    expected = load(spark, sf_dir, "events").count()
    formats.compact_small_files(spark, path, target_file_mb=128)  # v1→v2
    # the pre-compaction snapshot reads back exactly, current is v2
    assert formats.read_table(spark, path, version=1).count() == expected
    assert formats.list_versions(path) == [1, 2]
    removed = formats.vacuum_versions(path, keep=1)
    assert removed == [1] and formats.list_versions(path) == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not retained"):
        formats.read_table(spark, path, version=1)
    # current still serves after vacuum
    assert formats.read_table(spark, path).count() == expected


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


def test_schema_evolution_merges_batches(spark, sf_dir):
    from cocktailsdb_spark.sources import formats
    from cocktailsdb_spark.tables import load

    out = formats.schema_evolution_read(spark, sf_dir)
    assert out.count() == load(spark, sf_dir, "orders").count()
    # v1 rows (even keys) surface NULL for the evolved column; v2 never
    nulls = out.filter("price_band IS NULL").select("o_orderkey").collect()
    assert nulls and all(r["o_orderkey"] % 2 == 0 for r in nulls)
    bands = {r["price_band"] for r in out.filter("o_orderkey % 2 = 1").collect()}
    assert bands == {"high", "low"}


def test_corrupt_tolerant_read_quarantines_bad_lines(spark, sf_dir):
    from cocktailsdb_spark.sources import formats
    from cocktailsdb_spark.tables import load

    good = formats.corrupt_tolerant_read(spark, sf_dir)
    total = load(spark, sf_dir, "events").count()
    n_bad_expected = load(spark, sf_dir, "events").filter(
        f"event_id % {formats.CORRUPT_EVERY} = 0"
    ).count()
    assert good.count() == total - n_bad_expected
    # no corrupted id survives, and values parse exactly
    assert good.filter(f"event_id % {formats.CORRUPT_EVERY} = 0").count() == 0


def test_gdpr_erase_idempotent_and_time_travel(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from cocktailsdb_spark.sources import formats

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "id long, user_id long"
    ).write.parquet(path)
    pred = F.col("user_id") == 3
    formats.gdpr_erase(spark, path, pred, tag="u3")
    cur = formats.read_table(spark, path)
    assert cur.count() == 80
    assert cur.filter(pred).count() == 0
    # previous version retains the rows until vacuum (the retention caveat)
    assert formats.read_table(spark, path, version=1).filter(pred).count() == 20
    # idempotent: same tag is a no-op, version does not advance
    v_before = formats.list_versions(path)
    formats.gdpr_erase(spark, path, pred, tag="u3")
    assert formats.list_versions(path) == v_before
    # vacuum drops the retained copy — the physical deletion step
    formats.vacuum_versions(path, keep=1)
    import pytest

    with pytest.raises(ValueError):
        formats.read_table(spark, path, version=1)


def test_gdpr_erase_keeps_null_predicate_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from cocktailsdb_spark.sources import formats

    path = str(tmp_path / "tbl_null")
    spark.createDataFrame(
        [(1, 3), (2, None), (3, 5)], "id long, user_id long"
    ).write.parquet(path)
    formats.gdpr_erase(spark, path, F.col("user_id") == 3, tag="t")
    cur = formats.read_table(spark, path)
    # DELETE-WHERE: the NULL row is NOT matched -> kept
    assert sorted(r.id for r in cur.collect()) == [2, 3]


def test_gdpr_tag_survives_compaction(spark, tmp_path):
    from pyspark.sql import functions as F

    from cocktailsdb_spark.sources import formats

    path = str(tmp_path / "tbl_tag")
    spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, user_id long"
    ).write.parquet(path)
    formats.gdpr_erase(spark, path, F.col("user_id") == 1, tag="x")
    formats.compact_small_files(spark, path)
    v = formats.list_versions(path)
    # same-tag rerun after compaction is still a no-op
    formats.gdpr_erase(spark, path, F.col("user_id") == 1, tag="x")
    assert formats.list_versions(path) == v
