"""S1-S4 reader semantics on reference-shaped inputs (FIXTURES.md B1-B4)."""

from __future__ import annotations

import datetime as dt

from cocktailsdb_spark.sources import csv_sources


def test_bar_stock_header_and_dirty_int(spark, bar_fixtures):
    """S1: header CSV; the dirty '34 glasses' value stays a raw string at
    the staging layer (cleaning is a conform step)."""
    df = csv_sources.read_bar_stock(spark, bar_fixtures["bar_data"])
    rows = df.collect()
    assert len(rows) == 15
    dirty = [r for r in rows if r["stock"] == "34 glasses"]
    assert len(dirty) == 1 and dirty[0]["bar"] == "new york"


def test_budapest_header_discarded(spark, bar_fixtures):
    """S2: the Hungarian header row is dropped; canonical schema applies;
    ISO timestamps parse."""
    df = csv_sources.read_sales_iso_csv(spark, bar_fixtures["budapest"])
    rows = df.orderBy("idx").collect()
    assert len(rows) == 20
    assert df.columns == ["idx", "dateOfSale", "drink", "price"]
    assert rows[0]["dateOfSale"] == dt.datetime(2020, 12, 26, 10, 0, 0)
    assert rows[0]["drink"] == "Sweet Sangria"


def test_london_tsv_headerless(spark, bar_fixtures):
    """S3: tab separator, no header — first physical row is DATA."""
    df = csv_sources.read_sales_tsv_headerless(spark, bar_fixtures["london"])
    assert df.count() == 15
    assert df.filter(df.dateOfSale.isNull()).count() == 0


def test_ny_us_date_format(spark, bar_fixtures):
    """S4: 'MM-dd-yyyy HH:mm' parses with the explicit format; the pinned
    row from FIXTURES.md B3 lands on the exact timestamp."""
    df = csv_sources.read_sales_us_dates(spark, bar_fixtures["ny"])
    pinned = df.filter(df.idx == 0).first()
    assert pinned["dateOfSale"] == dt.datetime(2020, 12, 26, 22, 47)
    assert pinned["drink"] == "Paradise"


def test_wrong_format_yields_nulls(spark, bar_fixtures):
    """P6 pitfall (SURVEY.md §7): parsing US-format data with the ISO
    reader nulls every timestamp instead of raising."""
    df = csv_sources.read_sales_iso_csv(spark, bar_fixtures["ny"])
    assert df.filter(df.dateOfSale.isNotNull()).count() == 0


def test_csv_permissive_and_dropmalformed_modes(spark, tmp_path):
    """Malformed-row policy: PERMISSIVE keeps bad rows with nulls + the
    raw line in the corrupt-record column; DROPMALFORMED silently drops
    them — both are part of the ingestion contract for dirty feeds."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,ts,drink,price\n"
        "0,2020-12-30 15:15:53,Mojito,4.0\n"
        "not_an_int,xxxx,BadRow,abc\n"
        "2,2020-12-31 18:02:26,Negroni,6.0\n"
    )
    schema = "id bigint, ts timestamp, drink string, price double, _bad string"
    perm = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(str(p))
    )
    rows = perm.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_bad"] is not None]
    assert len(bad) == 1 and bad[0]["id"] is None and "BadRow" in bad[0]["_bad"]

    dropped = (
        spark.read.schema("id bigint, ts timestamp, drink string, price double")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert {r["drink"] for r in dropped.collect()} == {"Mojito", "Negroni"}


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution: a sink that gained a column mid-stream reads back
    as one unified schema with mergeSchema (old rows null-filled)."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        base + "/v=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(base + "/v=2")
    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) >= {"id", "name", "score"}
    got = {r["id"]: r["score"] for r in merged.collect()}
    assert got[1] is None and got[2] == 9.5


def test_python_datasource_partition_planning(spark):
    from cocktailsdb_spark.sources.py_datasource import LedgerDataSource

    spark.dataSource.register(LedgerDataSource)
    df = (
        spark.read.format("synth_ledger")
        .option("rows", "1000")
        .option("numPartitions", "4")
        .load()
    )
    from pyspark.sql import functions as F

    parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 4                       # the planner's partitions are real
    assert df.count() == 1000
    # deterministic content: same read twice is identical
    a = sorted(r.entry_id for r in df.filter(F.col("account") == 0).collect())
    b = sorted(r.entry_id for r in df.filter(F.col("account") == 0).collect())
    assert a == b and len(a) > 0


def test_python_datasource_zero_rows_and_bad_partitions(spark):
    from cocktailsdb_spark.sources.py_datasource import LedgerDataSource

    spark.dataSource.register(LedgerDataSource)
    empty = (
        spark.read.format("synth_ledger").option("rows", "0").load()
    )
    assert empty.count() == 0
    clamped = (
        spark.read.format("synth_ledger")
        .option("rows", "10")
        .option("numPartitions", "0")
        .load()
    )
    assert clamped.count() == 10
