"""tables.load() normalization: the driver owns the fixture parquet and has
shipped `ts` under different physical encodings across rounds (TIMESTAMP
NANOS, then µs TIMESTAMP_NTZ). load() must present TimestampType under the
pinned UTC session regardless of the at-rest type — round 3 lost its bench
and three operators to exactly this drift."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cocktailsdb_spark.tables import load

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def fake_sf(spark):
    """A scratch sf_dir holding an `events` table written as TIMESTAMP_NTZ
    (what a µs-no-timezone parquet reads back as in Spark 4)."""
    work = tempfile.mkdtemp(prefix="cdbspark_tables_")
    rows = [
        (1, dt.datetime(2024, 3, 1, 12, 30, 45, 123456), 7, "click", 1.5),
        (2, dt.datetime(2024, 3, 2, 0, 0, 1, 0), 8, "view", 2.0),
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(work, "events.parquet")
    )
    yield work
    shutil.rmtree(work, ignore_errors=True)


def test_load_normalizes_ntz_to_timestamp(spark, fake_sf):
    df = load(spark, fake_sf, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # the instant is preserved exactly (µs precision), interpreted as UTC
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    assert got[1] == dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    # numeric casts (sessionize's epoch math) are legal again
    secs = df.select(F.col("ts").cast("double").alias("s")).collect()
    assert all(r["s"] is not None for r in secs)


def test_load_real_fixture_ts_is_timestamp(spark, sf_dir):
    # whatever encoding the driver shipped this round, the contract holds
    df = load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert df.limit(1).select("ts").first()["ts"] is not None
