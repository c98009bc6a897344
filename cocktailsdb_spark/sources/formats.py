"""Additional source/sink formats beyond the reference's CSV family:
JSON-lines and ORC roundtrips (explicit schemas, format-native pushdown)
and a small-files compaction pass.

JSON-lines is the interchange format most document-corpus pipelines
ingest; ORC is the other columnar format Spark reads natively with
predicate pushdown. Both readers take explicit schemas — at 100 TB schema
inference is an extra full pass with nondeterministic typing, same policy
as csv_sources.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → gzip JSON-lines sink → schema'd JSON source. Timestamps
    serialize as ISO-8601 strings and parse back exactly (µs precision);
    filter pushdown applies post-parse (JSON has no footer statistics —
    the reason parquet/ORC remain the at-rest formats and JSON is
    ingest-only)."""
    work = tempfile.mkdtemp(prefix="cdbspark_json_")
    path = os.path.join(work, "events_jsonl")
    # explicit µs timestamp format: the default SSS truncates to millis
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    load(spark, sf_dir, "events").write.mode("overwrite").option(
        "compression", "gzip"
    ).option("timestampFormat", ts_fmt).json(path)
    return (
        spark.read.schema(EVENTS_DDL)
        .option("timestampFormat", ts_fmt)
        .json(path)
        .filter(F.col("event_type") != "view")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


JSON_ROUNDTRIP_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE event_type <> 'view'
"""


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC sink → ORC source with a pushed-down predicate (ORC
    carries min/max stripe statistics like parquet, so the filter prunes
    stripes at scan time)."""
    work = tempfile.mkdtemp(prefix="cdbspark_orc_")
    path = os.path.join(work, "orders_orc")
    load(spark, sf_dir, "orders").write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


ORC_ROUNDTRIP_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders WHERE o_totalprice > 300000
"""


def compact_small_files(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Small-files compaction IN PLACE: rewrite a parquet directory into
    size-targeted files (total bytes / target). The streaming/incremental
    sinks append one file per micro-batch — at scale the resulting
    million-file directories destroy scan planning; periodic compaction is
    part of the sink contract.

    The compacted copy is staged to a sibling directory, verified
    (row-count parity), then swapped into ``path`` via two renames —
    readers of ``path`` keep seeing a complete directory, and the original
    survives until the swap commits. Returns the new file count."""
    import shutil

    df = spark.read.parquet(path)
    n_rows_before = df.count()
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, total // (target_file_mb * 1024 * 1024))
    base = path.rstrip("/")
    tmp = base + "_compacting"
    old = base + "_precompact"
    df.repartition(int(n_files)).write.mode("overwrite").parquet(tmp)
    if spark.read.parquet(tmp).count() != n_rows_before:  # paranoia gate
        shutil.rmtree(tmp)
        raise RuntimeError(f"compaction row-count mismatch for {path}")
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)
    return int(n_files)
