"""Structured Streaming: checkpointed incremental file ingest (the
streaming mapping of S9/S10) — each run processes only unseen files."""

from __future__ import annotations

import os

from cocktailsdb_spark.streaming import stream_queries
from cocktailsdb_spark.tables import load


def test_incremental_append_processes_each_file_once(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    events = load(spark, sf_dir, "events")

    batch1 = events.filter("user_id % 2 = 0")
    batch1.write.parquet(os.path.join(src, "f1.parquet"))
    stream_queries.streaming_incremental_append(spark, src + "/*", sink, ckpt)
    n1 = spark.read.parquet(sink).count()
    assert n1 == batch1.count()

    batch2 = events.filter("user_id % 2 = 1")
    batch2.write.parquet(os.path.join(src, "f2.parquet"))
    stream_queries.streaming_incremental_append(spark, src + "/*", sink, ckpt)
    n2 = spark.read.parquet(sink).count()
    # second run appended ONLY the new file (checkpoint = high-water mark)
    assert n2 == n1 + batch2.count()

    # third run with nothing new appends nothing (idempotence)
    stream_queries.streaming_incremental_append(spark, src + "/*", sink, ckpt)
    assert spark.read.parquet(sink).count() == n2
