"""Structured Streaming: checkpointed incremental file ingest (the
streaming mapping of S9/S10) — each run processes only unseen files."""

from __future__ import annotations

import datetime as dt
import os
import uuid

from pyspark.sql import functions as F

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


def test_watermark_drops_late_rows(spark, tmp_path):
    """Event-time watermark semantics = the reference's strict-`>` filter
    (SURVEY.md §2.7): once the watermark passed an hour window, a late row
    for that window is DROPPED, not re-aggregated."""
    src = str(tmp_path / "wm_src")
    name = "wm_" + uuid.uuid4().hex[:8]
    ddl = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_batch(fname, rows):
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(os.path.join(src, fname))

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)
    write_batch("b1.parquet", [(1, t0, 1, "click", 1.0, "{}")])

    stream = (
        spark.readStream.format("parquet").schema(ddl).option("maxFilesPerTrigger", "1")
        .load(src + "/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        stream.writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far past the 10:00 window...
        write_batch("b2.parquet", [(2, t0 + dt.timedelta(hours=5), 1, "click", 1.0, "{}")])
        q.processAllAvailable()
        # ...then a LATE row for the closed 10:00 window arrives
        write_batch("b3.parquet", [(3, t0 + dt.timedelta(minutes=1), 1, "click", 1.0, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["ws"]: r["n"] for r in spark.table(name).collect()}
    # the 10:00 window was emitted with ONLY the on-time row; the late row
    # never re-opens it (dropped, exactly like the reference's strict >)
    assert out.get(t0) == 1


def test_streaming_postings_upsert_equals_batch_ranker(spark, sf_dir):
    """The stream-maintained postings index must rank identically to the
    in-plan batch ranker over the full corpus — additive index stats make
    the result independent of micro-batch arrival order."""
    from cocktailsdb_spark.operators import retrieval

    got = stream_queries.streaming_postings_upsert(spark, sf_dir).collect()
    want = retrieval.bm25_rank(load(spark, sf_dir, "documents")).collect()
    assert got == want and len(got) == 10


def test_streaming_last_touch_equals_batch(spark, sf_dir):
    """The stateful credit stream's channel rollup must equal the batch
    window form of last-touch attribution on the same events."""
    from cocktailsdb_spark.operators import attribution

    got = stream_queries.streaming_last_touch(spark, sf_dir).collect()
    want = attribution.last_touch(load(spark, sf_dir, "events")).collect()
    assert got == want
    assert sum(r.n_conversions for r in got) > 0


def test_streaming_error_burn_matches_batch(spark, sf_dir):
    from cocktailsdb_spark.operators.events import error_budget_burn
    from cocktailsdb_spark.streaming.stream_queries import streaming_error_burn
    from cocktailsdb_spark.tables import load

    batch = {r.hour: r for r in error_budget_burn(load(spark, sf_dir, "events")).collect()}
    stream = {r.hour: r for r in streaming_error_burn(spark, sf_dir).collect()}
    assert set(batch) == set(stream) and len(batch) > 0
    for h, b in batch.items():
        s = stream[h]
        assert (b.n_events, b.n_errors, b.burn_1h, b.burn_6h) == (
            s.n_events,
            s.n_errors,
            s.burn_1h,
            s.burn_6h,
        )
