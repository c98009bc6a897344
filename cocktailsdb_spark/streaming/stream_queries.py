"""Structured Streaming variants of the engine's event operators
(SURVEY.md §2.7): the streaming mappings of the reference's batch-
incremental watermark protocol.

These run a real ``readStream`` → transform → ``writeStream`` topology to
completion over the fixture parquet (file source + memory/parquet sink),
so the plans exercised are the ones a Kafka-backed deployment would run;
only the source format differs. Checkpoints replace last_update.txt.

Determinism: the tumbling query runs in COMPLETE mode (every window
emitted). The session query runs in APPEND mode with a watermark, which
only emits sessions once the watermark passes them — so the driver feeds a
sentinel batch far in the future to flush all real sessions, then filters
the sentinel back out. Both therefore equal their batch twins exactly and
carry full DuckDB oracles.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import SESSION_GAP_SEC
from ..numeric import dsum
from ..plans.hints import maybe_broadcast
from ..tables import load

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SENTINEL_USER = -1


from contextlib import contextmanager


@contextmanager
def _low_shuffle(spark: SparkSession, n: int = 8):
    """Stateful streaming operators allocate state stores PER shuffle
    partition per operator side; at local fixture scale the fixed store
    setup dominates wall-clock. Run the query at a small partition count
    and restore the session's setting after. On a real cluster this knob
    is sized to key cardinality / state volume, not CPU count."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _events_stream(
    spark: SparkSession, input_dir: str, max_files: int = 1
) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", str(max_files))
        .load(input_dir)
    )


def _materialize_events(
    spark: SparkSession, sf_dir: str, workdir: str, parts: int = 1
) -> str:
    """File streams need a DIRECTORY source; write the (ns→µs converted)
    events there once and stream from it.

    ``parts=1`` (default) → one part file → deterministic micro-batch
    boundaries under ``maxFilesPerTrigger=1`` (update-mode sinks would
    otherwise record per-batch intermediate state). Callers whose
    readout is multi-batch-safe (e.g. the funnel's max-level rollup) can
    pass ``parts>1`` for a parallel write AND a parallel scan — a single
    coalesced file is written by ONE task and read by ONE task (one row
    group — the round-10 fixture-layout lesson), which serializes the
    whole pipeline at sf10. Such callers must raise maxFilesPerTrigger
    to ≥ parts so the batch boundary stays deterministic (all files in
    one trigger)."""
    input_dir = os.path.join(workdir, "in")
    df = load(spark, sf_dir, "events")
    df = df.coalesce(1) if parts <= 1 else df.repartition(parts)
    df.write.mode("overwrite").parquet(os.path.join(input_dir, "batch1.parquet"))
    return input_dir


def streaming_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling count+sum over a parquet file stream, complete mode.
    Result (a static DataFrame) equals the batch tumbling query exactly."""
    name = "stream_tumbling_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_tumb_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    stream = (
        _events_stream(spark, input_dir + "/*")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    with _low_shuffle(spark):
        q = stream.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    result = spark.table(name).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window over a file stream in APPEND mode with a
    30-minute watermark — the genuinely stateful streaming operator.

    Batch 1 = the real events; batch 2 = one sentinel event 10 days past
    max(ts), which advances the event-time watermark beyond every real
    session so append mode flushes them all. Output (sentinel removed)
    equals the batch session computation."""
    static = load(spark, sf_dir, "events")
    max_ts = static.agg(F.max("ts")).first()[0]

    workdir = tempfile.mkdtemp(prefix="cdbspark_sess_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    name = "stream_session_" + uuid.uuid4().hex[:8]

    sessions = (
        _events_stream(spark, input_dir + "/*")
        .withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", f"{SESSION_GAP_SEC} seconds").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    with _low_shuffle(spark):
      q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .start()
      )
      try:
        q.processAllAvailable()
        # batch 2: sentinel far in the future → watermark passes every
        # real session; no-data batches then evict/emit remaining state.
        sentinel = spark.createDataFrame(
            [(10**9, max_ts + __import__("datetime").timedelta(days=10), SENTINEL_USER, "sentinel", 0.0, "{}")],
            schema=EVENTS_DDL,
        )
        sentinel.write.mode("overwrite").parquet(os.path.join(input_dir, "batch2.parquet"))
        q.processAllAvailable()
      finally:
        q.stop()
    out = spark.table(name).filter(F.col("user_id") != SENTINEL_USER)
    # materialize before the tempdir vanishes
    result = out.cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicates`` on (user_id, event_type)
    over the file stream — state keeps one entry per key; append mode
    emits each key's first arrival. Projected to the key columns the
    output is the deterministic distinct-key set (arrival order decides
    which row wins, so non-key columns are not part of the contract)."""
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_dedup_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    stream = (
        _events_stream(spark, input_dir + "/*")
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    with _low_shuffle(spark):
        q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    result = spark.table(name).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` on (user_id, event_type): the
    BOUNDED-STATE form of streaming dedup — key state is evicted once the
    event-time watermark passes it, so state size tracks the watermark
    horizon instead of growing with every key ever seen (the difference
    between a dedup stream that runs for years and one that OOMs).
    With the fixture in one batch every duplicate falls inside the
    watermark, so the output is exactly the distinct key set (the oracle)."""
    name = "stream_ddww_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_ddww_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    stream = (
        _events_stream(spark, input_dir + "/*")
        .withWatermark("ts", "1 hour")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    with _low_shuffle(spark):
        q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    result = spark.table(name).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


DEDUP_WITHIN_WM_SQL = "SELECT DISTINCT user_id, event_type FROM events"


def streaming_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-user running event counter whose state (the count so far)
    persists across micro-batches; each batch emits the updated totals for
    the users it touched. With the whole fixture in one batch the emitted
    totals equal the batch group-by — the oracle. This is the
    arbitrary-state API (GroupState + Arrow batches) that covers operators
    session_window/dropDuplicates cannot express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    name = "stream_state_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_state_")
    input_dir = _materialize_events(spark, sf_dir, workdir)

    def count_events(key, pdf_iter, state: GroupState):
        running = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            running += len(pdf)
        state.update((running,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [running]})

    stream = (
        _events_stream(spark, input_dir + "/*")
        .groupBy("user_id")
        .applyInPandasWithState(
            count_events,
            outputStructType="user_id long, n_events long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    with _low_shuffle(spark):
        q = stream.writeStream.outputMode("update").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    result = spark.table(name).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dim (broadcast per micro-batch — the streaming analog of the
    reference's cocktails-dim enrichment), aggregated per market segment.
    Complete mode; equals the batch join exactly."""
    name = "stream_sj_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_sj_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = (
        _events_stream(spark, input_dir + "/*")
        .join(maybe_broadcast(customer, "customer"), F.col("user_id") == F.col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("sum_value"))
    )
    with _low_shuffle(spark):
        q = stream.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    result = spark.table(name).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join with event-time interval bounds: clicks
    joined to the same user's purchases within [click_ts, click_ts+30min].

    Both sides are real file streams with watermarks; the time-range
    predicate is what lets Spark bound the join state (each side's rows
    are dropped once the opposite watermark passes their interval) — the
    canonical funnel/attribution topology. Inner stream-stream joins emit
    matches as they arrive, so the complete output equals the batch
    interval join exactly (the DuckDB oracle)."""
    name = "stream_ij_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_ij_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    base = _events_stream(spark, input_dir + "/*")
    clicks = (
        base.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, input_dir + "/*")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        "click_id", "purchase_id", F.col("c_user").alias("user_id"),
        "click_ts", "purchase_ts",
    )
    with _low_shuffle(spark):
        q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    result = spark.table(name).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


STREAM_INTERVAL_JOIN_SQL = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: every click emitted, joined
    to same-user purchases in [click_ts, click_ts+30min] — unmatched
    clicks come out with NULL purchase columns.

    This is the shape the inner join cannot express: a row can only be
    declared UNMATCHED once the watermark has passed its whole join
    interval (until then a matching purchase could still arrive), so null
    rows are emitted on WATERMARK EXPIRY, not on arrival. The driver feeds
    a far-future sentinel batch on both sides to push the watermark past
    every real interval — exactly the session_window flush pattern — then
    filters the sentinel back out. The complete output therefore equals
    the batch LEFT JOIN (the DuckDB oracle); join state stays bounded by
    the watermark horizon either way."""
    name = "stream_ijo_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_ijo_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    static = load(spark, sf_dir, "events")
    max_ts = static.agg(F.max("ts")).first()[0]

    clicks = (
        _events_stream(spark, input_dir + "/*")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, input_dir + "/*")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(
        "click_id", "purchase_id", F.col("c_user").alias("user_id"),
        "click_ts", "purchase_ts",
    )
    with _low_shuffle(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            # sentinel batch: one far-future click AND purchase advance
            # both side's watermarks past every real interval, forcing
            # the expiry scan that emits the null-padded rows.
            far = max_ts + __import__("datetime").timedelta(days=10)
            sentinel = spark.createDataFrame(
                [
                    (10**9, far, SENTINEL_USER, "click", 0.0, "{}"),
                    (10**9 + 1, far, SENTINEL_USER, "purchase", 0.0, "{}"),
                ],
                schema=EVENTS_DDL,
            )
            sentinel.write.mode("overwrite").parquet(
                os.path.join(input_dir, "batch2.parquet")
            )
            q.processAllAvailable()
        finally:
            q.stop()
    result = (
        spark.table(name).filter(F.col("user_id") != SENTINEL_USER).cache()
    )
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


STREAM_INTERVAL_JOIN_OUTER_SQL = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


def streaming_foreach_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE sink: each micro-batch latest-wins-merges into a
    versioned state table — the pattern for maintaining a dimension from a
    stream when the sink must be transactional per batch (foreachBatch is
    where MERGE INTO lives in real deployments; here the merge is the
    engine's own latest_wins over plain parquet versions).

    The input is deliberately split into TWO files (odd/even users) so the
    state genuinely evolves across batches. Because latest-wins is
    commutative/associative over the union of batches, the final state
    equals the batch dedup_latest_wins over all events — the exact oracle —
    regardless of micro-batch order."""
    from ..operators.dedup import latest_wins

    workdir = tempfile.mkdtemp(prefix="cdbspark_fbm_")
    input_dir = os.path.join(workdir, "in")
    ev = load(spark, sf_dir, "events")
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(input_dir, "batch_a.parquet")
    )
    ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(input_dir, "batch_b.parquet")
    )

    state_holder: list[str | None] = [None]

    def apply_batch(bdf: DataFrame, epoch_id: int) -> None:
        batch_latest = latest_wins(
            bdf.select("user_id", "event_id", "ts", "event_type", "value"),
            ["user_id"],
            ["ts", "event_id"],
        )
        if state_holder[0] is not None:
            merged = latest_wins(
                spark.read.parquet(state_holder[0]).unionByName(batch_latest),
                ["user_id"],
                ["ts", "event_id"],
            )
        else:
            merged = batch_latest
        out = os.path.join(workdir, f"state_{epoch_id}")
        merged.write.mode("overwrite").parquet(out)
        state_holder[0] = out

    with _low_shuffle(spark):
        q = (
            _events_stream(spark, input_dir + "/*")
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # the final state can be arbitrarily large (one row per key), so it
    # must never transit the driver: move the last state version out of
    # the scratch dir to a stable path and return a plain distributed
    # read of it — the caller sees a normal parquet-backed DataFrame.
    keep_dir = tempfile.mkdtemp(prefix="cdbspark_fbm_state_")
    # reclaim the kept state at interpreter exit — repeated driver rounds /
    # test runs must not accumulate one parquet dir per invocation in /tmp
    atexit.register(shutil.rmtree, keep_dir, ignore_errors=True)
    final_dir = os.path.join(keep_dir, "final_state")
    shutil.move(state_holder[0], final_dir)
    shutil.rmtree(workdir, ignore_errors=True)
    return spark.read.parquet(final_dir)


FOREACH_MERGE_SQL = """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def streaming_postings_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous indexing: documents arrive as a file stream in three
    micro-batches; each batch foreachBatch-upserts its postings into the
    AT-REST index (retrieval.postings_index_write for the first batch,
    postings_index_upsert after — appended postings + additive manifest
    stats). BM25's global inputs (n_docs, Σdl, per-term df) are additive
    and commutative over the union of batches, so the final probe equals
    the batch ranker over ALL documents — the exact full-corpus oracle —
    regardless of micro-batch arrival order. This is the retrieval twin
    of streaming_foreach_merge's dimension maintenance: the corpus is
    tokenized exactly once, as it arrives."""
    from ..operators import retrieval

    workdir = tempfile.mkdtemp(prefix="cdbspark_spu_")
    input_dir = os.path.join(workdir, "in")
    docs = load(spark, sf_dir, "documents")
    for residue in range(3):
        docs.filter(F.col("doc_id") % 3 == residue).coalesce(1).write.parquet(
            os.path.join(input_dir, f"batch_{residue}.parquet")
        )

    keep_dir = tempfile.mkdtemp(prefix="cdbspark_spu_ix_")
    atexit.register(shutil.rmtree, keep_dir, ignore_errors=True)
    ix = os.path.join(keep_dir, "postings_ix")
    src_marker = os.path.join(input_dir, "batch_0.parquet")

    def apply_batch(bdf: DataFrame, epoch_id: int) -> None:
        from ..sources.formats import _read_manifest

        if bdf.isEmpty():
            return
        if _read_manifest(ix, "_MANIFEST"):
            retrieval.postings_index_upsert(spark, ix, bdf)
        else:
            retrieval.postings_index_write(spark, bdf, ix, src_marker)

    with _low_shuffle(spark):
        q = (
            spark.readStream.format("parquet")
            .schema(DOCS_DDL)
            .option("maxFilesPerTrigger", "1")
            .load(input_dir + "/*")
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    return retrieval.bm25_rank_stored(spark, ix)


def streaming_incremental_append(
    spark: SparkSession, source_dir: str, sink_dir: str, checkpoint_dir: str
) -> None:
    """S9/S10 streaming mapping: file-source stream appended to a parquet
    sink with a checkpoint as the high-water-mark state. Each call processes
    only files not yet recorded in the checkpoint (exactly the reference's
    incremental contract, minus its advance-before-sink bug)."""
    stream = _events_stream(spark, source_dir)
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window over the event stream: 1-hour windows
    every 30 minutes, complete mode — each event lands in exactly two
    overlapping windows (the streaming twin of the batch
    window_sliding_halfhour, which materializes the same two-window
    expansion explicitly). Fills the one windowing shape §2.7 lacked:
    tumbling, session, and now hopping.

    State cost at scale: windows/event = window/slide = 2; the state
    store holds (2 × distinct windows in the watermark horizon) rows —
    sizing is slide-bound, not event-bound, which is why a 1h/30m hop is
    cheap but a 1h/1s hop is the classic misconfiguration."""
    name = "stream_sliding_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_slide_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    stream = (
        _events_stream(spark, input_dir + "/*")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    with _low_shuffle(spark):
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    result = spark.table(name).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


@contextmanager
def _rocksdb_state(spark: SparkSession):
    """Run a streaming query under the RocksDB state store provider —
    the production backend for large state: the default HDFS-backed
    provider keeps every key in executor heap (OOM at big-state scale),
    RocksDB keeps working state on local disk with block-cache reads and
    supports changelog checkpointing. Same API, one conf."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def streaming_tumbling_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window stream executed on the RocksDB state store —
    bit-identical results to streaming_tumbling_hour (same oracle): the
    state BACKEND must never change query semantics, and this entry pins
    that. State lives off-heap on executor-local disk, which is what
    makes billion-key watermarked aggregations feasible at 100 TB."""
    name = "stream_rocks_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_rocks_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    stream = (
        _events_stream(spark, input_dir + "/*")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    with _low_shuffle(spark), _rocksdb_state(spark):
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    result = spark.table(name).cache()
    result.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return result


def streaming_restart_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure-recovery semantics end-to-end: the stream is STOPPED
    mid-input and a NEW query object resumes from the same checkpoint —
    the restarted run must process only the unseen files, and the file
    sink's commit log must yield exactly-once output (no loss, no dupes)
    even though two distinct query incarnations wrote it. The oracle is
    the plain batch aggregate over all events: any dropped or replayed
    micro-batch breaks the hash.

    Mechanics: the fixture is split into three source files; incarnation
    one consumes file 1 and stops; files 2–3 land "while down";
    incarnation two resumes from the checkpoint and drains. This is the
    crash-recovery contract a production pipeline actually relies on —
    checkpoint = source offsets + sink epoch log, not just state."""
    workdir = tempfile.mkdtemp(prefix="cdbspark_restart_")
    src_dir = os.path.join(workdir, "in")
    sink_dir = os.path.join(workdir, "sink")
    ckpt_dir = os.path.join(workdir, "ckpt")
    os.makedirs(src_dir)
    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]

    def _write_file(i: int) -> None:
        parts[i].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src_dir, f"f{i}.parquet")
        )

    def _incarnation() -> None:
        q = (
            spark.readStream.format("parquet")
            .schema("event_id long, event_type string")
            .option("maxFilesPerTrigger", "1")
            .load(src_dir + "/*")
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()  # "crash": the query object is gone for good

    with _low_shuffle(spark):
        _write_file(0)
        _incarnation()
        _write_file(1)  # arrive while the pipeline is down
        _write_file(2)
        _incarnation()  # resume from checkpoint only
    out = (
        spark.read.parquet(sink_dir)
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .cache()
    )
    out.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def streaming_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch last-touch attribution
    (operators/attribution.py:last_touch): a per-user
    ``applyInPandasWithState`` operator whose state is the latest touch
    channel seen so far; each conversion in a micro-batch emits one
    credit row (conv_id, channel, value), and the registered result is
    the channel rollup of the emitted credit stream — equal to the batch
    window form on the same events.

    Within a micro-batch rows are sorted by (ts, event_id) inside the
    state function (Spark hands the group's rows in arbitrary order);
    the fixture streams as ONE batch so event-time order is total. In a
    real deployment cross-batch event-time ordering needs the source
    ordered by time (the usual log-stream contract) — a late touch
    arriving after a conversion was credited cannot retro-credit it
    (same contract as any online attribution system).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.attribution import (
        ATTR_CONVERSION_TYPE,
        ATTR_NO_TOUCH,
        ATTR_TOUCH_TYPES,
    )

    name = "stream_attr_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_attr_")
    input_dir = _materialize_events(spark, sf_dir, workdir)

    touch_set = set(ATTR_TOUCH_TYPES)

    def credit(key, pdf_iter, state: GroupState):
        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdf_iter))
        rows = rows.sort_values(["ts", "event_id"])
        conv_ids, channels, values = [], [], []
        for r in rows.itertuples():
            if r.event_type in touch_set:
                last = r.event_type
            elif r.event_type == ATTR_CONVERSION_TYPE:
                conv_ids.append(r.event_id)
                channels.append(last if last is not None else ATTR_NO_TOUCH)
                values.append(r.value)
        state.update((last,))
        yield pd.DataFrame(
            {"conv_id": conv_ids, "channel": channels, "value": values}
        )

    stream = (
        _events_stream(spark, input_dir + "/*")
        .groupBy("user_id")
        .applyInPandasWithState(
            credit,
            outputStructType="conv_id long, channel string, value double",
            stateStructType="last_channel string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    with _low_shuffle(spark):
        q = (
            stream.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out = (
        spark.table(name)
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            dsum(F.col("value")).alias("attributed_revenue"),
        )
        .orderBy("channel")
        .cache()
    )
    out.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def streaming_error_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of operators/events.py:error_budget_burn: the
    hourly (events, errors) counts run as a STATEFUL tumbling aggregate
    over the event file stream (complete mode, 1-hour watermark); the
    multi-window burn readout — a tiny O(#hours) view a foreachBatch
    alert sink would compute per micro-batch — is the SHARED
    events.burn_readout, so this entry reuses the batch oracle verbatim
    (the streaming_last_touch twin convention)."""
    from ..operators import events as ev_ops

    name = "stream_burn_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_burn_")
    input_dir = _materialize_events(spark, sf_dir, workdir)
    stream = (
        _events_stream(spark, input_dir + "/*")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("int")).alias("n_errors"),
        )
        .select(F.col("w.start").alias("hour"), "n_events", "n_errors")
    )
    with _low_shuffle(spark):
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out = ev_ops.burn_readout(spark.table(name)).cache()
    out.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def streaming_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the time-bound ordered funnel
    (operators/events.py:window_funnel_timebound): a per-user
    ``applyInPandasWithState`` state machine holding (anchor time,
    last-step time, level); each micro-batch advances the
    chain-of-first-occurrences — step k counts only when it lands after
    step k−1 and within the 60-minute anchor horizon. The registered
    result is the per-level reach rollup of each user's final level,
    equal to the batch operator (and its DuckDB oracle) on the same
    events.

    Same ordering contract as streaming_last_touch: rows are sorted by
    (ts, event_id) inside the state function; the fixture streams as one
    micro-batch so event-time order is total, and in production the
    log-stream-ordered source carries the guarantee. State is two int64
    nanosecond stamps + a level — constant per user, the smallest
    possible funnel state.

    Scale shape (round 11 — this was the steepest corrected scaling row
    at 6.7×/decade): (a) non-step event types are filtered JVM-side
    BEFORE the state shuffle (they can never advance the machine), so
    the Arrow transfer and Python workers see only funnel-relevant rows;
    (b) the per-user advance is vectorized — one numpy first-hit scan
    per REMAINING level (|steps| array ops) instead of a Python loop
    over every event; (c) the source is materialized as a multi-file
    batch and the state stage runs at defaultParallelism once the event
    count warrants the extra state stores (the max-level readout is
    multi-batch-safe, so all files ride ONE trigger and batch
    boundaries stay deterministic).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.events import FUNNEL_STEPS, WF_WINDOW_MIN

    steps = list(FUNNEL_STEPS)
    horizon_ns = WF_WINDOW_MIN * 60 * 1_000_000_000

    name = "stream_wfunnel_" + uuid.uuid4().hex[:8]
    workdir = tempfile.mkdtemp(prefix="cdbspark_wfun_")
    n_events = load(spark, sf_dir, "events").count()
    # fixture scale keeps the 8-store single-file layout; past ~200k
    # events the per-event work dwarfs state-store setup, so spend the
    # full core count on both the scan and the state stage
    par = spark.sparkContext.defaultParallelism
    wide = n_events > 200_000
    n_parts = par if wide else 1
    input_dir = _materialize_events(spark, sf_dir, workdir, parts=n_parts)

    def advance(key, pdf_iter, state: GroupState):
        t1, tk, level = state.get if state.exists else (None, None, 0)
        rows = pd.concat(list(pdf_iter))
        rows = rows.sort_values(["ts", "event_id"])
        ts = rows["ts"].values.astype("datetime64[ns]").astype("int64")
        et = rows["event_type"].values
        if level == 0:
            hit = np.flatnonzero(et == steps[0])
            if hit.size:
                t1 = tk = int(ts[hit[0]])
                level = 1
        while 0 < level < len(steps):
            # first event of the next step type STRICTLY after the last
            # step and within the anchor horizon; rows are ts-sorted, so
            # the first qualifying index is the loop's first qualifying
            # event — identical semantics to the row-at-a-time machine
            hit = np.flatnonzero(
                (et == steps[level]) & (ts > tk) & (ts <= t1 + horizon_ns)
            )
            if hit.size == 0:
                break
            tk = int(ts[hit[0]])
            level += 1
        state.update((t1, tk, level))
        yield pd.DataFrame({"u": [key[0]], "level": [level]})

    stream = (
        _events_stream(spark, input_dir + "/*", max_files=max(n_parts, 1))
        .filter(F.col("event_type").isin(steps))
        .groupBy("user_id")
        .applyInPandasWithState(
            advance,
            outputStructType="u long, level int",
            stateStructType="t1 long, tk long, level int",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    with _low_shuffle(spark, n=par if wide else 8):
        q = (
            stream.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finals = (
        spark.table(name)
        .groupBy("u")
        .agg(F.max("level").alias("lvl"))
        .filter(F.col("lvl") >= 1)
    )
    per_level = None
    for k, step in enumerate(steps, start=1):
        row = finals.filter(F.col("lvl") >= k).agg(
            F.lit(k).cast("int").alias("level"),
            F.lit(step).alias("step"),
            F.count("*").cast("long").alias("n_users"),
        )
        per_level = row if per_level is None else per_level.unionByName(row)
    base = F.broadcast(
        finals.agg(F.count("*").cast("double").alias("n1"))
    )
    from ..numeric import qround

    out = (
        per_level.crossJoin(base)
        .select(
            "level",
            "step",
            "n_users",
            qround(F.col("n_users").cast("double") / F.col("n1"), 6).alias(
                "conversion_from_l1"
            ),
        )
        .cache()
    )
    out.count()
    shutil.rmtree(workdir, ignore_errors=True)
    return out
