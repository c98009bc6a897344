"""Skew evidence for windowed operators: a hot user owning 20% of the
events must not serialize sessionization through one task. The chunked
two-phase sessionize is asserted output-identical to the plain window form
on a skewed fixture, and both are timed (numbers recorded in BASELINE.md —
timings are informational, equality is the gate)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cocktailsdb_spark.operators import events as EV

N_ROWS = 600_000
HOT_SHARE = 5  # id % 5 == 0 → user 0 owns 20% of all rows


@pytest.fixture(scope="module")
def hot_events(spark):
    """Synthetic skewed stream: user 0 = 20% of rows, 996 cold users share
    the rest; pseudo-random timestamps over ~8 weeks so every user has many
    sessions."""
    df = (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % HOT_SHARE == 0, 0)
            .otherwise(F.col("id") % 997 + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") * 2654435761) % 5_000_000
            ).alias("ts"),
            F.lit("click").alias("event_type"),
            ((F.col("id") % 1000) / 10.0).alias("value"),
        )
        .repartition(32)
        .cache()
    )
    df.count()
    return df


def _canon(df):
    return df.select(
        "user_id", "session_no", "session_start", "session_end", "n_events", "sum_value"
    )


def test_chunked_sessionize_identical_on_skewed_data(spark, hot_events):
    plain = _canon(EV.sessionize(hot_events)).cache()
    chunked = _canon(EV.sessionize_chunked(hot_events, chunk_sec=86400)).cache()
    try:
        n_plain, n_chunked = plain.count(), chunked.count()
        assert n_plain == n_chunked
        assert plain.exceptAll(chunked).count() == 0
        assert chunked.exceptAll(plain).count() == 0
        # the hot user really is hot, and really got split across chunks
        hot_rows = hot_events.filter("user_id = 0").count()
        assert hot_rows == N_ROWS // HOT_SHARE
    finally:
        plain.unpersist()
        chunked.unpersist()


def test_chunked_sessionize_timings_recorded(spark, hot_events, capsys):
    """Wall-clock both forms on the skewed fixture (informational; the
    BASELINE.md skew note quotes these numbers from a local[32] run)."""
    for name, fn in (
        ("plain_window", lambda: EV.sessionize(hot_events)),
        ("chunked_window", lambda: EV.sessionize_chunked(hot_events, chunk_sec=86400)),
    ):
        t0 = time.time()
        fn().count()
        with capsys.disabled():
            print(f"\n[skew-timing] {name}: {time.time() - t0:.2f}s", flush=True)


def test_chunked_bounds_the_straggler_partition(spark, hot_events):
    """The scale-invariant claim: the plain window funnels the hot user's
    ENTIRE history through one task (grows linearly with the user), while
    the chunked window bounds every task by the per-chunk slice."""
    plain_max = (
        hot_events.groupBy("user_id").count().agg(F.max("count")).first()[0]
    )
    chunk = F.floor(F.col("ts").cast("double") / 86400)
    chunked_max = (
        hot_events.groupBy("user_id", chunk.alias("c"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert plain_max == N_ROWS // HOT_SHARE  # 20% of the stream in ONE task
    assert chunked_max * 10 < plain_max  # spread over the ~58 day-chunks


def test_chunk_boundary_sessions_merge_exactly(spark):
    """A session straddling a chunk boundary must merge back into one; a
    gap just over the threshold at the boundary must not."""
    rows = [
        # user 1: events 10 min apart across midnight → ONE session
        (1, 1, "2024-01-01 23:50:00", 1.0),
        (2, 1, "2024-01-02 00:00:00", 1.0),
        (3, 1, "2024-01-02 00:10:00", 1.0),
        # user 2: 31-minute gap across midnight → TWO sessions
        (4, 2, "2024-01-01 23:45:00", 1.0),
        (5, 2, "2024-01-02 00:16:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, value double"
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = {
        (r["user_id"], r["session_no"]): r["n_events"]
        for r in EV.sessionize_chunked(df, chunk_sec=86400).collect()
    }
    assert out == {(1, 1): 3, (2, 1): 1, (2, 2): 1}
