"""Event-stream operators over the ``events`` table (SURVEY.md §2.9 X5/X6):
JSON property extraction, tumbling/sliding windows, sessionization.

Batch forms live here (every one has an exact DuckDB twin); the streaming
forms (readStream + watermark + session_window) are in
``cocktailsdb_spark.streaming`` and reuse the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import SESSION_GAP_SEC
from ..numeric import dsum


def json_props(events: DataFrame) -> DataFrame:
    """X5 — extract typed values from the JSON ``props`` string column."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


def tumbling_hour(events: DataFrame) -> DataFrame:
    """X6 — 1-hour tumbling windows: count + sum(value). Uses the native
    ``window()`` operator (same operator the streaming variant uses)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_hour(events: DataFrame) -> DataFrame:
    """X6 — 1-hour windows sliding every 30 minutes (each event lands in 2)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """X6 — classic batch sessionization: a gap > ``gap_sec`` between
    consecutive events of a user starts a new session. lag + running sum of
    session-start flags; two window functions over ONE shuffle on user_id
    (both windows share the partitioning)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_sec = F.col("ts").cast("double")
    prev = F.lag(ts_sec).over(w)
    new_sess = F.when(prev.isNull() | ((ts_sec - prev) > gap_sec), 1).otherwise(0)
    sess = events.withColumn(
        "session_no",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """X6 — Spark's native session_window operator (merging windows with
    gap timeout). Its oracle twin in registry_ops.py is the composed
    lag-based definition above — the two cross-validate each other.
    session_window.end = last event + gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
