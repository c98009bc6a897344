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
from ..numeric import dsum, qround


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


def sessionize_chunked(
    events: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    chunk_sec: int = 86400,
) -> DataFrame:
    """Skew-resistant sessionization, output-identical to :func:`sessionize`.

    A plain user_id window serializes each user's whole history through
    ONE task — a hot user owning 20% of a 100 TB stream becomes a 20 TB
    straggler (and AQE skew handling does not apply to window exchanges,
    only joins). Two-phase fix:

    1. Sessionize within ``(user_id, time-chunk)`` — the hot user's
       timeline is spread over #chunks parallel tasks. Chunking by time is
       the only valid \"salt\" for an order-dependent scan: rows that could
       belong to one session are either in the same chunk or in adjacent
       ones, never scattered.
    2. Re-apply the SAME gap rule over the per-chunk session *intervals*
       (ordered by start per user, merge when ``start - prev_end <= gap``)
       — exact because local sessions are disjoint and the only possible
       under-split is at chunk boundaries, where the inter-session gap
       equals the inter-event gap. Phase-2 data is smaller by the
       events-per-session ratio, so its per-user window is no longer a
       straggler at any realistic skew.

    Partial sums stay DECIMAL through phase 2 (exact re-aggregation), so
    sum_value is bit-identical to the single-window form.
    """
    from ..numeric import DEC

    ts_sec = F.col("ts").cast("double")
    chunk = F.floor(ts_sec / chunk_sec)
    w1 = Window.partitionBy("user_id", "_chunk").orderBy("ts", "event_id")
    prev = F.lag(ts_sec).over(w1)
    new_sess = F.when(prev.isNull() | ((ts_sec - prev) > gap_sec), 1).otherwise(0)
    local = (
        events.withColumn("_chunk", chunk)
        .withColumn(
            "_sess",
            F.sum(new_sess).over(w1.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "_chunk", "_sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("_val"),  # stay decimal
        )
    )
    # phase 2: gap rule over the interval list (tiny vs the event stream)
    w2 = Window.partitionBy("user_id").orderBy("session_start")
    prev_end = F.lag(F.col("session_end").cast("double")).over(w2)
    start_sec = F.col("session_start").cast("double")
    new_merged = F.when(
        prev_end.isNull() | ((start_sec - prev_end) > gap_sec), 1
    ).otherwise(0)
    return (
        local.withColumn(
            "session_no",
            F.sum(new_merged).over(w2.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_no")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
            F.sum("_val").cast("double").alias("sum_value"),
        )
    )


def asof_latest(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "signup",
) -> DataFrame:
    """As-of join: for each ``left_type`` event, the most recent
    ``right_type`` event of the same user at or before its timestamp.

    Implemented as the scalable union-then-window pattern — tag both sides,
    union, and carry the last right-side row forward with
    ``last(..., ignorenulls=True)`` over (user_id, ts). ONE shuffle on
    user_id, no row-multiplying inequality join, no per-key skew beyond the
    key's own event count; this is the plan that survives 100 TB, unlike
    the naive equi+inequality join whose matched-pair blowup is quadratic
    per key. Tie at equal ts: the right side sorts first (side=0) so the
    match is inclusive; among right-side ties the larger event_id wins.
    """
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id", "ts", "event_id", F.lit(1).alias("side"),
        F.lit(None).cast("struct<id:bigint,ts:timestamp>").alias("r"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        "user_id", "ts", "event_id", F.lit(0).alias("side"),
        F.struct(F.col("event_id").alias("id"), F.col("ts").alias("ts")).alias("r"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = right.unionByName(left).withColumn(
        "last_r", F.last("r", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("last_r.id").alias("signup_id"),
        F.col("last_r.ts").alias("signup_ts"),
    )


def range_join_count(
    events: DataFrame,
    anchor_type: str = "error",
    probe_type: str = "click",
    lookback_sec: int = 300,
) -> DataFrame:
    """Range join: for each ``anchor_type`` event, count ``probe_type``
    events of the same user in the preceding ``lookback_sec`` window
    [ts - lookback, ts). The user_id equi-key keeps this a hash join with
    the range as a post-join filter — never a nested-loop cross product.
    At 100 TB the refinement is bucketing both sides by (user_id,
    time_bucket) so each range probe touches ≤2 buckets."""
    anchors = events.filter(F.col("event_type") == anchor_type).select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    probes = events.filter(F.col("event_type") == probe_type).select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    cond = (
        (F.col("a_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("a_ts") - F.expr(f"INTERVAL {lookback_sec} SECOND"))
        & (F.col("p_ts") < F.col("a_ts"))
    )
    return (
        anchors.join(probes, cond, "left")
        .groupBy("anchor_id", F.col("a_user").alias("user_id"), F.col("a_ts").alias("ts"))
        .agg(F.count("p_ts").alias("n_recent"))
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


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_steps(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Strict-sequence funnel conversion: n_users who reached step k, where
    step k counts only if its event happens STRICTLY AFTER the user's
    step-(k−1) time (earliest-qualifying-event semantics at every step).

    ONE shuffle on user_id builds the per-user sorted event list; each
    step time is then a narrow higher-order filter/min over that array —
    no per-step re-join against the fact table (the naive form is k
    shuffles). Per-user state is bounded by that user's funnel-event
    count, the same bound sessionization carries. The final per-step
    counts reduce a 1-row-per-user frame, so the stack() unpivot at the
    end is driver-free and tiny."""
    ev = (
        events.filter(F.col("event_type").isin(*steps))
        .select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs"))
    )
    prev = None
    step_cols = []
    for k, step in enumerate(steps):
        if prev is None:
            hits = F.filter(F.col("evs"), lambda e: e.event_type == step)
        else:
            p = prev
            hits = F.filter(
                F.col("evs"), lambda e: (e.event_type == step) & (e.ts > p)
            )
        t = F.array_min(F.transform(hits, lambda e: e.ts))
        ev = ev.withColumn(f"_t{k}", t)
        prev = F.col(f"_t{k}")
        step_cols.append(f"_t{k}")
    sums = ev.agg(
        *[
            # coalesce: sum over an EMPTY frame (no user did step 0) is
            # null, but the funnel count is 0 — matches SQL count(*)
            F.coalesce(
                F.sum(F.col(c).isNotNull().cast("long")), F.lit(0)
            ).alias(f"n{k}")
            for k, c in enumerate(step_cols)
        ]
    )
    stack_args = ", ".join(
        f"'{s}', {k + 1}, n{k}" for k, s in enumerate(steps)
    )
    return sums.select(
        F.expr(f"stack({len(steps)}, {stack_args}) AS (step, step_index, n_users)")
    ).select("step", F.col("step_index").cast("int").alias("step_index"), "n_users")


def event_transitions(events: DataFrame) -> DataFrame:
    """Markov transition counts over each user's event stream: for every
    consecutive (event, next event) pair in (ts, event_id) order, the pair
    count and its share of all transitions leaving the source event type.
    ONE shuffle (the per-user window); the pair aggregate then runs on the
    tiny (type × type) grid. The row-probability denominator reuses the
    same aggregate via a window sum — no second pass over the facts."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        qround(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events),
c AS (SELECT from_type, to_type, count(*) AS n FROM seq
      WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
SELECT from_type, to_type, n,
       floor(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)
             * 1000000.0 + 0.5) / 1000000.0 AS p
FROM c
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day; for
    each (cohort_day, day_offset) the count of cohort members active that
    day. Active-day distinct() collapses the fact table BEFORE the cohort
    join (both keyed on user_id — AQE coalesces into one exchange reuse),
    and the final aggregate is on the tiny (cohort × offset) grid."""
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    active = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_day", F.datediff("day", "cohort_day").alias("day_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("int").alias("day_offset"),
            "n_users",
        )
    )


def activity_streaks(events: DataFrame, top_k: int = 20) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per user
    (the classic `date − row_number()` island key — public SQL folklore).

    Plan: ONE shuffle clusters each user's distinct activity days; the
    island key, per-island aggregate, and per-user argmax all run on that
    same user partitioning (the distinct, both windows, and the final
    aggregate share HashPartitioning(user_id) — no further data-sized
    exchange). TakeOrdered top_k with full tiebreak (streak desc, user
    asc, start asc) keeps the result deterministic cross-engine.

    Output: (user_id, streak_days, start_day, end_day) — each user's
    single longest streak (earliest wins ties), top_k longest overall.
    """
    days = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).dropDuplicates(["user_id", "d"])
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count("*").cast("int").alias("streak_days"),
        F.min("d").alias("start_d"),
        F.max("d").alias("end_d"),
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("start_d")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "streak_days",
            F.date_format("start_d", "yyyy-MM-dd").alias("start_day"),
            F.date_format("end_d", "yyyy-MM-dd").alias("end_day"),
        )
        .orderBy(F.desc("streak_days"), F.asc("user_id"))
        .limit(top_k)
    )


def asof_next(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "error",
    tolerance_sec: int = 86400,
) -> DataFrame:
    """Forward as-of join with tolerance: for each ``left_type`` event,
    the EARLIEST ``right_type`` event of the same user at-or-after its
    timestamp, but only within ``tolerance_sec`` — the mirror of
    :func:`asof_latest` (kdb's ``aj`` forward form / pandas
    ``merge_asof(direction='forward', tolerance=...)``).

    Same scalable union-then-window pattern — ONE shuffle on user_id, no
    row-multiplying inequality join: tag both sides, union, take
    ``first(right, ignorenulls)`` over the FOLLOWING frame [current,
    unbounded]. At equal ts the right side sorts after the left (side=1)
    so the match is inclusive; among right-side ties the smaller event_id
    wins (earliest match). The tolerance is applied as a post-window
    filter on the matched pair — matches beyond it become NULL, keeping
    every left row (left-outer semantics).
    """
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id", "ts", "event_id", F.lit(0).alias("side"),
        F.lit(None).cast("struct<ts:timestamp,id:bigint>").alias("r"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        "user_id", "ts", "event_id", F.lit(1).alias("side"),
        F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("id")).alias("r"),
    )
    # forward lookup via the REVERSED running frame: last(ignorenulls)
    # over desc order == first right at-or-after in asc order, but O(n)
    # per partition (a (currentRow, unboundedFollowing) frame re-scans to
    # the partition end per row — quadratic on hub users)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("side").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = left.unionByName(right).withColumn(
        "next_r", F.last("r", ignorenulls=True).over(w)
    )
    within = F.col("next_r.ts") <= F.col("ts") + F.expr(
        f"INTERVAL {int(tolerance_sec)} SECOND"
    )
    return merged.filter(F.col("side") == 0).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(within, F.col("next_r.id")).alias("next_id"),
        F.when(within, F.col("next_r.ts")).alias("next_ts"),
    )


PATH_LEN = 5
PATH_TOP_N = 25


def top_event_paths(
    events: DataFrame, path_len: int = PATH_LEN, top_n: int = PATH_TOP_N
) -> DataFrame:
    """Path analysis: the most common event-type sequences users actually
    take — each (user, day) journey truncated to its first ``path_len``
    steps, counted corpus-wide, top-N. The product-analytics primitive
    behind sankey/"user flow" views, and (as n-gram-over-actions) the
    behavioral-cloning data prep for agentic training sets.

    ONE data-sized shuffle: the (user, day) groupBy builds each journey
    with sort_array(collect_list(struct(ts, event_id, type))) — the
    struct sort gives the deterministic (ts, event_id) order WITHOUT a
    window pass, the transform/slice/concat are narrow JVM expressions,
    and journeys are bounded by path_len before the path count. The path
    aggregate then carries one row per distinct journey; top-N is a
    bounded TakeOrdered heap.
    """
    day = F.col("ts").cast("date")
    j = (
        events.groupBy(F.col("user_id"), day.alias("day"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("ts").alias("ts"),
                        F.col("event_id").alias("eid"),
                        F.col("event_type").alias("et"),
                    )
                )
            ).alias("seq")
        )
        .select(
            F.concat_ws(
                ">",
                F.slice(
                    F.transform(F.col("seq"), lambda s: s["et"]), 1, path_len
                ),
            ).alias("path")
        )
    )
    return (
        j.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_journeys"))
        .orderBy(F.desc("n_journeys"), F.asc("path"))
        .limit(top_n)
    )


def daily_user_accounting(events: DataFrame) -> DataFrame:
    """Growth accounting: per calendar day — active users, NEW users
    (first ever appearance), returning users, and the cumulative unique
    user count. The dashboard primitive behind every DAU/new-vs-returning
    chart, and a shape worth doing right: the naive form re-scans history
    per day, this one never does.

    Plan: ONE distinct over (user, day) collapses the event stream; a
    row_number window per user marks each user's first day (no join back
    against a first-seen table); the day aggregate counts active/new; the
    running cumulative sum runs on the DAY-grain frame — calendar-sized
    (~2.5k rows for 7 years), so its single-partition window is metadata
    work, the same justification as the encoding-runs boundary stitch.
    """
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    marked = ud.select(
        "day", (F.row_number().over(w) == 1).cast("long").alias("is_new")
    )
    daily = marked.groupBy("day").agg(
        F.count("*").cast("long").alias("active_users"),
        F.sum("is_new").cast("long").alias("new_users"),
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(wd).cast("long").alias("cumulative_unique"),
    )


def variant_props_agg(events: DataFrame) -> DataFrame:
    """X5 via the VARIANT type (Spark 4.0, public SQL:2023-adjacent
    semi-structured type): ``try_parse_json`` decodes each props payload
    ONCE into variant's binary encoding, and typed fields come out with
    ``variant_get`` path expressions — versus get_json_object, which
    re-parses the string per extraction. At 100 TB with many extractions
    per row that single-parse property is the entire cost story (and
    variant columns store shredded in parquet going forward). Malformed
    payloads become NULL variants (try_), never job failures.

    Output: per event_type — rows with a k value, exact sum and max of k.
    """
    v = F.try_parse_json("props")
    # try_variant_get, not variant_get: a well-formed payload whose k is
    # non-numeric must degrade to NULL like the malformed ones, per the
    # no-job-failures contract above
    k = F.try_variant_get(v, "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("long").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


def concurrent_sessions_daily(events: DataFrame) -> DataFrame:
    """Peak session concurrency per calendar day — the capacity-planning
    number (licenses, connection pools, GPU slots) — computed as a
    DISTRIBUTED sweep line: +1 at each session start, −1 at each end
    (end-exclusive: at an equal instant the −1 sorts first, so
    back-to-back sessions never double-count), running-summed WITHIN
    per-day windows, with each day's carry-in (sessions still open at
    midnight) coming from a calendar-sized cumulative of per-day deltas
    — the same split-merge identity as the encoding-runs boundary
    stitch, so no global single-partition window ever exists. A session
    spanning midnight contributes to its start day's running sum and to
    every later day's carry-in, which is exactly the sweep-line
    semantics.

    Output: (day, open_at_start, day_peak) per day with any session
    boundary; deterministic integer arithmetic throughout.
    """
    sess = sessionize(events).select("user_id", "session_start", "session_end")
    pts = sess.select(
        F.col("session_start").alias("ts"), F.lit(1).alias("delta"),
        "user_id",
    ).unionByName(
        sess.select(
            F.col("session_end").alias("ts"), F.lit(-1).alias("delta"),
            "user_id",
        )
    )
    day = F.col("ts").cast("date")
    w = Window.partitionBy("day").orderBy("ts", "delta", "user_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = (
        pts.select(day.alias("day"), "ts", "delta", "user_id")
        .withColumn("run", F.sum("delta").over(w))
    )
    per_day = run.groupBy("day").agg(
        F.max("run").alias("local_peak"), F.sum("delta").alias("day_delta")
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carry = F.coalesce(F.sum("day_delta").over(wd), F.lit(0))
    # the day's peak can be its carry-in itself: a day whose only points
    # are session ENDS never raises the running sum above the midnight
    # concurrency, so greatest(carry, carry + local_peak) is the true max
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        carry.cast("long").alias("open_at_start"),
        F.greatest(carry, carry + F.col("local_peak"))
        .cast("long")
        .alias("day_peak"),
    )


def audience_overlap(events: DataFrame) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, how many
    distinct users do both, and the Jaccard overlap of the two audiences
    — the segment-overlap question behind campaign planning ("do clickers
    also purchase?").

    Scale shape: ONE distinct (event_type, user_id) projection, then a
    user-keyed self-join whose fanout is bounded by the event-type
    cardinality (single digits — the blocking-IS-the-join-key shape, like
    frequent_itemset_pairs), one pair-keyed aggregate, and broadcast
    per-type audience sizes. Never quadratic in users.
    """
    base = events.select("event_type", "user_id").distinct()
    sizes = base.groupBy("event_type").agg(F.count("*").alias("n"))
    x, y = base.alias("x"), base.alias("y")
    both = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    jac = F.col("n_both").cast("double") / (
        F.col("n_a").cast("double")
        + F.col("n_b").cast("double")
        - F.col("n_both").cast("double")
    )
    return (
        both.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "n_both",
            qround(jac, 6).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def engagement_histogram(events: DataFrame) -> DataFrame:
    """Power-user curve: users bucketed by floor(log2(events)) activity
    bands, with each band's share of total event volume and the
    cumulative share scanning from the heaviest band down — the "what
    fraction of traffic do the top bands carry" engagement read.

    Scale shape: one user-keyed count aggregate (data-sized), one
    band-keyed rollup (≤ 64 bands — log2 of any 64-bit count), and a
    window over the band frame. floor(log2(n)) is flip-safe: log2 is
    exact at powers of two and the nearest-integer margin elsewhere is
    orders above libm's sub-ulp drift.
    """
    peruser = events.groupBy("user_id").agg(F.count("*").alias("n"))
    bands = (
        peruser.groupBy(
            F.floor(F.log2(F.col("n").cast("double"))).cast("int").alias("band")
        )
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("n").cast("long").alias("n_events"),
        )
    )
    totals = bands.agg(F.sum("n_events").alias("tot"))
    w = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        bands.crossJoin(F.broadcast(totals))
        .select(
            "band",
            "n_users",
            "n_events",
            qround(F.col("n_events").cast("double") / F.col("tot").cast("double"), 6).alias(
                "share_events"
            ),
            qround(
                F.sum("n_events").over(w).cast("double")
                / F.col("tot").cast("double"),
                6,
            ).alias("cum_share_from_top"),
        )
        .orderBy(F.desc("band"))
    )


AB_Z = 1.96  # 95% two-sided normal quantile, driver-side literal


def ab_test_wilson(events: DataFrame) -> DataFrame:
    """A/B experiment readout with Wilson score intervals: users are
    assigned to variants by ``user_id % 2`` (the deterministic hash-split
    convention — hash_split owns the general form), a user CONVERTS if
    they have ≥1 purchase event, and each variant reports its conversion
    rate with the Wilson 95% interval (Wilson 1927, public — the
    recommended small-/skewed-sample binomial interval; the normal
    approximation can leave [0,1]).

    Scale shape: one distinct-user aggregate (user-keyed, map-side
    combined), then a 2-row variant rollup; the interval arithmetic is
    scalar IEEE on the tiny frame, expression-shape-identical to the
    DuckDB twin, qround-pinned (sqrt is the one libm call).
    """
    per_user = events.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == F.lit("purchase")).cast("int")
        ).alias("converted")
    )
    g = per_user.groupBy(
        (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    n = F.col("n_users").cast("double")
    x = F.col("n_converted").cast("double")
    p = x / n
    z = F.lit(AB_Z)
    z2 = z * z
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (
        z
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
        / denom
    )
    return g.select(
        "variant",
        "n_users",
        "n_converted",
        qround(p, 6).alias("rate"),
        qround(center - half, 6).alias("wilson_low"),
        qround(center + half, 6).alias("wilson_high"),
    ).orderBy("variant")


DECAY_REF_EPOCH = 1706745600.0  # 2024-02-01 00:00:00 UTC, after the fixture
DECAY_LAMBDA_PER_DAY = 0.1
DECAY_TOP_K = 20


def decayed_engagement(events: DataFrame, top_k: int = DECAY_TOP_K) -> DataFrame:
    """Time-decayed engagement score per user — the recency-weighted
    activity ranking (each event contributes exp(−λ·age_days) as of a
    fixed reference instant), the standard churn/loyalty feature that a
    plain event count misses (100 events last year < 10 events this
    week).

    Scale shape: ONE map-side-combined user-keyed aggregate over the
    scan; per-event decay terms are decimal-quantized before summing
    (dsum — float-sum order would otherwise differ between engines and
    partitionings), then a rounded-score TakeOrdered top-k with the
    user as tiebreak. exp() is the one libm call (the logreg argument).
    """
    age_days = (
        F.lit(DECAY_REF_EPOCH) - F.col("ts").cast("double")
    ) / F.lit(86400.0)
    term = F.exp(F.lit(-DECAY_LAMBDA_PER_DAY) * age_days)
    g = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        dsum(term).alias("score_raw"),
    )
    return (
        g.select(
            "user_id",
            "n_events",
            qround(F.col("score_raw"), 6).alias("decay_score"),
        )
        .orderBy(F.desc("decay_score"), F.asc("user_id"))
        .limit(top_k)
    )


LAG_PCTS = (0.25, 0.5, 0.75, 0.9)


def conversion_lag_profile(events: DataFrame, pcts: tuple[float, ...] = LAG_PCTS) -> DataFrame:
    """Signup→first-purchase latency profile: exact PERCENTILE_DISC
    lags plus the conversion rate — the time-to-convert companion of
    funnel_conversion (which counts stage reach but not dwell).

    Lag = first purchase AT/after the user's first signup, in exact
    integer microseconds (unix_micros both engines) converted to seconds
    at the output edge. Percentiles use the ⌈q·n⌉ nearest-rank pick over
    the converted-user frame — O(converting users), one window; at
    100 TB the histogram route (relational.quantile_two_pass) replaces
    the exact rank, same as the winsorized/spearman exact↔scaled twins.
    """
    su = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.min("s_ts").alias("s_ts"))
        .select(
            "user_id",
            (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("lag_us"),
        )
    )
    w = Window.orderBy("lag_us", "user_id")
    n_conv = pu.agg(F.count("*").alias("n"))
    ranked = pu.crossJoin(F.broadcast(n_conv)).withColumn(
        "rn", F.row_number().over(w)
    )
    picks = [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n").cast("double")),
                F.col("lag_us"),
            )
        ).alias(f"p{int(q * 100)}_us")
        for q in pcts
    ]
    agg = ranked.agg(F.max("n").alias("n_converted"), *picks)
    n_signup = su.agg(F.count("*").alias("n_signup_users"))
    out_cols = [
        qround(F.col(f"p{int(q * 100)}_us").cast("double") / F.lit(1e6), 3).alias(
            f"p{int(q * 100)}_sec"
        )
        for q in pcts
    ]
    return agg.crossJoin(F.broadcast(n_signup)).select(
        F.col("n_signup_users").cast("long").alias("n_signup_users"),
        F.col("n_converted").cast("long").alias("n_converted"),
        qround(
            F.col("n_converted").cast("double") / F.col("n_signup_users").cast("double"),
            6,
        ).alias("conversion_rate"),
        *out_cols,
    )


ABANDON_WINDOW_SEC = 3600


def abandoned_views_daily(
    events: DataFrame, window_sec: int = ABANDON_WINDOW_SEC
) -> DataFrame:
    """Daily view-abandonment report: a view is *abandoned* when the same
    user makes NO purchase within ``window_sec`` after it — the
    time-bounded ANTI join (the non-conversion complement of
    funnel_conversion / conversion_lag_profile).

    Join shape at scale: LEFT ANTI on the user_id equi key with the time
    band as a join residual — the shuffle partitions by user, the band
    check is per-row; nothing quadratic (per-user event lists are
    bounded, the same contract as the as-of family). Time compared in
    exact integer microseconds on both engines.
    """
    v = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        F.unix_micros("ts").alias("v_us"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros("ts").alias("p_us")
    )
    win_us = window_sec * 1_000_000
    abandoned = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_us") >= F.col("v_us"))
        & (F.col("p_us") <= F.col("v_us") + F.lit(win_us)),
        "left_anti",
    )
    daily_v = v.groupBy(F.to_date("v_ts").alias("day")).agg(
        F.count("*").alias("n_views")
    )
    daily_a = abandoned.groupBy(F.to_date("v_ts").alias("day")).agg(
        F.count("*").alias("n_abandoned")
    )
    return (
        daily_v.join(daily_a, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_views").cast("long").alias("n_views"),
            F.coalesce(F.col("n_abandoned"), F.lit(0)).cast("long").alias("n_abandoned"),
            qround(
                F.coalesce(F.col("n_abandoned"), F.lit(0)).cast("double")
                / F.col("n_views").cast("double"),
                6,
            ).alias("abandonment_rate"),
        )
        .orderBy("day")
    )


def markov_prediction_accuracy(events: DataFrame) -> DataFrame:
    """First-order Markov next-event prediction, evaluated in-corpus: the
    model is argmax_next count(from → next) (ties break lexically on the
    next type — deterministic), scored against every actual transition.
    The readout :func:`event_transitions` lacks: how predictive the chain
    actually is, per source state.

    Scale: the corpus-sized pass is the ONE per-user window that also
    feeds event_transitions; the model is the (type × type) grid — a
    broadcast; scoring joins transitions to the model on the tiny grid
    key. Output per source state: majority prediction, transition count,
    hits, accuracy; plus the weighted overall row (from_type = '*').
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "next_type")
    )
    grid = trans.groupBy("from_type", "next_type").agg(F.count("*").alias("n"))
    w_pick = Window.partitionBy("from_type").orderBy(F.desc("n"), F.asc("next_type"))
    model = (
        grid.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select("from_type", F.col("next_type").alias("predicted"))
    )
    scored = trans.join(F.broadcast(model), "from_type").select(
        "from_type",
        (F.col("next_type") == F.col("predicted")).cast("int").alias("hit"),
        "predicted",
    )
    per_state = scored.groupBy("from_type", "predicted").agg(
        F.count("*").cast("long").alias("n_transitions"),
        F.sum("hit").cast("long").alias("n_correct"),
    )
    overall = scored.agg(
        F.count("*").cast("long").alias("n_transitions"),
        F.sum("hit").cast("long").alias("n_correct"),
    ).select(
        F.lit("*").alias("from_type"),
        F.lit("*").alias("predicted"),
        "n_transitions",
        "n_correct",
    )
    return (
        per_state.unionByName(overall)
        .select(
            "from_type",
            "predicted",
            "n_transitions",
            "n_correct",
            qround(
                F.col("n_correct").cast("double") / F.col("n_transitions").cast("double"),
                6,
            ).alias("accuracy"),
        )
        .orderBy("from_type")
    )


SLO_ERROR_TARGET = 0.25  # error-rate objective
BURN_SHORT_H = 1
BURN_LONG_H = 6
BURN_SHORT_THRESH = 2.0
BURN_LONG_THRESH = 1.0


def error_budget_burn(events: DataFrame, target: float = SLO_ERROR_TARGET) -> DataFrame:
    """Multi-window error-budget burn-rate alerting (Google SRE Workbook
    ch. 5, public): an hour pages when BOTH the short (1 h) and long
    (trailing 6 h) burn rates exceed their thresholds — fast detection
    without single-spike flapping.

        burn_w = error_rate_w / target

    The calendar-correct long window is a RANGE frame over the hour
    index (gap hours count as missing, not as neighbors). One full-data
    pass (the hourly aggregate); everything downstream is the
    O(#hours) frame — same tiny-frame convention as the daily series.
    Integer event counts all the way; rates qround'ed at the edge.
    """
    hourly = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("int")).alias("n_errors"),
    )
    return burn_readout(hourly, target)


def burn_readout(hourly: DataFrame, target: float = SLO_ERROR_TARGET) -> DataFrame:
    """Alert readout over an (hour, n_events, n_errors) frame — shared by
    the batch operator above and the streaming twin
    (streaming/stream_queries.py:streaming_error_burn), which produces
    the hourly frame with a stateful tumbling aggregate."""
    hourly = hourly.withColumn(
        "hour_idx", (F.unix_micros("hour") / F.lit(3_600_000_000)).cast("long")
    )
    w_long = Window.orderBy("hour_idx").rangeBetween(-(BURN_LONG_H - 1), 0)
    rated = (
        hourly.withColumn("ev_6h", F.sum("n_events").over(w_long))
        .withColumn("er_6h", F.sum("n_errors").over(w_long))
        .select(
            "hour",
            "n_events",
            "n_errors",
            (F.col("n_errors").cast("double") / F.col("n_events").cast("double")).alias(
                "rate_1h"
            ),
            (F.col("er_6h").cast("double") / F.col("ev_6h").cast("double")).alias(
                "rate_6h"
            ),
        )
    )
    burn_1h = F.col("rate_1h") / F.lit(target)
    burn_6h = F.col("rate_6h") / F.lit(target)
    return (
        rated.filter(
            (burn_1h > F.lit(BURN_SHORT_THRESH)) & (burn_6h > F.lit(BURN_LONG_THRESH))
        )
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_errors").cast("long").alias("n_errors"),
            qround(F.col("rate_1h"), 6).alias("error_rate_1h"),
            qround(burn_1h, 4).alias("burn_1h"),
            qround(burn_6h, 4).alias("burn_6h"),
        )
        .orderBy("hour")
    )


WF_WINDOW_MIN = 60  # windowFunnel horizon: steps must fit in this window


def window_funnel_timebound(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    window_min: int = WF_WINDOW_MIN,
) -> DataFrame:
    """Time-bound ordered funnel (the ClickHouse ``windowFunnel`` shape,
    public): a user reaches level L when steps 1..L occur in ORDER with
    every step inside ``window_min`` minutes of the level-1 anchor —
    unlike funnel_conversion (whole-history order), this is the
    campaign-attribution form where late conversions don't count.

    Deterministic chain-of-first-occurrences semantics: t₁ = min ts of
    step 1; tₖ = min ts of step k with tₖ > tₖ₋₁ and tₖ ≤ t₁ + W. Each
    level is ONE user-keyed conditional min over the (user, step) events
    joined to the broadcast-free previous-level frame — k−1
    co-partitioned shuffle joins for k steps, all on the user key, so
    AQE coalesces them onto one exchange footprint. Output: one row per
    level with reached-user counts and conversion from level 1.
    """
    ev = events.select(
        F.col("user_id").alias("u"), F.col("event_type").alias("et"), "ts"
    ).filter(F.col("et").isin(*steps))
    lvl = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t1"))
    )
    reached = [lvl.select("u", F.col("t1"), F.col("t1").alias("tk"))]
    horizon = F.col("t1") + F.expr(f"INTERVAL {window_min} MINUTES")
    for k, step in enumerate(steps[1:], start=2):
        prev = reached[-1].select("u", "t1", F.col("tk").alias("tprev"))
        nxt = (
            ev.filter(F.col("et") == step)
            .join(prev, "u")
            .filter((F.col("ts") > F.col("tprev")) & (F.col("ts") <= horizon))
            .groupBy("u", "t1")
            .agg(F.min("ts").alias("tk"))
        )
        reached.append(nxt)
    counts = [
        df.agg(F.count("*").cast("long").alias("n")) for df in reached
    ]
    out = None
    for k, c in enumerate(counts, start=1):
        row = c.select(
            F.lit(k).cast("int").alias("level"),
            F.lit(steps[k - 1]).alias("step"),
            F.col("n").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    base = F.broadcast(counts[0].select(F.col("n").alias("n1")))
    return out.crossJoin(base).select(
        "level",
        "step",
        "n_users",
        qround(F.col("n_users").cast("double") / F.col("n1"), 6).alias(
            "conversion_from_l1"
        ),
    )


RATE_TEST_EVENT = "error"
RATE_TEST_SPLIT = "2024-01-08"  # week 1 vs the rest of the fixture month


def event_rate_test(
    events: DataFrame,
    event_type: str = RATE_TEST_EVENT,
    split: str = RATE_TEST_SPLIT,
) -> DataFrame:
    """Two-period Poisson rate comparison for an event type — the SRE
    "did the error rate change after the deploy" primitive next to
    error_budget_burn (thresholds) and cusum (changepoint search):

        z = (r₁ − r₂) / √(n₁/T₁² + n₂/T₂²),   rᵢ = nᵢ/Tᵢ

    (normal approximation to the two-sample Poisson test; exposures are
    exact day counts from the observed span). ONE conditional aggregate
    over the filtered scan; everything else is scalar arithmetic on the
    single result row, identical shape both engines.
    """
    ev = events.filter(F.col("event_type") == event_type).select(
        (F.to_date("ts") < F.lit(split).cast("date")).alias("in_a"), "ts"
    )
    span = F.broadcast(
        events.agg(
            F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
        ).select(
            F.datediff(F.lit(split).cast("date"), F.col("d0"))
            .cast("double")
            .alias("t1"),
            (F.datediff(F.col("d1"), F.lit(split).cast("date")) + 1)
            .cast("double")
            .alias("t2"),
        )
    )
    g = ev.agg(
        F.count(F.when(F.col("in_a"), 1)).cast("double").alias("n1"),
        F.count(F.when(~F.col("in_a"), 1)).cast("double").alias("n2"),
    ).crossJoin(span)
    r1, r2 = F.col("n1") / F.col("t1"), F.col("n2") / F.col("t2")
    z = (r1 - r2) / F.sqrt(
        F.col("n1") / (F.col("t1") * F.col("t1"))
        + F.col("n2") / (F.col("t2") * F.col("t2"))
    )
    return g.select(
        F.col("n1").cast("long").alias("n_events_pre"),
        F.col("n2").cast("long").alias("n_events_post"),
        F.col("t1").cast("int").alias("days_pre"),
        F.col("t2").cast("int").alias("days_post"),
        qround(r1, 6).alias("rate_pre"),
        qround(r2, 6).alias("rate_post"),
        qround(r2 / r1, 6).alias("rate_ratio"),
        qround(z, 6).alias("z_score"),
    )
