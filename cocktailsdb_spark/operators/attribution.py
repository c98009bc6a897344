"""Marketing / conversion attribution over the ``events`` table — the
classic credit-assignment queries an analytics engine runs next to the
funnel and cohort reports (SURVEY.md §2.9 X6 family; reference analog:
the repo's analysis queries aggregate per category, attribution
aggregates per *causing* category).

Channels are the touch event types themselves (``click``/``view``/
``signup`` — the fixture's props carry no campaign field); conversions
are ``purchase`` events and credit is their ``value``.

Scale posture:

- ``last_touch`` — ONE user-partitioned window (the sessionize shape:
  one shuffle on user_id, deterministic (ts, event_id) ordering), then a
  channel-sized aggregate. No join.
- ``linear_attribution`` — user-equi-keyed range join (the
  range_join_count shape: hash join on user_id, the time window is a
  post-join filter — never a nested loop), then a conversion-keyed
  window to split credit and a channel-sized aggregate. At 100 TB both
  sides bucket by (user_id, week) so each probe touches ≤2 buckets;
  skewed power-users salt on the conversion side because credit rows
  carry their own conv_id key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..numeric import dsum

ATTR_TOUCH_TYPES = ("click", "view", "signup")
ATTR_CONVERSION_TYPE = "purchase"
ATTR_LOOKBACK_SEC = 7 * 24 * 3600
ATTR_NO_TOUCH = "(none)"


def last_touch(events: DataFrame) -> DataFrame:
    """Last-touch attribution: each conversion credits its full value to
    the latest preceding touch event of the same user (running
    ``last(..., ignorenulls)`` over the user timeline — touch rows carry
    their channel, other rows carry null, so the window needs no
    self-join). Conversions with no preceding touch land in the
    ``(none)`` channel so revenue is conserved.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col("event_type").isin(*ATTR_TOUCH_TYPES), F.col("event_type")
    )
    tagged = events.withColumn(
        "channel", F.last(touch, ignorenulls=True).over(w)
    )
    return (
        tagged.filter(F.col("event_type") == ATTR_CONVERSION_TYPE)
        .groupBy(
            F.coalesce(F.col("channel"), F.lit(ATTR_NO_TOUCH)).alias("channel")
        )
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            dsum(F.col("value")).alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


def linear_attribution(
    events: DataFrame, lookback_sec: int = ATTR_LOOKBACK_SEC
) -> DataFrame:
    """Linear (equal-split) attribution: each conversion's value is
    divided equally across ALL touch events of the same user in the
    preceding ``[ts − lookback, ts)`` window. Conversions with zero
    touches in the window receive no row (their credit is undefined
    under the linear model — last_touch's ``(none)`` bucket is the
    conserved-revenue view).

    The per-conversion touch count comes from a conv_id-partitioned
    window over the join output (each credit row already carries its
    conversion key, so the split never re-shuffles on a skewed key).
    """
    convs = events.filter(F.col("event_type") == ATTR_CONVERSION_TYPE).select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    touches = events.filter(
        F.col("event_type").isin(*ATTR_TOUCH_TYPES)
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    cond = (
        (F.col("c_user") == F.col("t_user"))
        & (F.col("t_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {lookback_sec} SECOND"))
        & (F.col("t_ts") < F.col("c_ts"))
    )
    pairs = convs.join(touches, cond)
    k = F.count("*").over(Window.partitionBy("conv_id"))
    credited = pairs.withColumn(
        "credit", F.col("c_value") / k.cast("double")
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_touchpoints"),
            F.countDistinct("conv_id").cast("long").alias("n_conversions"),
            dsum(F.col("credit")).alias("credited_revenue"),
        )
        .orderBy("channel")
    )


def shapley_attribution(
    events: DataFrame, lookback_sec: int = ATTR_LOOKBACK_SEC
) -> DataFrame:
    """Shapley-value attribution under the symmetric any-touch coalition
    game (Shapley 1953; the marketing application is public folklore —
    e.g. Zhao et al. 2018): when every participating channel contributes
    symmetrically to a conversion, each DISTINCT channel in the lookback
    window gets exactly value/|distinct channels| — the closed form of
    the Shapley value for that game, so no 2^n coalition enumeration is
    needed. Differs from :func:`linear_attribution` (which splits per
    TOUCH, over-crediting channels that fire often) and from last-touch
    (winner-take-all): the three models bracket how duplicate touches
    are valued.

    Plan: the same user-equi-keyed range join as linear, collapsed to
    distinct (conversion, channel) BEFORE credit split — the dedup runs
    on the conv-keyed credit stream, never re-shuffling a skewed user.
    """
    convs = events.filter(F.col("event_type") == ATTR_CONVERSION_TYPE).select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    touches = events.filter(
        F.col("event_type").isin(*ATTR_TOUCH_TYPES)
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    cond = (
        (F.col("c_user") == F.col("t_user"))
        & (F.col("t_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {lookback_sec} SECOND"))
        & (F.col("t_ts") < F.col("c_ts"))
    )
    participants = (
        convs.join(touches, cond)
        .select("conv_id", "channel", "c_value")
        .dropDuplicates(["conv_id", "channel"])
    )
    k = F.count("*").over(Window.partitionBy("conv_id"))
    credited = participants.withColumn(
        "credit", F.col("c_value") / k.cast("double")
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            dsum(F.col("credit")).alias("shapley_revenue"),
        )
        .orderBy("channel")
    )


POSITION_FIRST = 0.4
POSITION_LAST = 0.4


def position_attribution(
    events: DataFrame, lookback_sec: int = ATTR_LOOKBACK_SEC
) -> DataFrame:
    """Position-based (U-shaped 40/20/40) attribution — the standard
    middle ground between first/last-touch and linear: the FIRST and
    LAST touch in the lookback each take 40% of the conversion value,
    the remaining 20% splits equally across middle touches; journeys
    with one touch take 100%, with two split 50/50.

    Same user-equi range join as linear; position comes from one
    conv-keyed window over (t_ts, event id) — deterministic ordering,
    per-conversion state only.
    """
    convs = events.filter(F.col("event_type") == ATTR_CONVERSION_TYPE).select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    touches = events.filter(
        F.col("event_type").isin(*ATTR_TOUCH_TYPES)
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_eid"),
        F.col("event_type").alias("channel"),
    )
    cond = (
        (F.col("c_user") == F.col("t_user"))
        & (F.col("t_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {lookback_sec} SECOND"))
        & (F.col("t_ts") < F.col("c_ts"))
    )
    pairs = convs.join(touches, cond)
    wc = Window.partitionBy("conv_id")
    wo = wc.orderBy("t_ts", "t_eid")
    ranked = pairs.select(
        "conv_id",
        "channel",
        "c_value",
        F.row_number().over(wo).alias("pos"),
        F.count("*").over(wc).alias("k"),
    )
    k, pos = F.col("k"), F.col("pos")
    share = (
        F.when(k == 1, F.lit(1.0))
        .when(k == 2, F.lit(0.5))
        .when(pos == 1, F.lit(POSITION_FIRST))
        .when(pos == k, F.lit(POSITION_LAST))
        .otherwise(
            F.lit(1.0 - POSITION_FIRST - POSITION_LAST) / (k - 2).cast("double")
        )
    )
    credited = ranked.withColumn("credit", F.col("c_value") * share)
    return (
        credited.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_touchpoints"),
            F.countDistinct("conv_id").cast("long").alias("n_conversions"),
            dsum(F.col("credit")).alias("position_revenue"),
        )
        .orderBy("channel")
    )
