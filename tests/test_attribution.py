"""Semantic pins for the attribution operators
(operators/attribution.py), hand-computed on a tiny event timeline —
independent of the DuckDB oracle."""

from __future__ import annotations

from datetime import datetime, timedelta

from cocktailsdb_spark.operators import attribution as at

T0 = datetime(2024, 1, 10, 12, 0, 0)


def _ev(spark, rows):
    # (event_id, ts, user_id, event_type, value)
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _t(sec):
    return T0 + timedelta(seconds=sec)


ROWS = [
    # user 1: click -> view -> purchase(10) -> purchase(20, still last=view)
    (1, _t(0), 1, "click", 0.0),
    (2, _t(10), 1, "view", 0.0),
    (3, _t(20), 1, "purchase", 10.0),
    (4, _t(30), 1, "purchase", 20.0),
    # user 2: purchase with NO preceding touch
    (5, _t(0), 2, "purchase", 7.0),
    # user 2: then a signup and an old-touch purchase 8 days later
    (6, _t(5), 2, "signup", 0.0),
    (7, _t(5 + 8 * 86400), 2, "purchase", 5.0),
    # user 3: error events are not touches
    (8, _t(0), 3, "error", 0.0),
    (9, _t(1), 3, "purchase", 3.0),
]


def test_last_touch_credits_latest_preceding_touch(spark):
    out = {r.channel: r for r in at.last_touch(_ev(spark, ROWS)).collect()}
    # user 1: both purchases credit 'view' (latest touch before each)
    assert out["view"].n_conversions == 2
    assert out["view"].attributed_revenue == 30.0
    # user 2 second purchase: signup is >7d old but last_touch has no
    # lookback cap by design — it still credits signup
    assert out["signup"].n_conversions == 1
    assert out["signup"].attributed_revenue == 5.0
    # user 2 first purchase and user 3 (error is not a touch) -> (none)
    assert out[at.ATTR_NO_TOUCH].n_conversions == 2
    assert out[at.ATTR_NO_TOUCH].attributed_revenue == 10.0
    # revenue conserved across channels
    assert sum(r.attributed_revenue for r in out.values()) == 45.0


def test_linear_attribution_splits_within_lookback(spark):
    out = {r.channel: r for r in at.linear_attribution(_ev(spark, ROWS)).collect()}
    # user 1 purchase #3: click+view in window -> 5 each;
    # purchase #4: click+view -> 10 each
    assert out["click"].credited_revenue == 15.0
    assert out["view"].credited_revenue == 15.0
    assert out["click"].n_touchpoints == 2 and out["view"].n_touchpoints == 2
    assert out["click"].n_conversions == 2
    # user 2's signup is outside the 7-day lookback of purchase #7,
    # and untouched conversions (5, 9) produce no rows at all
    assert "signup" not in out and at.ATTR_NO_TOUCH not in out


def test_linear_attribution_lookback_boundary(spark):
    rows = [
        (1, _t(0), 9, "click", 0.0),
        # exactly lookback seconds later: t_ts >= c_ts - lookback -> included
        (2, _t(at.ATTR_LOOKBACK_SEC), 9, "purchase", 8.0),
        # 1s past the window on another user
        (3, _t(0), 8, "view", 0.0),
        (4, _t(at.ATTR_LOOKBACK_SEC + 1), 8, "purchase", 9.0),
    ]
    out = {r.channel: r for r in at.linear_attribution(_ev(spark, rows)).collect()}
    assert out["click"].credited_revenue == 8.0
    assert "view" not in out


def test_shapley_splits_across_distinct_channels_only(spark):
    """User touches click x3 then view x1 before a 100-value purchase:
    linear gives click 75/view 25; Shapley's symmetric game gives 50/50
    (distinct participants)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (1, 7, "click", base - dt.timedelta(hours=4), 0.0),
        (2, 7, "click", base - dt.timedelta(hours=3), 0.0),
        (3, 7, "click", base - dt.timedelta(hours=2), 0.0),
        (4, 7, "view", base - dt.timedelta(hours=1), 0.0),
        (5, 7, "purchase", base, 100.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    from cocktailsdb_spark.operators import attribution

    shap = {r.channel: r for r in attribution.shapley_attribution(events).collect()}
    assert shap["click"].shapley_revenue == 50.0
    assert shap["view"].shapley_revenue == 50.0
    lin = {r.channel: r for r in attribution.linear_attribution(events).collect()}
    assert lin["click"].credited_revenue == 75.0


def test_position_u_shape_40_20_40(spark):
    import datetime as dt

    base = dt.datetime(2024, 2, 1, 12, 0, 0)
    rows = [
        (1, 5, "click", base - dt.timedelta(hours=3), 0.0),
        (2, 5, "view", base - dt.timedelta(hours=2), 0.0),
        (3, 5, "signup", base - dt.timedelta(hours=1), 0.0),
        (4, 5, "purchase", base, 100.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    from cocktailsdb_spark.operators import attribution

    out = {r.channel: r for r in attribution.position_attribution(events).collect()}
    assert out["click"].position_revenue == 40.0    # first
    assert out["view"].position_revenue == 20.0     # middle
    assert out["signup"].position_revenue == 40.0   # last
