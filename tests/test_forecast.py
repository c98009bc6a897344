"""Semantic pins for holt_linear_forecast (operators/relational.py):
hand-run recursion on tiny weekly series, weekly aggregation contract."""

from __future__ import annotations

from datetime import datetime

from cocktailsdb_spark.operators import relational as rel


def _frames(spark, rows):
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    customer = spark.createDataFrame(
        [(1, "SEG_A"), (2, "SEG_B")], "c_custkey long, c_mktsegment string"
    )
    return orders, customer


def test_holt_exact_on_linear_series(spark):
    # weekly revenue 10, 12, 14 -> Holt tracks a clean linear trend
    # exactly: level 14, trend 2, forecast_h = 14 + 2h (alpha=.5, beta=.25)
    rows = [
        (1, datetime(2024, 1, 1), 10.0),   # Monday week 1
        (1, datetime(2024, 1, 8), 12.0),   # week 2
        (1, datetime(2024, 1, 15), 14.0),  # week 3
    ]
    out = rel.holt_linear_forecast(*_frames(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.segment == "SEG_A" and r.n_weeks == 3
    assert r.level == 14.0 and r.trend == 2.0
    assert r.forecast_7 == 14.0 + 7 * 2.0
    assert r.forecast_28 == 14.0 + 28 * 2.0


def test_holt_aggregates_within_week_and_per_segment(spark):
    # two orders inside one ISO week sum before the recursion; segments
    # are independent series; a 1-week segment is dropped (needs b_1).
    rows = [
        (1, datetime(2024, 1, 1), 4.0),
        (1, datetime(2024, 1, 3), 6.0),   # same ISO week -> x=10
        (1, datetime(2024, 1, 8), 10.0),  # constant series
        (2, datetime(2024, 1, 1), 99.0),  # SEG_B: single week -> excluded
    ]
    out = {r.segment: r for r in rel.holt_linear_forecast(*_frames(spark, rows)).collect()}
    assert set(out) == {"SEG_A"}
    r = out["SEG_A"]
    assert r.n_weeks == 2 and r.level == 10.0 and r.trend == 0.0
    assert r.forecast_7 == 10.0
