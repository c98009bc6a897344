"""Semantic pins for ngram_novelty_rate, window_funnel_timebound,
max_drawdown_daily, abc_xyz_parts and price_elasticity_by_brand."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest

from cocktailsdb_spark.operators import corpus, events, relational as rel


def test_ngram_novelty_all_novel_then_copies(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e", "s1"),   # 3 distinct 3-grams, all first
            (1, "a b c d e", "s1"),   # exact copy -> 0 novel
            (2, "x y z w", "s2"),     # 2 grams, all first
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in corpus.ngram_novelty_rate(docs).collect()}
    assert out["s1"].n_docs == 2
    assert out["s1"].n_grams == 6 and out["s1"].n_novel == 3
    assert out["s1"].novelty_rate == pytest.approx(0.5, abs=1e-9)
    assert out["s2"].novelty_rate == pytest.approx(1.0, abs=1e-9)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_window_funnel_order_and_horizon(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + timedelta(minutes=minutes)

    rows = [
        # user 1: full ordered funnel inside 60 min -> level 3
        (1, "view", m(0)), (1, "click", m(10)), (1, "purchase", m(30)),
        # user 2: click BEFORE view -> stops at level 1
        (2, "click", m(0)), (2, "view", m(5)),
        # user 3: click inside, purchase outside the 60-min anchor window
        (3, "view", m(0)), (3, "click", m(20)), (3, "purchase", m(90)),
        # user 4: never views -> not in funnel at all
        (4, "click", m(0)), (4, "purchase", m(1)),
    ]
    out = {r.level: r for r in events.window_funnel_timebound(_ev(spark, rows)).collect()}
    assert out[1].n_users == 3  # users 1, 2, 3 viewed
    assert out[2].n_users == 2  # users 1, 3 clicked after view
    assert out[3].n_users == 1  # only user 1 purchased in-window
    assert out[3].conversion_from_l1 == pytest.approx(1 / 3, abs=1e-6)


def test_window_funnel_same_horizon_anchored_at_t1(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "view", t0),
        (1, "click", t0 + timedelta(minutes=59)),
        # purchase 61 min after anchor: outside even though within 60 of click
        (1, "purchase", t0 + timedelta(minutes=61)),
    ]
    out = {r.level: r for r in events.window_funnel_timebound(_ev(spark, rows)).collect()}
    assert out[2].n_users == 1 and out[3].n_users == 0


def _orders(spark, ys, start=datetime(1996, 1, 1)):
    rows = [(start + timedelta(days=i), float(y)) for i, y in enumerate(ys)]
    return spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")


def test_max_drawdown_hand_example(spark):
    # peaks at 100 then drops to 40 (dd 60%), recovers to 120, drops to 90
    ys = [100.0, 80.0, 40.0, 120.0, 90.0]
    r = rel.max_drawdown_daily(_orders(spark, ys)).collect()[0]
    assert r.max_drawdown_abs == pytest.approx(60.0, abs=1e-6)
    assert r.max_drawdown_rel == pytest.approx(0.6, abs=1e-9)
    assert r.peak_revenue == 100.0 and r.trough_revenue == 40.0
    assert r.trough_day == datetime(1996, 1, 3)


def test_max_drawdown_monotone_is_zero(spark):
    ys = [10.0, 20.0, 30.0, 40.0]
    r = rel.max_drawdown_daily(_orders(spark, ys)).collect()[0]
    assert r.max_drawdown_rel == 0.0
    # ties on dd_rel=0 broken by earliest day
    assert r.trough_day == datetime(1996, 1, 1)


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_partkey long, l_quantity double, l_extendedprice double,"
        " l_shipdate timestamp",
    )


def test_abc_xyz_classes(spark):
    d = datetime(1995, 1, 15)
    rows = []
    # part 1: dominant revenue (A), steady monthly demand (X)
    for mth in range(6):
        rows.append((1, 10.0, 1000.0, datetime(1995, 1 + mth, 15)))
    # part 2: small revenue (C), bursty demand (Y/Z)
    rows.append((2, 1.0, 10.0, d))
    rows.append((2, 9.0, 90.0, datetime(1995, 5, 15)))
    out = {(r.abc, r.xyz): r for r in rel.abc_xyz_parts(_li(spark, rows)).collect()}
    # part 1: 6000 of 6100 revenue -> cumulative share before = 0 -> A;
    # CV of [10]*6 = 0 -> X
    assert ("A", "X") in out and out[("A", "X")].n_parts == 1
    assert out[("A", "X")].revenue_share == pytest.approx(6000.0 / 6100.0, abs=1e-6)
    # part 2: share before = 6000/6100 > 0.8 -> C; CV of [1,9] = 0.8 -> Y
    assert ("C", "Y") in out and out[("C", "Y")].n_parts == 1


def test_price_elasticity_recovers_planted_slope(spark):
    # construct qty = (price/100)^-2 exactly -> elasticity -2
    pt = spark.createDataFrame([(1, "B#1")], "p_partkey long, p_brand string")
    rows = []
    for i, unit_price in enumerate([50.0, 100.0, 200.0, 400.0] * 5):
        qty = (unit_price / 100.0) ** -2.0
        rows.append((1, qty, unit_price * qty, datetime(1995, 1, 1)))
    li = _li(spark, rows)
    r = rel.price_elasticity_by_brand(li, pt).collect()[0]
    assert r.brand == "B#1"
    assert r.elasticity == pytest.approx(-2.0, abs=1e-4)
    assert r.r_squared == pytest.approx(1.0, abs=1e-4)
