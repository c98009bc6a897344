"""Semantic pins for did_promo_effect and seasonal_decompose_daily
(operators/relational.py), hand-computed on tiny frames — independent of
the DuckDB oracle."""

from __future__ import annotations

from datetime import datetime

from cocktailsdb_spark.operators import relational as rel


def _li(spark, rows):
    return spark.createDataFrame(
        rows, "l_partkey long, l_shipdate timestamp, l_extendedprice double, l_discount double"
    )


def _parts(spark, rows):
    return spark.createDataFrame(rows, "p_partkey long, p_type string")


def test_did_recovers_injected_effect(spark):
    # control: 10 pre / 10 post (no change). treated: 10 pre / 13 post
    # => did = +3 exactly; discounts zero so rev == extendedprice.
    pre, post = datetime(1998, 6, 1), datetime(1999, 6, 1)
    rows = [
        (1, pre, 10.0, 0.0),
        (1, post, 13.0, 0.0),
        (2, pre, 10.0, 0.0),
        (2, post, 10.0, 0.0),
    ]
    parts = _parts(spark, [(1, "PROMO BURNISHED"), (2, "STANDARD PLATED")])
    out = rel.did_promo_effect(_li(spark, rows), parts).collect()[0]
    assert out.n_treated_pre == out.n_treated_post == 1
    assert out.mu_treated_pre == 10.0 and out.mu_treated_post == 13.0
    assert out.mu_control_pre == out.mu_control_post == 10.0
    assert out.did_estimate == 3.0


def test_did_discount_applied_and_cutoff_boundary(spark):
    # a row exactly AT the cutoff is post; discount reduces revenue
    cut = datetime(1999, 1, 1)
    rows = [
        (1, datetime(1998, 12, 31), 100.0, 0.5),  # pre, rev 50
        (1, cut, 100.0, 0.25),  # post, rev 75
        (2, datetime(1998, 1, 1), 40.0, 0.0),
        (2, datetime(2000, 1, 1), 40.0, 0.0),
    ]
    parts = _parts(spark, [(1, "PROMO X"), (2, "ECONOMY Y")])
    out = rel.did_promo_effect(_li(spark, rows), parts).collect()[0]
    assert out.mu_treated_pre == 50.0 and out.mu_treated_post == 75.0
    assert out.did_estimate == 25.0


def _orders(spark, rows):
    return spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")


def test_seasonal_decompose_recovers_weekday_pattern(spark):
    # 28 consecutive days: flat level 100 + seasonal bump +7 on Mondays
    # (isodow 1). Trend (7-day centered MA) = 101 everywhere interior;
    # seasonal should recover +6 for Monday and -1 for the other six
    # weekdays (centered), residuals exactly 0.
    rows = []
    for d in range(28):
        day = datetime(2024, 1, 1 + d)  # 2024-01-01 is a Monday
        bump = 7.0 if day.weekday() == 0 else 0.0
        rows.append((day, 100.0 + bump))
    out = {r.weekday: r for r in rel.seasonal_decompose_daily(_orders(spark, rows)).collect()}
    assert set(out) == set(range(1, 8))
    assert out[1].seasonal == 6.0
    for w in range(2, 8):
        assert out[w].seasonal == -1.0
        assert out[w].mean_abs_residual == 0.0
    assert out[1].mean_abs_residual == 0.0


def test_seasonal_decompose_trims_endpoints_and_handles_gaps(spark):
    # 10 days with day 5 missing: RANGE window is calendar-based, so
    # every day within +-3 of the gap loses a neighbor and is trimmed;
    # only days fully inside a gapless 7-day span survive.
    days = [1, 2, 3, 4, 6, 7, 8, 9, 10, 11, 12]
    rows = [(datetime(2024, 3, d), 10.0) for d in days]
    out = rel.seasonal_decompose_daily(_orders(spark, rows)).collect()
    # surviving centers: day 9 only (6..12 gapless)
    total_days = sum(r.n_days for r in out)
    assert total_days == 1
    for r in out:
        assert r.seasonal == 0.0 and r.mean_abs_residual == 0.0
