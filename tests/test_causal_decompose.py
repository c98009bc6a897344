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


# --- forecast_backtest / hampel_outlier_days --------------------------------


def test_forecast_backtest_hand_errors(spark):
    from cocktailsdb_spark.operators.relational import forecast_backtest

    # 9 consecutive days, weekly pattern 100..100 with day 8 = 130.
    # Eligible days (both lag-1 and lag-7 exist): days 8 and 9.
    xs = [100.0, 90.0, 95.0, 105.0, 110.0, 85.0, 100.0, 130.0, 90.0]
    rows = [(datetime(2024, 1, 1 + i), xs[i]) for i in range(9)]
    out = {r.method: r for r in forecast_backtest(_orders(spark, rows)).collect()}
    nv, sn = out["naive"], out["seasonal_naive"]
    assert nv.n_days == 2 and sn.n_days == 2
    # naive: |130-100|=30, |90-130|=40 -> mae 35
    assert nv.mae == 35.0
    # seasonal: |130-100|=30, |90-90|=0 -> mae 15
    assert sn.mae == 15.0
    # rmse: naive sqrt((900+1600)/2)=35.3553; seasonal sqrt(450)=21.2132
    assert abs(nv.rmse - 35.3553) <= 1e-3 and abs(sn.rmse - 21.2132) <= 1e-3


def test_forecast_backtest_gap_drops_wrong_day_forecast(spark):
    from cocktailsdb_spark.operators.relational import forecast_backtest

    # day 9 missing: day 10's naive forecast (needs day 9) must NOT fall
    # back to day 8 — RANGE[-1,-1] yields null and the day is excluded.
    rows = [(datetime(2024, 1, d), 100.0) for d in (1, 2, 3, 4, 5, 6, 7, 8, 10)]
    out = {r.method: r for r in forecast_backtest(_orders(spark, rows)).collect()}
    assert out["naive"].n_days == 1  # only day 8 qualifies


def test_hampel_flags_spike_not_neighbors(spark):
    from cocktailsdb_spark.operators.relational import hampel_outlier_days

    # 15 flat days at 100 with a single 200 spike at day 8: the spike is
    # the only outlier; its neighbors' windows contain it but their own
    # deviation from the window median (100) is 0.
    rows = []
    for d in range(1, 16):
        rows.append((datetime(2024, 1, d), 200.0 if d == 8 else 100.0))
    out = hampel_outlier_days(_orders(spark, rows)).collect()
    assert [r.day for r in out] == ["2024-01-08"]
    r = out[0]
    assert r.window_median == 100.0 and r.window_mad == 0.0
    assert r.abs_deviation == 100.0


# --- cohort_ltv / revenue_bridge ---------------------------------------------


def test_cohort_ltv_cumulative_per_customer(spark):
    from cocktailsdb_spark.operators.relational import cohort_ltv

    rows = [
        # cohort 2024-01: two customers
        (1, datetime(2024, 1, 5), 100.0),
        (2, datetime(2024, 1, 20), 50.0),
        (1, datetime(2024, 2, 5), 30.0),   # age 1
        # cohort 2024-03: one customer
        (3, datetime(2024, 3, 1), 80.0),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {(r.cohort, r.age_months): r for r in cohort_ltv(df).collect()}
    a0 = out[("2024-01", 0)]
    assert a0.n_customers == 2 and a0.cum_ltv == 75.0  # (100+50)/2
    a1 = out[("2024-01", 1)]
    assert a1.cum_ltv == 90.0  # (150+30)/2
    assert out[("2024-03", 0)].cum_ltv == 80.0


def test_revenue_bridge_identity_and_effects(spark):
    from cocktailsdb_spark.operators.relational import revenue_bridge

    # brand B1: 1997 sells 10 units @ 5 -> r1=50; 1998 sells 20 units @ 6
    # -> r2=120. delta=70 = volume (10*5=50) + price (1*20=20).
    li = spark.createDataFrame(
        [
            (1, datetime(1997, 5, 1), 10.0, 50.0, 0.0),
            (1, datetime(1998, 5, 1), 20.0, 120.0, 0.0),
        ],
        "l_partkey long, l_shipdate timestamp, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame([(1, "B1")], "p_partkey long, p_brand string")
    out = revenue_bridge(li, part).collect()
    assert len(out) == 1
    r = out[0]
    assert r.rev_y1 == 50.0 and r.rev_y2 == 120.0 and r.delta == 70.0
    assert r.volume_effect == 50.0 and r.price_effect == 20.0
    assert abs(r.delta - (r.volume_effect + r.price_effect)) < 1e-9
