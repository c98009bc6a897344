"""Semantic pins for the econometric-diagnostics family: Jarque-Bera,
Durbin-Watson, Breusch-Pagan, Chow break, runs test, PACF."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from cocktailsdb_spark.operators import relational as rel


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderdate timestamp, o_totalprice double"
    )


def _daily(spark, ys, start=datetime(1996, 1, 1)):
    # one order per day -> daily revenue = the value itself
    return _orders(
        spark, [(start + timedelta(days=i), float(y)) for i, y in enumerate(ys)]
    )


def test_jarque_bera_uniform_discrete(spark):
    # equal counts of {1..5}*1e5: skew = 0 exactly; kurtosis of discrete
    # uniform over n=5 points = 3 - 6(n^2+1)/(5(n^2-1)) = 1.7
    rows = [
        (datetime(1996, 1, 1), 100000.0 * v) for v in (1, 2, 3, 4, 5) for _ in range(8)
    ]
    r = rel.jarque_bera_price(_orders(spark, rows)).collect()[0]
    assert r.skewness == pytest.approx(0.0, abs=1e-9)
    assert r.kurtosis == pytest.approx(1.7, abs=1e-6)
    # JB = n/6 * ((K-3)^2/4) = 40/6 * 1.69/4
    assert r.jb_stat == pytest.approx(40.0 / 6.0 * (1.3**2) / 4.0, abs=1e-3)


def test_jarque_bera_skewed_rejects(spark):
    rows = [(datetime(1996, 1, 1), 100000.0)] * 50 + [
        (datetime(1996, 1, 1), 3000000.0)
    ] * 2
    r = rel.jarque_bera_price(_orders(spark, rows)).collect()[0]
    assert r.skewness > 2.0
    assert r.p_value < 0.01


def test_durbin_watson_alternating_residuals(spark):
    # y = 10t + (+1/-1 alternating): OLS slope=10, residuals alternate
    # +-1 -> DW = sum(4)/(sum 1) = 4(n-1)/n
    n = 40
    ys = [10.0 * t + (1.0 if t % 2 == 0 else -1.0) for t in range(n)]
    r = rel.durbin_watson_daily(_daily(spark, ys)).collect()[0]
    assert r.n_days == n
    assert r.slope_per_day == pytest.approx(10.0, abs=0.02)
    assert r.dw_stat == pytest.approx(4.0 * (n - 1) / n, abs=0.05)


def test_durbin_watson_sticky_residuals_small(spark):
    # residuals in two long blocks (+1 then -1): differences almost all 0
    n = 40
    ys = [5.0 * t + (1.0 if t < n // 2 else -1.0) for t in range(n)]
    r = rel.durbin_watson_daily(_daily(spark, ys)).collect()[0]
    assert r.dw_stat < 0.5


def _li(spark, rows):
    return spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_extendedprice double"
    )


def test_breusch_pagan_hetero_vs_homo(spark):
    homo = [
        (float(q), 0.01 * (i % 3), 100.0 * q + (1.0 if i % 2 else -1.0))
        for i, q in enumerate([(j % 10) + 1 for j in range(200)])
    ]
    # noise amplitude grows with q -> e^2 correlates with x1
    het = [
        (float(q), 0.01 * (i % 3), 100.0 * q + q * (1.0 if i % 2 else -1.0))
        for i, q in enumerate([(j % 10) + 1 for j in range(200)])
    ]
    r_homo = rel.breusch_pagan_price(_li(spark, homo)).collect()[0]
    r_het = rel.breusch_pagan_price(_li(spark, het)).collect()[0]
    assert r_het.r2_aux > 5 * max(r_homo.r2_aux, 1e-9)
    assert r_het.lm_stat > r_homo.lm_stat
    assert r_het.p_value < 0.05


def test_chow_no_break_f_small_with_break_f_large(spark):
    # same line both regimes -> F ~ 0 (up to the +-1 noise)
    n = 400
    same = [3.0 * t + (1.0 if t % 2 else -1.0) for t in range(n)]
    r_same = rel.chow_break_test(_daily(spark, same, datetime(1995, 1, 1))).collect()[0]
    # slope doubles after the break date (1995-07-01 = day 181)
    brk = [
        (3.0 * t if t < 181 else 3.0 * 181 + 9.0 * (t - 181))
        + (1.0 if t % 2 else -1.0)
        for t in range(n)
    ]
    r_brk = rel.chow_break_test(_daily(spark, brk, datetime(1995, 1, 1))).collect()[0]
    assert r_same.n_days_pre == 181
    assert r_same.f_stat < 2.0
    assert r_brk.f_stat > 100.0
    assert r_brk.sse_drop_share > 0.5


def test_runs_degenerate_one_sided_null_z(spark):
    # only two distinct values: the median day-set IS one side, so every
    # kept day lies on one side -> Var[R] = 0 -> z must be NULL (both
    # engines), never a divide-by-zero
    alt = [100.0 if i % 2 else 200.0 for i in range(41)]
    r_alt = rel.runs_test_daily(_daily(spark, alt)).collect()[0]
    assert r_alt.n_above == 0 or r_alt.n_below == 0
    assert r_alt.z_score is None


def test_runs_blocked_fewer_runs_negative_z(spark):
    # distinct increasing-ish values in two regime blocks: low block then
    # high block -> exactly 2 runs, z < 0
    ys = [100.0 + i for i in range(20)] + [500.0 + i for i in range(21)]
    r = rel.runs_test_daily(_daily(spark, ys)).collect()[0]
    assert r.n_runs == 2
    assert r.z_score < -3.0


def test_runs_test_exact_small_case(spark):
    # values 1..7 (odd n): median = 4 (excluded); pattern around median:
    # below below below above above above if sorted — use explicit order
    ys = [1.0, 5.0, 2.0, 6.0, 3.0, 7.0, 4.0]
    # median = 4 -> excluded; signs by day: B A B A B A -> 6 runs
    r = rel.runs_test_daily(_daily(spark, ys)).collect()[0]
    assert r.n_days_used == 6
    assert r.n_above == 3 and r.n_below == 3
    assert r.n_runs == 6
    # E[R] = 1 + 2*9/6 = 4, Var = 2*9*(18-6)/(36*5) = 1.2
    assert r.z_score == pytest.approx((6 - 4.0) / (1.2**0.5), abs=1e-4)


def test_pacf_ar1_lag2_vanishes(spark):
    # a near-AR(1) deterministic series: x_t = 0.6 x_{t-1} + unit impulse
    # every 25 steps; pacf2 should be near 0 while r1, r2 follow 0.6^k
    # magnitudes must look like real daily revenue (~1e8): the ACF lane
    # divides by 1e6 before the DECIMAL(24,8) deviation products, so a
    # toy-scale series would round to zero inside the exact lane
    xs, x = [], 0.0
    for t in range(200):
        x = 0.6 * x + (1.0 if t % 25 == 0 else 0.0)
        xs.append(1.0e8 + 1.0e7 * x)
    r = rel.pacf_daily_revenue(_daily(spark, xs)).collect()[0]
    assert r.pacf1 == r.r1
    assert abs(r.r1 - 0.6) < 0.12
    assert abs(r.r2 - 0.36) < 0.15
    assert abs(r.pacf2) < 0.12
    assert abs(r.pacf3) < 0.12


def test_pacf_consistency_formulas(spark):
    ys = [1.0e6 * float(100 + (i * 37) % 50) for i in range(120)]
    r = rel.pacf_daily_revenue(_daily(spark, ys)).collect()[0]
    # recompute pacf2 from the reported r's (rounded inputs -> loose tol)
    exp_p2 = (r.r2 - r.r1**2) / (1 - r.r1**2)
    assert r.pacf2 == pytest.approx(exp_p2, abs=1e-4)


def test_anderson_darling_normal_vs_skewed(spark):
    # symmetric triangular-ish data: A2* small; heavy one-sided outliers:
    # A2* large and flagged
    sym = []
    for i in range(200):
        # near-normal via sum of 3 uniform lanes (deterministic)
        u = ((i * 37) % 100 + (i * 61) % 100 + (i * 89) % 100) / 3.0
        sym.append(1000.0 + u)
    r_sym = rel.anderson_darling_price(_daily(spark, sym)).collect()[0]
    skw = [1000.0] * 190 + [9000.0 + i for i in range(10)]
    r_skw = rel.anderson_darling_price(_daily(spark, skw)).collect()[0]
    assert r_skw.a2_star > r_sym.a2_star
    assert r_skw.reject_normal_05 == 1
    assert r_sym.a2_stat > 0.0
