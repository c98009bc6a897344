"""Semantic pins for oaxaca_price_gap, lorenz_curve_deciles and
granger_causality_daily."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from cocktailsdb_spark.operators import relational as rel


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_shipdate timestamp, l_quantity double, l_discount double,"
        " l_extendedprice double",
    )


def test_oaxaca_pure_coefficient_effect(spark):
    # identical mix both years, price level +10% in 1997:
    # endowment = 0, coefficient = the whole gap; identity exact
    rows = []
    for yr, mult in ((1996, 1.0), (1997, 1.1)):
        for i in range(60):
            q = float(i % 5 + 1)
            d = 0.01 * (i % 3)
            rows.append((datetime(yr, 3, 1), q, d, mult * (100.0 * q + 50.0)))
    r = rel.oaxaca_price_gap(_li(spark, rows)).collect()[0]
    assert r.endowment_effect == pytest.approx(0.0, abs=1e-6)
    assert r.coefficient_effect == pytest.approx(r.mean_gap, abs=1e-6)
    assert r.identity_residual == pytest.approx(0.0, abs=1e-6)


def test_oaxaca_pure_endowment_effect(spark):
    # same pricing function both years, 1997 shifts to bigger quantities:
    # coefficient ~ 0, endowment = the gap
    def price(q, d):
        return 100.0 * q + 1000.0 * d + 50.0

    rows = []
    for i in range(60):
        q = float(i % 5 + 1)
        d = 0.01 * (i % 3)
        rows.append((datetime(1996, 3, 1), q, d, price(q, d)))
    for i in range(60):
        q = float(i % 5 + 3)  # shifted mix
        d = 0.01 * (i % 3)
        rows.append((datetime(1997, 3, 1), q, d, price(q, d)))
    r = rel.oaxaca_price_gap(_li(spark, rows)).collect()[0]
    assert r.coefficient_effect == pytest.approx(0.0, abs=1e-4)
    assert r.endowment_effect == pytest.approx(r.mean_gap, abs=1e-4)


def _orders(spark, pairs):
    # pairs: (custkey, totalprice); one order each on the same day
    return spark.createDataFrame(
        [(c, datetime(1996, 1, 1), v) for c, v in pairs],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )


def test_lorenz_equal_distribution_diagonal(spark):
    df = _orders(spark, [(i, 1000000.0) for i in range(10)])
    r = rel.lorenz_curve_deciles(df).collect()[0]
    for d in range(1, 11):
        assert getattr(r, f"share_p{d * 10}") == pytest.approx(d / 10, abs=1e-6)


def test_lorenz_concentrated_distribution(spark):
    # 9 customers with 1 unit, 1 customer with 91 -> bottom 90% hold 9%
    df = _orders(
        spark, [(i, 1000000.0) for i in range(9)] + [(9, 91000000.0)]
    )
    r = rel.lorenz_curve_deciles(df).collect()[0]
    assert r.share_p90 == pytest.approx(0.09, abs=1e-6)
    assert r.share_p100 == pytest.approx(1.0, abs=1e-6)
    assert r.share_p10 == pytest.approx(0.01, abs=1e-6)


def test_granger_planted_lag_signal(spark):
    # revenue_t = strongly driven by count_{t-1}: day t has n_t orders
    # where n cycles, and revenue_t = 1e6 * n_{t-1}
    rows = []
    counts = [(t * 7) % 10 + 1 for t in range(100)]
    for t in range(1, 100):
        n_today = counts[t]
        # noise term keeps SSE_u > 0 (an exact functional fit would zero
        # the unrestricted residual and F would divide by zero)
        rev_today = 1.0e6 * counts[t - 1] + 1.0e4 * ((t % 5) - 2)
        day = datetime(1996, 1, 1) + timedelta(days=t)
        for j in range(n_today):
            rows.append((j, day, rev_today / n_today))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    r = rel.granger_causality_daily(df).collect()[0]
    assert r.f_stat > 50.0
    assert r.sse_drop_share > 0.5
    assert r.beta_lag_count > 0.0
