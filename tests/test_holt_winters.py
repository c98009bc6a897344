"""Holt-Winters semantic pins: seasonal recovery on a planted cycle."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from cocktailsdb_spark.operators import relational as rel


def _fixture(spark, n_days=70):
    # revenue = 1000 + 50*t + weekday bump (planted additive season)
    season = [0.0, 10.0, 20.0, -10.0, -20.0, 5.0, -5.0]
    orders, cust = [], [(1, "SEG")]
    for t in range(n_days):
        day = datetime(1996, 1, 1) + timedelta(days=t)
        orders.append((1, day, 1000.0 + 50.0 * t + season[t % 7]))
    odf = spark.createDataFrame(
        orders, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    cdf = spark.createDataFrame(cust, "c_custkey long, c_mktsegment string")
    return odf, cdf


def test_hw_recovers_trend_and_season(spark):
    odf, cdf = _fixture(spark)
    r = rel.holt_winters_forecast(odf, cdf).collect()[0]
    assert r.segment == "SEG" and r.n_days == 70
    # trend converges TOWARD the planted 50/day (textbook init seeds the
    # seasonal slots with trend contamination, so convergence is gradual
    # — 63 steps at beta=0.25 gets ~40; the pin is the direction + band)
    assert 35.0 < r.trend < 55.0
    # h=7 and h=14 land on the same weekday slot as each other, so their
    # gap is EXACTLY 7*trend (up to the 1e-6 state quanta)
    assert (r.forecast_14 - r.forecast_7) == pytest.approx(7 * r.trend, abs=1e-3)
    # absolute sanity: within the init-bias envelope of 1000 + 50*76
    assert abs(r.forecast_7 - (1000.0 + 50.0 * 76)) < 250.0


def test_hw_short_series_dropped(spark):
    odf, cdf = _fixture(spark, n_days=10)  # < 2 periods
    assert rel.holt_winters_forecast(odf, cdf).count() == 0
