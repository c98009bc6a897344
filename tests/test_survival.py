"""Semantic pins for kaplan_meier_retention (operators/relational.py) —
the textbook KM example hand-computed, censoring semantics, and the
risk-set-extinction guard."""

from __future__ import annotations

from datetime import datetime

from cocktailsdb_spark.operators import relational as rel


def _orders(spark, rows):
    return spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")


def _mk(cust, first_day, last_day):
    # two orders pin (first, last); Jan 2000 base keeps us pre-censor
    return [
        (cust, datetime(2000, 1, first_day)),
        (cust, datetime(2000, 1, last_day)),
    ]


def test_km_textbook_curve(spark):
    # lifetimes (all events, no censoring): 1, 1, 2, 4
    # S(1) = 1 - 2/4 = 0.5 ; S(2) = 0.5 * (1 - 1/2) = 0.25 ;
    # S(4) = 0.25 * (1 - 1/1) = 0 (risk set dies out -> guard path)
    rows = _mk(1, 1, 2) + _mk(2, 1, 2) + _mk(3, 1, 3) + _mk(4, 1, 5)
    out = {r.t_days: r for r in rel.kaplan_meier_retention(_orders(spark, rows)).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].n_risk == 4 and out[1].d_events == 2
    assert abs(out[1].survival - 0.5) <= 1e-5
    assert out[2].n_risk == 2 and abs(out[2].survival - 0.25) <= 1e-5
    assert out[4].n_risk == 1 and out[4].survival == 0.0


def test_km_censoring_holds_risk_then_exits(spark):
    # lifetime-2 customer is CENSORED (last order after censor date):
    # they sit in the risk set at t=1 but their t=2 exit is no event.
    rows = _mk(1, 1, 2) + [
        (2, datetime(2001, 6, 1)),
        (2, datetime(2001, 6, 3)),  # >= 2001-01-01 -> censored, t=2
    ]
    out = rel.kaplan_meier_retention(_orders(spark, rows)).collect()
    # only t=1 is an event time; n_risk there includes the censored cust
    assert len(out) == 1
    r = out[0]
    assert r.t_days == 1 and r.n_risk == 2 and r.d_events == 1
    assert abs(r.survival - 0.5) <= 1e-5


def test_km_single_order_customers_are_t0_events(spark):
    rows = [(1, datetime(2000, 1, 1)), (2, datetime(2000, 2, 1))] + _mk(3, 1, 4)
    out = {r.t_days: r for r in rel.kaplan_meier_retention(_orders(spark, rows)).collect()}
    assert out[0].n_risk == 3 and out[0].d_events == 2
    assert abs(out[0].survival - (1 / 3)) <= 1e-5
