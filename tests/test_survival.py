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


def test_log_rank_hand_computed_two_customers(spark):
    """A-lifetime 0, B-lifetime 5 (both events): only t=0 has n>1 —
    O-E = 1 - 0.5 = 0.5, V = 0.25, chi^2 = 1.0."""
    import datetime as dt

    from cocktailsdb_spark.operators import relational

    orders = spark.createDataFrame(
        [
            (1, 10, dt.date(1996, 1, 1), 50.0),
            (2, 20, dt.date(1996, 1, 1), 50.0),
            (3, 20, dt.date(1996, 1, 6), 50.0),
        ],
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(10, "AUTOMOBILE"), (20, "BUILDING")],
        "c_custkey long, c_mktsegment string",
    )
    out = relational.log_rank_test(orders, customer).collect()[0]
    assert out.n_a_total == 1 and out.n_b_total == 1
    assert out.events_a == 1 and out.events_b == 1
    assert out.observed_minus_expected == 0.5
    assert out.variance == 0.25
    assert out.chi_sq == 1.0


def test_mann_kendall_strictly_increasing(spark):
    import datetime as dt

    from cocktailsdb_spark.operators import relational

    orders = spark.createDataFrame(
        [
            (i, dt.date(1996, 1, 1) + dt.timedelta(days=i), 100.0 * (i + 1))
            for i in range(10)
        ],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    )
    out = relational.mann_kendall_trend(orders).collect()[0]
    assert out.n_days == 10 and out.n_pairs == 45
    assert out.s_statistic == 45
    assert out.trend == "increasing" and out.z_score > 0
