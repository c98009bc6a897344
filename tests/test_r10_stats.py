"""Semantic pins for the round-10 statistics entries (ljung_box_daily,
friedman_test_priority, cmh_discount_returns): textbook hand-computed
examples, independent of the DuckDB oracle."""

from __future__ import annotations

from datetime import datetime

import pytest

from cocktailsdb_spark.operators import relational as rel


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderdate timestamp, o_orderpriority string, o_totalprice double"
    )


def test_ljung_box_hand_example(spark):
    # daily series 1..5 (in ACF_REV_SCALE units so decimal lanes keep
    # precision): dv = [-2,-1,0,1,2], den = 10, num1 = 4, num2 = -1
    # r1 = 0.4, r2 = -0.1
    # Q(1) = 5*7*(0.16/4)            = 1.4
    # Q(2) = 5*7*(0.16/4 + 0.01/3)   = 1.516667 (qround 6)
    rows = [
        (datetime(1996, 1, 1 + i), "p", rel.ACF_REV_SCALE * float(v))
        for i, v in enumerate([1, 2, 3, 4, 5])
    ]
    out = {r.lag: r for r in rel.ljung_box_daily(_orders(spark, rows)).collect()}
    assert len(out) == rel.LB_MAX_LAG and out[1].n_days == 5
    assert out[1].acf == pytest.approx(0.4, abs=1e-9)
    assert out[2].acf == pytest.approx(-0.1, abs=1e-9)
    assert out[1].q_stat == pytest.approx(1.4, abs=1e-6)
    assert out[2].q_stat == pytest.approx(35.0 * (0.04 + 0.01 / 3.0), abs=1e-6)
    # lags past the series length have no products: NULL, not 0
    assert out[5].acf is None and out[5].q_stat is None


def test_ljung_box_constant_series_null(spark):
    rows = [
        (datetime(1996, 1, 1 + i), "p", rel.ACF_REV_SCALE) for i in range(4)
    ]
    out = rel.ljung_box_daily(_orders(spark, rows)).collect()
    assert all(r.acf is None and r.q_stat is None for r in out)


def test_friedman_hand_example(spark):
    # 2 complete blocks (months), identical priority ordering in both:
    # ranks 1..5 twice -> R_j = 2j, Q = 12/(2*5*6)*220 - 3*2*6 = 8
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = []
    for m in (1, 2):
        for j, p in enumerate(prios, start=1):
            rows.append((datetime(1996, m, 10), p, 10.0 * j))
    out = {
        r.o_orderpriority: r
        for r in rel.friedman_test_priority(_orders(spark, rows)).collect()
    }
    assert len(out) == 5
    for j, p in enumerate(prios, start=1):
        assert out[p].n_blocks == 2 and out[p].df == 4
        assert out[p].rank_sum == pytest.approx(2.0 * j, abs=1e-9)
        assert out[p].mean_rank == pytest.approx(float(j), abs=1e-9)
        assert out[p].q_stat == pytest.approx(8.0, abs=1e-6)


def test_friedman_incomplete_blocks_dropped(spark):
    # month 3 has only 2 priorities -> not a complete block, excluded
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = [(datetime(1996, 1, 10), p, 10.0 * j) for j, p in enumerate(prios, 1)]
    rows += [(datetime(1996, 3, 10), "1-URGENT", 5.0),
             (datetime(1996, 3, 10), "2-HIGH", 6.0)]
    out = rel.friedman_test_priority(_orders(spark, rows)).collect()
    assert all(r.n_blocks == 1 for r in out)


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows, "l_shipdate timestamp, l_discount double, l_returnflag string"
    )


def test_cmh_hand_example(spark):
    # stratum 1995: n=10, exposed n1=5 (a=4 returned), unexposed 1/5 returned
    #   e = 5*5/10 = 2.5, v = 5*5*5*5/(100*9) = 0.694444
    # stratum 1996: n=8, exposed n1=4 (a=1), unexposed 1/4 returned
    #   e = 4*2/8 = 1.0, v = 4*4*2*6/(64*7) = 0.428571
    # CMH = (|5-3.5|-0.5)^2 / 1.123016 = 0.890459
    # OR_MH = (4*4/10 + 1*3/8) / (1*1/10 + 3*1/8) = 1.975/0.475 = 4.157895
    rows = []
    for flag_seq, disc in ((["R"] * 4 + ["N"], 0.10), (["R"] + ["N"] * 4, 0.0)):
        rows += [(datetime(1995, 6, 1), disc, f) for f in flag_seq]
    for flag_seq, disc in ((["R"] + ["N"] * 3, 0.10), (["R"] + ["N"] * 3, 0.0)):
        rows += [(datetime(1996, 6, 1), disc, f) for f in flag_seq]
    r = rel.cmh_discount_returns(_lineitem(spark, rows)).collect()[0]
    assert r.k_strata == 2 and r.n_total == 18
    assert r.sum_exposed_returns == 5
    assert r.expected_returns == pytest.approx(3.5, abs=1e-9)
    v = 625.0 / 900.0 + 192.0 / 448.0
    assert r.variance_sum == pytest.approx(v, abs=1e-6)
    assert r.cmh_stat == pytest.approx(1.0 / v, abs=1e-5)
    assert r.mh_odds_ratio == pytest.approx(1.975 / 0.475, abs=1e-6)


def test_cmh_singleton_stratum_excluded(spark):
    # a 1-row stratum has no variance (n-1 = 0): excluded, not a crash
    rows = [(datetime(1995, 6, 1), 0.10, "R"),
            (datetime(1995, 6, 1), 0.0, "N"),
            (datetime(1996, 6, 1), 0.10, "R")]
    r = rel.cmh_discount_returns(_lineitem(spark, rows)).collect()[0]
    assert r.k_strata == 1 and r.n_total == 2
