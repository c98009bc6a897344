"""Semantic pins for percentile_cont_priority, hhi_brand_concentration,
theil_index_revenue, neyman_allocation, ab_sample_size and the streaming
window funnel registration."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from cocktailsdb_spark.operators import relational as rel


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_custkey long, o_orderdate timestamp, o_orderpriority string,"
        " o_totalprice double",
    )


def test_percentile_cont_textbook(spark):
    # group g: values 10,20,30,40 -> p25: h=1.75 -> 10+0.75*10=17.5
    # p50: h=2.5 -> 25 ; p75: h=3.25 -> 32.5  (numpy 'linear' convention)
    rows = [(1, datetime(1996, 1, 1), "g", float(v)) for v in (10, 20, 30, 40)]
    r = rel.percentile_cont_priority(_orders(spark, rows)).collect()[0]
    assert r.n == 4
    assert r.p25 == pytest.approx(17.5, abs=1e-9)
    assert r.p50 == pytest.approx(25.0, abs=1e-9)
    assert r.p75 == pytest.approx(32.5, abs=1e-9)


def test_percentile_cont_with_ties_matches_numpy(spark):
    np = pytest.importorskip("numpy")
    vals = [5.0, 5.0, 5.0, 7.0, 9.0, 9.0, 12.0]
    rows = [(1, datetime(1996, 1, 1), "g", v) for v in vals]
    r = rel.percentile_cont_priority(_orders(spark, rows)).collect()[0]
    for p, col in ((0.25, r.p25), (0.5, r.p50), (0.75, r.p75)):
        assert col == pytest.approx(
            float(np.percentile(vals, p * 100, method="linear")), abs=1e-6
        )


def _li(spark, rows):
    return spark.createDataFrame(
        rows, "l_partkey long, l_extendedprice double"
    )


def _part(spark, brands):
    return spark.createDataFrame(brands, "p_partkey long, p_brand string")


def test_hhi_monopoly_and_duopoly(spark):
    part = _part(spark, [(1, "A"), (2, "B")])
    mono = _li(spark, [(1, 100.0), (1, 200.0)])
    r = rel.hhi_brand_concentration(mono, part).collect()[0]
    assert r.hhi == pytest.approx(10000.0, abs=1e-6)
    assert r.effective_n == pytest.approx(1.0, abs=1e-6)
    duo = _li(spark, [(1, 100.0), (2, 100.0)])
    r2 = rel.hhi_brand_concentration(duo, part).collect()[0]
    assert r2.hhi == pytest.approx(5000.0, abs=1e-6)
    assert r2.effective_n == pytest.approx(2.0, abs=1e-6)
    assert r2.top_share == pytest.approx(0.5, abs=1e-9)


def test_theil_decomposition(spark):
    # two segments, equal revenue within each segment -> T_within = 0 and
    # T_total = T_between exactly
    cust = spark.createDataFrame(
        [(1, "S1"), (2, "S1"), (3, "S2"), (4, "S2")],
        "c_custkey long, c_mktsegment string",
    )
    rows = [
        (1, datetime(1996, 1, 1), "p", 100.0),
        (2, datetime(1996, 1, 1), "p", 100.0),
        (3, datetime(1996, 1, 1), "p", 300.0),
        (4, datetime(1996, 1, 1), "p", 300.0),
    ]
    r = rel.theil_index_revenue(_orders(spark, rows), cust).collect()[0]
    assert r.theil_within == pytest.approx(0.0, abs=1e-6)
    # T_between = 0.25*ln(0.5)+0.25*ln(0.5)+0.75... shares: S1 X=200/800,
    # S2=600/800; n shares 0.5 each:
    exp = 0.25 * math.log(0.25 / 0.5) + 0.75 * math.log(0.75 / 0.5)
    assert r.theil_between == pytest.approx(exp, abs=1e-5)
    assert r.theil_total == pytest.approx(exp, abs=1e-5)


def test_neyman_allocation_proportional_to_nh_sh(spark):
    # stratum A: sd 0 (constant) -> allocation ~ 0; stratum B gets ~all
    cust = spark.createDataFrame(
        [("c%d" % i, "A", 100.0) for i in range(10)]
        + [("d%d" % i, "B", float(100 + 10 * i)) for i in range(10)],
        "c_name string, c_mktsegment string, c_acctbal double",
    )
    out = {r.segment: r for r in rel.neyman_allocation(cust).collect()}
    assert out["A"].alloc_share == pytest.approx(0.0, abs=1e-9)
    assert out["B"].alloc_share == pytest.approx(1.0, abs=1e-9)
    assert out["B"].n_sample == rel.NEYMAN_BUDGET


def test_ab_sample_size_closed_form(spark):
    rows = [(i, datetime(1996, 1, 1), "p", float(v))
            for i, v in enumerate([90, 95, 100, 105, 110] * 20)]
    r = rel.ab_sample_size(_orders(spark, rows)).collect()[0]
    vals = [90, 95, 100, 105, 110] * 20
    n = len(vals)
    mu = sum(vals) / n
    var = sum((v - mu) ** 2 for v in vals) / (n - 1)
    delta = 0.01 * mu
    zsum = rel.AB_Z_ALPHA2 + rel.AB_Z_BETA
    exp = math.ceil(2.0 * var * zsum * zsum / (delta * delta))
    assert r.n_per_group == exp
    assert r.mean_value == pytest.approx(mu, abs=1e-6)


def test_cramers_v_bounds_and_independence(spark):
    from cocktailsdb_spark.operators import profiling

    # perfectly associated pair: flag determines status -> V = 1
    rows = [("A", "O", 0.0)] * 10 + [("R", "F", 0.08)] * 10
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string, l_tax double"
    )
    out = {(r.col_a, r.col_b): r for r in profiling.cramers_v_pairs(df).collect()}
    assert out[("l_returnflag", "l_linestatus")].cramers_v == pytest.approx(
        1.0, abs=1e-6
    )
    # independent pair (balanced cross): V = 0
    rows2 = [(f, s, 0.0) for f in ("A", "R") for s in ("O", "F") for _ in range(5)]
    df2 = spark.createDataFrame(
        rows2, "l_returnflag string, l_linestatus string, l_tax double"
    )
    out2 = {(r.col_a, r.col_b): r for r in profiling.cramers_v_pairs(df2).collect()}
    assert out2[("l_returnflag", "l_linestatus")].cramers_v == pytest.approx(
        0.0, abs=1e-6
    )


def test_simpson_diversity_hand_values(spark):
    from cocktailsdb_spark.operators import profiling

    docs = spark.createDataFrame(
        [(i, "s1" if i < 5 else "s2") for i in range(10)],
        "doc_id long, source string",
    )
    r = profiling.simpson_diversity_sources(docs).collect()[0]
    # p = (.5, .5): D = 1 - .5 = .5 ; inverse = 2
    assert r.simpson_d == pytest.approx(0.5, abs=1e-9)
    assert r.inverse_simpson == pytest.approx(2.0, abs=1e-6)
    mono = spark.createDataFrame(
        [(i, "only") for i in range(7)], "doc_id long, source string"
    )
    r2 = profiling.simpson_diversity_sources(mono).collect()[0]
    assert r2.simpson_d == 0.0 and r2.inverse_simpson == pytest.approx(1.0, abs=1e-6)
