"""Semantic pins for vif_features, partial_corr_price,
regression_influence_topk and levene_brown_forsythe — hand-checkable or
numpy-verified examples."""

from __future__ import annotations

from datetime import datetime

import pytest

from cocktailsdb_spark.operators import relational as rel


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_quantity double,"
        " l_discount double, l_tax double, l_extendedprice double",
    )


def test_vif_orthogonal_features_are_one(spark):
    # quantity/discount/tax constructed pairwise-orthogonal (balanced
    # full-factorial design) -> all centered covariances 0 -> VIF = 1
    rows = []
    i = 0
    for q in (1.0, 2.0):
        for d in (0.0, 0.1):
            for t in (0.0, 0.05):
                i += 1
                rows.append((i, 1, q, d, t, 100.0))
    r = rel.vif_features(_li(spark, rows)).collect()[0]
    assert r.vif_qty == pytest.approx(1.0, abs=1e-6)
    assert r.vif_discount == pytest.approx(1.0, abs=1e-6)
    assert r.vif_tax == pytest.approx(1.0, abs=1e-6)


def test_vif_collinear_features_explode(spark):
    np = pytest.importorskip("numpy")
    rng = [(i, 1, float(i % 7 + 1), 0.01 * (i % 7 + 1) + 0.001 * (i % 3),
            0.02 * (i % 5), 50.0) for i in range(60)]
    r = rel.vif_features(_li(spark, rng)).collect()[0]
    # discount ~ quantity almost exactly -> both VIFs large
    assert r.vif_qty > 10 and r.vif_discount > 10
    # numpy cross-check of vif_qty
    X = np.array([[q, d, t] for _, _, q, d, t, _ in rng])
    Xc = X - X.mean(axis=0)
    C = Xc.T @ Xc
    # R^2 of x1 on (x2, x3)
    b = np.linalg.solve(C[1:, 1:], C[1:, 0])
    r2 = b @ C[1:, 0] / C[0, 0]
    assert r.vif_qty == pytest.approx(1.0 / (1.0 - r2), rel=1e-4)


def test_partial_corr_removes_mediated_association(spark):
    np = pytest.importorskip("numpy")
    # price driven ONLY by discount; quantity also driven by discount ->
    # marginal r(price, qty) nonzero, partial r | discount ~ 0
    rows = []
    for i in range(80):
        z = (i % 9) / 10.0
        q = 10.0 * z + (1.0 if i % 2 else -1.0)
        p = 1000.0 * z + (3.0 if i % 3 == 0 else -1.5)
        rows.append((i, 1, q, z, 0.0, p))
    r = rel.partial_corr_price(_li(spark, rows)).collect()[0]
    assert abs(r.r_price_qty) > 0.8
    assert abs(r.partial_r) < 0.35
    # numpy cross-check
    X = np.array([[p, q, z] for _, _, q, z, _, p in rows])
    c = np.corrcoef(X.T)
    exp = (c[0, 1] - c[0, 2] * c[1, 2]) / np.sqrt(
        (1 - c[0, 2] ** 2) * (1 - c[1, 2] ** 2)
    )
    assert r.partial_r == pytest.approx(exp, abs=1e-4)


def test_influence_flags_planted_outlier(spark):
    # clean linear data + one gross outlier: it must rank #1 by Cook's D
    rows = [
        (i, 1, float(i % 10 + 1), 0.01 * (i % 3), 0.0, 100.0 * (i % 10 + 1))
        for i in range(100)
    ]
    rows.append((999, 1, 10.0, 0.01, 0.0, 99999.0))
    out = rel.regression_influence_topk(_li(spark, rows)).collect()
    assert out[0].rank == 1
    assert out[0].l_orderkey == 999
    assert out[0].cooks_d > 10 * out[1].cooks_d
    assert len(out) == rel.INFLUENCE_TOPK


def test_influence_leverage_bounds(spark):
    rows = [(i, 1, float(i % 10 + 1), 0.01 * (i % 4), 0.0,
             70.0 * (i % 10 + 1) + (i % 7) - 3.0) for i in range(50)]
    out = rel.regression_influence_topk(_li(spark, rows)).collect()
    for r in out:
        assert 0.0 < r.leverage < 1.0


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderdate timestamp, o_orderpriority string, o_totalprice double"
    )


def test_levene_equal_spread_f_near_zero(spark):
    # identical dispersion around different medians -> |x - med| identical
    # across groups -> SSB = 0 -> F = 0
    rows = []
    for g, base in (("a", 100.0), ("b", 500.0)):
        for d in (-2.0, -1.0, 0.0, 1.0, 2.0):
            rows.append((datetime(1996, 1, 1), g, base + d))
    r = rel.levene_brown_forsythe(_orders(spark, rows)).collect()[0]
    assert r.n_total == 10 and r.k_groups == 2
    assert r.f_stat == pytest.approx(0.0, abs=1e-9)


def test_levene_detects_unequal_spread(spark):
    rows = []
    for d in (-1.0, 0.0, 1.0):
        rows.append((datetime(1996, 1, 1), "tight", 100.0 + d))
    for d in (-50.0, 0.0, 50.0):
        rows.append((datetime(1996, 1, 1), "wide", 100.0 + d))
    r = rel.levene_brown_forsythe(_orders(spark, rows)).collect()[0]
    # hand check: z_tight=[1,0,1], z_wide=[50,0,50]; SSB=1600.67,
    # SSW=1667.33 -> F = 1600.67/(1667.33/4) = 3.8401
    assert r.f_stat == pytest.approx(3.840064, abs=1e-4)
    assert r.eta_squared > 0.4


def test_levene_median_is_type1_lower(spark):
    # even group size: median = lower order statistic (rank n/2 ceil'd)
    # group [1,2,3,4] -> rank ceil(4/2)=2 -> med=2; z = [1,0,1,2]
    rows = [(datetime(1996, 1, 1), "g", float(v)) for v in (1, 2, 3, 4)]
    rows += [(datetime(1996, 1, 1), "h", float(v)) for v in (10, 20, 30, 40)]
    r = rel.levene_brown_forsythe(_orders(spark, rows)).collect()[0]
    # med_g=2 -> z=[1,0,1,2] mean 1; med_h=20 -> z=[10,0,10,20] mean 10
    # SSB = 4*(1-5.5)^2 + 4*(10-5.5)^2 = 162; SSW = 2 + 200 = 202
    # F = (162/1)/(202/6) = 4.8119...
    assert r.f_stat == pytest.approx(162.0 / (202.0 / 6.0), abs=1e-4)
