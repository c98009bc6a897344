"""Semantic pins for the distribution-test / ridge / l-diversity /
SQL-surface (recursive CTE, LATERAL) / array-HOF entries
(operators/relational.py + registry_stats.py): textbook hand-computed
examples, independent of the DuckDB oracle."""

from __future__ import annotations

from datetime import datetime

import pytest

from cocktailsdb_spark import registry_stats as RS
from cocktailsdb_spark.operators import filters, relational as rel


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderdate timestamp, o_orderpriority string, o_totalprice double"
    )


def test_ks_hand_example(spark):
    # 1996: {1,2,3,4}, 1997: {3,4,5,6} -> D = 0.5 at v=2 (ECDF 0.5 vs 0)
    rows = [(datetime(1996, 1, 1 + i), "p", float(v)) for i, v in enumerate([1, 2, 3, 4])]
    rows += [(datetime(1997, 1, 1 + i), "p", float(v)) for i, v in enumerate([3, 4, 5, 6])]
    r = rel.ks_test_two_sample(_orders(spark, rows)).collect()[0]
    assert r.n_a == 4 and r.n_b == 4
    assert r.d_stat == pytest.approx(0.5, abs=1e-9)
    # lambda = sqrt(16/8)*0.5 = sqrt(2)/2
    assert r.ks_lambda == pytest.approx(0.707107, abs=1e-6)
    assert 0.0 <= r.p_value <= 1.0


def test_ks_identical_distributions_d_zero(spark):
    rows = [(datetime(y, 1, 1 + i), "p", float(v))
            for y in (1996, 1997) for i, v in enumerate([10, 20, 30])]
    r = rel.ks_test_two_sample(_orders(spark, rows)).collect()[0]
    assert r.d_stat == 0.0 and r.p_value == 1.0


def test_kruskal_wallis_hand_example(spark):
    # groups a=[1,2], b=[3,4]: ranks 1..4, R_a=3, R_b=7
    # H = 12/(4*5) * (3^2/2 + 7^2/2) - 3*5 = 0.6*29 - 15 = 2.4, no ties
    rows = [
        (datetime(1996, 1, 1), "a", 1.0),
        (datetime(1996, 1, 2), "a", 2.0),
        (datetime(1996, 1, 3), "b", 3.0),
        (datetime(1996, 1, 4), "b", 4.0),
    ]
    r = rel.kruskal_wallis_priority(_orders(spark, rows)).collect()[0]
    assert r.n_total == 4 and r.k_groups == 2
    assert r.h_stat == pytest.approx(2.4, abs=1e-6)
    assert r.tie_correction == pytest.approx(1.0, abs=1e-9)
    assert r.h_corrected == pytest.approx(2.4, abs=1e-6)


def test_kruskal_wallis_tie_correction(spark):
    # a=[1,1], b=[2,2]: midranks 1.5,1.5,3.5,3.5 -> R_a=3, R_b=7 (same)
    # ties: two value-groups of t=2 -> sum(t^3-t)=12, C = 1 - 12/(64-4)=0.8
    rows = [
        (datetime(1996, 1, 1), "a", 1.0),
        (datetime(1996, 1, 2), "a", 1.0),
        (datetime(1996, 1, 3), "b", 2.0),
        (datetime(1996, 1, 4), "b", 2.0),
    ]
    r = rel.kruskal_wallis_priority(_orders(spark, rows)).collect()[0]
    assert r.tie_correction == pytest.approx(0.8, abs=1e-9)
    assert r.h_corrected == pytest.approx(r.h_stat / 0.8, abs=1e-6)


def test_anova_hand_example(spark):
    # a=[1,2] (mean 1.5), b=[4,6] (mean 5): SSB=12.25, SSW=2.5
    # F = (12.25/1)/(2.5/2) = 9.8 ; eta^2 = 12.25/14.75
    rows = [
        (datetime(1996, 1, 1), "a", 1.0),
        (datetime(1996, 1, 2), "a", 2.0),
        (datetime(1996, 1, 3), "b", 4.0),
        (datetime(1996, 1, 4), "b", 6.0),
    ]
    r = rel.anova_oneway_priority(_orders(spark, rows)).collect()[0]
    assert r.n_total == 4 and r.k_groups == 2
    assert r.f_stat == pytest.approx(9.8, abs=1e-4)
    assert r.eta_squared == pytest.approx(12.25 / 14.75, abs=1e-6)


def test_kendall_hand_example(spark):
    # daily (x=orders, y=revenue): (1,10), (2,30), (3,20)
    # pairs: d1-d2 concordant, d1-d3 concordant, d2-d3 discordant
    # tau_b = (2-1)/3 (no ties)
    rows = [(datetime(1996, 1, 1), "p", 10.0)]
    rows += [(datetime(1996, 1, 2), "p", v) for v in (15.0, 15.0)]
    rows += [(datetime(1996, 1, 3), "p", v) for v in (5.0, 5.0, 10.0)]
    r = rel.kendall_tau_daily(_orders(spark, rows)).collect()[0]
    assert r.n_days == 3 and r.n_pairs == 3
    assert r.concordant == 2 and r.discordant == 1
    assert r.tau_b == pytest.approx(1.0 / 3.0, abs=1e-6)


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_extendedprice double"
    )


def test_ridge_matches_numpy_closed_form(spark):
    np = pytest.importorskip("numpy")
    rows = [
        (1.0, 0.00, 105.0),
        (2.0, 0.05, 198.0),
        (3.0, 0.10, 285.0),
        (4.0, 0.00, 410.0),
        (5.0, 0.05, 495.0),
        (6.0, 0.10, 570.0),
    ]
    r = rel.ridge_regression_price(_lineitem(spark, rows)).collect()[0]
    X = np.array([[q, d] for q, d, _ in rows])
    y = np.array([p for _, _, p in rows])
    n = len(rows)
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    lam = rel.RIDGE_LAMBDA_PER_ROW * n
    A = Xc.T @ Xc + lam * np.eye(2)
    beta = np.linalg.solve(A, Xc.T @ yc)
    intercept = y.mean() - beta @ X.mean(axis=0)
    assert r.n_rows == n
    assert r.beta_qty == pytest.approx(beta[0], abs=1e-4)
    assert r.beta_discount == pytest.approx(beta[1], abs=1e-2)
    assert r.intercept == pytest.approx(intercept, abs=1e-2)
    assert 0.0 <= r.r_squared <= 1.0


def test_ridge_large_lambda_shrinks_to_mean(spark):
    rows = [(float(q), 0.01 * q, 100.0 * q) for q in range(1, 9)]
    df = _lineitem(spark, rows)
    r = rel.ridge_regression_price(df).collect()[0]
    # with per-row lambda 10 and tiny centered variance of discount,
    # beta_discount is heavily shrunk vs OLS (which would be unstable);
    # the prediction at the mean must still be the mean of y
    ybar = sum(100.0 * q for q in range(1, 9)) / 8
    x1bar = sum(float(q) for q in range(1, 9)) / 8
    x2bar = sum(0.01 * q for q in range(1, 9)) / 8
    assert r.intercept + r.beta_qty * x1bar + r.beta_discount * x2bar == pytest.approx(
        ybar, rel=1e-6
    )


def test_l_diversity_hand_example(spark):
    # class (0,'A'): bands low+top -> l=2 (below 3); class (1,'B'): 3 bands
    cust = spark.createDataFrame(
        [
            (0, "A", 100.0),
            (0, "A", 9000.0),
            (1, "B", -5.0),
            (1, "B", 3000.0),
            (1, "B", 8000.0),
        ],
        "c_nationkey int, c_mktsegment string, c_acctbal double",
    )
    r = filters.l_diversity_report(cust).collect()[0]
    assert r.min_l == 2
    assert r.n_classes == 2
    assert r.n_classes_below_l == 1
    assert r.n_rows_below_l == 2
    assert r.pct_rows_below_l == pytest.approx(0.4, abs=1e-9)


def test_recursive_cte_paths_semantics(spark):
    # user 1: three events a->b->c ; user 2: one event a
    rows = [
        (1, datetime(2024, 1, 1, 0), 10, "a"),
        (2, datetime(2024, 1, 1, 1), 10, "b"),
        (3, datetime(2024, 1, 1, 2), 10, "c"),
        (4, datetime(2024, 1, 2, 0), 20, "a"),
        # outside the week window -> ignored
        (5, datetime(2024, 2, 1, 0), 10, "zzz"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).createOrReplaceTempView("events")
    out = {
        (r.step, r.event_type): r.n_events
        for r in spark.sql(RS.RECURSIVE_PATHS_SQL).collect()
    }
    assert out == {(1, "a"): 2, (2, "b"): 1, (3, "c"): 1}


def test_recursive_cte_depth_bound(spark):
    # a 20-event chain stops at REC_MAX_STEPS
    rows = [(i, datetime(2024, 1, 1, 0, i), 1, "e") for i in range(20)]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).createOrReplaceTempView("events")
    out = spark.sql(RS.RECURSIVE_PATHS_SQL).collect()
    assert max(r.step for r in out) == RS.REC_MAX_STEPS
    assert sum(r.n_events for r in out) == RS.REC_MAX_STEPS


def test_lateral_topk_semantics(spark):
    spark.createDataFrame(
        [(0, "ALPHA"), (1, "BETA")], "n_nationkey int, n_name string"
    ).createOrReplaceTempView("nation")
    spark.createDataFrame(
        [
            ("c1", 0, 50.0),
            ("c2", 0, 90.0),
            ("c3", 0, 70.0),
            ("c4", 0, 70.0),  # tie with c3 -> name breaks it
            ("c5", 1, 10.0),
        ],
        "c_name string, c_nationkey int, c_acctbal double",
    ).createOrReplaceTempView("customer")
    rows = sorted(
        (r.nation, r.customer, r.acctbal)
        for r in spark.sql(RS.LATERAL_TOPK_SQL).collect()
    )
    assert rows == [
        ("ALPHA", "c2", 90.0),
        ("ALPHA", "c3", 70.0),
        ("ALPHA", "c4", 70.0),
        ("BETA", "c5", 10.0),
    ]


def test_array_hof_stats_python_recompute(spark, sf_dir):
    """avg_big_components and max_component recomputed in plain Python
    from the parquet for one label (float32 promoted to double, exactly
    what both engines do)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    got = {
        r.label: r
        for r in RS._q_array_hof(spark, sf_dir).collect()
    }
    label = tbl[0]["label"]
    vecs = [t["embedding"] for t in tbl if t["label"] == label]
    nbig = [sum(1 for x in v if abs(float(x)) > RS.HOF_BIG_CUTOFF) for v in vecs]
    import math

    exp_avg_big = math.floor(sum(nbig) / len(vecs) * 1e6 + 0.5) / 1e6
    exp_max = math.floor(max(max(float(x) for x in v) for v in vecs) * 1e6 + 0.5) / 1e6
    assert got[label].n_vecs == len(vecs)
    assert got[label].avg_big_components == pytest.approx(exp_avg_big, abs=1e-9)
    assert got[label].max_component == pytest.approx(exp_max, abs=1e-9)
    # L1 norm sanity: positive and bounded by 64 * max|x|
    assert 0.0 < got[label].avg_l1 < 64.0
