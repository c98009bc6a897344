"""Semantic pins for bootstrap_ci_revenue (operators/relational.py):
degenerate-distribution exactness and CI sanity."""

from __future__ import annotations

from datetime import datetime

from cocktailsdb_spark.operators import relational as rel


def _orders(spark, vals):
    rows = [(i, datetime(2000, 1, 1), v) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )


def test_constant_revenue_collapses_ci(spark):
    # every order worth 42: every replicate mean is exactly 42 whatever
    # the weights (unless a replicate draws all-zero weights, impossible
    # at n=50 with P(w=0) = 1/e), so se == 0 and the CI is a point.
    out = rel.bootstrap_ci_revenue(_orders(spark, [42.0] * 50)).collect()[0]
    assert out.n_orders == 50 and out.b_reps == 100
    assert out.point_mean == 42.0 == out.boot_mean
    assert out.se == 0.0
    assert out.ci_lo == 42.0 == out.ci_hi


def test_ci_brackets_point_mean(spark):
    vals = [float(10 + (i % 7) * 25) for i in range(200)]
    out = rel.bootstrap_ci_revenue(_orders(spark, vals)).collect()[0]
    assert out.ci_lo < out.point_mean < out.ci_hi
    assert out.ci_lo < out.boot_mean < out.ci_hi
    assert out.se > 0
    # CI half-width should be within a few stderr of the classical one
    import statistics

    classical_se = statistics.pstdev(vals) / (len(vals) ** 0.5)
    assert out.se < 3 * classical_se
