"""Semantic pins for permutation_test_price, effect_sizes_priority,
conformal_interval_price and mutual_info_features."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from cocktailsdb_spark.operators import profiling, relational as rel


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string,"
        " o_totalprice double",
    )


A, B = rel.TTEST_GROUP_A, rel.TTEST_GROUP_B


def test_permutation_separated_groups_significant(spark):
    # A ~ 1000s, B ~ 10s: no permuted labeling should reach the observed
    # gap -> n_extreme == 0, p = 1/(B+1)
    rows = [(i, datetime(1996, 1, 1), A, 1000.0 + i) for i in range(30)]
    rows += [(100 + i, datetime(1996, 1, 1), B, 10.0 + i) for i in range(30)]
    r = rel.permutation_test_price(_orders(spark, rows), b_reps=50).collect()[0]
    assert r.n_a == 30 and r.n_b == 30
    assert r.obs_diff == pytest.approx(990.0, abs=0.5)
    assert r.n_extreme == 0
    assert r.p_value == pytest.approx(1.0 / 51.0, abs=1e-6)


def test_permutation_identical_groups_not_significant(spark):
    # both groups drawn from the same 60 values -> p should be large
    rows = [(i, datetime(1996, 1, 1), A if i % 2 else B, float(i % 30))
            for i in range(120)]
    r = rel.permutation_test_price(_orders(spark, rows), b_reps=100).collect()[0]
    assert r.p_value > 0.2


def test_effect_sizes_textbook(spark):
    # A = [2,4], B = [0,2]: m_a=3, m_b=1, va=vb=2, pooled sd=sqrt(2)
    # d = 2/sqrt(2) = sqrt(2); U: pairs (2>0, 2=2 ties 0.5, 4>0, 4>2)
    # -> U_a = 1 + 0.5 + 1 + 1 = 3.5; cles = 3.5/4; delta = 0.75
    rows = [
        (1, datetime(1996, 1, 1), A, 2.0),
        (2, datetime(1996, 1, 1), A, 4.0),
        (3, datetime(1996, 1, 1), B, 0.0),
        (4, datetime(1996, 1, 1), B, 2.0),
    ]
    r = rel.effect_sizes_priority(_orders(spark, rows)).collect()[0]
    assert r.cohens_d == pytest.approx(math.sqrt(2.0), abs=1e-6)
    assert r.hedges_g == pytest.approx(math.sqrt(2.0) * (1 - 3.0 / 7.0), abs=1e-6)
    assert r.cles == pytest.approx(3.5 / 4.0, abs=1e-6)
    assert r.cliffs_delta == pytest.approx(0.75, abs=1e-6)


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_quantity double,"
        " l_discount double, l_extendedprice double",
    )


def test_conformal_coverage_guarantee(spark):
    # linear-ish data with bounded noise: q_width must cover >= 90% of
    # calibration residuals by construction
    rows = [
        (i, 1, float(i % 10 + 1), 0.05, 100.0 * (i % 10 + 1) + (i % 7) - 3.0)
        for i in range(400)
    ]
    r = rel.conformal_interval_price(_lineitem(spark, rows)).collect()[0]
    assert r.n_train + r.n_cal == 400
    assert r.coverage >= 0.9
    assert r.q_width > 0.0
    # width = noise + ridge-shrinkage bias (lambda = 10n pulls beta_qty
    # toward 0, so residuals carry systematic slope error); bounded by
    # the full response range
    assert r.q_width < 1000.0


def test_conformal_rank_is_exact_order_statistic(spark):
    # tiny calibration set: verify the ceil((n+1)*0.9) rank semantics by
    # recomputing in python
    rows = [
        (i, 1, float(i % 5 + 1), 0.0, 50.0 * (i % 5 + 1) + (i % 11))
        for i in range(200)
    ]
    df = _lineitem(spark, rows)
    r = rel.conformal_interval_price(df).collect()[0]
    # recompute residuals with the returned betas on the calibration half
    from cocktailsdb_spark.operators.text import md5_prefix_value  # noqa
    import pyspark.sql.functions as F

    lane = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / 4294967296.0
    )
    cal = (
        df.withColumn("lane", lane)
        .filter(F.col("lane") >= 0.5)
        .select(
            F.abs(
                F.col("l_extendedprice")
                - (
                    F.lit(r.intercept)
                    + F.lit(r.beta_qty) * F.col("l_quantity")
                    + F.lit(r.beta_discount) * F.col("l_discount")
                )
            ).alias("res")
        )
        .collect()
    )
    res = sorted(x.res for x in cal)
    k = math.ceil((len(res) + 1) * 0.9)
    assert r.n_cal == len(res)
    # betas were qround'd for output, so allow a small tolerance
    assert r.q_width == pytest.approx(res[k - 1], abs=0.01)


def _li_mi(spark, rows):
    return spark.createDataFrame(rows, "l_quantity double, l_discount double")


def test_mutual_info_independent_is_zero(spark):
    # uniform product distribution: MI == 0 exactly (counts identical in
    # every cell)
    rows = [(float(q), d / 10.0) for q in (5.0, 15.0) for d in (0, 1) for _ in range(10)]
    r = profiling.mutual_info_features(_li_mi(spark, rows)).collect()[0]
    assert r.n_cells == 4
    assert r.mi_nats == pytest.approx(0.0, abs=1e-6)
    assert r.h_x == pytest.approx(math.log(2.0), abs=1e-6)
    assert r.nmi == pytest.approx(0.0, abs=1e-6)


def test_mutual_info_deterministic_function_is_entropy(spark):
    # discount = f(quantity bin): MI == H_x == H_y
    rows = [(5.0, 0.0)] * 8 + [(15.0, 0.1)] * 8
    r = profiling.mutual_info_features(_li_mi(spark, rows)).collect()[0]
    assert r.mi_nats == pytest.approx(math.log(2.0), abs=1e-6)
    assert r.nmi == pytest.approx(1.0, abs=1e-6)

def test_permutation_cents_lanes_match_decimal_lanes(spark, sf_dir):
    """Round-11 rewrite pin: the integer-CENTS replicate lanes must be
    BIT-identical, per replicate, to the DECIMAL(38,8) lanes the DuckDB
    oracle still computes (relational.permutation_test_price docstring
    has the exactness argument: 2-dp values recover exactly, Σ|cents|
    < 2^53, and both paths round the same exact rational to nearest
    double)."""
    from pyspark.sql import functions as F

    from cocktailsdb_spark.operators.relational import _dsum38
    from cocktailsdb_spark.operators.text import md5_prefix_value
    from cocktailsdb_spark.tables import load, spread

    orders = load(spark, sf_dir, "orders")
    a = F.col("o_orderpriority") == A
    base = orders.filter(F.col("o_orderpriority").isin(A, B)).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").cast("double").alias("x"),
        a.alias("isa"),
    )
    pa_df = base.agg(
        F.count(F.when(F.col("isa"), 1)).cast("double").alias("na"),
        F.count("*").cast("double").alias("n"),
        F.sum(F.floor(F.col("x") * 100 + F.lit(0.5)).cast("long")).alias(
            "s_cents"
        ),
        F.count("*").alias("c_all"),
    ).select("s_cents", "c_all", (F.col("na") / F.col("n")).alias("pa"))
    n_b = 40
    rep = spread(base).select(
        "okey",
        "x",
        F.floor(F.col("x") * 100 + F.lit(0.5)).cast("long").alias("xc"),
        F.explode(F.sequence(F.lit(0), F.lit(n_b - 1))).alias("b"),
    )
    u = md5_prefix_value(
        F.concat_ws(":", F.col("okey").cast("string"), F.col("b").cast("string")),
        8,
    ).cast("double") / F.lit(4294967296.0)
    drawn = rep.crossJoin(F.broadcast(pa_df)).withColumn("toa", u < F.col("pa"))
    both = (
        drawn.groupBy("b")
        .agg(
            # decimal lanes (the oracle's shape)
            _dsum38(F.when(F.col("toa"), F.col("x"))).alias("sad"),
            _dsum38(F.when(~F.col("toa"), F.col("x"))).alias("sbd"),
            # cents lanes (the round-11 engine shape)
            F.sum(F.when(F.col("toa"), F.col("xc"))).alias("sac"),
            F.count(F.when(F.col("toa"), 1)).alias("ca"),
            F.first("s_cents").alias("s_cents"),
            F.first("c_all").alias("c_all"),
            F.count(F.when(~F.col("toa"), 1)).alias("cb"),
        )
        .collect()
    )
    assert len(both) == n_b
    for r in both:
        dec_stat = r.sad / r.ca - r.sbd / r.cb
        cents_stat = (
            float(r.sac) / 100.0 / r.ca
            - float(r.s_cents - r.sac) / 100.0 / (r.c_all - r.ca)
        )
        assert dec_stat == cents_stat, (r.b, dec_stat, cents_stat)
