"""Semantic pins for autocorr_daily_revenue and association_rules
(operators/relational.py), hand-computed on tiny frames — independent of
the DuckDB oracle."""

from __future__ import annotations

import math
from datetime import datetime

from cocktailsdb_spark.operators import relational as rel


def _orders(spark, rows):
    return spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")


def _acf_py(xs, k):
    mu = sum(x / 1e6 for x in xs) / len(xs)
    dv = [x / 1e6 - mu for x in xs]
    den = sum(d * d for d in dv)
    num = sum(dv[t] * dv[t - k] for t in range(k, len(dv)))
    return num / den


def test_autocorr_alternating_series(spark):
    # revenue alternates high/low daily -> strong negative lag-1,
    # strong positive lag-2. Magnitudes are realistic daily revenues:
    # the operator's 1e-6 downscale + DECIMAL(24,8) product sums assume
    # revenue-scale inputs (docstring) — micro-revenues would quantize
    # deviation products to zero.
    xs = [x * 1e6 for x in (100.0, 10.0, 110.0, 12.0, 105.0, 8.0, 102.0, 11.0, 99.0, 9.0)]
    rows = [
        (datetime(2024, 1, d + 1), xs[d]) for d in range(len(xs))
    ]
    out = {r.lag: r for r in rel.autocorr_daily_revenue(_orders(spark, rows), 3).collect()}
    assert out[1].n_days == len(xs)
    for k in (1, 2, 3):
        want = _acf_py(xs, k)
        assert abs(out[k].acf - want) <= 1e-6, (k, out[k].acf, want)
    assert out[1].acf < -0.8 and out[2].acf > 0.8


def test_autocorr_sums_within_day(spark):
    # two orders on one day must aggregate before the lag structure
    rows = [
        (datetime(2024, 1, 1, 3), 50e6),
        (datetime(2024, 1, 1, 20), 50e6),
        (datetime(2024, 1, 2), 10e6),
        (datetime(2024, 1, 3), 100e6),
        (datetime(2024, 1, 4), 10e6),
    ]
    out = {r.lag: r for r in rel.autocorr_daily_revenue(_orders(spark, rows), 1).collect()}
    assert out[1].n_days == 4
    want = _acf_py([100e6, 10e6, 100e6, 10e6], 1)
    assert abs(out[1].acf - want) <= 1e-6


def _baskets(spark, baskets):
    rows = [(ok, pk) for ok, parts in baskets for pk in parts]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_association_rules_confidence_direction(spark):
    # part 1 appears in 4 baskets, part 2 in 3, together in 3:
    # conf(2->1)=1.0, conf(1->2)=0.75; lift symmetric = 3/(4*3/5)... n=5
    baskets = [
        (10, [1, 2]),
        (11, [1, 2]),
        (12, [1, 2]),
        (13, [1]),
        (14, [3]),
    ]
    out = {
        (r.antecedent, r.consequent): r
        for r in rel.association_rules(_baskets(spark, baskets), 3, 10).collect()
    }
    assert out[(2, 1)].confidence == 1.0
    assert out[(1, 2)].confidence == 0.75
    assert out[(1, 2)].support == out[(2, 1)].support == 3
    lift = (3 / 4) / (3 / 5)
    assert out[(1, 2)].lift == math.floor(lift * 1e4 + 0.5) / 1e4
    assert out[(2, 1)].lift == out[(1, 2)].lift  # symmetric
    # below min_support pairs never appear
    assert (1, 3) not in out and (3, 1) not in out


def test_association_rules_dedups_within_basket(spark):
    # duplicate (order, part) lines count once
    baskets = [(1, [7, 7, 8]), (2, [7, 8]), (3, [7, 8]), (4, [8])]
    out = {
        (r.antecedent, r.consequent): r
        for r in rel.association_rules(_baskets(spark, baskets), 3, 10).collect()
    }
    assert out[(7, 8)].support == 3
    assert out[(7, 8)].confidence == 1.0


def test_weekday_seasonality_index(spark):
    # Jan 1 2024 is a Monday. Mondays earn 2x the flat baseline.
    rows = []
    for d in range(1, 15):  # two full weeks
        day = datetime(2024, 1, d)
        rev = 200e6 if day.isoweekday() == 1 else 100e6
        rows.append((day, rev))
    out = {r.weekday: r for r in rel.weekday_seasonality(_orders(spark, rows)).collect()}
    assert set(out) == set(range(1, 8))
    assert all(r.n_days == 2 for r in out.values())
    overall = (2 * 200e6 + 12 * 100e6) / 14
    assert abs(out[1].seasonality_index - 200e6 / overall) <= 1e-6
    assert abs(out[3].seasonality_index - 100e6 / overall) <= 1e-6
    assert out[1].mean_revenue == 200e6


def test_segment_percentiles_disc_semantics(spark):
    orders = spark.createDataFrame(
        [(c, float(v)) for c, v in [(1, 10), (1, 20), (1, 30), (1, 40), (2, 5)]],
        "o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(1, "A"), (2, "B")], "c_custkey long, c_mktsegment string"
    )
    collected = rel.segment_percentiles(orders, customer).collect()
    out = {(r.c_mktsegment, r.pct): r.value for r in collected}
    # segment A: values 10,20,30,40 -> ceil(q*4)-th smallest
    assert out[("A", 0.25)] == 10.0   # ceil(1.0) = 1st
    assert out[("A", 0.5)] == 20.0
    assert out[("A", 0.75)] == 30.0
    assert out[("A", 0.9)] == 40.0    # ceil(3.6) = 4th
    assert out[("B", 0.5)] == 5.0
    # coinciding-target contract (r14 one-pass rewrite): segment B has
    # n=1 so EVERY q's target rank is 1 — one output row per q must
    # still be emitted, exactly as the per-q union form did
    b_pcts = sorted(r.pct for r in collected if r.c_mktsegment == "B")
    assert b_pcts == sorted(rel.SEGMENT_PCTS)
    assert len(collected) == 2 * len(rel.SEGMENT_PCTS)


def test_weekday_adjusted_anomalies_flags_only_true_outlier(spark):
    # 4 weeks of flat weekday-cyclic revenue, then one Monday spikes.
    # An unadjusted z-score would flag every Monday; adjusted flags one.
    rows = []
    for d in range(1, 29):  # Jan 2024; Jan 1 is a Monday
        day = datetime(2024, 1, d)
        base = 200e6 if day.isoweekday() == 1 else 100e6
        rows.append((day, base))
    rows.append((datetime(2024, 1, 29), 500e6))  # 5th Monday: spike
    out = rel.weekday_adjusted_anomalies(_orders(spark, rows)).collect()
    days = [r.day for r in out]
    assert "2024-01-29" in days
    # the regular Mondays are NOT flagged
    assert "2024-01-08" not in days and "2024-01-15" not in days
