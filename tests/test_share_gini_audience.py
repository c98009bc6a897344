"""Semantic pins for share_of_total, gini_revenue (operators/relational.py)
and audience_overlap / engagement_histogram (operators/events.py)."""

from __future__ import annotations

from datetime import datetime

from cocktailsdb_spark.operators import events as ev
from cocktailsdb_spark.operators import relational as rel


def test_share_of_total_shares_and_ranks(spark):
    orders = spark.createDataFrame(
        [(1, 100.0), (1, 100.0), (2, 300.0), (3, 500.0)],
        "o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 12)], "c_custkey long, c_nationkey int"
    )
    nation = spark.createDataFrame(
        [(10, "alpha", 1), (11, "beta", 1), (12, "gamma", 2)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(1, "east"), (2, "west")], "r_regionkey int, r_name string"
    )
    out = {
        (r.region_name, r.nation_name): r
        for r in rel.share_of_total(orders, customer, nation, region).collect()
    }
    east_total = 200.0 + 300.0
    assert out[("east", "beta")].share_in_region == round(300.0 / east_total, 6)
    assert out[("east", "beta")].rank_in_region == 1
    assert out[("east", "alpha")].rank_in_region == 2
    assert out[("west", "gamma")].share_in_region == 1.0


def test_gini_zero_for_equal_and_known_value(spark):
    eq = spark.createDataFrame(
        [(c, 2e6) for c in range(1, 5)], "o_custkey long, o_totalprice double"
    )
    row = rel.gini_revenue(eq).collect()[0]
    assert row.n_customers == 4 and row.gini == 0.0
    # revenues 1,2,3,4 (x 1e6): G = 2*30/(4*10) - 5/4 = 0.25
    lin = spark.createDataFrame(
        [(c, c * 1e6) for c in range(1, 5)], "o_custkey long, o_totalprice double"
    )
    row = rel.gini_revenue(lin).collect()[0]
    assert abs(row.gini - 0.25) <= 1e-6
    assert row.total_revenue == 10e6


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


T = datetime(2024, 1, 1)


def test_audience_overlap_jaccard(spark):
    rows = [
        (1, T, 1, "click"), (2, T, 2, "click"), (3, T, 3, "click"),
        (4, T, 1, "view"), (5, T, 2, "view"),
        (6, T, 9, "purchase"),
        (7, T, 1, "click"),  # duplicate pair must not double count
    ]
    out = {
        (r.type_a, r.type_b): r for r in ev.audience_overlap(_events(spark, rows)).collect()
    }
    r = out[("click", "view")]
    assert (r.n_a, r.n_b, r.n_both) == (3, 2, 2)
    assert r.jaccard == round(2 / 3, 6)
    # disjoint audiences produce no row (inner pair join)
    assert ("click", "purchase") not in out


def test_engagement_histogram_bands_and_cumshare(spark):
    # user 1: 1 event (band 0); user 2: 2 (band 1); user 3: 5 (band 2)
    rows = [(i, T, 1, "click") for i in range(1)]
    rows += [(10 + i, T, 2, "click") for i in range(2)]
    rows += [(20 + i, T, 3, "click") for i in range(5)]
    out = {r.band: r for r in ev.engagement_histogram(_events(spark, rows)).collect()}
    assert out[0].n_users == 1 and out[0].n_events == 1
    assert out[1].n_users == 1 and out[1].n_events == 2
    assert out[2].n_users == 1 and out[2].n_events == 5
    assert out[2].cum_share_from_top == round(5 / 8, 6)
    assert out[0].cum_share_from_top == 1.0


def test_ab_test_wilson_known_values(spark):
    # variant 0: users 2,4 -> user 2 converts (1/2); variant 1: users 1,3,5
    # -> users 1,5 convert (2/3)
    rows = [
        (1, T, 1, "purchase"), (2, T, 2, "purchase"), (3, T, 3, "click"),
        (4, T, 4, "view"), (5, T, 5, "purchase"), (6, T, 2, "click"),
    ]
    out = {r.variant: r for r in ev.ab_test_wilson(_events(spark, rows)).collect()}
    import math

    def wilson(x, n, z=1.96):
        p = x / n
        denom = 1.0 + z * z / n
        center = (p + z * z / (2.0 * n)) / denom
        half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n)) / denom
        return center - half, center + half

    assert (out[0].n_users, out[0].n_converted) == (2, 1)
    assert (out[1].n_users, out[1].n_converted) == (3, 2)
    lo, hi = wilson(1, 2)
    assert abs(out[0].wilson_low - lo) <= 1e-6 and abs(out[0].wilson_high - hi) <= 1e-6
    assert 0.0 <= out[0].wilson_low <= out[0].rate <= out[0].wilson_high <= 1.0


def test_shipping_latency_histogram(spark):
    orders = spark.createDataFrame(
        [(1, datetime(2024, 1, 1)), (2, datetime(2024, 1, 10))],
        "o_orderkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 3)), (1, 2, datetime(2024, 1, 8)),
         (2, 1, datetime(2024, 1, 12)), (2, 2, datetime(2024, 1, 12))],
        "l_orderkey long, l_linenumber int, l_shipdate timestamp",
    )
    out = {r.latency_days: r for r in rel.shipping_latency_profile(orders, lineitem).collect()}
    assert out[2].n == 3  # two from order 2 (+2d), one from order 1 (+2d)
    assert out[7].n == 1
    assert out[2].share == 0.75 and out[2].cum_share == 0.75
    assert out[7].cum_share == 1.0


def test_decayed_engagement_recency_beats_volume(spark):
    import math
    from datetime import timedelta

    ref = datetime(2024, 2, 1)  # DECAY_REF_EPOCH
    # user 1: 10 events 30 days old; user 2: 2 events 1 day old
    rows = [(i, ref - timedelta(days=30), 1, "click") for i in range(10)]
    rows += [(100 + i, ref - timedelta(days=1), 2, "click") for i in range(2)]
    out = {r.user_id: r for r in ev.decayed_engagement(_events(spark, rows)).collect()}
    w_old = math.exp(-0.1 * 30)
    w_new = math.exp(-0.1 * 1)
    assert abs(out[1].decay_score - 10 * w_old) <= 1e-5
    assert abs(out[2].decay_score - 2 * w_new) <= 1e-5
    # 2 recent events outweigh 10 month-old ones at lambda=0.1/day
    assert out[2].decay_score > out[1].decay_score


def test_band_join_cross_bucket_and_boundary(spark):
    customer = spark.createDataFrame(
        [(1, "SEG", 19.0), (2, "SEG", 100.0), (3, "OTH", 25.0)],
        "c_custkey long, c_mktsegment string, c_acctbal double",
    )
    supplier = spark.createDataFrame(
        [(10, 21.0),   # cross-bucket match to 19.0 (gap 2) and 25.0 (gap 4)
         (11, 29.0),   # gap 10 to 19.0 -> EXCLUDED (strict <); gap 4 to 25
         (12, 500.0)],
        "s_suppkey long, s_acctbal double",
    )
    out = {r.c_mktsegment: r for r in rel.band_join_acctbal(customer, supplier, 10.0).collect()}
    assert out["SEG"].n_pairs == 1  # only (19.0, 21.0); 29-19=10 excluded
    assert out["SEG"].mean_gap == 2.0
    assert out["OTH"].n_pairs == 2  # 25 vs 21 and 25 vs 29
    assert out["OTH"].mean_gap == 4.0
