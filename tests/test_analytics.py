"""Semantic pins for the event-analytics operators (funnel / cohort
retention / rolling z-score), hand-computed and independent of the
DuckDB oracles."""

from __future__ import annotations

import math
from datetime import datetime

from cocktailsdb_spark.operators import events as EV
from cocktailsdb_spark.operators import relational as R


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_funnel_strict_sequencing(spark):
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    e = _events(
        spark,
        [
            # user 1: full funnel in order
            (1, t(1), 1, "view"), (2, t(2), 1, "click"), (3, t(3), 1, "purchase"),
            # user 2: click BEFORE view → stops at view
            (4, t(5), 2, "click"), (5, t(6), 2, "view"),
            # user 3: click at the SAME instant as view → strict >, not counted
            (6, t(7), 3, "view"), (7, t(7), 3, "click"),
            # user 4: purchase only → no view, counted nowhere
            (8, t(9), 4, "purchase"),
            # user 5: view, then purchase before click → stops at click=absent
            (9, t(10), 5, "view"), (10, t(11), 5, "purchase"),
        ],
    )
    out = {r.step: r for r in EV.funnel_steps(e).collect()}
    assert out["view"].n_users == 4  # users 1, 2, 3, 5
    assert out["click"].n_users == 1  # user 1 only
    assert out["purchase"].n_users == 1
    assert [out[s].step_index for s in ("view", "click", "purchase")] == [1, 2, 3]


def test_funnel_earliest_qualifying_event(spark):
    # the SECOND view is the one that lets the click qualify only if we
    # anchor on the EARLIEST view; verify we do (min per step, not max)
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    e = _events(
        spark,
        [(1, t(1), 1, "view"), (2, t(5), 1, "view"), (3, t(3), 1, "click")],
    )
    out = {r.step: r.n_users for r in EV.funnel_steps(e).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 0}


def test_cohort_retention_offsets(spark):
    d = lambda day, h: datetime(2024, 1, day, h)
    e = _events(
        spark,
        [
            (1, d(1, 9), 1, "view"), (2, d(1, 17), 1, "click"),  # same day ×2
            (3, d(3, 9), 1, "view"),  # offset 2
            (4, d(2, 9), 2, "view"), (5, d(3, 9), 2, "view"),  # cohort Jan 2
        ],
    )
    out = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in EV.cohort_retention(e).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
    }


def test_rolling_zscore_hand_computed(spark):
    rows = [
        (i, datetime(2024, 1, 1 + i).date(), 100.0 + 10.0 * i) for i in range(4)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = {r.day: r for r in R.rolling_zscore(orders).collect()}
    assert out["2024-01-01"].zscore is None and out["2024-01-01"].n_prior == 0
    assert out["2024-01-02"].zscore is None and out["2024-01-02"].n_prior == 1
    # day 3: prior = [100, 110] → mean 105, sample std ≈ 7.0711, z ≈ 2.1213
    s = math.sqrt(((2 * (100**2 + 110**2)) - 210**2) / 2)
    exp = math.floor((120 - 105) / s * 1e4 + 0.5) / 1e4
    assert out["2024-01-03"].n_prior == 2 and out["2024-01-03"].zscore == exp
    assert out["2024-01-04"].n_prior == 3


def test_rolling_zscore_resets_at_year_boundary(spark):
    rows = [(1, datetime(2023, 12, 30).date(), 50.0),
            (2, datetime(2023, 12, 31).date(), 60.0),
            (3, datetime(2024, 1, 1).date(), 70.0)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = {r.day: r for r in R.rolling_zscore(orders).collect()}
    # new year partition: no trailing baseline crosses the boundary
    assert out["2024-01-01"].n_prior == 0 and out["2024-01-01"].zscore is None


def test_incremental_agg_merge_equals_full_recompute(spark):
    from datetime import datetime

    rows = [
        (i, datetime(1996 + (i % 2), 6, 1 + i % 3).date(), 100.25 * (i + 1))
        for i in range(30)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    merged = {
        (r.day): (r.revenue, r.n_orders)
        for r in R.incremental_agg_merge(orders, cutoff="1997-01-01").collect()
    }
    full = {}
    for _, d, p in rows:
        day = d.strftime("%Y-%m-%d")
        rev, n = full.get(day, (0.0, 0))
        full[day] = (rev + p, n + 1)
    assert set(merged) == set(full)
    for day, (rev, n) in full.items():
        assert merged[day][1] == n
        assert abs(merged[day][0] - rev) < 1e-6
    # the batch side is non-empty (cutoff actually splits the data)
    assert any(day >= "1997-01-01" for day in full) and any(
        day < "1997-01-01" for day in full
    )


def test_event_transitions_counts_and_probs(spark):
    import datetime as dt

    from cocktailsdb_spark.operators.events import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a ; user 2: a -> b
        (1, t0, 1, "a", 0.0, "{}"),
        (2, t0.replace(minute=1), 1, "b", 0.0, "{}"),
        (3, t0.replace(minute=2), 1, "a", 0.0, "{}"),
        (4, t0, 2, "a", 0.0, "{}"),
        (5, t0.replace(minute=1), 2, "b", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"]) for r in event_transitions(ev).collect()}
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_activity_streaks_islands(spark):
    rows = (
        # user 1: days 1-3, then 5-6, then 10 -> longest = 3 (Jan 1-3)
        [(1, datetime(2024, 1, d, 9)) for d in (1, 2, 3, 5, 6, 10)]
        # duplicate events on one day must not inflate the streak
        + [(1, datetime(2024, 1, 2, 15))]
        # user 2: two 2-day streaks -> earliest (Jan 1-2) wins the tie
        + [(2, datetime(2024, 1, d, 9)) for d in (1, 2, 8, 9)]
    )
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.user_id: r for r in EV.activity_streaks(ev).collect()}
    assert got[1].streak_days == 3
    assert (got[1].start_day, got[1].end_day) == ("2024-01-01", "2024-01-03")
    assert got[2].streak_days == 2
    assert (got[2].start_day, got[2].end_day) == ("2024-01-01", "2024-01-02")


def test_embedding_stats_known_vector(spark):
    from cocktailsdb_spark.operators.similarity import embedding_stats

    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [-1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in embedding_stats(emb).collect()}
    assert got[1].dim == 2 and got[1].l2_norm == 5.0
    assert got[1].mean_component == 3.5 and got[1].max_component == 4.0
    assert got[2].l2_norm == 1.0 and got[2].max_component == 0.0
    assert got[2].mean_component == -0.25


def test_winsorized_stats_clips_outlier(spark):
    # group of 20: values 1..19 plus a 1000 outlier. p05 idx = floor(.05*19)+1
    # = 1 (min), p95 idx = floor(.95*19)+1 = 19 -> value 19, so the outlier
    # clips to 19 and the winsorized mean is (sum(1..19)+19)/20 = 10.45
    rows = [(i, "P", float(i)) for i in range(1, 20)] + [(20, "P", 1000.0)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    r = R.winsorized_stats(df).collect()[0]
    assert r.n == 20 and r.p_lo == 1.0 and r.p_hi == 19.0
    assert abs(r.win_mean - 10.45) < 1e-9
    # raw mean would be 58.5 — winsorization must have removed the outlier
    assert r.win_std < 10


def test_top_event_paths_order_and_truncation(spark):
    import datetime as dt

    from cocktailsdb_spark.operators import events as E

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = (
        # user 1: 7 events in one day -> path truncated to first 5
        [(i, t(i), 1, c, 1.0, None) for i, c in enumerate("abcdefg")]
        # users 2,3: identical 2-step journeys -> count 2
        + [(10, t(1), 2, "x", 1.0, None), (11, t(2), 2, "y", 1.0, None)]
        + [(12, t(1), 3, "x", 1.0, None), (13, t(2), 3, "y", 1.0, None)]
    )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.path: r.n_journeys for r in E.top_event_paths(ev).collect()}
    assert out == {"x>y": 2, "a>b>c>d>e": 1}


def test_daily_user_accounting_new_vs_returning(spark):
    import datetime as dt

    from cocktailsdb_spark.operators import events as E

    d = lambda day, h: dt.datetime(2024, 1, day, h)
    rows = [
        (1, d(1, 1), 10, "a", 1.0, None),
        (2, d(1, 2), 10, "a", 1.0, None),   # same user same day: 1 active
        (3, d(1, 3), 20, "a", 1.0, None),
        (4, d(2, 1), 10, "a", 1.0, None),   # returning
        (5, d(2, 2), 30, "a", 1.0, None),   # new
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.day: r for r in E.daily_user_accounting(ev).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert (d1.active_users, d1.new_users, d1.returning_users, d1.cumulative_unique) == (2, 2, 0, 2)
    assert (d2.active_users, d2.new_users, d2.returning_users, d2.cumulative_unique) == (2, 1, 1, 3)


def test_variant_props_malformed_and_null(spark):
    import datetime as dt

    from cocktailsdb_spark.operators import events as E

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"k": 7}'),
        (2, dt.datetime(2024, 1, 1), 1, "a", 1.0, "not json {{{"),
        (3, dt.datetime(2024, 1, 1), 1, "a", 1.0, None),
        (4, dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"other": 1}'),
        # well-formed JSON, wrong-typed k: must degrade to NULL, not crash
        (5, dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"k": "abc"}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = E.variant_props_agg(ev).collect()[0]
    # only the one well-formed row with a k field counts
    assert (r.n_with_k, r.sum_k, r.max_k) == (1, 7, 7)


def test_concurrent_sessions_sweep_line(spark):
    import datetime as dt

    from cocktailsdb_spark.operators import events as E

    t = lambda d, h, m=0: dt.datetime(2024, 1, d, h, m)
    # session gap is 30 min, so events 20 min apart stay in one session.
    # u1: 01:00-01:40; u2: 01:30-01:50 overlaps u1 -> peak 2 on day 1
    # u3: 23:50 day1 .. 00:10 day2 -> spans midnight: open_at_start(day2)=1
    rows = [
        (1, t(1, 1), 1, "a", 1.0, None), (2, t(1, 1, 20), 1, "a", 1.0, None),
        (3, t(1, 1, 40), 1, "a", 1.0, None),
        (4, t(1, 1, 30), 2, "a", 1.0, None), (5, t(1, 1, 50), 2, "a", 1.0, None),
        (6, t(1, 23, 50), 3, "a", 1.0, None), (7, t(2, 0, 10), 3, "a", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.day: r for r in E.concurrent_sessions_daily(ev).collect()}
    assert out["2024-01-01"].day_peak == 2
    assert out["2024-01-01"].open_at_start == 0
    assert out["2024-01-02"].open_at_start == 1   # u3 still open at midnight
    assert out["2024-01-02"].day_peak == 1


# --- conversion_lag_profile --------------------------------------------------


def test_conversion_lag_profile_exact_ranks(spark):
    from datetime import datetime

    from cocktailsdb_spark.operators.events import conversion_lag_profile

    def ev(eid, ts, uid, typ):
        return (eid, ts, uid, typ)

    rows = [
        # user 1: signup at t0, purchase 10s later
        ev(1, datetime(2024, 1, 1, 0, 0, 0), 1, "signup"),
        ev(2, datetime(2024, 1, 1, 0, 0, 10), 1, "purchase"),
        # user 2: signup, purchase 20s later (an earlier purchase BEFORE
        # signup must be ignored)
        ev(3, datetime(2024, 1, 1, 0, 0, 5), 2, "purchase"),
        ev(4, datetime(2024, 1, 1, 0, 1, 0), 2, "signup"),
        ev(5, datetime(2024, 1, 1, 0, 1, 20), 2, "purchase"),
        # user 3: signup, purchase 40s later
        ev(6, datetime(2024, 1, 1, 0, 2, 0), 3, "signup"),
        ev(7, datetime(2024, 1, 1, 0, 2, 40), 3, "purchase"),
        # user 4: signup, never purchases
        ev(8, datetime(2024, 1, 1, 0, 3, 0), 4, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = conversion_lag_profile(df).collect()[0]
    assert out.n_signup_users == 4 and out.n_converted == 3
    assert abs(out.conversion_rate - 0.75) <= 1e-6
    # lags sorted: [10, 20, 40]; nearest-rank picks: p25->rk1, p50->rk2,
    # p75->rk3, p90->rk3
    assert out.p25_sec == 10.0
    assert out.p50_sec == 20.0
    assert out.p75_sec == 40.0 and out.p90_sec == 40.0


def test_abandoned_views_daily_window_semantics(spark):
    from datetime import datetime

    from cocktailsdb_spark.operators.events import abandoned_views_daily

    rows = [
        # user 1: view converted 30 min later -> not abandoned
        (1, datetime(2024, 1, 1, 10, 0), 1, "view"),
        (2, datetime(2024, 1, 1, 10, 30), 1, "purchase"),
        # user 1: second view; purchase 2h later is OUTSIDE the window
        (3, datetime(2024, 1, 2, 10, 0), 1, "view"),
        (4, datetime(2024, 1, 2, 12, 0), 1, "purchase"),
        # user 2: view, purchase BEFORE it doesn't count
        (5, datetime(2024, 1, 1, 9, 0), 2, "purchase"),
        (6, datetime(2024, 1, 1, 11, 0), 2, "view"),
        # user 3: purchase exactly AT the window edge counts as converted
        (7, datetime(2024, 1, 2, 8, 0), 3, "view"),
        (8, datetime(2024, 1, 2, 9, 0), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.day: r for r in abandoned_views_daily(df).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert d1.n_views == 2 and d1.n_abandoned == 1  # user 2's view
    assert d2.n_views == 2 and d2.n_abandoned == 1  # user 1's 2nd view
    assert abs(d1.abandonment_rate - 0.5) <= 1e-6


def test_markov_prediction_accuracy_majority_and_overall(spark):
    from datetime import datetime

    from cocktailsdb_spark.operators.events import markov_prediction_accuracy

    # user 1 stream: A B A B A  -> transitions A->B ×2, B->A ×2
    # user 2 stream: A B B      -> A->B, B->B
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, seq in ((1, "ABABA"), (2, "ABB")):
        for i, s in enumerate(seq):
            rows.append((eid, datetime(2024, 1, 1, i), uid, s))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.from_type: r for r in markov_prediction_accuracy(df).collect()}
    # A -> B is 3/3; B -> {A:2, B:1} -> predict A, 2/3 correct
    assert out["A"].predicted == "B" and out["A"].accuracy == 1.0
    assert out["B"].predicted == "A"
    assert out["B"].n_transitions == 3 and out["B"].n_correct == 2
    assert out["*"].n_transitions == 6 and out["*"].n_correct == 5


def test_error_budget_burn_multiwindow_gate(spark):
    from datetime import datetime

    from cocktailsdb_spark.operators.events import error_budget_burn

    # hours 0-5: healthy (10% errors). hour 6: 100% errors but the 6h
    # window still dilutes it; hour 7-9 sustained 100% errors -> the
    # long window crosses 25% and the alert fires.
    rows = []
    eid = 0
    for h in range(10):
        err = 10 if h >= 6 else 1
        for i in range(10):
            typ = "error" if i < err else "click"
            rows.append((eid, datetime(2024, 1, 1, h, i), 1, typ))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = error_budget_burn(df).collect()
    hours = [r.hour for r in out]
    # hour 6: rate_6h = (1*5+10)/60 = 0.25 -> burn_6h == 1.0, NOT > 1 -> no alert
    assert "2024-01-01 06:00" not in hours
    # hour 7 onward: rate_6h climbs past target -> alert
    assert "2024-01-01 07:00" in hours and "2024-01-01 09:00" in hours
    r7 = next(r for r in out if r.hour == "2024-01-01 07:00")
    assert r7.burn_1h == 4.0  # 100% errors vs 25% target


def test_dp_noisy_counts_bounded_noise_and_determinism(spark):
    from datetime import datetime

    from cocktailsdb_spark.operators.filters import dp_noisy_counts

    rows = [(i, datetime(1997, 1, 1 + i % 20), "1-URGENT") for i in range(40)] + [
        (100 + i, datetime(1998, 3, 1 + i % 5), "5-LOW") for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_orderpriority string"
    )
    out1 = dp_noisy_counts(df).collect()
    out2 = dp_noisy_counts(df).collect()
    assert out1 == out2  # deterministic release
    got = {(r.priority, r.year): r for r in out1}
    assert got[("1-URGENT", 1997)].true_count == 40
    assert got[("5-LOW", 1998)].true_count == 10
    for r in out1:
        noise = r.released_count - r.true_count
        assert noise != 0.0  # noise was actually added
        # |noise| ~ Exp-tail: P(|n| > 12) = e^-12 -- impossible in 2 draws
        assert abs(noise) < 12.0


def test_weighted_percentiles_by_brand_hand_case(spark):
    from cocktailsdb_spark.operators.relational import weighted_percentiles_by_brand

    # brand B: prices 10 (w=1), 20 (w=8), 30 (w=1). W=10.
    # p25 -> cw>=2.5 first at price 20; p50 -> 20; p90 -> cw>=9 at 20
    # (cw=9 exactly at the end of 20's run); price 30 only beyond 9.
    li = spark.createDataFrame(
        [(1, 10.0, 1.0), (1, 20.0, 8.0), (1, 30.0, 1.0)],
        "l_partkey long, l_extendedprice double, l_quantity double",
    )
    part = spark.createDataFrame([(1, "B")], "p_partkey long, p_brand string")
    out = {r.pct: r for r in weighted_percentiles_by_brand(li, part).collect()}
    assert out[0.25].value == 20.0
    assert out[0.5].value == 20.0
    assert out[0.9].value == 20.0
    assert out[0.5].total_weight == 10.0


def test_new_vs_returning_monthly(spark):
    from datetime import datetime

    from cocktailsdb_spark.operators.relational import new_vs_returning_monthly

    rows = [
        (1, datetime(2024, 1, 3)),
        (1, datetime(2024, 1, 20)),  # same month, counts once
        (1, datetime(2024, 2, 1)),   # returning
        (2, datetime(2024, 2, 5)),   # new in Feb
    ]
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")
    out = {r.month: r for r in new_vs_returning_monthly(df).collect()}
    assert out["2024-01"].new_customers == 1 and out["2024-01"].returning_customers == 0
    feb = out["2024-02"]
    assert feb.new_customers == 1 and feb.returning_customers == 1
    assert abs(feb.new_share - 0.5) <= 1e-6


def test_pareto_customers_by_region_crossing(spark):
    from datetime import datetime

    from cocktailsdb_spark.operators.relational import pareto_customers_by_region

    # region R: revenues 50, 30, 15, 5 (total 100). cum: 50, 80, 95, 100.
    # 80% crossing at rank 2 -> n_top = 2, fraction 0.5.
    orders = spark.createDataFrame(
        [
            (1, datetime(2000, 1, 1), 50.0),
            (2, datetime(2000, 1, 1), 30.0),
            (3, datetime(2000, 1, 1), 15.0),
            (4, datetime(2000, 1, 1), 5.0),
        ],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(i, 10) for i in (1, 2, 3, 4)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame([(10, "N", 20)], "n_nationkey long, n_name string, n_regionkey long")
    region = spark.createDataFrame([(20, "R")], "r_regionkey long, r_name string")
    out = pareto_customers_by_region(orders, customer, nation, region).collect()
    assert len(out) == 1
    r = out[0]
    assert r.region == "R" and r.n_customers == 4
    assert r.n_top == 2 and abs(r.top_fraction - 0.5) <= 1e-6
    assert r.total_revenue == 100.0
