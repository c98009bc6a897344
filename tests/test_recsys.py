"""Semantic pins for item_item_recs (operators/recsys.py) — hand-computed
cosines on tiny basket frames, independent of the DuckDB oracle."""

from __future__ import annotations

import math

from cocktailsdb_spark.operators import recsys


def _baskets(spark, baskets):
    rows = [(ok, pk) for ok, parts in baskets for pk in parts]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_cosine_values_and_symmetry(spark):
    # part 1 in 4 baskets, part 2 in 3, together 3 times:
    # cosine = 3/sqrt(4*3) both directions.
    baskets = [
        (10, [1, 2]),
        (11, [1, 2]),
        (12, [1, 2]),
        (13, [1]),
        (14, [3]),
    ]
    out = recsys.item_item_recs(_baskets(spark, baskets), min_support=3, k=3).collect()
    got = {(r.item, r.rec): r for r in out}
    want = math.floor(3 / math.sqrt(12) * 1e6 + 0.5) / 1e6
    assert got[(1, 2)].cosine == want == got[(2, 1)].cosine
    assert got[(1, 2)].support == 3
    # part 3 never co-occurs -> absent from both sides
    assert not any(r.item == 3 or r.rec == 3 for r in out)


def test_topk_rank_and_tiebreak(spark):
    # item 1 co-occurs with 2 (3x) and 3 (3x); all items appear in the
    # same 3 baskets plus enough filler to differentiate norms.
    baskets = [
        (1, [1, 2, 3]),
        (2, [1, 2, 3]),
        (3, [1, 2, 3]),
        (4, [3]),  # n_3 = 4 -> cosine(1,3) < cosine(1,2)
    ]
    out = recsys.item_item_recs(_baskets(spark, baskets), min_support=3, k=1).collect()
    by_item = {r.item: r for r in out}
    assert by_item[1].rec == 2 and by_item[1].rank == 1
    # equal-cosine tie (2's neighbors 1 and... n_1 == n_3? n_1=3, n_3=4) -> 1 wins on cosine
    assert by_item[2].rec == 1
    assert len([r for r in out if r.item == 1]) == 1  # k=1 enforced


def test_min_support_prunes(spark):
    baskets = [(1, [1, 2]), (2, [1, 2]), (3, [4, 5])]
    out = recsys.item_item_recs(_baskets(spark, baskets), min_support=3, k=3).collect()
    assert out == []


def test_user_item_recommendations_scores_and_excludes_owned(spark):
    from cocktailsdb_spark.operators.recsys import user_item_recommendations

    # baskets: items 1,2 co-occur 3x; items 1,3 co-occur 3x; 2,3 co-occur 2x (< min support)
    baskets = [
        (10, [1, 2]),
        (11, [1, 2]),
        (12, [1, 2, 3]),
        (13, [1, 3]),
        (14, [1, 3]),
    ]
    li = _baskets(spark, baskets)
    orders = spark.createDataFrame(
        [(10, 100), (11, 100), (12, 101), (13, 102), (14, 102)],
        "o_orderkey long, o_custkey long",
    )
    out = user_item_recommendations(li, orders, min_support=3, k=3).collect()
    got = {(r.custkey, r.item): r for r in out}
    # customer 100 owns {1,2}: candidate via neighbors of 1 -> {2,3}, of 2 -> {1};
    # after owned-exclusion only 3 remains, scored cosine(1,3)
    import math

    cos13 = math.floor(3 / math.sqrt(5 * 3) * 1e6 + 0.5) / 1e6
    assert got[(100, 3)].rank == 1 and abs(got[(100, 3)].score - cos13) < 1e-9
    assert (100, 1) not in got and (100, 2) not in got
    # customer 102 owns {1,3}: only rec is 2 via neighbor-of-1
    assert got[(102, 2)].rank == 1
    # customer 101 owns {1,2,3}: every candidate is owned -> no rows
    assert not any(r.custkey == 101 for r in out)


def test_recommendation_hitrate_constructed_hit(spark):
    """Items 1,2 co-occur in 3 train baskets; user 100 owns only item 1
    in train and buys item 2 in test -> the model must recommend 2 and
    score a perfect hit for the single evaluated user."""
    import datetime as dt

    from cocktailsdb_spark.operators import recsys

    train_day = dt.date(1997, 1, 1)
    test_day = dt.date(1997, 8, 1)
    orders_rows = [
        (1, 11, train_day), (2, 12, train_day), (3, 13, train_day),
        (4, 100, train_day),          # user 100's train basket
        (5, 100, test_day),           # user 100's test basket
        (6, 11, train_day),           # extra singleton baskets
    ]
    li_rows = [
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 2),               # support(1,2) = 3
        (4, 1),                       # user 100 owns item 1
        (5, 2),                       # user 100 buys item 2 in test
        (6, 3),
    ]
    orders = spark.createDataFrame(
        orders_rows, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    lineitem = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
    out = recsys.recommendation_hitrate(lineitem, orders).collect()[0]
    assert out.n_users_eval == 1
    assert out.n_hits == 1 and out.n_hit_users == 1
    assert out.hit_rate == 1.0


def test_recommendation_hitrate_no_forced_broadcast_on_eval_users(spark):
    """The eval_users frame is user-cardinality (data-sized) — a forced
    broadcast hint on it would blow the broadcast ceiling at 100x scale
    (VERDICT r9 item 3). The plan may STILL pick a broadcast join at this
    tiny size via AQE; what must be absent is the explicit hint on that
    edge. We assert by disabling auto-broadcast: with the hint gone, no
    BroadcastHashJoin may appear on the eval_users join."""
    import datetime as dt

    from cocktailsdb_spark.operators import recsys

    orders = spark.createDataFrame(
        [(1, 10, dt.date(1997, 1, 1)), (2, 10, dt.date(1997, 8, 1))],
        "o_orderkey long, o_custkey long, o_orderdate date",
    )
    lineitem = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2)], "l_orderkey long, l_partkey long"
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = (
            recsys.recommendation_hitrate(lineitem, orders)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    # the only hinted broadcasts left are genuinely bounded frames: the
    # three item-sized tables inside user_item_recommendations (ni, nr,
    # sims) and the 1-row final agg crossJoin; a 4th BHJ would mean the
    # eval_users edge got its hint back
    n_bhj = plan.count("BroadcastHashJoin")
    n_bnl = plan.count("BroadcastNestedLoopJoin")
    assert n_bhj <= 3 and n_bnl <= 1, (
        f"unexpected forced broadcasts: BHJ={n_bhj} BNLJ={n_bnl}\n{plan[:4000]}"
    )
