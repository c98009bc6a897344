"""Physical-plan assertions (SURVEY.md §4): the optimizations we rely on at
100 TB must actually appear in the plan — broadcast joins for dims, filter
and projection pushdown into the parquet scan, no Python UDFs in JVM-only
operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktailsdb_spark.operators import text
from cocktailsdb_spark.plans import poc_analysis
from cocktailsdb_spark.tables import load


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _count_nodes(plan: str, name: str) -> int:
    """Count physical nodes by their "(N) <name>" detail headers — the
    formatted plan prints every node twice (tree + detail section), so a
    raw substring count double-counts."""
    return sum(
        1 for ln in plan.splitlines() if ln.strip().split(") ")[-1] == name
    )


def test_poc_uses_broadcast_joins(spark, sf_dir):
    plan = _plan(poc_analysis.poc_analysis(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the only shuffle is the aggregate, not the dim joins
    assert plan.count("ShuffledHashJoin") + plan.count("SortMergeJoin") <= 1


def test_kmeans_assign_is_narrow_zero_exchange(spark, sf_dir):
    """Nearest-centroid assignment must be a pure narrow map over the scan:
    the bounded centroid set is folded in as a literal, so the plan for N
    rows has NO shuffle exchange, NO join, and NO window — the shape that
    survives 100 TB (cf. the bucketed-join assert in test_layout.py)."""
    from cocktailsdb_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    plan = _plan(similarity.kmeans_assign(emb))
    assert _count_nodes(plan, "Exchange") == 0
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_kmeans_single_exchange_candidate_join(spark, sf_dir):
    from cocktailsdb_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    plan = _plan(similarity.ivf_kmeans_topk(emb, [0, 1, 2], k=3))
    # cell assignment and probe selection are narrow literal expressions;
    # the candidate cell join broadcasts the tiny probe side, so the ONLY
    # shuffle left is the final per-query top-k window
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") == 0
    assert _count_nodes(plan, "Exchange") == 1
    # no Python in the hot path: everything is JVM expressions
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    df = l.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") >= 25)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,25.0)" in plan
    # ReadSchema carries only the two projected columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_text_ops_are_jvm_only(spark, sf_dir):
    plan = _plan(text.quality_score(load(spark, sf_dir, "documents")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_filter_ops_are_jvm_only_and_narrow(spark, sf_dir):
    from cocktailsdb_spark.operators import filters

    docs = load(spark, sf_dir, "documents")
    for op in (filters.pii_redact, filters.hash_split):
        plan = _plan(op(docs))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # pure narrow maps: no shuffle anywhere in the plan
        assert "Exchange" not in plan, op.__name__
    plan = _plan(filters.repetition_stats(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_topk_uses_distributed_heap(spark, sf_dir):
    from cocktailsdb_spark.operators import retrieval

    plan = _plan(retrieval.bm25_rank(load(spark, sf_dir, "documents")))
    # global top-k must be TakeOrderedAndProject (bounded per-partition
    # heap), never a full sort or an unbounded single-partition window
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q6_pushes_full_predicate_to_scan(spark, sf_dir):
    from cocktailsdb_spark.plans import tpch_ext

    plan = _plan(tpch_ext.q6_forecast_revenue(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, f"{frag} not pushed: {pushed}"
    assert "Join" not in plan  # pure scan-filter-aggregate


def test_q3_topk_avoids_global_sort(spark, sf_dir):
    from cocktailsdb_spark.plans import tpch

    plan = _plan(tpch.q3_shipping_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # limit+order fused, no full sort


def test_asof_join_is_single_shuffle(spark, sf_dir):
    from cocktailsdb_spark.operators import events as ev

    import re

    plan = _plan(ev.asof_latest(load(spark, sf_dir, "events")))
    # union + window: exactly one exchange node (user_id), no join operator
    exchanges = [
        ln for ln in plan.splitlines() if re.match(r"\(\d+\) \w*Exchange", ln.strip())
    ]
    assert len(exchanges) == 1, exchanges
    assert "Join" not in plan


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    from cocktailsdb_spark.registry import QUERIES

    plan = _plan(QUERIES["topk_per_group_limit"](spark, sf_dir))
    # rn <= 3 must be pushed into the window operator: each partition keeps
    # a bounded heap instead of ranking every row (full per-key sort)
    assert "WindowGroupLimit" in plan, plan


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    from cocktailsdb_spark.operators import corpus

    plan = _plan(corpus.decontaminate(load(spark, sf_dir, "documents")))
    # the (tiny) benchmark shingle set broadcasts; the training side never
    # shuffles for the join
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # JVM-only end to end


def test_tumbling_partial_aggregation(spark, sf_dir):
    from cocktailsdb_spark.operators import events as ev

    plan = _plan(ev.tumbling_hour(load(spark, sf_dir, "events")))
    # partial+final hash aggregate around one exchange
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_funnel_single_shuffle_no_python(spark, sf_dir):
    from cocktailsdb_spark.operators import events as EV

    plan = _plan(EV.funnel_steps(load(spark, sf_dir, "events")))
    # ONE exchange builds the per-user event arrays; the only other one
    # feeds the final single-row count reduce (formatted plans print each
    # node twice — once in the tree, once as a "(N) Exchange" detail
    # header — so count the headers)
    assert _count_nodes(plan, "Exchange") <= 2  # user shuffle + final 1-row agg
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_snapshot_diff_is_one_join_no_python(spark, sf_dir):
    from cocktailsdb_spark.registry import QUERIES

    df = QUERIES["snapshot_diff_cdc"](spark, str(sf_dir))
    plan = _plan(df)
    n_joins = sum(
        _count_nodes(plan, j)
        for j in ("SortMergeJoin FullOuter", "SortMergeJoin", "ShuffledHashJoin")
    )
    assert n_joins == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_profile_table_is_single_pass_scan(spark, sf_dir):
    from cocktailsdb_spark.operators import profiling as P

    plan = _plan(P.profile_table(load(spark, sf_dir, "customer")))
    # one aggregate over one scan (the exact-distinct Expand replicates
    # rows in-flight, it does not rescan); HLL variant drops the Expand
    n_scans = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Scan parquet" in ln
    )
    assert n_scans == 1
    assert "Expand" in plan
    plan_hll = _plan(P.profile_table(load(spark, sf_dir, "customer"), exact=False))
    assert "Expand" not in plan_hll


def test_fuzzy_match_blocked_join_no_cartesian(spark, sf_dir):
    from cocktailsdb_spark.operators.dedup import edit_distance_pairs

    plan = _plan(edit_distance_pairs(load(spark, sf_dir, "part")))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# --- broadcast-hint policy (plans/hints.py; round-5 judge directive 1) ------


def test_growing_dims_degrade_without_forced_broadcast(spark, sf_dir):
    """With autoBroadcastJoinThreshold=-1, the SF-growing dims
    (customer/part/supplier) must degrade to sort-merge / shuffled-hash
    joins — proving no forced F.broadcast() hint survives on them — while
    the BOUNDED frames (nation/region, the derived stock dim) stay
    broadcast because their hints are explicit and scale-safe."""
    from cocktailsdb_spark.plans import tpch

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # Q5: joins = lineitem⋈orders, ⋈supplier, ⋈customer (growing, no
        # hint → SMJ/SHJ) + ⋈nation, ⋈region (bounded, hinted → BHJ)
        plan = _plan(tpch.q5_local_supplier_volume(spark, sf_dir))
        n_shuffle_joins = _count_nodes(plan, "SortMergeJoin") + _count_nodes(
            plan, "ShuffledHashJoin"
        )
        assert n_shuffle_joins >= 3, plan
        assert _count_nodes(plan, "BroadcastHashJoin") == 2, plan

        # Q3: customer unhinted → no broadcast join anywhere at threshold=-1
        plan3 = _plan(tpch.q3_shipping_priority(spark, sf_dir))
        assert _count_nodes(plan3, "BroadcastHashJoin") == 0, plan3

        # flagship: part/supplier degrade; nation + derived stock dim stay
        plan_poc = _plan(poc_analysis.poc_analysis(spark, sf_dir))
        assert _count_nodes(plan_poc, "BroadcastHashJoin") == 2, plan_poc
        assert (
            _count_nodes(plan_poc, "SortMergeJoin")
            + _count_nodes(plan_poc, "ShuffledHashJoin")
            >= 3
        ), plan_poc
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_growing_dims_still_broadcast_at_bench_scale(spark, sf_dir):
    """Sanity for the other half of the policy: at the DEFAULT threshold the
    unhinted growing dims are still picked up as broadcast joins by the
    planner's size stats, so bench-scale plans are unchanged by the sweep."""
    from cocktailsdb_spark.plans import tpch

    plan = _plan(tpch.q5_local_supplier_volume(spark, sf_dir))
    assert _count_nodes(plan, "SortMergeJoin") + _count_nodes(
        plan, "ShuffledHashJoin"
    ) <= 1, plan  # only lineitem⋈orders may shuffle


def test_maybe_broadcast_policy_unit(spark, sf_dir):
    """Policy table: bounded names get the hint, growing names pass
    through unhinted, names outside the policy table raise."""
    import pytest as _pytest

    from cocktailsdb_spark.plans.hints import maybe_broadcast
    from cocktailsdb_spark.tables import load as _load

    df = _load(spark, sf_dir, "nation")
    hinted = maybe_broadcast(df, "nation")
    assert "hint" in hinted._jdf.queryExecution().logical().toString().lower()
    for growing in ("customer", "part", "supplier", "orders"):
        out = maybe_broadcast(df, growing)
        assert out is df  # identity: no hint node added
    with _pytest.raises(ValueError):
        maybe_broadcast(df, "no_such_table")
