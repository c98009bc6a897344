"""Physical-plan audit: dump the formatted plan of each headline query plus
the scale-relevant properties the engine is designed around (pushed filters,
broadcast joins, exchange counts, Python stages, whole-stage codegen spans).

Writes PLANS.md at the repo root — the reviewable artifact behind the
assertions in tests/test_plans.py. Run after plan-affecting changes:

    python tools/plan_audit.py [--sf /root/testdata/sf0.01] [--only a,b]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from cocktailsdb_spark.session import get_spark  # noqa: E402

# the queries whose plan shape carries the 100 TB story
AUDIT = [
    "poc_analysis",
    "tpch_q1_pricing",
    "tpch_q3_shipping_priority",
    "partition_pruned_load",
    "bucketed_join_revenue",
    "salted_groupby",
    "asof_join_signup",
    "sessionize_events",
    "exact_dedup_hash",
    "simhash_near_dup",
    "ngram_jaccard_prefix",
    "embedding_topk_ivf",
    "embedding_topk_ivf_kmeans",
    "kmeans_assign_centroid",
    "decontaminate_ngrams",
    "bm25_rank_query",
    "funnel_conversion",
    "snapshot_diff_cdc",
    "multimodal_features",
    # round-5 additions
    "boilerplate_ngrams",
    "boilerplate_coverage",
    "semantic_dedup",
    "embedding_topk_sq",
    "embedding_topk_pq",
    "bloom_filtered_join",
    # round-5 late additions
    "gapfill_daily_revenue",
    "skyline_parts",
    "triangle_count",
    "cusum_changepoint",
    "join_skew_report",
    "activity_streaks",
    "embedding_stats",
    # round-5 session-2 additions
    "graph_bfs_levels",
    "ccnet_quality_buckets",
    "pmi_collocations",
    "winsorized_stats",
    "encoding_runs_report",
    "source_cap_firstn",
    "asof_join_next",
    "incremental_join_mv",
    "mad_outlier_report",
    "hll_sketch_rollup",
    "corpus_drift_kl",
    "python_datasource_read",
    "gapfill_interpolate",
    "quantile_two_pass",
    "weighted_sample_topn",
    "spearman_rank_corr",
    "top_event_paths",
    # round-9 scale-path + analytics additions
    "segment_percentiles_scaled",
    "weighted_percentiles_by_brand_scaled",
    "geo_knn_recall_at_k",
    "ipw_treatment_effect",
    "theil_sen_trend",
    "wasserstein_price_drift",
    "keyword_tagging",
    "bigram_cross_entropy",
    "nelson_aalen_hazard",
    "attribution_shapley",
    "fd_violations",
    # round-8 scale-path additions
    "pack_sequences_sharded",
    "rfm_segments_scaled",
    "winsorized_stats_scaled",
    "spearman_rank_corr_scaled",
    "ann_index_upsert_probe",
    "neardup_incremental_pairs",
    "daily_user_accounting",
    "embedding_dim_ablation",
    "range_pruned_revenue",
    "zorder_box_revenue",
    "arrow_token_stats",
    # round-6 additions
    "dsir_importance_weights",
    # round-8 additions
    "hybrid_rank_rrf",
    "bm25_rank_stored",
    "phrase_match_docs",
    "terms_near_docs",
    "bm25_compacted_stored",
    "snippet_extract_docs",
    # round-8 session-4 additions
    "roc_auc_score",
    "attribution_linear",
    "duplicate_spans",
    "gini_revenue",
    "mmr_diversify",
    "band_join_acctbal",
    # round-8 session-5 additions: the plans with a distinct scale story
    "did_promo_effect",
    "item_item_recs",
    "user_item_recommendations",
    "count_min_heavy",
    "kaplan_meier_retention",
    "holt_linear_forecast",
    "bootstrap_ci_revenue",
    "naive_bayes_langid",
    "decision_stump_train",
    "abandoned_views_daily",
    "cohort_ltv",
    # round-9 session-2: distribution tests / diagnostics / SQL surface
    "ks_test_two_sample",
    "kruskal_wallis_priority",
    "levene_brown_forsythe",
    "permutation_test_price",
    "conformal_interval_price",
    "bh_fdr_brand_price",
    "ridge_regression_price",
    "regression_influence_topk",
    "heaps_law_fit",
    "recursive_cte_paths",
    "lateral_topk_per_nation",
    "array_hof_stats",
    "mutual_info_features",
    "ngram_novelty_rate",
    "window_funnel_timebound",
    "abc_xyz_parts",
    "price_elasticity_by_brand",
    "percentile_cont_priority",
    "theil_index_revenue",
    "hhi_brand_concentration",
    "rmst_retention",
    "tukey_hsd_priority",
    "frequent_token_subsample",
    "holt_winters_forecast",
    "oaxaca_price_gap",
    "lorenz_curve_deciles",
    "granger_causality_daily",
    "max_drawdown_daily",
    "jarque_bera_price",
    "durbin_watson_daily",
    "breusch_pagan_price",
    "chow_break_test",
    "runs_test_daily",
    "pacf_daily_revenue",
    "conformal_interval_price",
    "permutation_test_price",
    "effect_sizes_priority",
    "vif_features",
    "partial_corr_price",
    "regression_influence_topk",
    "levene_brown_forsythe",
    "neyman_allocation",
    "ab_sample_size",
    # round-10: whiteness / blocked-rank / stratified-2x2 tests
    "ljung_box_daily",
    "friedman_test_priority",
    "cmh_discount_returns",
    # round-11: the most expensive bench rows that had no audit section
    # (VERDICT r10 task 7 — cover the top of the cost table, starting
    # with the #1 row lpa_communities)
    "lpa_communities",
    "recommendation_hitrate",
    "pagerank_top_nodes",
    "geo_knn_join",
    "minhash_banded_pairs",
    "weighted_percentiles_by_brand",
    "segment_percentiles",
    "kcore_peel_rounds",
    "cogroup_asof_pandas",
    "link_prediction_jaccard",
    "adaboost_two_stumps",
    "frequent_itemset_pairs",
    # round-11 scale-path twin: (cell × plane-bucket) SemDeDup
    "semantic_dedup_scaled",
    # round-11 entries that had budget rows but no audit prose (r11 nit)
    "ann_index_drift_monitor",
    "neardup_band_precision",
    # round-12 additions: adaptive-cell index lifecycle + banding frontier
    "embedding_topk_ivf_adaptive",
    "ann_index_delete_compact",
    "ann_recall_vs_nprobe_stored",
    "minhash_band_frontier",
    # round-13 additions: lifecycle recall, adaptive drift, filtered probe
    "ann_recall_lifecycle",
    "ann_index_drift_adaptive",
    "ann_probe_filtered_stored",
    "ann_filtered_recall_at_k",
    # round-14 additions: balanced kind, fixed-kind filtered (hist-routed),
    # drift→rebuild decision loop
    "embedding_topk_ivf_balanced",
    "ann_probe_filtered_fixed",
    "ann_drift_rebuild_loop",
]


def fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


import re

_TREE_NODE = re.compile(r"^[\s:+\-]*\*?\s*([A-Za-z][A-Za-z0-9 ]*?)\s*\(\d+\)\s*$")


def node_counts(plan: str) -> dict[str, int]:
    """Node-name counts from the FINAL executed tree only — the formatted
    output also prints AQE's initial plan and per-node details, which
    would double-count every operator."""
    tree = plan.split("== Initial Plan ==")[0]
    counts: dict[str, int] = {}
    for ln in tree.splitlines():
        m = _TREE_NODE.match(ln)
        if m:
            name = m.group(1).split(" ")[0]
            counts[name] = counts.get(name, 0) + 1
    return counts


def summarize(plan: str) -> list[str]:
    c = node_counts(plan)
    facts = []
    ex = c.get("Exchange", 0)
    facts.append(f"exchanges: {ex}")
    joins = {
        k: v
        for k, v in c.items()
        if "Join" in k and "Broadcast" not in k or k == "BroadcastHashJoin"
    }
    bj = c.get("BroadcastHashJoin", 0)
    smj = c.get("SortMergeJoin", 0)
    shj = c.get("ShuffledHashJoin", 0)
    facts.append(f"joins: broadcast={bj} sort-merge={smj} shuffled-hash={shj}")
    py = c.get("BatchEvalPython", 0) + c.get("ArrowEvalPython", 0)
    mip = c.get("MapInPandas", 0)
    mia = c.get("MapInArrow", 0) + c.get("PythonMapInArrow", 0)
    facts.append(
        f"python stages: row/arrow-eval={py} mapInPandas={mip} mapInArrow={mia}"
    )
    pushed = [
        ln.strip() for ln in plan.splitlines() if "PushedFilters: [" in ln
    ]
    real = [p for p in pushed if p != "PushedFilters: []"]
    facts.append(f"scans with pushed filters: {len(real)}/{len(pushed)}")
    spans = {
        m.group(1) for m in re.finditer(r"codegen id : (\d+)", plan)
    }
    facts.append(f"whole-stage codegen spans: {len(spans)}")
    return facts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "PLANS.md"))
    args = ap.parse_args()
    names = args.only.split(",") if args.only else AUDIT

    spark = get_spark("plan_audit")
    queries = entrymod.queries()
    parts: list[str] = [
        "# PLANS.md — physical-plan audit\n",
        f"Generated by tools/plan_audit.py at sf dir `{args.sf}`. One section "
        "per headline query: the scale-relevant summary, then the formatted "
        "plan Catalyst/AQE produced. The pass/fail form of these properties "
        "lives in tests/test_plans.py (and test_graph.py / test_layout.py for "
        "the iteration and bucketing shapes). Caveats: exchange/join counts "
        "are static (AQE may collapse identical subtrees via ReusedExchange "
        "and convert joins at runtime), and codegen-span counts only show "
        "for stages the pre-execution printout has already compiled — 0 "
        "here does not mean interpreted.\n",
    ]
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            plan = fmt_plan(df)
            facts = summarize(plan)
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            parts.append(f"## {name}\n\nERROR: {type(exc).__name__}: {exc}\n")
            continue
        parts.append(
            f"## {name}\n\n- " + "\n- ".join(facts) + "\n\n```\n" + plan.strip() + "\n```\n"
        )
        print(f"{name}: " + "; ".join(facts))
    Path(args.out).write_text("\n".join(parts), encoding="utf-8")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
