"""Query registry: operator name → (Spark callable, DuckDB oracle twin).

Every operator from SURVEY.md §2 that is implemented registers here; the
driver (and tests/test_oracle.py) iterate this. Callables take
``(spark, sf_dir)`` and return a DataFrame. Oracle SQL must produce the
same column NAMES (the harness sorts columns by name before hashing).
Keys with no oracle get rows-only checks (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import poc_analysis as _poc
from .plans import reference_parity as _refpar
from .plans import tpch as _tpch

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# --- flagship + analytical plans (SURVEY.md §3.2, §2.3-§2.6) ---------------
register("poc_analysis", _poc.poc_analysis, _poc.ORACLE_SQL)
register(
    "reference_parity_poc", _refpar.reference_parity_poc, _refpar.REFERENCE_POC_SQL
)
register("tpch_q1_pricing", _tpch.q1_pricing_summary, _tpch.Q1_SQL)
register("tpch_q3_shipping_priority", _tpch.q3_shipping_priority, _tpch.Q3_SQL)
register("tpch_q5_local_supplier", _tpch.q5_local_supplier_volume, _tpch.Q5_SQL)

# conform / source / dedup / text / similarity / event operators register
# themselves on import:
from . import registry_ops  # noqa: E402,F401

# extended TPC-H suite + relational/window/stats operators:
from . import registry_ext  # noqa: E402,F401

# --- driver-sweep rotation --------------------------------------------------
# The correctness driver checks ~50 entries in registration order per round.
# Registration order follows module structure, so without rotation the same
# long-green core gets re-checked every round while newer families never get
# a driver row. This list puts the entries with no driver-green row yet (and
# this round's new additions) first; everything else keeps registration order
# behind them. Rotate per round as families accumulate driver-green rows.
_DRIVER_PRIORITY: list[str] = [
    # round-4 fixes/changes (newest = highest risk): the r3-broken entries
    # and everything whose semantics or expressions changed this round
    "ivf_recall_at_k",
    "embedding_topk_ivf",
    "embedding_topk_ivf_kmeans",
    "ivf_kmeans_recall_at_k",
    "sessionize_events",
    "sessionize_skew_chunked",
    "json_lines_roundtrip",
    "multimodal_features",
    "multimodal_frame_sample",
    "udtf_chunk_spans",
    "udaf_median_order_value",
    "compact_small_files",
    "event_transition_counts",
    "simhash_fingerprint",
    "simhash_near_dup",
    "pagerank_top_nodes",
    "streaming_foreach_merge",
    # never driver-checked (r1–r3 samples missed these 27)
    "approx_percentile_price",
    "repetition_stats",
    "pii_redact",
    "hash_split",
    "set_intersect_customers",
    "set_except_customers",
    "cube_revenue",
    "grouping_sets_mix",
    "rank_family_topk",
    "lag_lead_daily_revenue",
    "quantile_disc_price",
    "stats_moments",
    "price_histogram",
    "unpivot_priority_counts",
    "json_map_aggregate",
    "asof_join_signup",
    "partition_pruned_load",
    "bucketed_join_revenue",
    "salted_groupby",
    "argmax_order_per_customer",
    "scd2_dim_history",
    "merge_upsert_dim",
    "orc_roundtrip",
    "approx_distinct_users",
    "range_join_recent_clicks",
    "window_distribution_family",
    # md5-parse rewrite touched these families too — re-confirm a sample
    "minhash_lsh_pairs",
    "stratified_sample",
    "weighted_resample",
    "doc_fingerprint",
    "ngram_jaccard_prefix",
    "dedup_clusters",
    "embedding_near_dup",
    # timestamp normalization touched every events consumer — sample a few
    "window_tumbling_hour",
    "window_sliding_halfhour",
    "session_window_native",
    "json_extract_props",
    "funnel_conversion",
    "cohort_retention",
]


def _apply_driver_priority() -> None:
    ordered = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for mapping in (QUERIES, ORACLES):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)


_apply_driver_priority()
