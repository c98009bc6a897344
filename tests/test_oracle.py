"""t2-style oracle checks inside pytest: a representative subset of the
registry compared against DuckDB at sf0.001 (the full sweep is
tools/selfcheck.py; this keeps CI-style regressions visible in pytest)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cocktailsdb_spark.registry import ORACLES, QUERIES  # noqa: E402
from cocktailsdb_spark.tables import TABLES  # noqa: E402
from tools.selfcheck import normalize  # noqa: E402

SUBSET = [
    "poc_analysis",
    "tpch_q1_pricing",
    "surrogate_key_rows",
    "dedup_latest_wins",
    "sessionize_events",
    "session_window_native",
    "simhash_fingerprint",
    "doc_fingerprint",
    "embedding_topk_cosine",
    "http_dim_pipeline",
    "multimodal_features",
    "incremental_idempotence",
    "tpch_q4_order_priority",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "cube_revenue",
    "rank_family_topk",
    "quantile_disc_price",
    "stats_moments",
    "asof_join_signup",
    "range_join_recent_clicks",
    "salted_groupby",
    "streaming_dedup_keys",
    "streaming_stateful_counts",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(ORACLES[name]).df()
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} != {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert normalize(sdf) == normalize(odf)
