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
