"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cocktailsdb_spark/``; this module is the thin
registry mapping SURVEY.md §2's operator inventory to (spark_fn, oracle_sql)
pairs.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cocktailsdb_spark.plans import poc_analysis as _poc
from cocktailsdb_spark.plans import tpch as _tpch
from cocktailsdb_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (PoC analysis, SURVEY.md §3.2) on sf0.001."""
    return _poc.poc_analysis(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys absent here get rows-only checks."""
    return dict(ORACLES)
