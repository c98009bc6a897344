"""Column conforming transforms — SURVEY.md §2.2 (P1–P9).

All pure DataFrame→DataFrame functions built from ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd; no Python UDFs). Each cites the reference
behavior it re-expresses.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def project(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """P1 — keep a column subset (reference build_database.py:187-197)."""
    return df.select(*cols)


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P2 — bulk rename (reference build_database.py:83,165)."""
    return df.withColumnsRenamed(mapping)


def add_surrogate_key(df: DataFrame, key_name: str, order_by: list[str]) -> DataFrame:
    """P3 — deterministic 0-based surrogate key.

    The reference uses the pandas positional index
    (build_database.py:82-85,164-166). Distributed equivalent: row_number
    over an explicit total order, minus 1. The single-partition window is
    deliberate ONLY for oracle-checked paths; at 100 TB scale use
    ``zipWithIndex``-style keys via ``monotonically_increasing_id`` (sparse,
    per-partition contiguous) — provided as ``add_sparse_key``.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(key_name, F.row_number().over(w) - F.lit(1))


def add_sparse_key(df: DataFrame, key_name: str) -> DataFrame:
    """P3 (scale path) — non-contiguous but globally unique int64 key.

    No shuffle, no global sort: partition id lives in the high bits. This is
    what a 100 TB load should use; contiguity is an oracle-test nicety only.
    """
    return df.withColumn(key_name, F.monotonically_increasing_id())


def extract_int(col: str | Column, target: str = "int") -> Column:
    """P4 — pull the leading integer out of a dirty string
    ('34 glasses' → 34; reference build_database.py:86-87)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_cast: a no-digit string yields NULL, not an ANSI-mode error
    return F.regexp_extract(c, r"(\d+)", 1).try_cast(target)


def cast_double(col: str | Column) -> Column:
    """P5 — price string → double (reference build_database.py:167)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def cast_timestamp(col: str | Column, fmt: str) -> Column:
    """P6 — string → timestamp with an EXPLICIT per-source format
    (reference build_database.py:111,126,141,208). Spark silently nulls on
    a wrong format — tests pin a known row per format (FIXTURES.md B3)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_to_timestamp: a wrong-format value yields NULL (testable), never
    # an ANSI error — the reference's lenient pandas behavior
    return F.try_to_timestamp(c, F.lit(fmt))


def lowercase_strings(df: DataFrame) -> DataFrame:
    """P7 — normalize every string column to lowercase.

    This is the join-key conformer that makes the case-mixed drink/glass
    joins match (reference build_database.py:88-90,168,220-222; SURVEY.md
    §3.4). Schema-driven comprehension, no UDF.
    """
    return df.select(
        *[
            F.lower(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, T.StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def with_source_tag(df: DataFrame, col_name: str, value: str) -> DataFrame:
    """P8 — constant per-source tag column (reference build_database.py:113,128,143)."""
    return df.withColumn(col_name, F.lit(value))


def filter_after_watermark(df: DataFrame, ts_col: str, high_water_mark) -> DataFrame:
    """P9 — strict `>` incremental-load predicate
    (reference build_database.py:114-116,129-131,144-146).

    A row exactly AT the mark is excluded (FIXTURES.md B6). When the sink is
    date-partitioned this predicate partition-prunes for free.
    """
    if high_water_mark is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(high_water_mark))


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """O3 — schema-aligned union of N frames (reference build_database.py:162,204)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
