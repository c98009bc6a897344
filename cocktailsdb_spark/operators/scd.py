"""Slowly-changing-dimension operators: SCD2 version history and a
MERGE-style upsert — the dimension-maintenance half the reference's
latest-wins dedup (build_database.py:207-219) throws away. latest-wins is
SCD1 (overwrite); these keep history / apply changes.

Both are declarative single-shuffle plans: SCD2 is one window over the
business key; the upsert is one full-outer join on the key. At 100 TB the
upsert join is the standard pre-Delta MERGE pattern (with table formats
the same plan runs inside MERGE INTO)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    records: DataFrame,
    key: str,
    change_col: str,
    tiebreak: str,
) -> DataFrame:
    """Type-2 history from raw change records: one row per version with
    [valid_from, valid_to) ranges; open range (null valid_to) = current.
    One window shuffle on the business key; version/valid_to/is_current
    share it."""
    w = Window.partitionBy(key).orderBy(F.asc(change_col), F.asc(tiebreak))
    return records.select(
        "*",
        F.row_number().over(w).cast("int").alias("version"),
        F.col(change_col).alias("valid_from"),
        F.lead(change_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def merge_upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics over plain DataFrames: update matched keys, insert
    new ones, keep unmatched current rows. Full-outer join on the key,
    update side wins per column. Column sets must match.

    ``updates`` is deduplicated to one row per key first (deterministic:
    the row greatest under (col1 DESC, col2 DESC, ...) wins) — duplicate
    update keys would otherwise fan out through the full-outer join and
    silently duplicate output rows. MERGE INTO engines raise on this;
    picking a deterministic winner keeps the operator total."""
    cols = [c for c in current.columns if c != key]
    assert set(updates.columns) == set(current.columns), "schema mismatch"
    w = Window.partitionBy(key).orderBy(*[F.desc_nulls_last(c) for c in cols])
    updates = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    u = updates.select(
        F.col(key).alias("_u_key"), *[F.col(c).alias(f"_u_{c}") for c in cols]
    )
    joined = current.join(u, current[key] == u["_u_key"], "full_outer")
    has_update = F.col("_u_key").isNotNull()
    # row-level (not column-level) preference: a matched row takes the
    # WHOLE update record, so legitimate NULLs in updates survive
    return joined.select(
        F.coalesce(current[key], F.col("_u_key")).alias(key),
        *[
            F.when(has_update, F.col(f"_u_{c}")).otherwise(current[c]).alias(c)
            for c in cols
        ],
    )
