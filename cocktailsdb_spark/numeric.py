"""Engine-agnostic numeric determinism helpers.

Two hazards make naive float results differ between Spark and the DuckDB
oracle (and between Spark runs at different partitionings):

1. ``round(x, k)`` tie-breaking: Spark rounds via BigDecimal on the decimal
   string, DuckDB via scaled-float arithmetic — they disagree exactly when
   x is a dyadic rational sitting on a .5 boundary at scale k (common for
   ratios with power-of-two denominators, e.g. 27/64). ``qround`` instead
   computes floor(x·10^k + 0.5)/10^k with the SAME primitive float ops on
   both engines → identical results whenever the inputs are identical.

2. float summation order: Spark's partial/final aggregation order differs
   from DuckDB's (and varies with partitioning). ``dsum`` sums exactly:
   per-row doubles → DECIMAL(24,8) (round-to-nearest; a tie would need a
   dyadic double ending in …5·10⁻⁹, which cannot exist) → exact decimal
   sum → double. Order-insensitive, engine-insensitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(24,8)"


def qround(c: Column, k: int) -> Column:
    scale = 10**k
    return F.floor(c * F.lit(float(scale)) + F.lit(0.5)) / F.lit(float(scale))


def sql_qround(expr: str, k: int) -> str:
    scale = 10**k
    return f"floor(({expr}) * {scale}.0 + 0.5) / {scale}.0"


def dsum(expr: Column) -> Column:
    return F.sum(expr.cast(DEC)).cast("double")


def sql_dsum(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(24,8))) AS DOUBLE)"
