"""TPC-H-style analytical plans over the fixture star schema.

The reference has exactly one analytical query (poc_analysis); these widen
the engine's query surface to the canonical OLAP shapes its tables support
(pricing summary, shipping-priority top-k, local-supplier volume) and serve
as the bench headliners.

Oracle exactness: monetary aggregates are summed as DECIMAL(24,8) —
per-row products are computed in double (bit-identical on both engines),
cast to decimal (round-to-nearest; ties cannot occur at scale 8 for dyadic
doubles), summed exactly, and only then cast back to double. This removes
FP summation-order sensitivity entirely, so Spark's partial/final
aggregation order can differ from DuckDB's and the value hash still
matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..numeric import dsum, sql_dsum as _sql_dsum
from ..tables import load
from .hints import maybe_broadcast


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: groupBy(returnflag, linestatus) + 8 aggregates.
    One shuffle, partial+final hash agg, filter pushed to the parquet scan."""
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / cnt).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
            (dsum(F.col("l_discount")) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity')}                                   AS sum_qty,
       {_sql_dsum('l_extendedprice')}                              AS sum_base_price,
       {_sql_dsum('l_extendedprice * (1 - l_discount)')}           AS sum_disc_price,
       {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_sql_dsum('l_quantity')} / count(*)                        AS avg_qty,
       {_sql_dsum('l_extendedprice')} / count(*)                   AS avg_price,
       {_sql_dsum('l_discount')} / count(*)                        AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: 3-way join + agg + top-10 by revenue.

    customer is SF-growing, so it carries no forced hint — AQE broadcasts
    it under the threshold at bench scale and picks SMJ/SHJ at real scale
    (plans/hints.py policy); orders⋈lineitem is the one real shuffle join.
    Deterministic top-k: exact revenue, o_orderkey tiebreak."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-table join, revenue per nation, customer and
    supplier in the same nation. Bounded dims (nation/region) broadcast;
    SF-growing dims unhinted per plans/hints.py; one agg shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(s, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(
            maybe_broadcast(c, "customer"),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(maybe_broadcast(n, "nation"), s.s_nationkey == n.n_nationkey)
        .join(maybe_broadcast(r, "region"), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name AS nation, r_name AS region,
       {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""
