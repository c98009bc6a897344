"""Flagship query — the reference's PoC analysis re-expressed on the
fixture star schema (reference database/poc_tables.sql:3-36; SURVEY.md §3.2,
§7 Phase 0; role mapping FIXTURES.md "Family A").

Reference dataflow:  global_sales →(left join cocktails, group by
day/drink/price/bar/glass, count)→ CTE →(left join bar_stock on glass+bar,
CASE stock check)→ poc_analysis.

Fixture mapping: fact = lineitem⋈orders (o_orderdate→dateOfSale,
l_quantity→price — a small-cardinality numeric, preserving the reference's
"price participates in GROUP BY" quirk, SURVEY.md §3.4); cocktails-dim
analog = part (p_name→drink, p_type→strGlass); bar analog = nation via
supplier (n_name→bar); bar_stock analog = a deterministic derived dim
(avg part size × 40 per glass, cross-joined with bars).

Physical shape (what Catalyst should produce, and does — see
tests/test_plans.py): broadcast hash joins for all dims, ONE shuffle for
the hash aggregate (partial+final), second broadcast join after the agg.
At 100 TB only lineitem⋈orders is a real (shuffle/SMJ) join; everything
else stays broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .hints import maybe_broadcast


def sales_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble the sales-analog fact: one row per lineitem with
    dateOfSale/drink/price/bar/strGlass attributes."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        # J1 analog: dim join kept LEFT like poc_tables.sql:15-18.
        # part/supplier grow with SF → no forced hint (plans/hints.py);
        # AQE still broadcasts them at bench scale under the threshold.
        .join(maybe_broadcast(part, "part"), lineitem.l_partkey == part.p_partkey, "left")
        .join(maybe_broadcast(supplier, "supplier"), lineitem.l_suppkey == supplier.s_suppkey, "left")
        .join(maybe_broadcast(nation, "nation"), supplier.s_nationkey == nation.n_nationkey, "left")
        .select(
            F.col("o_orderdate").alias("dateOfSale"),
            F.col("p_name").alias("drink"),
            F.col("l_quantity").alias("price"),
            F.col("n_name").alias("bar"),
            F.col("p_type").alias("strGlass"),
        )
    )


def stock_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bar_stock analog: stock level per (strGlass, bar) — deterministic
    derived dim (avg p_size × 40, truncated), cross-joined with the bar
    list. ~5 glass types × 25 bars; trivially broadcastable."""
    part = load(spark, sf_dir, "part")
    nation = load(spark, sf_dir, "nation")
    # floor, not cast: double→int CAST truncates in Spark but rounds in
    # DuckDB — floor() agrees everywhere
    per_glass = part.groupBy(F.col("p_type").alias("strGlass")).agg(
        F.floor(F.avg("p_size") * F.lit(40)).cast("int").alias("stock")
    )
    bars = nation.select(F.col("n_name").alias("bar"))
    return per_glass.crossJoin(bars)


def poc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full PoC analysis (grouped_drinks CTE + stock check CASE,
    poc_tables.sql:6-34)."""
    grouped = (
        sales_fact(spark, sf_dir)
        .groupBy(
            # string day key: date-typed cells normalize differently across
            # pandas/duckdb bridges; 'yyyy-MM-dd' strings are unambiguous
            F.date_format("dateOfSale", "yyyy-MM-dd").alias("dayOfSale"),
            "drink",
            "price",
            "bar",
            "strGlass",
        )
        .agg(F.count("drink").alias("drinkCount"))
    )
    stock = stock_dim(spark, sf_dir)
    return (
        grouped.join(F.broadcast(stock), on=["strGlass", "bar"], how="left")
        .select(
            "dayOfSale",
            "drink",
            "price",
            "bar",
            "strGlass",
            "drinkCount",
            "stock",
            # E1 — both branches null-guarded; unmatched stock ⇒ NULL comment
            # (poc_tables.sql:26-29)
            F.when(F.col("drinkCount") < F.col("stock"), F.lit("NO ISSUE"))
            .when(F.col("drinkCount") >= F.col("stock"), F.lit("POTENTIAL ISSUE"))
            .alias("comment"),
        )
    )


ORACLE_SQL = """
WITH sales AS (
  SELECT o.o_orderdate AS dateOfSale,
         p.p_name      AS drink,
         l.l_quantity  AS price,
         n.n_name      AS bar,
         p.p_type      AS strGlass
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  LEFT JOIN part p ON l.l_partkey = p.p_partkey
  LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
  LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
),
grouped_drinks AS (
  SELECT strftime(CAST(dateOfSale AS DATE), '%Y-%m-%d') AS dayOfSale,
         drink, price, bar, strGlass,
         COUNT(drink) AS drinkCount
  FROM sales
  GROUP BY 1, 2, 3, 4, 5
),
stock_dim AS (
  SELECT g.strGlass, n.n_name AS bar, g.stock
  FROM (SELECT p_type AS strGlass, CAST(FLOOR(AVG(p_size) * 40) AS INT) AS stock
        FROM part GROUP BY p_type) g
  CROSS JOIN nation n
)
SELECT gd.dayOfSale, gd.drink, gd.price, gd.bar, gd.strGlass, gd.drinkCount,
       sd.stock,
       CASE WHEN gd.drinkCount < sd.stock THEN 'NO ISSUE'
            WHEN gd.drinkCount >= sd.stock THEN 'POTENTIAL ISSUE'
       END AS comment
FROM grouped_drinks gd
LEFT JOIN stock_dim sd
  ON gd.strGlass = sd.strGlass AND gd.bar = sd.bar
"""
