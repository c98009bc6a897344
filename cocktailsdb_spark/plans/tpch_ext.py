"""Extended TPC-H-style plans (Q4/6/7/8/9/10/13/14/15/17/18/19/20/22 analogs).

The fixture star schema (TESTDATA.md) lacks partsupp and the commit/receipt
date columns, so each query keeps the *shape* of its TPC-H namesake — the
operator mix Catalyst must plan (correlated EXISTS → semi join, scalar
subquery → broadcast cross join, group-having → agg-then-join, disjunctive
join predicates, outer-join count distributions) — re-targeted at the
available columns.

Scale posture (100 TB): every query is a declarative DataFrame plan —
filters sit directly on the scans (parquet pushdown + pruning), small dims
are broadcast explicitly, scalar subqueries become one-row broadcast
cross joins (never `.collect()` into the driver plan), and the only
shuffles are the per-query aggregation/join keys. Nothing here collects a
fact table.

Oracle exactness follows tpch.py: monetary aggregates via ``dsum``
(exact DECIMAL(24,8) summation, order-insensitive → identical doubles on
Spark and DuckDB); ratios/derived values are arithmetic over those exact
doubles, so they match bit-for-bit without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..numeric import dsum, sql_dsum as _d
from ..tables import load
from .hints import maybe_broadcast


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS correlated subquery → left-semi join
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (one quarter) having at least one line shipped after the order
    date; count per priority. The EXISTS becomes a left-semi shuffle join on
    o_orderkey — no row multiplication, map-side combinable count."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        o.join(l, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan-filter-aggregate
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single filtered global aggregate — the whole predicate reaches the
    parquet scan (PushedFilters), one partial+final agg, zero joins."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


Q6_SQL = f"""
SELECT {_d('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping: nation-pair revenue per ship year
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flowing supplier-nation → customer-nation per year. The two
    nation dims broadcast twice under different aliases; the fact-side
    orders⋈lineitem join is the single large shuffle."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(s, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(maybe_broadcast(c, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {_d('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation within a customer region
# ---------------------------------------------------------------------------

Q8_NATION = "NATION_3"
Q8_REGION = "ASIA"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """share = Σ(rev | supp_nation = NATION_3) / Σ(rev) per order year, for
    customers in ASIA. Conditional aggregate over one joined plan — both
    sums share the same shuffle; the ratio of two exact decimal sums is a
    deterministic double."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n_s = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n_c = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(s, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(maybe_broadcast(c, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(F.lit(0.0)))
                / dsum(rev)
            ).alias("mkt_share")
        )
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       {_d(f"CASE WHEN n1.n_name = '{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       / {_d('l_extendedprice * (1 - l_discount)')} AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND r_name = '{Q8_REGION}'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit (synthetic supply cost from p_retailprice)
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation per year; cost term synthesized as
    0.6·p_retailprice·l_quantity (no partsupp in the fixtures). part joins
    on the fact side — broadcast while it fits, AQE falls back to shuffle
    hash at scale."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(maybe_broadcast(p, "part"), l.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       {_d('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by lost revenue
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of RETURN-flagged lines per customer for one quarter of
    orders; deterministic top-20 (exact decimal revenue, c_custkey
    tiebreak). TakeOrderedAndProject — no global sort materialization."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
       {_d('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join → double aggregation
# ---------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers LEFT JOIN filtered orders → orders per customer → customers
    per order count. Two shuffles (custkey, then c_count); count(col) skips
    nulls exactly like SQL, so no-order customers land in bucket 0."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share for one month
# ---------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum ratio over a month of shipments; part broadcast, both
    sums in one agg."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(maybe_broadcast(p, "part"), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / dsum(rev)
            ).alias("promo_revenue")
        )
    )


Q14_SQL = f"""
SELECT 100.0 * {_d("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       / {_d('l_extendedprice * (1 - l_discount)')} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier: scalar MAX subquery as a one-row broadcast cross join
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) hitting the max quarterly revenue. The scalar subquery is
    a one-row aggregate broadcast-cross-joined back — no collect, no
    single-partition window. Equality on doubles is safe: both sides derive
    from the same exact DECIMAL(24,8) sum."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = (
        l.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.max_revenue)
        .join(maybe_broadcast(s, "supplier"), rev.l_suppkey == s.s_suppkey)
        .select(F.col("l_suppkey").alias("s_suppkey"), "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, {_d('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT l_suppkey AS s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated AVG → agg + join-back
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#1"


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines of one brand with quantity under 20% of that part's average
    quantity. The correlated scalar AVG becomes a per-part aggregate joined
    back on l_partkey (both sides pre-filtered to the brand's parts, so the
    agg input is already pruned). avg is dsum/count — deterministic."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND).select("p_partkey")
    l = load(spark, sf_dir, "lineitem")
    lb = l.join(maybe_broadcast(p, "part"), l.l_partkey == p.p_partkey)
    avg_q = lb.groupBy("l_partkey").agg(
        (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")
    ).select(F.col("l_partkey").alias("a_partkey"), "avg_qty")
    return (
        lb.join(avg_q, lb.l_partkey == avg_q.a_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


Q17_SQL = f"""
WITH lb AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'),
a AS (
  SELECT l_partkey AS a_partkey,
         {_d('l_quantity')} / count(*) AS avg_qty
  FROM lb GROUP BY l_partkey)
SELECT {_d('l_extendedprice')} / 7.0 AS avg_yearly
FROM lb JOIN a ON l_partkey = a_partkey
WHERE l_quantity < 0.2 * avg_qty
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume orders: group-HAVING feeding a join
# ---------------------------------------------------------------------------

Q18_QTY = 250


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds the threshold. The HAVING-IN
    subquery is the aggregate itself joined to orders on the same key — the
    orderkey shuffle is reused (no second scan of lineitem)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, "customer"), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (SELECT l_orderkey, {_d('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum_qty > {Q18_QTY})
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under disjunctive brand/size/quantity predicates
# ---------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three OR'd brand/size/quantity clauses over the part⋈lineitem join.
    The p_partkey equi-key keeps it a hash join; the disjunction is a
    post-join filter Catalyst also partially pushes to both scans (common
    bounds)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(maybe_broadcast(p, "part"), l.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(5, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(10, 40)
        )
    )
    return j.filter(clause).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


Q19_SQL = f"""
SELECT {_d('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 5 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 10 AND 40)
"""


# ---------------------------------------------------------------------------
# Q20 — suppliers with significant part movement: agg → semi-join chain
# ---------------------------------------------------------------------------

Q20_QTY = 50


def q20_active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that moved > Q20_QTY units of any single part during 1997.
    (supp,part) aggregate → distinct suppliers → left-semi into the
    supplier dim."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load(spark, sf_dir, "supplier")
    movers = (
        l.groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity")).alias("qty"))
        .filter(F.col("qty") > Q20_QTY)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING {_d('l_quantity')} > {Q20_QTY})
"""


# ---------------------------------------------------------------------------
# Q22 — dormant valuable customers: scalar AVG subquery + windowed anti-join
# ---------------------------------------------------------------------------

Q22_CUTOFF = "2001-01-01"


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the positive-balance average with no orders since the
    cutoff, counted per nation. Scalar subquery → one-row broadcast cross
    join; NOT EXISTS → left-anti join on the pre-filtered orders."""
    c = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= Q22_CUTOFF)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


Q22_SQL = f"""
SELECT c_nationkey, count(*) AS numcust, {_d('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {_d('c_acctbal')} / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY c_nationkey
"""

# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (lineitem as the part↔supplier link)
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each small part (p_size < 10), the supplier(s) offering the
    lowest average unit price (extendedprice/quantity over their lines).
    The correlated MIN becomes a window-min over the (part, supplier)
    aggregate — one shuffle on l_partkey reused by agg and window; supplier
    and nation broadcast. Ties keep all suppliers, like TPC-H Q2."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    per_ps = (
        l.join(maybe_broadcast(p.select("p_partkey", "p_name"), "part"), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "p_name", "l_suppkey")
        .agg((dsum(F.col("l_extendedprice")) / dsum(F.col("l_quantity"))).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = per_ps.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(maybe_broadcast(s, "supplier"), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            "unit_cost",
        )
    )


Q2_SQL = f"""
WITH per_ps AS (
  SELECT l_partkey, p_name, l_suppkey,
         {_d('l_extendedprice')} / {_d('l_quantity')} AS unit_cost
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size < 10
  GROUP BY 1, 2, 3),
best AS (
  SELECT *, min(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost FROM per_ps)
SELECT l_partkey AS p_partkey, p_name, s_name, n_name AS nation, unit_cost
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE unit_cost = min_cost
"""


# ---------------------------------------------------------------------------
# Q11 — important stock: group-HAVING against a scalar fraction of the total
# ---------------------------------------------------------------------------

Q11_FRACTION = 0.005


def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose total line value exceeds FRACTION of the global
    total. Both aggregates come from ONE per-supplier aggregate: the global
    total is a re-aggregation of the small per-supplier result, broadcast
    back — lineitem is scanned once."""
    l = load(spark, sf_dir, "lineitem")
    per_supp = l.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice")).alias("value")
    )
    total = per_supp.agg(dsum(F.col("value")).alias("grand"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(Q11_FRACTION) * F.col("grand"))
        .select("l_suppkey", "value")
    )


Q11_SQL = f"""
WITH per_supp AS (
  SELECT l_suppkey, {_d('l_extendedprice')} AS value
  FROM lineitem GROUP BY l_suppkey)
SELECT l_suppkey, value
FROM per_supp
WHERE value > {Q11_FRACTION} * (SELECT {_d('value')} FROM per_supp)
"""


# ---------------------------------------------------------------------------
# Q12 — shipping-class priority counts: conditional aggregation
# ---------------------------------------------------------------------------


def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per linestatus (ship-mode analog), count high-priority vs other
    orders among 1997 shipments — the CASE-WHEN-inside-SUM shape."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part attribute: count distinct + NOT IN
# ---------------------------------------------------------------------------


def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type, size) via the lineitem
    link, excluding one brand and excluding "complaint" suppliers
    (negative balance) — the NOT IN is a left-anti broadcast join before
    the distinct aggregation."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#5")
    l = load(spark, sf_dir, "lineitem")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(maybe_broadcast(p, "part"), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q21 — sole-problem supplier: double correlation (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------


def q21_sole_problem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY supplier with RETURN-flagged lines on a
    multi-supplier order. TPC-H Q21's EXISTS(other supplier) + NOT
    EXISTS(other supplier with problem) pair collapses into one per-order
    aggregate — distinct suppliers vs distinct problem suppliers — so the
    double correlation costs a single orderkey shuffle instead of two
    correlated re-scans of lineitem."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    # (orderkey, suppkey) grain first: ONE map-side-combined shuffle on the
    # composite key replaces the double countDistinct (whose Expand doubles
    # the stream) — and since the n_bad == 1 filter means exactly one bad
    # supplier per surviving order, max(when(bad)) recovers the culprit in
    # the SAME aggregate, eliminating the fact⋈fact culprit join entirely.
    # sf1 probe: 19.7 s (expand + self-join form) → 9.1 s (this form).
    per_os = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("bad")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("bad").alias("n_bad"),
        F.max(F.when(F.col("bad") == 1, F.col("l_suppkey"))).alias("bad_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_bad") == 1))
        .join(maybe_broadcast(s, "supplier"), F.col("bad_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_bad
  FROM lineitem GROUP BY l_orderkey),
culprit AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
SELECT s_name, count(*) AS numwait
FROM per_order
JOIN culprit USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_bad = 1
GROUP BY s_name
"""
