"""The full reference ETL pipeline, re-expressed Spark-first —
SURVEY.md §3.1 stages 2–6 plus the §3.2 PoC query as stage 7.

Reference: build_database.py:227-253 (main), database/poc_tables.sql.
Same semantics on the same-shaped inputs (FIXTURES.md Family B), with the
documented §3.4 fixes: explicit schemas/parameters (no inferred col_names,
no cross-function locals), watermark advance AFTER the sink, latest-wins
dedup keyed on idDrink.

Storage: parquet directories under a base path ("tables" global_sales /
bar_stock / cocktails / poc_analysis) — the saveAsTable analog without
needing a metastore. At scale global_sales would be partitioned by
to_date(dateOfSale) so the watermark filter partition-prunes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import conform
from ..operators.dedup import latest_wins
from ..sources import csv_sources
from ..sources.http_source import Transport, fetch_df, http_transport
from ..sources.watermark import DEFAULT_MARK, WatermarkStore

SOURCE_BARS = ("budapest", "london", "new york")


def process_bar_data(spark: SparkSession, path: str) -> DataFrame:
    """Stage 3 (build_database.py:76-92): S1 scan → P2 rename → P3 key →
    P4 dirty-int clean → P7 lowercase."""
    raw = csv_sources.read_bar_stock(spark, path)
    df = (
        conform.rename(raw, {"glass_type": "glassType"})
        .withColumn("stock", conform.extract_int("stock"))
    )
    df = conform.add_surrogate_key(df, "stockID", ["glassType", "bar"])
    return conform.lowercase_strings(
        df.select("stockID", "glassType", "stock", "bar")
    )


def process_sales_data(
    spark: SparkSession,
    budapest_path: str,
    london_path: str,
    ny_path: str,
    store: WatermarkStore,
) -> tuple[DataFrame, dict]:
    """Stage 4 (build_database.py:95-168): three heterogeneous scans →
    per-source bar tag (P8) + strict-> watermark filter (P9) + new-mark
    computation (A2) → union (O3) → saleID (P3) → price double (P5) →
    lowercase (P7).

    Returns (conformed sales, new marks). The CALLER writes the marks after
    the sink commits — the §3.4 ordering fix."""
    marks = store.read(spark)
    sources = {
        "budapest": csv_sources.read_sales_iso_csv(spark, budapest_path),
        "london": csv_sources.read_sales_tsv_headerless(spark, london_path),
        "new york": csv_sources.read_sales_us_dates(spark, ny_path),
    }
    new_marks = dict(marks)
    frames = []
    for bar, df in sources.items():
        wm = marks.get(bar, DEFAULT_MARK)
        inc = conform.filter_after_watermark(
            conform.with_source_tag(df, "bar", bar), "dateOfSale", wm
        )
        mx = inc.agg(F.max("dateOfSale")).first()[0]  # A2
        if mx is not None:
            new_marks[bar] = mx
        frames.append(inc)
    sales = conform.union_by_name(frames)
    sales = conform.add_surrogate_key(
        sales.drop("idx"), "saleID", ["bar", "dateOfSale", "drink", "price"]
    )
    sales = sales.withColumn("price", conform.cast_double("price"))
    return (
        conform.lowercase_strings(
            sales.select("saleID", "dateOfSale", "drink", "price", "bar")
        ),
        new_marks,
    )


def query_cocktail_data(
    spark: SparkSession, sales: DataFrame, transport: Transport = http_transport
) -> DataFrame:
    """Stage 5 (build_database.py:171-224): A3 distinct drinks → S5 per-key
    fetch (error→empty) → O1+O2 latest-wins dedup on idDrink → P7."""
    keys = [
        r["drink"]
        for r in sales.select("drink").distinct().orderBy("drink").collect()
    ]
    raw = fetch_df(spark, keys, transport=transport)
    dd = latest_wins(raw, ["idDrink"], ["dateModified", "strDrink"])
    return conform.lowercase_strings(dd)


POC_SQL = """
WITH grouped_drinks AS (
  SELECT date_format(gs.dateOfSale, 'yyyy-MM-dd') AS dayOfSale,
         gs.drink, gs.price, gs.bar, c.strGlass,
         COUNT(gs.drink) AS drinkCount
  FROM global_sales gs
  LEFT JOIN cocktails c ON c.strDrink = gs.drink
  GROUP BY 1, 2, 3, 4, 5
)
SELECT gd.dayOfSale, gd.drink, gd.price, gd.bar, gd.strGlass, gd.drinkCount,
       bs.stock,
       CASE WHEN gd.drinkCount < bs.stock THEN 'NO ISSUE'
            WHEN gd.drinkCount >= bs.stock THEN 'POTENTIAL ISSUE'
       END AS comment
FROM grouped_drinks gd
LEFT JOIN bar_stock bs
  ON gd.strGlass = bs.glassType AND gd.bar = bs.bar
"""


def poc_analysis_bar(
    spark: SparkSession,
    sales: DataFrame,
    stock: DataFrame,
    cocktails: DataFrame,
) -> DataFrame:
    """Stage 7 — poc_tables.sql:6-34 verbatim semantics (dims broadcast)."""
    sales.createOrReplaceTempView("global_sales")
    F.broadcast(stock).createOrReplaceTempView("bar_stock")
    F.broadcast(cocktails).createOrReplaceTempView("cocktails")
    return spark.sql(POC_SQL)


def build_database(
    spark: SparkSession,
    base_dir: str,
    bar_data_path: str,
    budapest_path: str,
    london_path: str,
    ny_path: str,
    transport: Transport = http_transport,
) -> DataFrame:
    """The whole main() (build_database.py:227-253) + PoC CTAS.

    Write order (§3.4 fix): sinks commit, THEN watermarks advance.
    Returns the materialized poc_analysis DataFrame."""
    store = WatermarkStore(os.path.join(base_dir, "last_update"))

    stock = process_bar_data(spark, bar_data_path)
    sales, new_marks = process_sales_data(
        spark, budapest_path, london_path, ny_path, store
    )
    cocktails = query_cocktail_data(spark, sales, transport)

    sales.write.mode("append").parquet(os.path.join(base_dir, "global_sales"))
    stock.write.mode("overwrite").parquet(os.path.join(base_dir, "bar_stock"))
    cocktails.write.mode("overwrite").parquet(os.path.join(base_dir, "cocktails"))
    store.write(spark, new_marks)  # only after the sinks committed

    all_sales = spark.read.parquet(os.path.join(base_dir, "global_sales"))
    poc = poc_analysis_bar(
        spark,
        all_sales,
        spark.read.parquet(os.path.join(base_dir, "bar_stock")),
        spark.read.parquet(os.path.join(base_dir, "cocktails")),
    )
    poc.write.mode("overwrite").parquet(os.path.join(base_dir, "poc_analysis"))
    return spark.read.parquet(os.path.join(base_dir, "poc_analysis"))
