"""Batch scan sources — SURVEY.md §2.1 S1–S4.

Each reader is handed an explicit StructType (never inferSchema: on 100 TB
inference means an extra full pass AND nondeterministic typing). gzip is
handled transparently by extension. Timestamp parsing is an explicit
per-source conform step because formats differ (reference
build_database.py:105-142; a wrong format must produce testable nulls,
not silent garbage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import conform
from ..schemas import BAR_STOCK_RAW, SALES_RAW

ISO_TS = "yyyy-MM-dd HH:mm:ss"
US_TS = "MM-dd-yyyy HH:mm"


def read_bar_stock(spark: SparkSession, path: str) -> DataFrame:
    """S1 — comma CSV with a header row (glass inventory).
    Reference: build_database.py:78."""
    return (
        spark.read.schema(BAR_STOCK_RAW)
        .option("header", True)
        .csv(path)
    )


def _read_sales(spark: SparkSession, path: str, *, header: bool, sep: str) -> DataFrame:
    return (
        spark.read.schema(SALES_RAW)
        .option("header", header)
        .option("sep", sep)
        .csv(path)
    )


def read_sales_iso_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2 — gzip CSV whose source header (e.g. Hungarian `,TS,ital,költség`)
    is discarded and replaced by the canonical schema; ISO timestamps.
    Reference: build_database.py:105-112."""
    df = _read_sales(spark, path, header=True, sep=",")
    return df.withColumn("dateOfSale", conform.cast_timestamp("dateOfSale", ISO_TS))


def read_sales_tsv_headerless(spark: SparkSession, path: str) -> DataFrame:
    """S3 — gzip TSV, tab separator, NO header row.
    Reference: build_database.py:120-127."""
    df = _read_sales(spark, path, header=False, sep="\t")
    return df.withColumn("dateOfSale", conform.cast_timestamp("dateOfSale", ISO_TS))


def read_sales_us_dates(spark: SparkSession, path: str) -> DataFrame:
    """S4 — gzip CSV with `MM-dd-yyyy HH:mm` timestamps ('12-26-2020 22:47').
    Spark will NOT infer this; the format is explicit, and a wrong format
    yields nulls (pinned by tests/test_sources.py).
    Reference: build_database.py:135-142."""
    df = _read_sales(spark, path, header=True, sep=",")
    return df.withColumn("dateOfSale", conform.cast_timestamp("dateOfSale", US_TS))
