"""cocktailsdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL pipeline
(jacob-mennell/cocktailsDB, surveyed in SURVEY.md), re-expressed Spark-first
and extended with LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, Arrow, sane shuffle parts)
- ``tables``     fixture-table loaders (parquet star schema, TESTDATA.md)
- ``schemas``    explicit StructTypes (reference DDL + fixture tables)
- ``conform``    column conforming transforms (SURVEY.md §2.2 P1–P9)
- ``sources``    CSV/TSV readers, HTTP dimension source, watermark control
- ``operators``  dedup / similarity / text / events / multimodal operators
- ``plans``      composed analytical queries (flagship PoC analysis, TPC-H-ish)
- ``streaming``  Structured Streaming variants (tumbling/session windows,
                 incremental file ingest with checkpoints)
"""

__version__ = "0.1.0"
