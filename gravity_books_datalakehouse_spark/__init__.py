"""gravity_books_datalakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference project ``moetzi/gravity-books-datalakehouse`` (a pandas ETL +
MySQL/DuckDB differential-validation lakehouse): medallion pipeline
(bronze → silver → gold), Kimball star schema, the five validation
analytics queries, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for a 1000-executor / 100 TB deployment while remaining testable on
``local[*]``.

Layout
------
- ``session``    — SparkSession factory with scale-ready defaults (AQE, Arrow).
- ``sources``    — readers/writers/catalog (Parquet, JDBC; medallion layers).
- ``operators``  — relational kit, surrogate keys, dedup, similarity, text.
- ``functions``  — date-dimension kit, portable hashing helpers.
- ``plans``      — medallion pipeline and star-schema builders + queries.
- ``streaming``  — Structured Streaming ingest of the events stream.
"""

from gravity_books_datalakehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
