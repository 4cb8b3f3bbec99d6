"""PySpark-native analytics engine with the query surface of
``awfeequdng/clickhouse_from_scratch`` (a parser-complete ClickHouse rebuild).

The reference stops at SQL→AST (see SURVEY.md §0); its *capability surface*
is the ClickHouse SQL dialect plus the columnar data model. This package
re-expresses that surface Spark-first:

- ``session``   — tuned SparkSession builder (AQE, UTC, Arrow).
- ``catalog``   — testdata table loader / temp-view registrar.
- ``operators`` — ClickHouse constructs Spark lacks natively (FINAL,
  LIMIT BY, ANY/ASOF JOIN, WITH FILL/TOTALS/TIES, SAMPLE, ARRAY JOIN,
  DISTINCT ON) as DataFrame plan builders.
- ``functions`` — registry mapping ClickHouse function names to
  ``pyspark.sql.functions`` expressions (JVM-side, codegen-friendly).
- ``plans``     — ClickHouse-dialect SQL frontend (lexer → AST → DataFrame).
- ``sources``   — format registry (CSV/TSV/JSONEachRow/Parquet/ORC/...).
- ``streaming`` — LIVE VIEW / WINDOW VIEW surface on Structured Streaming.
- ``pipeline``  — beyond-reference large-scale training-data ops:
  dedup (exact/MinHash-LSH/SimHash/n-gram), embedding similarity search,
  text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"
