"""jassv2_spark — a PySpark-native impact-ordered BM25 search engine.

Brand-new engine with the query/data-processing capabilities of the JASSv2
score-at-a-time search engine (reference studied in SURVEY.md), built
Spark-first: DataFrame/SQL plans, Arrow-batched pandas UDFs only where
per-byte semantics demand it, parquet segment tables as the index.
"""

from jassv2_spark.engine import Engine  # noqa: F401

__version__ = "0.1.0"
