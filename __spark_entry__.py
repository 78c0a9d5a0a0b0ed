"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: anytime BM25 top-k over sf0.001 documents.
queries()       — one callable per implemented operator (SURVEY.md §2 plus
                  the training-data-pipeline family); see
                  jassv2_spark/entry_queries.py for the registry.
oracle_sql()    — DuckDB-runnable ANSI SQL mirroring each Spark plan with
                  identical column names/types and bitwise-identical float
                  math (transcendentals computed driver-side; exact IEEE
                  ops in matching order; repr() float literals).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jassv2_spark.entry_queries import registry

_REGISTRY = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = _REGISTRY["jass_topk"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
