"""Catalog-aware input/output: one reference string resolves to an Iceberg
/ Hive / session-catalog table or a parquet path.

The north-rule input is "an Iceberg table of Common-Crawl-style web pages".
In production that is `spark.read.table("catalog.db.webpages")` with an
Iceberg catalog configured (`spark.sql.catalog.<name>` +
`iceberg-spark-runtime` on the executor classpath) — the DataFrame that
comes back is indistinguishable to every operator in this package, which
is the point: all plans here are declarative, so Iceberg's pushdown,
partition pruning, and snapshot isolation apply for free. This sandbox
ships no Iceberg jars, so tests exercise the same code path through the
built-in session catalog and the parquet arm; nothing in the library
depends on which catalog serves the table.

Reference forms:
  - ``table:db.name`` / ``table:catalog.db.name`` — any configured catalog
    (Iceberg in production, the session catalog here).
  - anything else — a parquet directory/file path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_PREFIX = "table:"


def read_input(spark: SparkSession, ref: str) -> DataFrame:
    """Resolve a table reference or parquet path to a DataFrame."""
    if ref.startswith(TABLE_PREFIX):
        return spark.read.table(ref[len(TABLE_PREFIX):])
    return spark.read.parquet(ref)


def write_output(
    df: DataFrame,
    ref: str,
    partition_by: list[str] | None = None,
    location: str | None = None,
) -> None:
    """Write a DataFrame to a table reference (DataFrameWriterV2 — the
    Iceberg-native `writeTo` path, atomic replace per Iceberg semantics
    when the catalog is Iceberg) or a parquet path. ``location`` pins an
    external table location (ignored for path refs; Iceberg catalogs
    normally manage locations themselves)."""
    if ref.startswith(TABLE_PREFIX):
        name = ref[len(TABLE_PREFIX):]
        w = df.writeTo(name).using("parquet")
        if location:
            w = w.tableProperty("location", location)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        try:
            w.createOrReplace()  # V2 atomic replace (Iceberg et al.)
        except Exception:
            # legacy V1 session catalog: no REPLACE TABLE AS SELECT
            v1 = df.write.format("parquet").mode("overwrite")
            if location:
                v1 = v1.option("path", location)
            if partition_by:
                v1 = v1.partitionBy(*partition_by)
            v1.saveAsTable(name)
        return
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
