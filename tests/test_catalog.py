"""Catalog-aware table references resolve through the same code path an
Iceberg catalog would serve in production (spark.read.table / writeTo)."""

import os

from jassv2_spark.sources.catalog import read_input, write_output


def test_read_input_parquet_path(spark):
    df = read_input(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() == 500 and "text" in df.columns


def test_read_input_table_reference(spark):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src.createOrReplaceTempView("docs_view")
    df = read_input(spark, "table:docs_view")
    assert df.count() == 500


def test_write_output_roundtrip_partitioned(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    out = str(tmp_path / "out")
    write_output(src, out, partition_by=["source"])
    back = read_input(spark, out)
    assert back.count() == 50
    # physically partitioned layout (what Iceberg partition specs replace)
    assert any(d.startswith("source=") for d in os.listdir(out))


def test_write_output_table_reference(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    write_output(src, "table:cat_rt", location=str(tmp_path / "cat_rt"))
    assert read_input(spark, "table:cat_rt").count() == 10
    spark.sql("DROP TABLE cat_rt")
