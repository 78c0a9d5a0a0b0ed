from jassv2_spark.sources.docids import assign_doc_ids  # noqa: F401
