from jassv2_spark.sources.docids import assign_doc_ids  # noqa: F401
from jassv2_spark.sources.fasta import split_fasta_documents  # noqa: F401
from jassv2_spark.sources.webpages import build_web_index, synthesize_webpages  # noqa: F401
