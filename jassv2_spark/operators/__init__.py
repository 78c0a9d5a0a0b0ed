from jassv2_spark.operators.build import BuildConf, Index, build_index  # noqa: F401
from jassv2_spark.operators.search import (  # noqa: F401
    parse_queries,
    search,
    search_metrics,
    trec_run,
)
