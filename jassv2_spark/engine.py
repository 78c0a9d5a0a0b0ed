"""Public API: the PySpark analogue of the pyjass surface.

The reference's SWIG-wrapped Python API (`anytime/PyJASS.swg`,
`anytime/JASS_anytime_api.h:49-394`) exposes load_index/search/set_top_k/
set_postings_to_process; ours is a thin class over DataFrames with the same
knobs, returning DataFrames instead of result structs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jassv2_spark.operators.build import BuildConf, Index, build_index
from jassv2_spark.operators.search import (
    DEFAULT_K,
    search,
    search_metrics,
    trec_run,
)


class Engine:
    """build → search lifecycle, mirroring pyjass `anytime()` usage."""

    def __init__(self, index: Index):
        self.index = index
        self.top_k = DEFAULT_K
        self.rho = 1.0
        self.postings_budget: int | None = None

    # -- construction -------------------------------------------------
    @classmethod
    def build(
        cls,
        documents: DataFrame,
        *,
        text_col: str = "text",
        key_col: str = "url",
        doc_id_col: str | None = None,
        conf: BuildConf | None = None,
    ) -> "Engine":
        return cls(
            build_index(
                documents,
                text_col=text_col,
                key_col=key_col,
                doc_id_col=doc_id_col,
                conf=conf,
            )
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Engine":
        from jassv2_spark.plans.persist import load_index_tables

        return cls(load_index_tables(spark, path))

    def save(self, path: str) -> None:
        from jassv2_spark.plans.persist import save_index_tables

        save_index_tables(self.index, path)

    # -- knobs (reference: JASS_anytime_api.h) ------------------------
    def set_top_k(self, k: int) -> None:
        self.top_k = k

    def set_postings_to_process_proportion(self, rho: float) -> None:
        self.rho = rho

    def set_postings_to_process(self, budget: int) -> None:
        self.postings_budget = budget

    def get_document_count(self) -> int:
        return self.index.n_docs

    # -- serving -------------------------------------------------------
    def search(self, queries: DataFrame, k: int | None = None) -> DataFrame:
        return search(
            self.index,
            queries,
            k=k or self.top_k,
            rho=self.rho,
            postings_budget=self.postings_budget,
        )

    def search_metrics(self, queries: DataFrame) -> DataFrame:
        return search_metrics(
            self.index, queries, rho=self.rho, postings_budget=self.postings_budget
        )

    def trec_run(self, results: DataFrame, run_name: str = "JASSv2spark") -> DataFrame:
        return trec_run(results, run_name)
