"""ECOM19 (eBay eCommerce IR workshop) format converters — the last
reference `tools/` rows (`tools/ECOM19_to_JASS_eval.cpp`,
`tools/ECOM19_to_run.cpp`) re-expressed over DataFrames.

The workshop shipped (a) a documents table `doc_id\\tprice`, (b) wide
assessment / training / run MATRICES whose first row holds query ids and
first column document ids, cells in {1, -1, 0/blank}.  The reference
converts these to its evaluation formats:

* `ECOM19_to_JASS_eval`: one `PRICE 0 <doc> <price %.2f>` pseudo-qrel
  per document, then `<qid> 0 <doc> <rel>` per NONZERO cell with
  rel = 1 for cell 1 and 0 for cell -1, ordered (qid, doc)
  (`ECOM19_to_JASS_eval.cpp:67-133`);
* `ECOM19_to_run`: keep run cells == 1 whose (doc, query) is absent
  from the training matrix, rank each query's kept documents by
  (price ASC, doc_id ASC), and emit
  `<qid> Q0 <doc> <rank> <n-rank+1> <runname>`
  (`ECOM19_to_run.cpp:200-226` — the score column is the reversed rank,
  so trec-style descending-score order reproduces the price sort).

Matrix inputs arrive here in LONG form (doc_id, query_id, value); the
`read_ecom19_*` helpers parse the workshop's wide tab files into that
shape with a plain distributed text scan + per-line split (header row
broadcast), so a 10^8-document matrix never concentrates anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_ecom19_documents(spark: SparkSession, path: str) -> DataFrame:
    """`doc_id\\tprice` with a header line → (doc_id, price)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        lines.where(~F.col("value").rlike("^[^0-9]"))  # skip the header row
        .select(
            parts.getItem(0).cast("long").alias("doc_id"),
            parts.getItem(1).cast("double").alias("price"),
        )
        .where(F.col("doc_id").isNotNull())
    )


def read_ecom19_matrix(spark: SparkSession, path: str,
                       keep_minus_1: bool = True) -> DataFrame:
    """Wide assessments matrix → long (doc_id, query_id, value).  The
    header row (query ids) is read once on the driver (it is one line of
    q query ids — tiny); data rows melt distributively.  Cells other
    than '1' (and '-1' when kept) are dropped, mirroring `read_matrix`
    (`ECOM19_to_run.cpp:79-122`)."""
    lines = spark.read.text(path)
    header = lines.limit(1).collect()[0]["value"]  # one row: the qid list
    qids = [int(x) for x in header.split("\t")[1:] if x.strip()]
    cols = [F.split(F.col("value"), "\t").alias("c")]
    rows = lines.where(~F.col("value").startswith(header.split("\t")[0])).select(*cols)
    melted = rows.select(
        F.element_at("c", 1).cast("long").alias("doc_id"),
        F.posexplode(F.slice("c", 2, len(qids))).alias("pos", "cell"),
    )
    qmap = F.array(*[F.lit(q) for q in qids])
    out = melted.select(
        "doc_id",
        F.element_at(qmap, F.col("pos") + 1).alias("query_id"),
        F.trim("cell").alias("cell"),
    )
    cond = F.col("cell") == "1"
    if keep_minus_1:
        cond = cond | F.col("cell").startswith("-")
    return out.where(cond & F.col("doc_id").isNotNull()).select(
        "doc_id", "query_id",
        F.when(F.col("cell") == "1", F.lit(1)).otherwise(F.lit(-1)).alias("value"),
    )


def ecom19_to_jass_eval(documents: DataFrame, assessments: DataFrame) -> DataFrame:
    """(doc_id, price) × (doc_id, query_id, value∈{1,-1}) → the JASS_eval
    qrel lines: PRICE pseudo-qrels for every document, then one line per
    nonzero assessment with -1 collapsed to 0."""
    price_lines = documents.select(
        F.format_string("PRICE 0 %d %.2f", "doc_id", "price").alias("line")
    )
    qrel_lines = assessments.select(
        F.format_string(
            "%d 0 %d %d", "query_id", "doc_id",
            F.when(F.col("value") == 1, F.lit(1)).otherwise(F.lit(0)),
        ).alias("line")
    )
    return price_lines.unionAll(qrel_lines)


def ecom19_to_run(documents: DataFrame, training: DataFrame, run: DataFrame,
                  run_name: str = "JASSv2spark") -> DataFrame:
    """Run matrix → trec-format run lines, training pairs removed, each
    query ranked by (price ASC, doc_id ASC); score = n - rank + 1.

    Scale shape: anti-join on (doc_id, query_id) then one window per
    query partition — no driver-side matrix, no all-pairs work."""
    kept = (
        run.where(F.col("value") == 1)
        .join(training.select("doc_id", "query_id"), ["doc_id", "query_id"], "left_anti")
        .join(F.broadcast(documents), "doc_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("price").asc(), F.col("doc_id").asc())
    ranked = (
        kept.withColumn("rank", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("query_id")))
    )
    return ranked.select(
        "query_id", "doc_id", "rank",
        (F.col("n") - F.col("rank") + 1).alias("score"),
        F.format_string(
            "%d Q0 %d %d %d " + run_name, "query_id", "doc_id", "rank",
            (F.col("n") - F.col("rank") + 1),
        ).alias("line"),
    )
