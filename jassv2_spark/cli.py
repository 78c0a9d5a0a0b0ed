"""Command-line parity: the reference's three user-facing binaries.

A JASSv2 user drives the engine through `JASS_index` (build,
`tools/JASS_index.cpp:60-96` flags), `JASS_anytime` (serve,
`anytime/JASS_anytime.cpp:38-52` flags) and `JASS_eval` (evaluate,
`tools/JASS_eval.cpp:55-66` flags). These entry points accept the same
spellings (ASCII aliases for the reference's unicode rho flags) so the
muscle-memory workflow ports:

  python -m jassv2_spark.cli index   -f docs.trec -tp -o ./ix
  python -m jassv2_spark.cli anytime -i ./ix -q queries.txt -k 10 -rr 35
  python -m jassv2_spark.cli eval    -a qrels.txt -r ranking.txt -p

Unicode flag aliases: the reference uses -⌊r⌋/-⌊R⌋/-ℝ for the rho-minimum
and relative-rho knobs; here they are -rm / -Rm / -rr.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def _spark(app: str) -> SparkSession:
    from jassv2_spark.session import get_spark

    return get_spark(app_name=app)


# ----------------------------------------------------------------- index

def jass_index_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="jass index", description="Build an index (JASS_index parity)")
    p.add_argument("-f", "--filename", required=True, help="file to index")
    fmt = p.add_mutually_exclusive_group()
    fmt.add_argument("-dt", "--document_TREC", action="store_true", help="TREC <DOC> format (default)")
    fmt.add_argument("-djc", "--document_JSON_uniCOIL", action="store_true", help="uniCOIL JSON lines")
    fmt.add_argument("-IF", "--index_FASTA", type=int, metavar="K", help="FASTA k-mer index of width K")
    p.add_argument("-tp", "--term_stemming_porter", action="store_true", help="Porter v1 stemming")
    p.add_argument("-Ib", "--index_binary", action="store_true", help="also dump raw postings integers")
    p.add_argument("-If", "--index_forward", action="store_true", help="also write a forward index")
    p.add_argument("-o", "--out", default="./index_spark", help="index output directory")
    p.add_argument("-q", "--nologo", action="store_true")
    p.add_argument("-N", "--report-every", type=int, default=None, dest="report_every",
                   help="(accepted, no-op: progress comes from the Spark UI/event log)")
    a = p.parse_args(argv)

    from jassv2_spark.operators.build import BuildConf, build_index, build_prequantized_index
    from jassv2_spark.plans.persist import save_index_tables

    spark = _spark("jass-index")
    with open(a.filename, "rb") as f:
        blob = f.read()
    blobs = spark.createDataFrame([(blob,)], "blob binary")
    conf = BuildConf(stem=a.term_stemming_porter)

    if a.document_JSON_uniCOIL:
        from jassv2_spark.sources.instreams import read_unicoil_json

        lines = spark.createDataFrame(
            [(ln,) for ln in blob.decode("utf-8", "replace").splitlines() if ln.strip()],
            "line string",
        )
        index = build_prequantized_index(read_unicoil_json(lines), conf=conf)
    elif a.index_FASTA:
        from jassv2_spark.sources.fasta import build_fasta_index, split_fasta_documents

        index = build_fasta_index(split_fasta_documents(blobs), k=a.index_FASTA, conf=conf)
    else:
        from jassv2_spark.sources.instreams import split_trec_documents

        docs = split_trec_documents(blobs)
        index = build_index(docs, text_col="contents", key_col="primary_key", conf=conf)

    save_index_tables(index, a.out)
    if a.index_binary:
        from jassv2_spark.plans.export import integer_segments

        integer_segments(index).write.mode("overwrite").parquet(f"{a.out}/CIpostings_integers")
    if a.index_forward:
        from jassv2_spark.plans.export import forward_index

        forward_index(index).write.mode("overwrite").parquet(f"{a.out}/CIforward")
    if not a.nologo:
        print(f"indexed {index.n_docs} documents -> {a.out}")
    return 0


# --------------------------------------------------------------- anytime

def jass_anytime_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="jass anytime", description="Top-k serving (JASS_anytime parity)")
    p.add_argument("-i", "--index", required=True, help="index directory (from `jass index`)")
    p.add_argument("-q", "--queryfile", required=True,
                   help="queries, 1/line, line = <query-id> <terms...>")
    p.add_argument("-k", "--top-k", dest="top_k", type=int, default=10)
    p.add_argument("-a", "--asciiparser", action="store_true",
                   help="raw pre-casefolded whitespace tokens (parser_query.cpp:112-143)")
    p.add_argument("-r", "--rho", type=float, default=None,
                   help="max postings as PERCENT of collection doc count")
    p.add_argument("-rm", "--rho_min", type=float, default=None,
                   help="min postings as PERCENT of collection doc count (ref -⌊r⌋)")
    p.add_argument("-R", "--RHO", type=int, default=None, help="max postings, absolute")
    p.add_argument("-Rm", "--RHO_min", type=int, default=None, help="min postings, absolute (ref -⌊R⌋)")
    p.add_argument("-rr", "--Relative_RHO", type=float, default=None,
                   help="max postings as PERCENT of this query's postings (ref -ℝ)")
    p.add_argument("-Q", "--queryrsvfile", default=None,
                   help="oracle rsv@k file, 1/line: <query_id> <rsv>")
    p.add_argument("-o", "--output", default="ranking.txt", help="TREC run output file")
    # accepted for reference-command-line compatibility; managed by Spark
    p.add_argument("-t", "--threads", type=int, default=None,
                   help="(accepted, no-op: Spark schedules query partitions)")
    p.add_argument("-w", "--width", type=int, default=None,
                   help="(accepted, no-op: accumulator layout is automatic)")
    p.add_argument("-2", "--v2_index", action="store_true", dest="v2_index",
                   help="(accepted, no-op: one on-disk format here)")
    a = p.parse_args(argv)
    if a.threads or a.width:
        print("note: -t/-w are managed by Spark; flags accepted for compatibility")

    from jassv2_spark.engine import Engine

    spark = _spark("jass-anytime")
    eng = Engine.load(spark, a.index)
    eng.set_top_k(a.top_k)
    if a.asciiparser:
        eng.use_ascii_parser()
    if a.rho is not None:
        eng.set_postings_to_process_proportion(a.rho)
    if a.RHO is not None:
        eng.set_postings_to_process(a.RHO)
    if a.Relative_RHO is not None:
        eng.set_postings_to_process_relative(a.Relative_RHO)
    if a.rho_min is not None:
        eng.set_postings_to_process_proportion_minimum(a.rho_min)
    if a.RHO_min is not None:
        eng.set_postings_to_process_minimum(a.RHO_min)

    queries = []
    with open(a.queryfile) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                queries.append((parts[0], parts[1]))
    qdf = spark.createDataFrame(queries, ["query_id", "query"])

    if a.queryrsvfile:
        rows = []
        with open(a.queryrsvfile) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    rows.append((parts[0], int(parts[1])))
        eng.load_oracle_scores(spark.createDataFrame(rows, "query_id string, rsv_at_k long"))

    results = eng.search(qdf)
    lines = [r["line"] for r in eng.trec_run(results).collect()]
    with open(a.output, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    print(f"{len(queries)} queries -> {a.output} ({len(lines)} result lines)")
    return 0


# ------------------------------------------------------------------ eval

def jass_eval_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="jass eval", description="Run evaluation (JASS_eval parity)")
    p.add_argument("-a", "--assessmentfile", required=True,
                   help="TREC qrels; JASS PRICE extension rows ('PRICE 0 <doc> <price>') supported")
    p.add_argument("-r", "--runfile", required=True, help="TREC 6-column run file")
    p.add_argument("-k", "--k_equals", type=int, default=10)
    p.add_argument("-n", "--n_equals", type=int, default=10, help="depth (P@n etc.)")
    p.add_argument("-P", "--probability", type=float, default=0.95, help="RBP persistence")
    p.add_argument("-p", "--perquery", action="store_true", help="per-query rows, not just means")
    a = p.parse_args(argv)

    from jassv2_spark.operators.evaluate import evaluate_run, evaluate_run_priced, mean_metrics

    spark = _spark("jass-eval")
    qrels_rows, price_rows = [], []
    with open(a.assessmentfile) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 4:
                continue
            topic, _, doc, val = parts
            if topic == "PRICE":  # JASS price extension (JASS_eval.cpp:757)
                price_rows.append((doc, float(val)))
            elif float(val) > 0:
                qrels_rows.append((topic, doc))
    run_rows = []
    with open(a.runfile) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 6:
                run_rows.append((parts[0], parts[2], int(parts[3])))

    run = spark.createDataFrame(run_rows, "query_id string, doc_id string, rank long")
    qrels = spark.createDataFrame(qrels_rows, "query_id string, doc_id string")
    if price_rows:
        from pyspark.sql import functions as F

        prices = spark.createDataFrame(price_rows, "doc_id string, price double")
        per_q = evaluate_run_priced(run, qrels, prices, depth=a.n_equals, k4=a.k_equals)
        means_df = per_q.agg(
            F.count(F.lit(1)).alias("n_queries"),
            *[
                F.avg(c).alias(f"mean_{c}")
                for c, t in per_q.dtypes
                if c not in ("query_id", "n_rel", "n_ret") and t in ("double", "bigint")
            ],
        )
    else:
        per_q = evaluate_run(run, qrels, depth=a.n_equals, rbp_p=a.probability, k4=a.k_equals)
        means_df = mean_metrics(per_q)
    if a.perquery:
        for row in sorted(per_q.collect(), key=lambda r: r["query_id"]):
            for metric, val in row.asDict().items():
                if metric != "query_id":
                    print(f"{metric}\t{row['query_id']}\t{val}")
    means = means_df.collect()[0]
    for metric, val in means.asDict().items():
        print(f"{metric}\tall\t{val}")
    return 0


# ----------------------------------------------------------------- curate

def jass_curate_main(argv: list[str]) -> int:
    """Training-data curation front-end (beyond the reference's binaries —
    the pipeline family): run the lang → quality → near-dup funnel over a
    parquet documents table, print the per-stage report, and optionally
    write the surviving corpus for `index` to consume."""
    p = argparse.ArgumentParser(prog="jass curate", description="Curate a document corpus")
    p.add_argument("-f", "--filename", required=True, help="documents parquet path")
    p.add_argument("-o", "--out", default=None, help="write surviving docs parquet here")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--langs", default="en", help="comma-separated language allow-list")
    p.add_argument("--min-words", type=int, default=20)
    p.add_argument("--max-words", type=int, default=100_000)
    p.add_argument("--min-stop-hits", type=int, default=1)
    a = p.parse_args(argv)

    from jassv2_spark.operators.curation import curate_corpus, curate_funnel

    spark = _spark("jass-curate")
    docs = spark.read.parquet(a.filename)
    kw = dict(
        text_col=a.text_col, id_col=a.id_col,
        langs=tuple(a.langs.split(",")), min_words=a.min_words,
        max_words=a.max_words, min_stop_hits=a.min_stop_hits,
    )
    for r in curate_funnel(docs, **kw).collect():
        print(f"{r.stage:10s} in={r.n_in:>10} dropped={r.n_dropped:>10} out={r.n_out:>10}")
    if a.out:
        curate_corpus(docs, **kw).write.mode("overwrite").parquet(a.out)
        print(f"survivors written to {a.out}")
    return 0


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help", "-?"):
        print("usage: python -m jassv2_spark.cli {index|anytime|eval|curate} [flags]\n"
              "       (JASS_index / JASS_anytime / JASS_eval parity + curation pipeline)")
        return 0 if len(sys.argv) >= 2 else 1
    cmd, rest = sys.argv[1], sys.argv[2:]
    if cmd == "index":
        return jass_index_main(rest)
    if cmd == "anytime":
        return jass_anytime_main(rest)
    if cmd == "eval":
        return jass_eval_main(rest)
    if cmd == "curate":
        return jass_curate_main(rest)
    print(f"unknown subcommand {cmd!r}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
