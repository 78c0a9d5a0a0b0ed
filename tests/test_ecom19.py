"""ECOM19 converters (`tools/ECOM19_to_JASS_eval.cpp`,
`tools/ECOM19_to_run.cpp`) and the bin_to_human postings dump
(`tools/bin_to_human.cpp`)."""

import os
import tempfile

import pytest


DOCFILE = "docid\tprice\n1\t10.00\n2\t2.50\n3\t2.50\n4\t99.99\n"
# matrix: header row = query ids; cells 1 / -1 / 0
MATRIX = (
    "docid\t101\t102\n"
    "1\t1\t0\n"
    "2\t-1\t1\n"
    "3\t0\t1\n"
    "4\t1\t-1\n"
)


@pytest.fixture()
def ecom_files(tmp_path):
    docp = tmp_path / "docs.tsv"
    docp.write_text(DOCFILE)
    matp = tmp_path / "assess.tsv"
    matp.write_text(MATRIX)
    return str(docp), str(matp)


def test_read_ecom19_inputs(spark, ecom_files):
    from jassv2_spark.operators.ecom19 import (read_ecom19_documents,
                                               read_ecom19_matrix)

    docp, matp = ecom_files
    docs = {r["doc_id"]: r["price"] for r in read_ecom19_documents(spark, docp).collect()}
    assert docs == {1: 10.0, 2: 2.5, 3: 2.5, 4: 99.99}
    cells = {(r["doc_id"], r["query_id"]): r["value"]
             for r in read_ecom19_matrix(spark, matp).collect()}
    assert cells == {(1, 101): 1, (2, 101): -1, (2, 102): 1,
                     (3, 102): 1, (4, 101): 1, (4, 102): -1}
    # -1 dropped when keep_minus_1=False (run matrices)
    runs = read_ecom19_matrix(spark, matp, keep_minus_1=False).collect()
    assert all(r["value"] == 1 for r in runs) and len(runs) == 4


def test_ecom19_to_jass_eval_lines(spark, ecom_files):
    """Exact reference output: PRICE pseudo-qrels (%.2f) then one line per
    nonzero cell with -1 → 0 (`ECOM19_to_JASS_eval.cpp:67-133`)."""
    from jassv2_spark.operators.ecom19 import (ecom19_to_jass_eval,
                                               read_ecom19_documents,
                                               read_ecom19_matrix)

    docp, matp = ecom_files
    lines = sorted(
        r["line"] for r in ecom19_to_jass_eval(
            read_ecom19_documents(spark, docp),
            read_ecom19_matrix(spark, matp)).collect()
    )
    assert lines == sorted([
        "PRICE 0 1 10.00", "PRICE 0 2 2.50", "PRICE 0 3 2.50", "PRICE 0 4 99.99",
        "101 0 1 1", "101 0 2 0", "101 0 4 1",
        "102 0 2 1", "102 0 3 1", "102 0 4 0",
    ])


def test_ecom19_to_run_rank_by_price(spark, ecom_files):
    """Run lines: training pairs removed, rank by price ASC then doc ASC,
    score = n - rank + 1 (`ECOM19_to_run.cpp:200-226`)."""
    from jassv2_spark.operators.ecom19 import (ecom19_to_run,
                                               read_ecom19_documents,
                                               read_ecom19_matrix)

    docp, matp = ecom_files
    docs = read_ecom19_documents(spark, docp)
    # run: docs 1,2,3,4 relevant for q101; training removes doc 4
    run = spark.createDataFrame(
        [(d, 101, 1) for d in (1, 2, 3, 4)], ["doc_id", "query_id", "value"])
    training = spark.createDataFrame([(4, 101, 1)], ["doc_id", "query_id", "value"])
    lines = [r["line"] for r in
             ecom19_to_run(docs, training, run, run_name="T").orderBy("rank").collect()]
    # price order: 2 (2.50), 3 (2.50, doc tie-break), 1 (10.00); doc 4 removed
    assert lines == ["101 Q0 2 1 3 T", "101 Q0 3 2 2 T", "101 Q0 1 3 1 T"]


def test_bin_to_human_roundtrip(spark):
    """bin_to_human parses back exactly what write_serialise_integers
    wrote (the byte format itself is differentially proven vs
    `JASS_index -Ib`)."""
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.plans.export import (bin_to_human,
                                           read_serialise_integers,
                                           write_serialise_integers)

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog fish"), (3, "cat")], ["doc_id", "text"])
    idx = build_index(docs, text_col="text", key_col="doc_id",
                      doc_id_col="doc_id", conf=BuildConf(tokenizer="parity"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "postings.bin")
        write_serialise_integers(idx, path)
        lists = read_serialise_integers(path)
        human = bin_to_human(path)
    # every (term, impact) segment appears once; lengths sum to postings
    n_postings = idx.impacts.count()
    assert sum(n for n, _ids in lists) == n_postings
    assert all(len(ids) == n and ids == sorted(ids) for n, ids in lists)
    assert human[0].startswith(f"{lists[0][0]}:")
    assert human[0].endswith(" ")
    idx.unpersist()
