"""FASTA ingest + k-mer tokenizer vs the reference goldens
(`source/parser_fasta.cpp:92-130` unittest, `source/instream_document_fasta.cpp:146-190`)."""

from jassv2_spark.sources.fasta import (
    _split_fasta,
    build_fasta_index,
    kmer_tokens,
    split_fasta_documents,
)

REF_DOC = ">NR_118889.1\nG GTC\nTTA TAxGxxGATTCAx"


def test_kmer_golden_reference_unittest():
    # parser_fasta.cpp unittest, k=5: header text tokens then sequence k-mers
    assert kmer_tokens(REF_DOC, k=5) == [
        "nr", "118889", "1",
        "ggtct", "gtctt", "tctta", "cttat", "ttata", "gattc", "attca",
    ]


def test_kmer_edge_cases():
    assert kmer_tokens(None) == []
    assert kmer_tokens(">x\nACG", k=5) == ["x"]  # run shorter than k
    assert kmer_tokens(">x\nA C\nGT\tA", k=5) == ["x", "acgta"]  # ws never breaks
    assert kmer_tokens(">x\nACGTNACGT", k=4) == ["x", "acgt", "acgt"]  # N splits


def test_record_split_reference_semantics():
    # boundary is "\n>"; a key line may contain further '>' chars
    text = (">NR_118889.1\nGGTC\nTTAA\n"
            ">NR_074334.1 >NR_118873.1\nACGT\n"
            ">NR_118890.1\nTTTT")
    recs = _split_fasta(text)
    assert [k for k, _ in recs] == [
        ">NR_118889.1", ">NR_074334.1 >NR_118873.1", ">NR_118890.1"]
    assert recs[0][1] == ">NR_118889.1\nGGTC\nTTAA\n"  # boundary \n kept
    assert recs[2][1] == ">NR_118890.1\nTTTT"


def test_fasta_split_and_index_end_to_end(spark):
    import random

    rng = random.Random(7)
    recs = []
    for i in range(30):
        seq = "".join(rng.choice("ACGT") for _ in range(rng.randint(20, 60)))
        recs.append(f">SEQ_{i:04d}.1\n{seq}")
    blob = "\n".join(recs)
    docs = split_fasta_documents(spark.createDataFrame([(blob,)], ["blob"]))
    assert docs.count() == 30
    idx = build_fasta_index(docs, k=5)
    # query with a k-mer drawn from record 0's sequence
    probe = recs[0].split("\n")[1][:5].lower()
    from jassv2_spark.operators.search import search

    q = spark.createDataFrame([("q1", probe)], ["query_id", "query"])
    hits = search(idx, q, k=10).collect()
    assert any(r["key"] == ">SEQ_0000.1" for r in hits)
    idx.unpersist()
