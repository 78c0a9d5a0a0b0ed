

# ------------------------------------------------------- readability

def test_readability_counts_and_grade(spark):
    from jassv2_spark.operators.textstats import readability_scores
    import math

    docs = spark.createDataFrame(
        [
            (1, "The table is blue. It works fine! Really?"),
            (2, "word"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    r1 = out[1]
    assert r1["n_sentences"] == 3
    assert r1["n_words"] == 8
    # syllables: the(1) table(2-1=1 silent-e... groups a,e=2 ends 'le'→1)
    # is(1) blue(1) it(1) works(1) fine(groups i,e=2 ends ne→1) really(2)
    assert r1["n_syllables"] == 1 + 1 + 1 + 1 + 1 + 1 + 1 + 2
    w, s, y = 8, 3, 9
    want = math.floor(1e6 * (0.39 * (w / s) + 11.8 * (y / w) - 15.59))
    assert r1["fk_grade_micros"] == want
    # single word, no terminator: 1 sentence minimum
    assert out[2]["n_sentences"] == 1 and out[2]["n_words"] == 1
    # empty doc: grade undefined
    assert out[3]["n_words"] == 0 and out[3]["fk_grade_micros"] is None


def test_cross_source_dup_matrix(spark):
    from jassv2_spark.operators.textstats import cross_source_dups

    docs = spark.createDataFrame(
        [
            (1, "shared one", "cc"),
            (2, "shared one", "books"),     # cc∩books via 'shared one'
            (3, "shared two", "cc"),
            (4, "shared two", "books"),
            (5, "shared two", "wiki"),      # in all three
            (6, "only cc", "cc"),
            (7, "shared one", "cc"),        # same (hash, source) dup: counted once
        ],
        ["doc_id", "text", "source"],
    )
    out = {(r["source_a"], r["source_b"]): r["n_shared_texts"]
           for r in cross_source_dups(docs).collect()}
    assert out == {("books", "cc"): 2, ("books", "wiki"): 1, ("cc", "wiki"): 1}


def test_char_entropy_separates_runs_from_text(spark):
    from jassv2_spark.operators.textstats import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaaaaaaaaaa"), (2, "The quick brown fox jumps."), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert out[1]["entropy_cbits"] == 0          # single repeated char
    assert out[2]["entropy_cbits"] > 50          # natural text
    assert tuple(out[3]) == (3, 0, 0, 0)
    # python reference for doc 2
    t = "the quick brown fox jumps."
    n = len(t)
    want = sum(
        t.count(c) * (n.bit_length() - t.count(c).bit_length())
        for c in set(t)
    )
    assert out[2]["entropy_cbits"] == want


def test_mojibake_signal_counts(spark):
    from jassv2_spark.operators.textstats import mojibake_signals

    docs = spark.createDataFrame(
        [
            (1, "clean text"),
            (2, "bad \uFFFD and \uFFFD twice"),
            (3, "c1 here \u0085 and \u0092"),
            (4, "curly \u00e2\u20ac\u2122 and \u00e2\u20ac\u0153 mangled"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in mojibake_signals(docs).collect()}
    assert out[1]["is_suspect"] is False
    assert out[2]["n_replacement"] == 2 and out[2]["is_suspect"] is True
    assert out[3]["n_c1_controls"] == 2
    assert out[4]["n_cp1252_sigs"] == 2
