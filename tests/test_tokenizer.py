"""Tokenizer parity tests against the reference parser's own goldens.

Golden expectations transcribed from `source/parser.cpp::unittest`
(parser.cpp:454-588) and `source/parser_query.cpp::unittest`, restricted to
*indexable* (alpha/numeric) tokens since only those reach the index
(`tools/JASS_index.cpp:303-330`).
"""

from jassv2_spark.functions.tokenizer import extract_text, fold, tokenize


def test_unicode_mix_golden():
    # parser.cpp:461-479: full token stream is
    # abc 123 αβγ 123 aβc 123 αbγ 123 ab [c:other] 123 αβγ 123
    # the "c" comes from ℃ (NFKD "°C" → strip → "C" → fold "c") but as an
    # *other* token — not indexable.
    text = "abc123 αβγ①②③ aβc1②3 αbγ①2③ ab℃½3         αβγ½③"
    expected = [
        "abc", "123",
        "αβγ", "123",
        "aβc", "123",
        "αbγ", "123",
        "ab", "123",
        "αβγ", "123",
    ]
    assert tokenize(text) == expected


def test_xml_golden():
    # parser.cpp:514-543: the indexable tokens of the XML torture string are
    # exactly notopen / notclose / notempty (tags, PI, comment, CDATA,
    # DOCTYPE, conditionals are all consumed without indexing).
    xml = (
        '<![ INCLUDE [<!DOCTYPE note SYSTEM "Note.dtd"><DOC a="\'h">'
        "<?JASS ignore?><!--rem--><![CDATA[<t>text</t>]]><empty/>"
        "< notopen></ notclose>< notempty/></DOC>]]> "
    )
    assert tokenize(xml) == ["notopen", "notclose", "notempty"]


def test_counts_from_reference_unittest():
    # parser.cpp:564-586, restricted to indexable tokens.
    assert tokenize(" Z  ") == ["z"]
    assert tokenize("Zap") == ["zap"]
    assert tokenize("123") == ["123"]
    # "<![t]>" → other tokens ! [ ] > plus the alpha token t
    assert tokenize("<![t]>") == ["t"]
    # "<name at='val'>" → a start tag only, nothing indexable
    assert tokenize("<name at='val'>") == []


def test_folding():
    assert fold("①") == "1"
    assert fold("½") == "12"
    assert fold("℃") == "c"
    assert fold("A") == "a"
    assert fold("ß") == "ss"


def test_alpha_numeric_split():
    assert tokenize("abc123def45") == ["abc", "123", "def", "45"]
    assert tokenize("Hello, World! 42") == ["hello", "world", "42"]


def test_query_mode_no_markup():
    # parser_query.cpp: '<' is punctuation in queries.
    assert tokenize("<doc> ten", xml=False) == ["doc", "ten"]
    assert tokenize("<doc> ten", xml=True) == ["ten"]


def test_max_token_truncation():
    long = "a" * 3000
    assert tokenize(long) == ["a" * 1024]
    assert tokenize(long + " b") == ["a" * 1024, "b"]


def test_extract_text_trec_roundtrip():
    body = "ten nine eight"
    html = f"<DOC><DOCNO>7</DOCNO>{body}</DOC>".encode()
    assert extract_text(html) == body
    assert extract_text(None) == ""


def test_empty_and_whitespace():
    assert tokenize("") == []
    assert tokenize("   \t\n ") == []
    assert tokenize(None) == []


def test_spark_udf_matches_python(spark):
    import pyspark.sql.functions as F

    from jassv2_spark.functions.tokenizer import make_tokenize_udf, spark_tokens

    rows = [
        ("abc123 αβγ①②③ aβc1②3",),
        ("<DOC><DOCNO>1</DOCNO>ten nine</DOC>",),
        ("plain ascii text 42",),
        (None,),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = df.select(make_tokenize_udf(xml=True)(F.col("text")).alias("toks")).collect()
    for (want,), (gotrow,) in zip(rows, got):
        assert gotrow == tokenize(want, xml=True)

    # JVM ascii path == parity path on simple ASCII
    simple = spark.createDataFrame([("the quick brown fox 99",)], ["text"])
    a = simple.select(spark_tokens("text", mode="ascii").alias("t")).first()["t"]
    b = simple.select(spark_tokens("text", mode="parity").alias("t")).first()["t"]
    assert a == b == ["the", "quick", "brown", "fox", "99"]


def test_raw_query_tokenizer_goldens():
    """`-a` raw query mode (`source/parser_query.cpp:112-143`), golden from
    the reference unittest (`parser_query.cpp:225-231`): " . ; A " keeps
    punctuation and case, splits only on ASCII whitespace."""
    from jassv2_spark.functions.tokenizer import tokenize_raw

    assert tokenize_raw(" . ; A ") == [".", ";", "A"]
    assert tokenize_raw("Example") == ["Example"]
    assert tokenize_raw("  hash-table\tJOIN\n12a ") == ["hash-table", "JOIN", "12a"]
    assert tokenize_raw("a\x0bb\x0cc") == ["a", "b", "c"]  # \v \f are separators
    assert tokenize_raw("café naïve x") == ["café", "naïve x"]  # NBSP is NOT ASCII ws
    assert tokenize_raw(None) == []
    assert tokenize_raw("   ") == []


def test_raw_mode_spark_parity(spark):
    """spark_tokens(mode='raw') (pure JVM) must agree with tokenize_raw."""
    from pyspark.sql import functions as F

    from jassv2_spark.functions.tokenizer import spark_tokens, tokenize_raw

    texts = [" . ; A ", "Example Query", "a\x0bb\x0cc", "café naïve x",
             "  hash-table\tJOIN\n12a ", "", "   "]
    df = spark.createDataFrame([(t,) for t in texts], ["query"])
    got = [r["toks"] for r in df.select(spark_tokens("query", mode="raw", xml=False).alias("toks")).collect()]
    assert got == [tokenize_raw(t) for t in texts]
