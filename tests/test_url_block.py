"""URL blocklist gating: host/subdomain suffix rule, path keyword rule,
dot-boundary non-matches, empty-list behavior."""

from jassv2_spark.operators.weburls import url_block_flags

HOSTS = ["spam.example", "tracker.net"]
WORDS = ["casino", "viagra"]


def _run(spark, urls, hosts=HOSTS, words=WORDS):
    pages = spark.createDataFrame([(u,) for u in urls], ["url"])
    return {
        r["url"]: (r["host_blocked"], r["path_blocked"], r["keep"])
        for r in url_block_flags(pages, hosts, words).collect()
    }


def test_host_and_subdomain_block(spark):
    got = _run(spark, [
        "https://spam.example/page",
        "https://ads.spam.example/x",
        "https://notspam.example/x",
        "https://goodsite.org/a",
    ])
    assert got["https://spam.example/page"] == (True, False, False)
    assert got["https://ads.spam.example/x"] == (True, False, False)
    # dot boundary: 'notspam.example' is NOT a subdomain of 'spam.example'
    assert got["https://notspam.example/x"] == (False, False, True)
    assert got["https://goodsite.org/a"] == (False, False, True)


def test_path_keyword_block_case_insensitive(spark):
    got = _run(spark, [
        "https://ok.org/best-CASINO-bonus",
        "https://ok.org/article?ref=ViAgRa",
        "https://ok.org/casinoville",  # substring rule: still blocked
        "https://ok.org/clean",
        "https://casino.org/clean-path",  # keyword in HOST only -> not path rule
    ])
    assert got["https://ok.org/best-CASINO-bonus"][1] is True
    assert got["https://ok.org/article?ref=ViAgRa"][1] is True
    assert got["https://ok.org/casinoville"][1] is True
    assert got["https://ok.org/clean"] == (False, False, True)
    assert got["https://casino.org/clean-path"] == (False, False, True)


def test_empty_lists_keep_everything(spark):
    got = _run(spark, ["https://spam.example/casino"], hosts=[], words=[])
    assert got["https://spam.example/casino"] == (False, False, True)
