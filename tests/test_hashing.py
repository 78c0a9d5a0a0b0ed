"""Pure-Python xxhash64 must be bitwise-identical to Spark's F.xxhash64.

This parity is load-bearing: the SaaT package directory is bucketed by the
JVM expression ``pmod(xxhash64(term), n)`` (operators/saat.py) and workers
re-derive the bucket in Python (functions/hashing.py) — one bit of
divergence silently drops a term from every query.
"""

import random
import string

from pyspark.sql import functions as F

from jassv2_spark.functions.hashing import term_bucket, xxhash64


def _samples():
    random.seed(7)
    out = ["", "a", "ab", "abc", "the", "zebra", "w0001", "café", "naïve-ß",
           "日本語テスト", "🚀🚀", "\x00\x01", " spaces  inside "]
    # every tail-length regime of the algorithm: <4, 4-7, 8-31, 32+, and
    # each residue mod 8/4 past the 32-byte stripe loop
    for length in [3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 39, 40, 41,
                   63, 64, 65, 100, 257]:
        out.append("".join(random.choices(string.ascii_lowercase + string.digits + "é日", k=length)))
    return out


def test_xxhash64_matches_spark(spark):
    samples = _samples()
    df = spark.createDataFrame([(s,) for s in samples], ["t"])
    got = {
        r["t"]: (r["h"], r["b7"], r["b32"])
        for r in df.select(
            "t",
            F.xxhash64("t").alias("h"),
            F.pmod(F.xxhash64("t"), F.lit(7)).cast("long").alias("b7"),
            F.pmod(F.xxhash64("t"), F.lit(32)).cast("long").alias("b32"),
        ).collect()
    }
    for s in samples:
        assert (xxhash64(s.encode("utf-8")), term_bucket(s, 7), term_bucket(s, 32)) == got[s], repr(s)


def test_xxhash64_signed_range():
    # Spark's value is a SIGNED long; ours must land in the same range
    for s in _samples():
        h = xxhash64(s.encode("utf-8"))
        assert -(1 << 63) <= h < (1 << 63)
