"""aHash perceptual fingerprint: byte-exact re-simulation."""

from jassv2_spark.operators.multimodal import ahash_64


def _py_ahash(payload: bytes) -> str:
    pre = payload[:64]
    mean = sum(pre) // len(pre)
    bits = ["1" if b > mean else "0" for b in pre]
    bits += ["0"] * (64 - len(bits))
    return "".join(bits)


PAYLOADS = {
    1: b"abcABCxyz" * 10,        # > 64 bytes
    2: b"short",                  # < 64 bytes, zero-padded tail
    3: b"abcABCxyz" * 10,        # exact dup of 1
    4: bytes(range(64)),          # full ramp
    5: b"\x00" * 64,              # all-equal: no byte > mean -> all zeros
}


def test_ahash_matches_simulation(spark):
    media = spark.createDataFrame(
        [(i, "image", p, None) for i, p in sorted(PAYLOADS.items())],
        "media_id long, kind string, payload binary, meta string",
    )
    got = {
        r["media_id"]: (r["n_bytes"], r["ahash"], r["n_same"])
        for r in ahash_64(media).collect()
    }
    for i, p in PAYLOADS.items():
        same = sum(1 for q in PAYLOADS.values() if _py_ahash(q) == _py_ahash(p))
        assert got[i] == (len(p), _py_ahash(p), same), i
    assert got[5][1] == "0" * 64
    assert got[1][2] >= 2  # dup pair found
