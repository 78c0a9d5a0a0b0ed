"""Fletcher-16 vs the reference goldens (`source/checksum.cpp:104-149`)."""

import numpy as np

from jassv2_spark.fixtures import ten_documents
from jassv2_spark.functions.checksum import fletcher_16, fletcher_16_file


def test_reference_goldens():
    assert fletcher_16(b"") == 0x0000
    assert fletcher_16("a") == 0x6161
    assert fletcher_16("z") == 0x7A7A
    # the reference's ten-document corpus string, rebuilt from our fixtures
    blob = b"".join(r["html"] for r in ten_documents())
    assert fletcher_16(blob) == 0xF7DE


def test_blocked_equals_scalar_loop():
    rng = np.random.default_rng(3)
    for n in (0, 1, 254, 255, 256, 70000, 200001):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        s1 = s2 = 0
        for b in data:
            s1 = (s1 + b) % 255
            s2 = (s2 + s1) % 255
        assert fletcher_16(data) == (s2 << 8) | s1, n


def test_file_variant(tmp_path):
    p = tmp_path / "blob.bin"
    data = bytes(range(256)) * 300
    p.write_bytes(data)
    assert fletcher_16_file(str(p)) == fletcher_16(data)
