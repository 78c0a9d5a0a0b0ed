"""Fletcher-16 checksum — the reference's golden-file verifier.

The reference checksums its four serialized index files in regression
tests with Fletcher's 16-bit checksum (`source/checksum.cpp:20-60`,
used from the unittest harness). Same algorithm here so persisted-index
golden files can be cross-checked against reference-style sums:
sum1 = (sum1 + byte) mod 255, sum2 = (sum2 + sum1) mod 255 per byte,
result (sum2 << 8) | sum1.

Implementation is numpy-blocked instead of byte-at-a-time: within a block
of n bytes, sum1' = sum1 + Σb_i and sum2' = sum2 + n·sum1 + Σ (n-i)·b_i
(all mod 255), which gives the C loop's exact value with two vector
reductions per block. Reference goldens (`checksum.cpp:104-149`):
"" → 0x0000, "a" → 0x6161, "z" → 0x7A7A, ten-documents → 0xF7DE.
"""

from __future__ import annotations

import numpy as np

_BLOCK = 1 << 16


def fletcher_16(data: bytes | bytearray | memoryview | str) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    sum1 = 0
    sum2 = 0
    for start in range(0, len(buf), _BLOCK):
        block = buf[start : start + _BLOCK].astype(np.int64)
        n = len(block)
        weights = np.arange(n, 0, -1, dtype=np.int64)  # (n - i) for i=0..n-1
        sum2 = (sum2 + n * sum1 + int(weights @ block)) % 255
        sum1 = (sum1 + int(block.sum())) % 255
    return (sum2 << 8) | sum1


def fletcher_16_file(path: str) -> int:
    """Checksum a file in streaming blocks (the istream variant,
    `source/checksum.cpp:83-99`)."""
    sum1 = 0
    sum2 = 0
    with open(path, "rb") as f:
        while True:
            chunk = f.read(_BLOCK)
            if not chunk:
                break
            block = np.frombuffer(chunk, dtype=np.uint8).astype(np.int64)
            n = len(block)
            weights = np.arange(n, 0, -1, dtype=np.int64)
            sum2 = (sum2 + n * sum1 + int(weights @ block)) % 255
            sum1 = (sum1 + int(block.sum())) % 255
    return (sum2 << 8) | sum1
