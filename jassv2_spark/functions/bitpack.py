"""Fixed-width bin-packing codecs: bitpack 64 / 128 / 256 and the
reduced-selector 32-bit variant — bit-exact vs the reference.

One shared encode shape (`source/compress_integer_bitpack.h:95-160`):
the stream is a sequence of [1 selector byte][WIDTH/8 data bytes] words.
Per word, scan forward accumulating the widest bits_needed
(= max(bit_length, 1), `compress_integer_bitpack.h:72-76`) until
widest·index ≥ WIDTH, round the width UP to the class's allowed set
(`bits_to_use`), then pack (32/width)·(WIDTH/32) integers ROUND-ROBIN
across the WIDTH/32 little-endian 32-bit lanes (value i → lane
i mod lanes, slot i div lanes) — the layout the SIMD decoders shift out
lane-parallel (`compress_integer_bitpack_64.cpp:22-46` et al.).  Input
exhausted mid-word packs zeros.

Width sets: 64/128/256 use {1,2,3,4,5,6,8,10,16,32}
(`compress_integer_bitpack.cpp:20-97`); the 32-bit reduced variant drops
6 and 10 to keep 8 selectors
(`compress_integer_bitpack_32_reduced.cpp:25-101`).

Proven byte-identical by tests/test_codec_differential.py fuzz
(codec_tool names "Binpack into 64-bit integers", "... 128-bit SIMD
integers", "... 256-bit SIMD integers", "Binpack into 32-bit integers
with 8 selectors").  Exporter/research-harness use only (SURVEY §2.9).
"""

from __future__ import annotations

# allowed widths by selector index; bits_to_use rounds a needed width up
# to the next member
COMPLETE_WIDTHS = [1, 2, 3, 4, 5, 6, 8, 10, 16, 32]
REDUCED_WIDTHS = [1, 2, 3, 4, 5, 8, 16, 32]


def _bits_needed(v: int) -> int:
    return max(v.bit_length(), 1)


def _round_up(width: int, allowed: list[int]) -> int:
    for w in allowed:
        if w >= width:
            return w
    return 32


def _bitpack_encode(values, word_bits: int, allowed: list[int]) -> bytes:
    src = [int(v) & 0xFFFFFFFF for v in values]
    lanes = word_bits // 32
    out = bytearray()
    pos = 0
    n = len(src)
    while pos < n:
        widest = 0
        for i, v in enumerate(src[pos:n]):
            widest = max(widest, _bits_needed(v))
            if widest * i >= word_bits:
                break
        width = _round_up(widest, allowed)
        per_lane = 32 // width
        count = per_lane * lanes
        lane_words = [0] * lanes
        for i in range(count):
            v = src[pos + i] if pos + i < n else 0
            lane_words[i % lanes] |= v << (width * (i // lanes))
        out.append(allowed.index(width))
        for w in lane_words:
            out += (w & 0xFFFFFFFF).to_bytes(4, "little")
        pos += count
    return bytes(out)


def _bitpack_decode(data: bytes, count: int, word_bits: int, allowed: list[int]) -> list[int]:
    lanes = word_bits // 32
    out: list[int] = []
    at = 0
    step = 1 + word_bits // 8
    while at + step <= len(data) and len(out) < count:
        width = allowed[data[at]]
        lane_words = [
            int.from_bytes(data[at + 1 + 4 * j : at + 5 + 4 * j], "little")
            for j in range(lanes)
        ]
        mask = (1 << width) - 1
        per_lane = 32 // width
        for i in range(per_lane * lanes):
            out.append((lane_words[i % lanes] >> (width * (i // lanes))) & mask)
        at += step
    return out[:count]


def bitpack64_encode(values) -> bytes:
    return _bitpack_encode(values, 64, COMPLETE_WIDTHS)


def bitpack64_decode(data: bytes, count: int) -> list[int]:
    return _bitpack_decode(data, count, 64, COMPLETE_WIDTHS)


def bitpack128_encode(values) -> bytes:
    return _bitpack_encode(values, 128, COMPLETE_WIDTHS)


def bitpack128_decode(data: bytes, count: int) -> list[int]:
    return _bitpack_decode(data, count, 128, COMPLETE_WIDTHS)


def bitpack256_encode(values) -> bytes:
    return _bitpack_encode(values, 256, COMPLETE_WIDTHS)


def bitpack256_decode(data: bytes, count: int) -> list[int]:
    return _bitpack_decode(data, count, 256, COMPLETE_WIDTHS)


def bitpack32_reduced_encode(values) -> bytes:
    return _bitpack_encode(values, 32, REDUCED_WIDTHS)


def bitpack32_reduced_decode(data: bytes, count: int) -> list[int]:
    return _bitpack_decode(data, count, 32, REDUCED_WIDTHS)


# ----------------------------------------------------------- stream vbyte


def stream_vbyte_encode(values) -> bytes:
    """Lemire's Stream VByte (public format; the reference vendors the
    upstream scalar/SIMD code, `source/compress_integer_stream_vbyte.cpp:
    15-43`): ceil(n/4) control bytes first — 2 bits per integer, code =
    bytes-1, first integer in the LOW bits — then each value's 1-4
    little-endian data bytes."""
    src = [int(v) & 0xFFFFFFFF for v in values]
    n = len(src)
    ctrl = bytearray((n + 3) // 4)
    data = bytearray()
    for i, v in enumerate(src):
        nbytes = max(1, (v.bit_length() + 7) // 8)
        ctrl[i // 4] |= (nbytes - 1) << (2 * (i % 4))
        data += v.to_bytes(nbytes, "little")
    return bytes(ctrl) + bytes(data)


def stream_vbyte_decode(data: bytes, count: int) -> list[int]:
    ctrl_len = (count + 3) // 4
    at = ctrl_len
    out: list[int] = []
    for i in range(count):
        nbytes = ((data[i // 4] >> (2 * (i % 4))) & 0x3) + 1
        out.append(int.from_bytes(data[at : at + nbytes], "little"))
        at += nbytes
    return out
