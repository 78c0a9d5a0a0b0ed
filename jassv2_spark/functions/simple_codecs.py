"""Simple-9 / Simple-16 word-aligned codecs (Anh & Moffat 2005; Zhang,
Yan & Suel's 16-configuration variant), bit-exact vs the reference.

`source/compress_integer_simple_9.cpp:146-198` and
`source/compress_integer_simple_16.cpp:94-149` share one encode shape:
per 32-bit word, scan up to 28 upcoming integers narrowing the set of
feasible selectors (a selector stays feasible at scan position `offset`
while its bit width at that position holds ceiling_log2(value) bits);
a selector becomes a *candidate* once the scan has covered its full
capacity; the lowest-numbered candidate (= most integers packed) wins.
Payload bits pack low-first above the low 4 selector bits; words are
little-endian.  The reference drives this off five precomputed tables
(can_pack_table / invalid_masks_for_offset / row_for_bits_needed /
shift / ints_packed); all five are derivable from the per-selector
width layouts alone, which is how this module computes feasibility —
same decisions, no tables to transcribe.

ceiling_log2 in the reference is a bit-length table (value 4 → 3,
`source/maths.h:33-58`), so feasibility is `bit_length(v) <= width`;
value 0 packs anywhere (row 0).  Values needing > 28 bits are
unencodable — the reference returns 0, we raise OverflowError.

Proven byte-identical by tests/test_codec_differential.py fuzz
(codec_tool names "Simple-9", "Simple-16").  Exporter/research-harness
use; the engine's at-scale postings layout remains parquet (SURVEY §2.9).
"""

from __future__ import annotations

# per-selector bit-width layout: selector -> tuple of widths by position.
# Simple-9: uniform widths over 28 payload bits
# (`compress_integer_simple_9.cpp:32-44`).
SIMPLE9_WIDTHS: list[tuple[int, ...]] = [
    (w,) * n for n, w in [(28, 1), (14, 2), (9, 3), (7, 4), (5, 5), (4, 7), (3, 9), (2, 14), (1, 28)]
]

# Simple-16: the 16 mixed-width configurations, readable as the deltas of
# the reference's shift table (`compress_integer_simple_16.cpp:21-40`).
SIMPLE16_WIDTHS: list[tuple[int, ...]] = [
    (1,) * 28,
    (2,) * 7 + (1,) * 14,
    (1,) * 7 + (2,) * 7 + (1,) * 7,
    (1,) * 14 + (2,) * 7,
    (2,) * 14,
    (4,) + (3,) * 8,
    (3,) + (4,) * 4 + (3,) * 3,
    (4,) * 7,
    (5,) * 4 + (4,) * 2,
    (4,) * 2 + (5,) * 4,
    (6,) * 3 + (5,) * 2,
    (5,) * 2 + (6,) * 3,
    (7,) * 4,
    (10, 9, 9),
    (14, 14),
    (28,),
]


def _pack_words(values, widths: list[tuple[int, ...]]) -> bytes:
    src = [int(v) & 0xFFFFFFFF for v in values]
    n = len(src)
    out = bytearray()
    pos = 0
    n_sel = len(widths)
    while pos < n:
        remaining = min(28, n - pos)
        feasible = set(range(n_sel))
        candidates: set[int] = set()
        for offset in range(remaining):
            need = src[pos + offset].bit_length()  # == reference ceiling_log2
            feasible = {
                s for s in feasible
                if offset < len(widths[s]) and need <= widths[s][offset]
            }
            candidates |= {s for s in feasible if len(widths[s]) <= offset + 1}
            if not feasible:
                break
        if not candidates:
            raise OverflowError("simple-family: integer exceeds 28 bits")
        sel = min(candidates)  # lowest selector = most integers per word
        word = 0
        shift = 0
        for w in widths[sel]:
            word |= src[pos] << shift
            shift += w
            pos += 1
        word = ((word << 4) | sel) & 0xFFFFFFFF
        out += word.to_bytes(4, "little")
    return bytes(out)


def _unpack_words(data: bytes, count: int, widths: list[tuple[int, ...]]) -> list[int]:
    out: list[int] = []
    for at in range(0, len(data), 4):
        word = int.from_bytes(data[at : at + 4], "little")
        payload = word >> 4
        shift = 0
        for w in widths[word & 0xF]:
            out.append((payload >> shift) & ((1 << w) - 1))
            shift += w
        if len(out) >= count:
            break
    return out[:count]


def simple9_encode(values) -> bytes:
    return _pack_words(values, SIMPLE9_WIDTHS)


def simple9_decode(data: bytes, count: int) -> list[int]:
    return _unpack_words(data, count, SIMPLE9_WIDTHS)


def simple16_encode(values) -> bytes:
    return _pack_words(values, SIMPLE16_WIDTHS)


def simple16_decode(data: bytes, count: int) -> list[int]:
    return _unpack_words(data, count, SIMPLE16_WIDTHS)
