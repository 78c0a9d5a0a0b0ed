"""Carry-8b (Anh & Moffat's Carryover variant of Simple-8b) — bit-exact
vs the reference (`source/compress_integer_carry_8b.cpp:20-265`,
codec_tool name "Carry-8b").

Three selector sub-tables of (bits, capacity, next_selector_bit) rows:

* 57-bit first word: 3-bit `base` in bits 61-63 (chosen from the
  sequence's largest integer, `base_table`), 4-bit selector in bits 0-3,
  payload above;
* 60-bit words: selector in the low 4 bits;
* 64-bit words: the WHOLE word is payload because the selector was
  carried into the spare top bits (the `next_selector` position) of the
  previous word — the "carryover".

`base` offsets every later word's selector into its sub-table so all 16
selector codes cover widths around the sequence's actual maximum.

Selection per word is a single forward scan that only ever WIDENS: start
at the first selector of the slice and bump to the next on a misfit,
keeping the accepted count; the scan can overshoot a later selector's
capacity, in which case only `capacity` integers are packed (observed
and reproduced — it changes bytes).  Values pack low-first; the 1-bit
run selectors (255/128/180/120 × 1) wrap the 64-bit payload, which the
decoder ignores by FILLING ones — hence sequences of zeros that land in
a run word are outside the codec's domain (the reference corrupts them
too; its own round-trip fails).

A further reproduced reference quirk: after the first word the encoder
unconditionally packs another word, so any input fully consumed by the
57-bit first word (≤ its capacity) FAILS to encode — the reference
returns 0 bytes; we return b"" (`compress_integer_carry_8b.cpp:246-258`).

Exporter/research-harness use only (SURVEY §2.9).
"""

from __future__ import annotations

# (bits, capacity, next_selector_bit); next_selector_bit != 0 means the
# FOLLOWING word's selector lives at that bit of THIS word and the
# following word is full-64-bit payload
TABLE_60 = [
    (1, 255, 60), (1, 128, 60), (1, 60, 0), (2, 30, 0), (3, 20, 0),
    (4, 15, 0), (5, 12, 0), (6, 10, 0), (7, 8, 60), (8, 7, 60),
    (9, 6, 60), (10, 6, 0), (11, 5, 60), (12, 5, 0), (14, 4, 60),
    (15, 4, 0), (18, 3, 60), (20, 3, 0), (28, 2, 60), (30, 2, 0),
    (56, 1, 0), (60, 1, 0),
]
TABLE_64 = [
    (1, 255, 60), (1, 180, 60), (1, 120, 60), (1, 64, 0), (2, 32, 0),
    (3, 21, 0), (4, 16, 0), (5, 12, 60), (6, 10, 60), (7, 9, 0),
    (8, 8, 0), (9, 7, 0), (10, 6, 60), (12, 5, 60), (15, 4, 60),
    (16, 4, 0), (20, 3, 60), (21, 3, 0), (30, 2, 60), (32, 2, 0),
    (60, 1, 60), (64, 1, 0),
]
TABLE_57 = [
    (1, 57, 0), (2, 28, 0), (3, 19, 0), (4, 14, 0), (5, 11, 0),
    (6, 9, 0), (7, 8, 0), (8, 7, 0), (9, 6, 0), (10, 5, 57),
    (11, 5, 0), (12, 4, 57), (14, 4, 0), (19, 3, 0), (28, 2, 0),
    (57, 1, 0),
]

# largest-integer bit count -> table slice offset
# (`compress_integer_carry_8b.cpp:95-105`)
BASE_TABLE = (
    [0] * 16 + [1, 1, 1, 2, 2] + [3] * 8 + [4, 4] + [5] * 26 + [6, 6, 6, 6]
    + [7] * 4
)

_M64 = 0xFFFFFFFFFFFFFFFF


def _pack_one(table, base, src, pos):
    """One word's selection + payload; returns (word, took, next_sel_bit,
    sel).  Mirrors `pack_one_word` (:112-176): the scan keeps its accepted
    count across selector bumps and may exceed a later selector's
    capacity — ceiling_log2 is bit_length (0 fits any width)."""
    n = len(src) - pos
    sel = 0
    terms = 0
    while True:
        bits, cap, _nxt = table[base + sel]
        bumped = False
        while terms < cap and terms < n:
            if src[pos + terms].bit_length() > bits:
                sel += 1
                bumped = True
                break
            terms += 1
        if bumped:
            if sel >= 16:
                raise OverflowError("carry-8b: integer too large")
            continue
        if not (terms < cap and terms < n):
            break
    bits, cap, nxt = table[base + sel]
    took = min(cap, n)
    word = 0
    for i in range(took - 1, -1, -1):
        word = ((word << bits) | src[pos + i]) & _M64
    return word, took, nxt, sel


def carry8b_encode(values) -> bytes:
    src = [int(v) & 0xFFFFFFFF for v in values]
    if not src:
        return b""
    base = BASE_TABLE[max(max(src).bit_length(), 0)]
    out = bytearray()
    word, took, nxt, sel = _pack_one(TABLE_57, 0, src, 0)
    word = ((word << 4) | sel) & _M64
    word = (word & 0x1FFFFFFFFFFFFFFF) | ((base & 0x7) << 61)
    out += word.to_bytes(8, "little")
    used = took
    next_pos = nxt
    while True:
        if used >= len(src):
            # reference quirk: one more word is ALWAYS attempted; packing
            # zero integers is its failure mode — whole encode returns 0
            return b""
        table = TABLE_64 if next_pos else TABLE_60
        word, took, nxt, sel = _pack_one(table, base, src, used)
        if next_pos:
            prev = int.from_bytes(out[-8:], "little")
            prev = (prev & ~(0xF << next_pos) & _M64) | (sel << next_pos)
            out[-8:] = prev.to_bytes(8, "little")
        else:
            word = ((word << 4) | sel) & _M64
        out += word.to_bytes(8, "little")
        used += took
        next_pos = nxt
        if used >= len(src):
            return bytes(out)


def carry8b_decode(data: bytes, count: int) -> list[int]:
    out: list[int] = []
    if not data:
        return out
    words = [int.from_bytes(data[i : i + 8], "little") for i in range(0, len(data), 8)]
    w = words[0]
    base = (w >> 61) & 0x7
    sel = w & 0xF
    bits, cap, nxt = TABLE_57[sel]
    payload = (w >> 4) & ((1 << 57) - 1)
    mask = (1 << bits) - 1
    for _ in range(cap):
        out.append(payload & mask)
        payload >>= bits
    next_pos, prev_word = nxt, w
    at = 1
    while len(out) < count and at < len(words):
        w = words[at]
        if next_pos:
            sel = (prev_word >> next_pos) & 0xF
            bits, cap, nxt = TABLE_64[base + sel]
            payload = w
            payload_bits = 64
        else:
            sel = w & 0xF
            bits, cap, nxt = TABLE_60[base + sel]
            payload = w >> 4
            payload_bits = 60
        if bits * cap > payload_bits:  # wrapped run selector: all ones
            out.extend([1] * cap)
        else:
            mask = (1 << bits) - 1
            for _ in range(cap):
                out.append(payload & mask)
                payload >>= bits
        next_pos, prev_word = nxt, w
        at += 1
    return out[:count]
