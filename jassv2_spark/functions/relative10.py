"""Relative-10 (Anh & Moffat 2005) — bit-exact vs the reference
(`source/compress_integer_relative_10.cpp:84-158`, codec_tool name
"Relative-10").

Wire format: the FIRST 32-bit word is Simple-9 with the selector in the
TOP four bits (payload packs from bit 0) — note this is selector order
{1×28b, 2×14b, 3×9b, 4×7b, 5×5b, 7×4b, 9×3b, 14×2b, 28×1b}, i.e. row 0
is ONE wide integer, the reverse of the greedy Simple-9 class's wire
numbering.  Every later word spends only TWO selector bits (top), coding
the next row RELATIVE to the current one: codes map to rows
(cur+1, cur, cur-1, 0) for rows 3-8, to (3, 2, 1, 0) absolutely for rows
0-2, and (9, 8, 7, 0) for row 9; a desired row outside the reachable set
falls to the nearest reachable not-narrower row (the `transfer_array`,
`compress_integer_relative_10.cpp:35-47`).  The 10 relative rows pack
{1×30b, 2×15b, 3×10b, 4×7b, 5×6b, 6×5b, 7×4b, 10×3b, 15×2b, 30×1b}.

The per-word fill is the ATIRE-style widest-prefix scan: grow the scan
while max(bits_to_use(width)) × count stays within the 28/30 payload
bits, then the row for that count (`table_row` / `table_row10`).
Integers must fit 28 bits in the first word and 30 bits after (the
reference returns 0, we raise OverflowError); zeros are fine (1 bit).

Exporter/research-harness use only (SURVEY §2.9).
"""

from __future__ import annotations

# Simple-9 rows as (numbers, bits), row 0 widest — relative_10's own order
S9_ROWS = [(1, 28), (2, 14), (3, 9), (4, 7), (5, 5), (7, 4), (9, 3), (14, 2), (28, 1)]
# Relative-10 rows (numbers, bits)
R10_ROWS = [(1, 30), (2, 15), (3, 10), (4, 7), (5, 6), (6, 5), (7, 4), (10, 3), (15, 2), (30, 1)]

# allowed widths (bits_to_use / bits_to_use10 in the reference collapse a
# needed bit count up to the next row width; >28 / >30 is unencodable)
_S9_WIDTHS = sorted({b for _n, b in S9_ROWS})
_R10_WIDTHS = sorted({b for _n, b in R10_ROWS})


def _use_bits(needed: int, widths: list[int]) -> int | None:
    for w in widths:
        if w >= max(needed, 1):
            return w
    return None


def _row_for_count(count: int, rows: list[tuple[int, int]]) -> int:
    """table_row / table_row10: the highest row whose `numbers` ≤ count."""
    best = 0
    for i, (n, _b) in enumerate(rows):
        if n <= count:
            best = i
    return best


def _relative_rows(cur: int) -> tuple[int, int, int, int]:
    if cur <= 2:
        return (3, 2, 1, 0)
    if cur == 9:
        return (9, 8, 7, 0)
    return (cur + 1, cur, cur - 1, 0)


def _transfer(cur: int, desired: int) -> int:
    """2-bit code moving `cur` toward `desired` (never to a narrower row
    than desired allows): the reference's transfer_array by rule."""
    reach = _relative_rows(cur)
    for code in (3, 2, 1, 0):  # reach[3]=0 … reach[0]=cur+1, prefer exact
        if reach[code] == desired:
            return code
    # desired not reachable: above → one step up (code 0); below → row 0
    return 0 if desired > max(reach) else 3


def _scan(src: list[int], pos: int, payload_bits: int, max_count: int,
          widths: list[int]) -> int:
    """Widest-prefix scan: returns the scanned count `term` exactly as the
    reference's loop leaves it."""
    needed = 0
    term = 0
    while term < max_count and pos + term < len(src):
        w = _use_bits(src[pos + term].bit_length(), widths)
        if w is None:
            raise OverflowError("relative-10: integer too large")
        needed = max(needed, w)
        if needed * (term + 1) > payload_bits:
            break
        term += 1
    # the reference breaks BEFORE incrementing, leaving term at the count
    # that still fits — unless the very first integer overflows alone,
    # which the width check above already rejected
    return max(term, 1)


def relative10_encode(values) -> bytes:
    src = [int(v) & 0xFFFFFFFF for v in values]
    if not src:
        return b""
    out = bytearray()
    # first word: Simple-9, selector in top 4 bits
    term = _scan(src, 0, 28, 28, _S9_WIDTHS)
    row = _row_for_count(term, S9_ROWS)
    numbers, bits = S9_ROWS[row]
    word = row << 28
    for i in range(min(numbers, len(src))):
        word |= src[i] << (i * bits)
    out += (word & 0xFFFFFFFF).to_bytes(4, "little")
    pos = numbers
    # remainder: Relative-10, 2-bit selector in top 2 bits
    while pos < len(src):
        term = _scan(src, pos, 30, 30, _R10_WIDTHS)
        desired = _row_for_count(term, R10_ROWS)
        code = _transfer(row, desired)
        row = _relative_rows(row)[code]
        numbers, bits = R10_ROWS[row]
        word = code << 30
        for i in range(numbers):
            if pos + i < len(src):
                word |= src[pos + i] << (i * bits)
        out += (word & 0xFFFFFFFF).to_bytes(4, "little")
        pos += numbers
    return bytes(out)


def relative10_decode(data: bytes, count: int) -> list[int]:
    out: list[int] = []
    if not data:
        return out
    word = int.from_bytes(data[0:4], "little")
    row = word >> 28
    numbers, bits = S9_ROWS[row]
    payload = word & 0x0FFFFFFF
    mask = (1 << bits) - 1
    for _ in range(numbers):
        out.append(payload & mask)
        payload >>= bits
    at = 4
    while len(out) < count and at + 4 <= len(data):
        word = int.from_bytes(data[at : at + 4], "little")
        row = _relative_rows(row)[word >> 30]
        numbers, bits = R10_ROWS[row]
        payload = word & 0x3FFFFFFF
        mask = (1 << bits) - 1
        for _ in range(numbers):
            out.append(payload & mask)
            payload >>= bits
        at += 4
    return out[:count]
