"""Group Elias Gamma SIMD — the reference's default index codec, bit-exact.

The JASS v1 serialiser's default compressor is "Group Elias Gamma SIMD"
(`source/serialise_jass_v1.h` default codex `elias_gamma_simd`). Format
(`reference/source/compress_integer_elias_gamma_simd.cpp`, re-expressed
from the format — no code copied):

A sequence of 68-byte blocks: one u32 SELECTOR then 16 u32 payload words
(one 512-bit register). Integers fill the block slice-major: integer i of
the block lives in payload word i%16, slice i//16. Each 16-integer slice
is stored at a common bit width = max over the slice of bits(v) (min 1;
bits(0)==1 after the clamp), written at the slice's cumulative shift.
The selector gamma-packs the slice widths low-bits-first: for each slice,
width w contributes w bits holding `1 << (w-1)` (so the decoder reads
w = index of lowest set bit + 1, then shifts it out).

When a slice does not fit the 32 remaining bits of the block, the HIGH
`remaining` bits of each of its 16 values are stored at the top of the
current block (the selector simply ends), and the slice re-encodes at
reduced width (bits - carryover) at the bottom of the NEXT block — whose
selector carries the REDUCED width. The decoder's leftover-payload OR
makes clean block ends (leftover bits all zero) and carryover ends the
same code path.

Validated by round-trip over the reference's own unittest "broken
sequences" (`compress_integer_elias_gamma_simd.cpp:404-448`) plus fuzz.
Driver/exporter-side use only (plans/jass_v1.py codex 'G'); the engine's
at-scale layout remains parquet (SURVEY §2.9).
"""

from __future__ import annotations

WORDS = 16  # 512-bit register / 32-bit words
_MASK32 = 0xFFFFFFFF


def _bits(v: int) -> int:
    """maths::ceiling_log2 clamped to ≥1: the stored width of v."""
    return max(1, v.bit_length())


def _compute_selector(widths: list[int]) -> int:
    """`compute_selector`: gamma-pack slice widths, first slice lowest."""
    value = 0
    for w in reversed(widths):
        value = (value << w) | (1 << (w - 1))
    return value & _MASK32


def eg_simd_encode(values) -> bytes:
    src = [int(v) & _MASK32 for v in values]
    out = bytearray()
    carryover = 0
    actual_max_width = 0
    pos = 0
    n = len(src)
    if n == 0:
        return b""
    while True:
        words = [0] * WORDS
        widths: list[int] = []
        remaining = 32
        cumulative_shift = 0
        overflow = False
        consumed = 0
        slice_no = 0
        while slice_no < 32:
            row_start = consumed
            max_width = 0
            for word in range(WORDS):
                index = pos + slice_no * WORDS + word
                if index < n:
                    consumed += 1
                    value = src[index]
                else:
                    overflow = True
                    value = 0  # pad so no stray carryover bits
                max_width = max(max_width, _bits(value))
                if carryover == 0:
                    words[word] |= (value << cumulative_shift) & _MASK32
                else:
                    low = actual_max_width - carryover
                    words[word] |= value & ((1 << low) - 1)
            actual_max_width = max_width
            max_width -= carryover
            carryover = 0
            cumulative_shift += max_width

            if max_width > remaining:
                # split slice: high `remaining` bits at the top of this
                # block; the slice restarts (reduced) in the next block
                consumed = row_start
                for word in range(WORDS):
                    index = pos + slice_no * WORDS + word
                    value = src[index] if index < n else 0
                    keep_low = 32 - remaining
                    words[word] &= (1 << keep_low) - 1
                    shift = actual_max_width - remaining
                    words[word] |= ((value >> shift) << keep_low) & _MASK32
                carryover = remaining
                break
            widths.append(max_width)
            if (
                max_width == remaining
                or overflow
                or (slice_no + 1) * WORDS >= n - pos
            ):
                break
            remaining -= max_width
            slice_no += 1
        out += _compute_selector(widths).to_bytes(4, "little")
        for w in words:
            out += w.to_bytes(4, "little")
        pos += consumed
        if pos >= n:
            break
    return bytes(out)


def eg_simd_decode(data: bytes, count: int):
    """Scalar mirror of the AVX decoder: selector widths drive masked
    reads; leftover payload bits OR into the next block's first slice
    (zero on clean boundaries, the carried high bits on splits)."""
    out: list[int] = []
    if count == 0 or not data:
        return out
    src = 0
    end = len(data)

    def load_block(at: int):
        sel = int.from_bytes(data[at : at + 4], "little")
        words = [
            int.from_bytes(data[at + 4 + 4 * i : at + 8 + 4 * i], "little")
            for i in range(WORDS)
        ]
        return sel, words

    selector, payload = load_block(src)
    src += 68
    while True:
        width = (selector & -selector).bit_length()  # ffs, 1-based
        mask = (1 << width) - 1
        for w in range(WORDS):
            out.append(payload[w] & mask)
        payload = [p >> width for p in payload]
        selector >>= width
        while selector == 0:
            if src >= end:
                return out[:count]
            high_bits = payload
            selector, payload = load_block(src)
            src += 68
            width = (selector & -selector).bit_length()
            mask = (1 << width) - 1
            for w in range(WORDS):
                out.append((payload[w] & mask) | ((high_bits[w] << width) & _MASK32))
            payload = [p >> width for p in payload]
            selector >>= width
