"""Group Elias Delta SIMD — codex 'D', bit-exact.

Format per `source/compress_integer_elias_delta_simd.cpp` (re-expressed
from the format — no code copied): payload 512-bit blocks (16 little-
endian u32 words, integer i of a group in word i%16) packed slice-major
at a common per-slice bit width, followed by a SEPARATE selector stream.

Unlike the gamma variant ('G', functions/eg_simd.py) there is no
per-block selector word.  Slice widths are Elias-delta coded into one
global bitstream: width w is written as floor_log2(w) zero bits (unary
length) then the zig-zag binary `((w & ~(1 << floor_log2(w))) << 1) | 1`
(`push_selector`, :68-94).  The stream accumulates in a u64 and flushes
32-bit words DOWNWARD from the end of a scratch buffer; after encoding,
the flushed region (last-flushed word first) is appended after the
payload blocks (:233-244).  The decoder therefore walks selector words
from the END of the encoded buffer backwards (:329-343).

A slice that does not fit the block's remaining bits stores its high
`remaining` bits at the top of the current block and restarts reduced in
the next block; the continuation's reduced width is NOT pushed to the
selector stream (the decoder derives it as `used + width - 32`, :370-376)
— the opposite of the gamma variant, whose next-block selector carries
the reduced width.

Validated bit-for-bit against the reference class via
tests/test_codec_differential.py (codec_tool fuzz).  Driver/exporter-side
use only (plans/jass_v1.py codex 'D'); the engine's at-scale layout
remains parquet (SURVEY §2.9).
"""

from __future__ import annotations

WORDS = 16
_MASK32 = 0xFFFFFFFF


def _bits(v: int) -> int:
    return max(1, v.bit_length())


class _SelectorStream:
    """Mirror of push_selector/flush: u64 accumulator, 32-bit words
    emitted last-flushed-first (the on-disk order after the memmove)."""

    def __init__(self) -> None:
        self.bits_used = 0
        self.acc = 0
        self.words: list[int] = []  # in flush order

    def push(self, raw: int) -> None:
        width = raw.bit_length() - 1  # floor_log2
        self.bits_used += width       # unary: `width` zero bits
        zig_zag = ((raw & ~(1 << width)) << 1) + 1
        self.acc |= zig_zag << self.bits_used
        self.bits_used += width + 1
        if self.bits_used > 32:
            self.words.append(self.acc & _MASK32)
            self.acc >>= 32
            self.bits_used -= 32

    def serialise(self) -> bytes:
        # final flush word, then previously flushed words in REVERSE
        # (the scratch buffer grew downward; memmove keeps that order)
        out = [self.acc & _MASK32] + self.words[::-1]
        return b"".join(w.to_bytes(4, "little") for w in out)


def ed_simd_encode(values, stale: bytes | None = None) -> bytes:
    """Encode; the output always ends with one dead 64-byte block between
    the payloads and the selector stream: the reference's `destination`
    pointer runs one block ahead and the memmove lands the selectors
    AFTER it (:229-244), so those bytes are whatever the encode buffer
    previously held.  ``stale`` supplies them for byte-parity inside a
    serialiser's reused buffer (plans/jass_v1.py `_buf` semantics);
    defaults to zeros (a fresh buffer, matching codec_tool).  ``stale``
    may also be a callable taking the payload length in bytes and
    returning the 64 gap bytes — the writer uses this to slice its
    persistent buffer at the gap's actual offset."""
    src = [int(v) & _MASK32 for v in values]
    n = len(src)
    if n == 0:
        return b""
    payload_out = bytearray()
    sel = _SelectorStream()
    carryover = 0
    actual_max_width = 0
    pos = 0
    while True:
        words = [0] * WORDS
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
                    value = 0
                max_width = max(max_width, _bits(value))
                if carryover == 0:
                    words[word] |= (value << cumulative_shift) & _MASK32
                else:
                    low = actual_max_width - carryover
                    words[word] |= value & ((1 << low) - 1)
            if carryover == 0:
                sel.push(max_width)
            actual_max_width = max_width
            max_width -= carryover
            carryover = 0
            cumulative_shift += max_width

            if max_width > remaining:
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
            if (
                max_width == remaining
                or overflow
                or (slice_no + 1) * WORDS >= n - pos
            ):
                break
            remaining -= max_width
            slice_no += 1
        for w in words:
            payload_out += w.to_bytes(4, "little")
        pos += consumed
        if pos >= n:
            break
    raw = stale(len(payload_out)) if callable(stale) else (stale or b"")
    gap = bytes(raw)[:4 * WORDS]
    gap = gap + bytes(4 * WORDS - len(gap))
    return bytes(payload_out) + gap + sel.serialise()


def ed_simd_decode(data: bytes, count: int) -> list[int]:
    """Scalar mirror of the AVX decoder (:316-448): selector words read
    from the buffer end backwards through a u64 accumulator primed with
    bits_used=64."""
    out: list[int] = []
    if count == 0 or not data:
        return out
    n_words = len(data) // 4
    words = [int.from_bytes(data[4 * i : 4 * i + 4], "little")
             for i in range(n_words)]

    sel_at = n_words - 1
    acc = 0
    bits_used = 64

    def next_selector() -> int:
        nonlocal sel_at, acc, bits_used
        if bits_used >= 32:
            bits_used -= 32
            acc |= words[sel_at] << (32 - bits_used)
            sel_at -= 1
        unary = (acc & -acc).bit_length() - 1 if acc else 64
        decoded = ((acc >> unary) & ((1 << (unary + 1)) - 1)) >> 1 | (1 << unary)
        bits_used += unary + unary + 1
        acc >>= unary + unary + 1
        return decoded

    src = 0
    payload = words[src : src + WORDS]
    src += WORDS
    used = 0
    while len(out) < count:
        width = next_selector()
        if used + width <= 32:
            mask = (1 << width) - 1
            out.extend(p & mask for p in payload)
            payload = [p >> width for p in payload]
            used += width
        else:
            shift_up = width - (32 - used)
            high = [(p << shift_up) & _MASK32 for p in payload]
            payload = words[src : src + WORDS]
            src += WORDS
            low_bits = used + width - 32
            mask = (1 << low_bits) - 1
            out.extend((p & mask) | h for p, h in zip(payload, high))
            payload = [p >> low_bits for p in payload]
            used = low_bits
    return out[:count]
