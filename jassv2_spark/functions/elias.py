"""Elias gamma / delta codecs — all four reference variants, bit-exact.

The reference carries TWO distinct wire formats per code:

* the branchless word-at-a-time classes
  (`source/compress_integer_elias_gamma.cpp:19-63`,
  `source/compress_integer_elias_delta.cpp:19-80`) write the value
  "zig-zagged": the top bit of the binary part is MOVED to the low
  position to double as the unary terminator, and the remaining bits
  follow LOW-bit-first in a little-endian bitstream, so the stream can be
  truncated at any byte;

* the ATIRE-heritage "bitwise (slow)" classes
  (`source/compress_integer_elias_gamma_bitwise.h:39-49`,
  `source/compress_integer_elias_delta_bitwise.h:39-45`,
  `source/bitstream.h`) push classic Elias codes bit by bit, the binary
  part HIGH-bit-first, into the same little-endian word stream — a
  different byte sequence for the same input.

Both are reproduced here over a Python big-int bit accumulator (LSB-first
== little-endian byte order) and proven byte-identical encoders /
correct decoders of the reference's bytes by
tests/test_codec_differential.py fuzz (codec_tool names "Elias gamma",
"Elias delta", "Elias gamma with bit instuctions (slow)", "Elias delta
with bit instuctions (slow)").

None of these can represent 0 (floor_log2(0) is undefined in the
reference too); postings payloads are d1-gapped so values are ≥ 1.
Engine-side the at-scale layout remains parquet (SURVEY §2.9); these are
exporter/research-harness codecs.
"""

from __future__ import annotations


def _emit(bits: int, nbits: int) -> bytes:
    return bits.to_bytes((nbits + 7) // 8, "little")


# ------------------------------------------------- branchless (zig-zag)


def elias_gamma_encode(values) -> bytes:
    """`compress_integer_elias_gamma::encode`: n zero bits, then
    ((v without top bit) << 1 | 1) appended low-bit-first."""
    bits = 0
    pos = 0
    for v in values:
        v = int(v)
        n = v.bit_length() - 1
        pos += n  # unary zeros (already zero)
        zig = ((v ^ (1 << n)) << 1) | 1
        bits |= zig << pos
        pos += n + 1
    return _emit(bits, pos)


def elias_gamma_decode(data: bytes, count: int) -> list[int]:
    bits = int.from_bytes(data, "little")
    out: list[int] = []
    pos = 0
    total = len(data) * 8
    for _ in range(count):
        n = 0
        while pos < total and not (bits >> pos) & 1:
            n += 1
            pos += 1
        pos += 1  # the terminator / moved top bit
        rest = (bits >> pos) & ((1 << n) - 1)
        pos += n
        out.append(rest | (1 << n))
    return out


def elias_delta_encode(values) -> bytes:
    """`compress_integer_elias_delta::encode`: gamma-style zig-zag of the
    length n = bit_length(v), then the low n-1 bits of v low-bit-first."""
    bits = 0
    pos = 0
    for v in values:
        v = int(v)
        n = v.bit_length()
        unary = n.bit_length() - 1
        pos += unary
        zig = ((n ^ (1 << unary)) << 1) | 1
        bits |= zig << pos
        pos += unary + 1
        bits |= (v ^ (1 << (n - 1))) << pos
        pos += n - 1
    return _emit(bits, pos)


def elias_delta_decode(data: bytes, count: int) -> list[int]:
    bits = int.from_bytes(data, "little")
    out: list[int] = []
    pos = 0
    total = len(data) * 8
    for _ in range(count):
        u = 0
        while pos < total and not (bits >> pos) & 1:
            u += 1
            pos += 1
        pos += 1
        n = ((bits >> pos) & ((1 << u) - 1)) | (1 << u)
        pos += u
        rest = (bits >> pos) & ((1 << (n - 1)) - 1)
        pos += n - 1
        out.append(rest | (1 << (n - 1)))
    return out


# ------------------------------------------- bitwise (ATIRE bitstream)


def _push_msb_first(bits: int, pos: int, v: int, length: int) -> tuple[int, int]:
    """bitstream::push_bits: the low `length` bits of v, MSB of that
    field first (`source/bitstream.h:131-138`)."""
    for i in range(length - 1, -1, -1):
        if (v >> i) & 1:
            bits |= 1 << pos
        pos += 1
    return bits, pos


def elias_gamma_bitwise_encode(values) -> bytes:
    """`compress_integer_elias_gamma_bitwise::encode`: exp zeros then the
    exp+1 bits of v MSB-first (`..._gamma_bitwise.h:43-49`). The stream
    flushes whole 32-bit words but reports (total_bits+7)/8 bytes
    (`bitstream.h:169-173`) — the byte stream is what the tool prints."""
    bits = 0
    pos = 0
    for v in values:
        v = int(v)
        exp = v.bit_length() - 1
        pos += exp
        bits, pos = _push_msb_first(bits, pos, v, exp + 1)
    return _emit(bits, pos)


def _get_msb_first(bits: int, pos: int, length: int) -> tuple[int, int]:
    v = 0
    for _ in range(length):
        v = (v << 1) | ((bits >> pos) & 1)
        pos += 1
    return v, pos


def elias_gamma_bitwise_decode(data: bytes, count: int) -> list[int]:
    bits = int.from_bytes(data, "little")
    out: list[int] = []
    pos = 0
    total = len(data) * 8
    for _ in range(count):
        exp = 0
        while pos < total and not (bits >> pos) & 1:
            exp += 1
            pos += 1
        pos += 1  # the leading 1 of the MSB-first binary part
        rest, pos = _get_msb_first(bits, pos, exp)
        out.append((1 << exp) | rest)
    return out


def elias_delta_bitwise_encode(values) -> bytes:
    """`compress_integer_elias_delta_bitwise::encode`: gamma_bitwise of
    exp+1, then the low exp bits of v MSB-first (`.h:39-45`)."""
    bits = 0
    pos = 0
    for v in values:
        v = int(v)
        exp = v.bit_length() - 1
        n = exp + 1
        g_exp = n.bit_length() - 1
        pos += g_exp
        bits, pos = _push_msb_first(bits, pos, n, g_exp + 1)
        bits, pos = _push_msb_first(bits, pos, v, exp)
    return _emit(bits, pos)


def elias_delta_bitwise_decode(data: bytes, count: int) -> list[int]:
    bits = int.from_bytes(data, "little")
    out: list[int] = []
    pos = 0
    total = len(data) * 8
    for _ in range(count):
        g_exp = 0
        while pos < total and not (bits >> pos) & 1:
            g_exp += 1
            pos += 1
        pos += 1
        rest, pos = _get_msb_first(bits, pos, g_exp)
        exp = ((1 << g_exp) | rest) - 1
        rest, pos = _get_msb_first(bits, pos, exp)
        out.append((1 << exp) | rest)
    return out
