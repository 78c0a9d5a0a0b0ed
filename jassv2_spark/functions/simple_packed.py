"""The "Optimal Packed" Simple-family variants — bit-exact vs the
reference (codec_tool names "Optimal Packed Simple-9", "Optimal Packed
Simple-16", "Optimal Packed Simple-8b").

Where plain Simple-9/16/8b choose each word greedily, the packed
variants run a backwards dynamic program over block starts
(`source/compress_integer_simple_9_packed.cpp:91-245`,
`..._simple_16_packed.cpp` and `..._simple_8b_packed.cpp`, same shape):
blocks_needed[pos] = 1 + min over candidate selectors of
blocks_needed[pos + capacity].  The candidate set at a position is the
same feasibility scan as the greedy codecs (simple_codecs.py /
atire_codecs.py).  Faithfully-replicated reference quirks, each of which
changes bytes and is therefore load-bearing for parity:

* the LAST position is pre-seeded `blocks_needed = 0` with the
  single-integer selector — a block landing exactly there is counted as
  free, so the DP is "optimal" only up to that accounting;
* a selector whose capacity reaches the end overwrites the choice
  UNCONDITIONALLY, so among end-reaching candidates the highest-numbered
  (fewest integers) selector wins, while interior ties keep the
  lowest-numbered one (strict `>` comparison);
* a one-integer input short-circuits to the widest selector with an
  off-by-one overflow test (`> 1<<28` / `> 1ULL<<60`, not `>=`).

Exporter/research-harness use only (SURVEY §2.9).
"""

from __future__ import annotations

from jassv2_spark.functions.atire_codecs import _S8B, _can_pack
from jassv2_spark.functions.simple_codecs import SIMPLE9_WIDTHS, SIMPLE16_WIDTHS


def _feasible_width(widths):
    def ok(sel: int, offset: int, value: int) -> bool:
        return offset < len(widths[sel]) and value.bit_length() <= widths[sel][offset]

    return ok


def _feasible_8b(sel: int, offset: int, value: int) -> bool:
    return offset < _S8B[sel][1] and _can_pack(value, sel)


def _packed_encode(values, *, n_sel, caps, feasible, window, word_bytes,
                   single_sel, single_limit, pack_word) -> bytes:
    src = [int(v) & 0xFFFFFFFF for v in values]
    n = len(src)
    if n == 0:
        return b""
    if n == 1:
        if src[0] > single_limit:  # reference tests >, not >= (quirk)
            raise OverflowError("simple-packed: integer too large")
        return pack_word(src, 0, 1, single_sel)
    blocks = [-1] * n
    masks = [255] * n
    blocks[n - 1] = 0
    masks[n - 1] = single_sel
    for pos in range(n - 2, -1, -1):
        remaining = min(window, n - pos)
        feas = set(range(n_sel))
        cands: set[int] = set()
        for offset in range(remaining):
            feas = {s for s in feas if feasible(s, offset, src[pos + offset])}
            cands |= {s for s in feas if caps[s] <= offset + 1}
            if not feas:
                break
        if not cands:
            raise OverflowError("simple-packed: integer too large")
        for sel in range(n_sel):  # ascending, reference iteration order
            if sel not in cands:
                continue
            cap = caps[sel]
            if pos + cap >= n:
                blocks[pos] = 1  # unconditional: last end-reaching sel wins
                masks[pos] = sel
            elif blocks[pos] == -1 or blocks[pos] > blocks[pos + cap] + 1:
                blocks[pos] = blocks[pos + cap] + 1
                masks[pos] = sel
        if masks[pos] == 255:
            raise OverflowError("simple-packed: integer too large")
    out = bytearray()
    pos = 0
    while pos < n:
        sel = masks[pos]
        num = min(caps[sel], n - pos)
        out += pack_word(src, pos, num, sel)
        pos += num
    return bytes(out)


def _make_width_packer(widths):
    def pack_word(src, pos: int, num: int, sel: int) -> bytes:
        word = 0
        shift = 0
        for i in range(num):
            word |= src[pos + i] << shift
            shift += widths[sel][i]
        return (((word << 4) | sel) & 0xFFFFFFFF).to_bytes(4, "little")

    return pack_word


def _pack_word_8b(src, pos: int, num: int, sel: int) -> bytes:
    word = 0
    if sel > 1:  # selectors 0/1 are the magic all-ones runs, no payload
        bits = _S8B[sel][0]
        for i in range(num):
            word |= src[pos + i] << (i * bits)
    return (((word << 4) | sel) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")


def simple9_packed_encode(values) -> bytes:
    return _packed_encode(
        values, n_sel=9, caps=[len(w) for w in SIMPLE9_WIDTHS],
        feasible=_feasible_width(SIMPLE9_WIDTHS), window=28, word_bytes=4,
        single_sel=8, single_limit=1 << 28,
        pack_word=_make_width_packer(SIMPLE9_WIDTHS),
    )


def simple16_packed_encode(values) -> bytes:
    return _packed_encode(
        values, n_sel=16, caps=[len(w) for w in SIMPLE16_WIDTHS],
        feasible=_feasible_width(SIMPLE16_WIDTHS), window=28, word_bytes=4,
        single_sel=15, single_limit=1 << 28,
        pack_word=_make_width_packer(SIMPLE16_WIDTHS),
    )


def simple8b_packed_encode(values) -> bytes:
    return _packed_encode(
        values, n_sel=16, caps=[c for _b, c in _S8B],
        feasible=_feasible_8b, window=240, word_bytes=8,
        single_sel=15, single_limit=1 << 60,
        pack_word=_pack_word_8b,
    )


# decoders: the packed wire format is identical to the greedy variants'
# (same selector layouts), only the choice of words differs
def simple9_packed_decode(data: bytes, count: int) -> list[int]:
    from jassv2_spark.functions.simple_codecs import simple9_decode

    return simple9_decode(data, count)


def simple16_packed_decode(data: bytes, count: int) -> list[int]:
    from jassv2_spark.functions.simple_codecs import simple16_decode

    return simple16_decode(data, count)


def simple8b_packed_decode(data: bytes, count: int) -> list[int]:
    from jassv2_spark.functions.atire_codecs import simple8b_decode

    return simple8b_decode(data, count)
