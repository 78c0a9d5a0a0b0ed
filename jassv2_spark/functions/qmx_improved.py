"""QMX Improved — bit-exact vs the reference
(`source/compress_integer_qmx_improved.cpp:397-690`, codec_tool name
"QMX Improved").

Same 15 width classes as QMX JASS v1 (0-bit runs of ONES through 32-bit,
four of them spanning two 128-bit words), but: the selector bytes live
REVERSED at the END of the stream with no variable-byte pointer; a
selector's low nibble stores the run count INVERTED (`~(batch-1)`,
`:187`); end-of-sequence promotion uses its own spans (<4 left → 8
entries to 8/16/32 bits; <8 left → 8→8-bit or SIXTEEN→16-bit; <16 left →
16→8-bit, `:440-485`); width spans never split — a block whose span
overruns the input zero-pads (stripes) or short-writes (8/16/32-bit
byte classes, `:286-364`).

The 0-bit class encodes runs of the VALUE 1 (bits_needed_for(1)==0,
`:73-77`); zeros cost 1 bit.  Proven byte-identical by
tests/test_codec_differential.py fuzz.  Exporter/research-harness use
only (SURVEY §2.9).
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF

# width -> (selector type, integers per block);  7/9/12/21 span 256 bits
SPAN = {0: 256, 1: 128, 2: 64, 3: 40, 4: 32, 5: 24, 6: 20, 7: 36, 8: 16,
        9: 28, 10: 12, 12: 20, 16: 8, 21: 12, 32: 4}
TYPE = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8, 9: 9,
        10: 10, 12: 11, 16: 12, 21: 13, 32: 14}
NEXT = {0: 1, 1: 2, 2: 3, 3: 4, 4: 5, 5: 6, 6: 7, 7: 8, 8: 9, 9: 10,
        10: 12, 12: 16, 16: 21, 21: 32}
# double-word classes: (count in word 1, straddle quad start, low bits of
# the straddle quad kept in word 1, shift of the first post-straddle quad
# in word 2)
SPLIT = {7: (20, 16, 4, 3), 9: (16, 12, 5, 4), 12: (12, 8, 8, 8), 21: (8, 4, 11, 11)}
_BY_TYPE = {t: b for b, t in TYPE.items()}


def _bits_needed(v: int) -> int:
    if v == 1:
        return 0
    if v == 0:
        return 1
    b = v.bit_length()
    for w in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 16, 21, 32):
        if b <= w:
            return w
    return 32


def _stripe(src, base: int, end: int, count: int, bits: int, extra: int = 0,
            lanes=None, start: int = 0):
    if lanes is None:
        lanes = [0, 0, 0, 0]
    for i in range(start, count):
        v = src[base + i] if base + i < end else 0
        lanes[i & 3] |= (v << (((i - start) // 4) * bits + extra)) & _M32
    return lanes


def _emit_block(out: bytearray, src, base: int, end: int, bits: int) -> int:
    """One block; returns source positions consumed."""
    if bits == 0:
        return 256  # implicit run of 256 ones
    span = SPAN[bits]
    if bits in (8, 16, 32):
        width = bits // 8
        n = 0
        for i in range(span):
            if base + i >= end:
                break  # short end block: bytes stop at the run's end
            out += (src[base + i] & ((1 << bits) - 1)).to_bytes(width, "little")
            n += 1
        return n
    if bits in SPLIT:
        first, straddle, low, extra = SPLIT[bits]
        w1 = _stripe(src, base, end, first, bits)
        out += b"".join(x.to_bytes(4, "little") for x in w1)
        w2 = [0, 0, 0, 0]
        for i in range(straddle, straddle + 4):
            v = src[base + i] if base + i < end else 0
            w2[i & 3] |= (v >> low) & _M32
        w2 = _stripe(src, base, end, span, bits, extra, w2, first)
        out += b"".join(x.to_bytes(4, "little") for x in w2)
        return span
    w = _stripe(src, base, end, span, bits)
    out += b"".join(x.to_bytes(4, "little") for x in w)
    return span


def qmx_improved_encode(values) -> bytes:
    src = [int(v) & _M32 for v in values]
    n = len(src)
    if n == 0:
        return b""
    cl = [_bits_needed(v) for v in src] + [0] * 512
    for p in range(0, n + 4, 4):
        m = max(cl[p : p + 4])
        cl[p] = cl[p + 1] = cl[p + 2] = cl[p + 3] = m
    p = 0
    while p < n:
        rem = n - p
        if rem < 4:
            largest = max(cl[p : p + 8])
            if largest <= 8:
                cl[p : p + 8] = [8] * 8
            elif largest <= 16:
                cl[p : p + 8] = [16] * 8
            elif largest <= 32:
                cl[p : p + 8] = [32] * 8
        elif rem < 8:
            largest = max(cl[p : p + 8])
            if largest <= 8:
                cl[p : p + 8] = [8] * 8
            elif largest <= 16:
                cl[p : p + 16] = [16] * 16
        elif rem < 16:
            largest = max(cl[p : p + 16])
            if largest <= 8:
                cl[p : p + 16] = [8] * 16
        bits = cl[p]
        span = SPAN[bits]
        for b in range(0, span, 4):
            if cl[p + b] > bits:
                cl[p] = cl[p + 1] = cl[p + 2] = cl[p + 3] = NEXT[bits]
        if cl[p] != bits:
            continue  # promoted: re-run with the wider width
        cl[p : p + span] = [bits] * span
        p += span
    # run-length pass over the real entries only
    data = bytearray()
    keys = bytearray()

    def write_out(start: int, raw_count: int, bits: int) -> None:
        end = start + raw_count
        count = (raw_count + SPAN[bits] - 1) // SPAN[bits]
        base = start
        while count > 0:
            batch = min(16, count)
            keys.append((TYPE[bits] << 4) | (~(batch - 1) & 0xF))
            count -= batch
            for _ in range(batch):
                base += _emit_block(data, src, base, end, bits)

    run_start = 0
    bits = cl[0]
    for i in range(1, n):
        if cl[i] != bits:
            write_out(run_start, i - run_start, bits)
            run_start, bits = i, cl[i]
    write_out(run_start, n - run_start, bits)
    return bytes(data) + bytes(reversed(keys))


def qmx_improved_decode(data: bytes, count: int) -> list[int]:
    out: list[int] = []

    def u32(at: int) -> int:
        return int.from_bytes(data[at : min(at + 4, len(data))], "little")

    at = 0
    key_at = len(data) - 1
    while at <= key_at and len(out) < count:
        key = data[key_at]
        key_at -= 1
        bits = _BY_TYPE[key >> 4]
        batch = 16 - (key & 0xF)
        for _ in range(batch):
            if bits == 0:
                out.extend([1] * 256)
                continue
            span = SPAN[bits]
            if bits in (8, 16, 32):
                width = bits // 8
                for i in range(span):
                    out.append(int.from_bytes(
                        data[at + i * width : at + (i + 1) * width], "little"))
                at += span * width
                continue
            w1 = [u32(at + 4 * i) for i in range(4)]
            at += 16
            if bits in SPLIT:
                first, straddle, low, extra = SPLIT[bits]
                w2 = [u32(at + 4 * i) for i in range(4)]
                at += 16
                mask = (1 << bits) - 1
                vals = [0] * span
                for i in range(first):
                    vals[i] = (w1[i & 3] >> ((i // 4) * bits)) & mask
                for i in range(straddle, straddle + 4):
                    vals[i] = ((w1[i & 3] >> ((straddle // 4) * bits)) & ((1 << low) - 1)) | (
                        (w2[i & 3] & ((1 << (bits - low)) - 1)) << low)
                for i in range(first, span):
                    vals[i] = (w2[i & 3] >> (((i - first) // 4) * bits + extra)) & mask
                out.extend(vals)
            else:
                mask = (1 << bits) - 1
                out.extend((w1[i & 3] >> ((i // 4) * bits)) & mask for i in range(span))
    return out[:count]
