"""QMX (JASS v1 variant) — bit-exact encoder/decoder in pure Python.

QMX packs runs of equal-width integers into 128-bit (or 256-bit) SIMD
words: 15 width classes (0,1,2,3,4,5,6,7,8,9,10,12,16,21,32 bits) plus a
raw-32-bit escape. A selector byte stores the width class in its top
nibble and a run length (complemented, 1..16) in the bottom nibble. The
packed words are written first; the selector bytes are appended REVERSED
at the end of the sequence (the JASS v1 variant has no trailing
variable-byte pointer — the decoder walks selectors backward from the
last byte while reading data forward). Published algorithm: Trotman,
"Compression, SIMD, and Postings Lists", ADCS 2014; the v1-compat quirks
(selector placement, NO_ZEROS one-runs, SHORT_END_BLOCKS byte-exact short
tails for the 8/16/32-bit classes, the 0-bit class meaning runs of the
VALUE 1) follow `reference/source/compress_integer_qmx_jass_v1.cpp` —
semantics re-expressed from the format, no code copied.

Bit-exactness is proven end-to-end: plans/jass_v1.py uses this codec and
reproduces the reference's golden Fletcher-16 checksums for
CIpostings.bin (`source/serialise_jass_v1.cpp:273-310`).

Used on the driver-side exporter epilogue only — postings-scale encoding
for OUR index layout stays in parquet (SURVEY §2.9 mapping).
"""

from __future__ import annotations

# width (bits) -> (selector type, integers per block, 32-byte double block?)
_SINGLE = {0: (0, 256), 1: (1, 128), 2: (2, 64), 3: (3, 40), 4: (4, 32),
           5: (5, 24), 6: (6, 20), 8: (8, 16), 10: (10, 12), 16: (12, 8),
           32: (14, 4)}
_DOUBLE = {7: (7, 36), 9: (9, 28), 12: (11, 20), 21: (13, 12)}
_PER_BLOCK = {**{b: n for b, (_t, n) in _SINGLE.items()},
              **{b: n for b, (_t, n) in _DOUBLE.items()}, 128: 1}
_TYPE_OF = {**{b: t for b, (t, _n) in _SINGLE.items()},
            **{b: t for b, (t, _n) in _DOUBLE.items()}, 128: 15}
# promotion ladder (compress_integer_qmx_jass_v1.cpp:560-780): width ->
# next width when a block can't be filled
_NEXT = {0: 1, 1: 2, 2: 3, 3: 4, 4: 5, 5: 6, 6: 7, 7: 8, 8: 9, 9: 10,
         10: 12, 12: 16, 16: 21, 21: 32}
# double-word classes: (ints fully in word 1, straddle-quad start,
# low bits the straddle quad keeps in word 1, shift offset in word 2)
_SPLIT = {7: (20, 16, 4, 3), 9: (16, 12, 5, 4), 12: (12, 8, 8, 8), 21: (8, 4, 11, 11)}


def _bits_needed(value: int) -> int:
    """`bits_needed_for` — note 0 bits means the value 1 exactly (d1 gaps
    of consecutive docids), and the value 0 needs 1 bit."""
    if value == 0x01:
        return 0
    for bits, limit in ((1, 0x01), (2, 0x03), (3, 0x07), (4, 0x0F), (5, 0x1F),
                       (6, 0x3F), (7, 0x7F), (8, 0xFF), (9, 0x1FF), (10, 0x3FF),
                       (12, 0xFFF), (16, 0xFFFF), (21, 0x1FFFFF)):
        if value <= limit:
            return bits
    return 32


def _pack_stripe(values, bits: int, base: int, count: int, lane_shift_extra: int = 0,
                 lanes=None):
    """Interleaved stripe packing: value i goes to 32-bit lane (i & 3) at
    shift (i//4)*bits (+extra). Returns the four lanes."""
    if lanes is None:
        lanes = [0, 0, 0, 0]
    for i in range(count):
        v = values[base + i]
        lanes[i & 3] |= (v << ((i // 4) * bits + lane_shift_extra)) & 0xFFFFFFFF
    return lanes


def _lanes_bytes(lanes) -> bytes:
    return b"".join((lane & 0xFFFFFFFF).to_bytes(4, "little") for lane in lanes)


def _write_block(out: bytearray, src, base: int, end: int, bits: int) -> int:
    """Emit one block of `bits`-wide integers starting at src[base];
    returns the number of source integers consumed."""
    if bits == 0:
        return 256  # implicit run of 256 ones — nothing stored
    if bits in (8, 16, 32):
        per = _PER_BLOCK[bits]
        width = bits // 8
        n = 0
        for i in range(per):  # SHORT_END_BLOCKS: stop at the sequence end
            if base + i >= end:
                break
            out += (src[base + i] & ((1 << bits) - 1)).to_bytes(width, "little")
            n += 1
        return n
    if bits == 128:
        out += (src[base] & 0xFFFFFFFF).to_bytes(4, "little")
        return 1
    if bits in _SINGLE:
        per = _SINGLE[bits][1]
        out += _lanes_bytes(_pack_stripe(src, bits, base, per))
        return per
    # double 128-bit word classes: 7, 9, 12, 21. The straddling quad keeps
    # its LOW `low_in_w1` bits in word 1 (at the top) and its high bits at
    # word 2's shift 0; later quads shift past them
    # (compress_integer_qmx_jass_v1.cpp:303-395)
    per = _DOUBLE[bits][1]
    first_count, straddle_at, low_in_w1, second_extra = _SPLIT[bits]
    w1 = _pack_stripe(src, bits, base, first_count)
    out += _lanes_bytes(w1)
    w2 = [0, 0, 0, 0]
    for i in range(straddle_at, straddle_at + 4):
        w2[i & 3] |= (src[base + i] >> low_in_w1) & 0xFFFFFFFF
    for i in range(first_count, per):
        w2[i & 3] |= (src[base + i] << (((i - first_count) // 4) * bits + second_extra)) & 0xFFFFFFFF
    out += _lanes_bytes(w2)
    return per


def qmx_encode(values) -> bytes:
    """Bit-exact `compress_integer_qmx_jass_v1::encode`."""
    n = len(values)
    if n == 0:
        return b""
    src = [int(v) & 0xFFFFFFFF for v in values]
    wastage = 512
    cl = [_bits_needed(v) for v in src] + [0] * wastage
    # group-of-4 max (each aligned quad must share a width)
    for p in range(0, n + 4, 4):
        m = max(cl[p], cl[p + 1], cl[p + 2], cl[p + 3])
        cl[p] = cl[p + 1] = cl[p + 2] = cl[p + 3] = m
    # width selection with end-of-sequence promotion
    p = 0
    while p < n:
        remaining = n - p
        # SHORT_END_BLOCKS pre-pass: few values left and narrow enough →
        # byte/short/word tails are smaller than full stripes
        if remaining < 4:
            largest = max(cl[p : p + 8])
            if largest <= 8:
                cl[p : p + 8] = [8] * 8
            elif largest <= 16:
                cl[p : p + 8] = [16] * 8
            elif largest <= 32:
                cl[p : p + 8] = [32] * 8
        elif remaining < 8:
            largest = max(cl[p : p + 8])
            if largest <= 8:
                cl[p : p + 8] = [8] * 8
            elif largest <= 16:
                cl[p : p + 8] = [16] * 8
        elif remaining < 16:
            largest = max(cl[p : p + 16])
            if largest <= 8:
                cl[p : p + 16] = [8] * 16
        bits = cl[p]
        if bits == 128:
            break  # everything to the end is the raw escape
        per = _PER_BLOCK[bits]
        if remaining < per:
            if bits == 32:  # no wider class: the rest become raw escapes
                for i in range(remaining):
                    cl[p + i] = 128
            else:
                nxt = _NEXT[bits]
                cl[p] = cl[p + 1] = cl[p + 2] = cl[p + 3] = nxt
            continue
        if any(cl[p + b] > bits for b in range(0, per, 4)):
            nxt = _NEXT[bits]
            cl[p] = cl[p + 1] = cl[p + 2] = cl[p + 3] = nxt
            continue
        for b in range(per):
            cl[p + b] = bits
        p += per
    # run-length pass: emit write_out per run of equal widths
    data = bytearray()
    keys = bytearray()
    run_start = 0
    bits = cl[0]
    for i in range(1, n):
        if cl[i] != bits:
            _write_run(data, keys, src, run_start, i, bits, n)
            run_start, bits = i, cl[i]
    _write_run(data, keys, src, run_start, n, bits, n)
    return bytes(data) + bytes(reversed(keys))


def _write_run(data: bytearray, keys: bytearray, src, start: int, stop: int,
               bits: int, n: int) -> None:
    """`write_out`: selector byte(s) then the packed blocks for one run."""
    raw = stop - start
    per = _PER_BLOCK[bits]
    count = raw if bits == 128 else (raw + per - 1) // per
    t = _TYPE_OF[bits]
    pos = start
    while count > 0:
        batch = min(count, 16)
        keys.append((t << 4) | (~(batch - 1) & 0x0F))
        count -= batch
        for _ in range(batch):
            pos += _write_block(data, src, pos, n, bits)


def _unpack_stripe(w, bits: int, count: int):
    mask = (1 << bits) - 1
    return [(w[i & 3] >> ((i // 4) * bits)) & mask for i in range(count)]


def qmx_decode(data: bytes, count: int):
    """Bit-exact decode: selectors walk backward from the last byte,
    packed words forward from the first; output truncated to `count`
    (short end blocks over-decode by design)."""
    out = []
    inp = 0
    kp = len(data) - 1
    while inp <= kp:
        sel = data[kp]
        kp -= 1
        t = sel >> 4
        batch = 16 - (sel & 0x0F)
        for _ in range(batch):
            if t == 0:  # NO_ZEROS: a run of 256 literal ones
                out.extend([1] * 256)
                continue
            if t == 15:
                out.append(int.from_bytes(data[inp : inp + 4], "little"))
                inp += 4
                continue
            if t in (8, 12, 14):  # byte / short / word-aligned classes
                width = {8: 1, 12: 2, 14: 4}[t]
                per = {8: 16, 12: 8, 14: 4}[t]
                chunk = data[inp : inp + 16]
                chunk = chunk + b"\x00" * (16 - len(chunk))
                out.extend(
                    int.from_bytes(chunk[i * width : (i + 1) * width], "little")
                    for i in range(per)
                )
                inp += 16
                continue
            bits = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 9: 9,
                    10: 10, 11: 12, 13: 21}[t]
            w1 = [int.from_bytes(data[inp + 4 * i : inp + 4 * i + 4], "little") for i in range(4)]
            inp += 16
            if bits in (1, 2, 3, 4, 5, 6, 10):
                out.extend(_unpack_stripe(w1, bits, _SINGLE[bits][1]))
                continue
            # double-word classes
            per = _DOUBLE[bits][1]
            first_count, straddle_at, low_in_w1, second_extra = _SPLIT[bits]
            w2 = [int.from_bytes(data[inp + 4 * i : inp + 4 * i + 4], "little") for i in range(4)]
            inp += 16
            mask = (1 << bits) - 1
            vals = _unpack_stripe(w1, bits, first_count)
            for i in range(straddle_at, straddle_at + 4):
                vals[i] = (vals[i] | (w2[i & 3] << low_in_w1)) & mask
            for i in range(first_count, per):
                vals.append((w2[i & 3] >> (((i - first_count) // 4) * bits + second_extra)) & mask)
            out.extend(vals)
    return out[:count]


def d1_encode(values):
    """Gap-encode in place semantics (`compress_integer.h:94-109`)."""
    prior = 0
    out = []
    for v in values:
        out.append(v - prior)
        prior = v
    return out


def d1_decode(gaps):
    total = 0
    out = []
    for g in gaps:
        total += g
        out.append(total)
    return out
