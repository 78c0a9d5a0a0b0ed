"""QMX "original" + QMX-D4 — the codecs behind codex tags 'Q' and 'R'.

The jass_v1_codex tags 'Q' (QMX-D4) and 'R' (QMX-D0) come from the
ATIRE-era tooling (`JASSv1/atire_to_jass_index.c:359-373`,
`JASSv1/jass.c:374-386`); the CURRENT reference can neither write nor
read them (`serialise_jass_v1.cpp:241-261` exits), so, as with 'c'/'8'
(functions/atire_codecs.py), these are import/export extensions for
historical indexes:

- tag 'R' used `ANT_compress_qmx` over RAW docids (no delta) — whose
  byte format is the keys-reversed "JASS v1" QMX already implemented
  bit-exactly in functions/qmx.py; `qmx_d0_*` below just re-exports it.
- tag 'Q' used `ANT_compress_qmx_d4`: lane-wise D4 deltas
  (delta[i] = v[i] - v[i-4], four independent lanes seeded at 0,
  `JASSv1/compress_qmx_d4.c:536-548`) in front of a core whose byte
  format survives in the modern reference as
  `compress_integer_qmx_original` (`source/compress_integer_qmx_original
  .cpp`): same width classes and 128-bit stripe blocks as qmx.py, but
  selector keys stored FORWARD after the payload followed by a
  reverse-variable-byte pointer (low 7 bits first, stop bit on the
  FIRST byte, read backward from the buffer end) giving the offset from
  the end to the start of the keys — including the 127-boundary quirk
  where adding the pointer's own length lengthens its encoding
  (:776-781). Width selection also differs from the v1 variant: no
  tail-driven promotion and no raw-escape class; tail blocks pad with
  zeros from the scratch copy, except the byte-aligned 8/16/32 classes
  which stop at the sequence end (:414-452).

Both are fuzz-proven byte-identical to the compiled reference classes —
`codec_tool "QMX Original"` and `legacy_qmx_tool qmx_d4` — in
tests/test_codec_differential.py.  Driver/exporter-side use only.
"""

from __future__ import annotations

from jassv2_spark.functions.qmx import (_PER_BLOCK, _TYPE_OF, _bits_needed,
                                        _write_block, qmx_decode, qmx_encode)

# re-exported D0 core for tag 'R' (raw docids through the v1-format QMX)
qmx_d0_encode = qmx_encode
qmx_d0_decode = qmx_decode


def _reverse_vbyte(value: int) -> bytes:
    """`vbyte_compress_into` (:139-171): little-endian 7-bit groups, stop
    bit on the FIRST byte — decoded by reading backward from the end."""
    out = bytearray([(value & 0x7F) | 0x80])
    value >>= 7
    while value:
        out.append(value & 0x7F)
        value >>= 7
    return bytes(out)


def _read_reverse_vbyte(data: bytes) -> tuple[int, int]:
    """Read the trailing pointer: walk backward from the last byte until
    the stop bit; returns (value, pointer_length)."""
    at = len(data) - 1
    value = 0
    length = 0
    while at >= 0:
        value = (value << 7) | (data[at] & 0x7F)
        length += 1
        if data[at] & 0x80:
            return value, length
        at -= 1
    raise ValueError("qmx_original: no pointer stop bit found")


def qmx_original_encode(values, legacy_tail_bug: bool = False) -> bytes:
    """Bit-exact `compress_integer_qmx_original::encode` (:122-785).

    ``legacy_tail_bug``: the ATIRE-era `ANT_compress_qmx_d4` has a typo
    in its SHORT_END pre-pass — the 4..7-remaining branch tests
    ``largest <= 8`` twice (`JASSv1/compress_qmx_d4.c:598-609`), so 9-16
    bit tails are never promoted to the 16-bit class and are written as
    a zero-padded full-width block instead.  The modern
    compress_integer_qmx_original fixed the typo.  Tag 'Q' files came
    from the legacy tool, so the D4 wrapper passes True.
    """
    n = len(values)
    if n == 0:
        return b""
    src = [int(v) & 0xFFFFFFFF for v in values]
    wastage = 512
    cl = [_bits_needed(v) for v in src] + [0] * wastage
    for p in range(0, n + 4, 4):
        m = max(cl[p], cl[p + 1], cl[p + 2], cl[p + 3])
        cl[p] = cl[p + 1] = cl[p + 2] = cl[p + 3] = m
    # width selection: SHORT_END pre-pass plus intra-capacity quad
    # promotion only — unlike the v1 variant there is NO remaining-
    # shorter-than-capacity promotion and NO 128-bit escape class
    _NEXT = {0: 1, 1: 2, 2: 3, 3: 4, 4: 5, 5: 6, 6: 7, 7: 8, 8: 9, 9: 10,
             10: 12, 12: 16, 16: 21, 21: 32}
    p = 0
    while p < n:
        remaining = n - p
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
            elif not legacy_tail_bug and largest <= 16:
                cl[p : p + 8] = [16] * 8
        elif remaining < 16:
            largest = max(cl[p : p + 16])
            if largest <= 8:
                cl[p : p + 16] = [8] * 16
        bits = cl[p]
        per = _PER_BLOCK[bits]
        promoted = False
        for b in range(0, per, 4):
            if cl[p + b] > bits:
                cl[p] = cl[p + 1] = cl[p + 2] = cl[p + 3] = _NEXT[bits]
                promoted = True
                break
        if promoted:
            continue
        for b in range(per):
            cl[p + b] = bits
        p += per
    # run-length emit: packed blocks forward, keys FORWARD
    data = bytearray()
    keys = bytearray()
    run_start = 0
    bits = cl[0]
    for i in range(1, n):
        if cl[i] != bits:
            _write_original_run(data, keys, src, run_start, i, bits, n)
            run_start, bits = i, cl[i]
    _write_original_run(data, keys, src, run_start, n, bits, n)
    # trailing pointer: keys length + the pointer's own length, with the
    # re-check for the boundary where including the pointer grows it
    val = len(keys) + len(_reverse_vbyte(len(keys)))
    if len(_reverse_vbyte(val)) > len(_reverse_vbyte(len(keys))):
        val = len(keys) + len(_reverse_vbyte(val))
    return bytes(data) + bytes(keys) + _reverse_vbyte(val)


def _write_original_run(data: bytearray, keys: bytearray, src, start: int,
                        stop: int, bits: int, n: int) -> None:
    raw = stop - start
    per = _PER_BLOCK[bits]
    count = (raw + per - 1) // per
    t = _TYPE_OF[bits]
    pos = start
    # tail blocks beyond the sequence read from the encoder's zero-padded
    # scratch copy; _write_block with a padded source mirrors that
    padded = src[start:] + [0] * (per * 16 + 16)
    while count > 0:
        batch = min(count, 16)
        keys.append((t << 4) | (~(batch - 1) & 0x0F))
        count -= batch
        for _ in range(batch):
            consumed = _write_block(data, padded, pos - start, n - start, bits)
            pos += consumed


def qmx_original_decode(data: bytes, count: int) -> list[int]:
    """Decode: pointer from the end locates the keys; keys walk FORWARD
    while payload reads forward from the start."""
    if count == 0 or not data:
        return []
    val, _ptr_len = _read_reverse_vbyte(data)
    keys_start = len(data) - val
    # reuse the v1 decoder's block reader by re-framing: qmx_decode walks
    # keys BACKWARD from the last byte, so hand it payload + reversed keys
    payload = data[:keys_start]
    keys_fwd = data[keys_start : len(data) - _ptr_len]
    return qmx_decode(payload + bytes(reversed(keys_fwd)), count)


# ------------------------------------------------------------- D4 ('Q')


def _d4_deltas(values) -> list[int]:
    out = []
    for i, v in enumerate(values):
        prev = values[i - 4] if i >= 4 else 0
        out.append((int(v) - int(prev)) & 0xFFFFFFFF)
    return out


def qmx_d4_encode(values) -> bytes:
    """`ANT_compress_qmx_d4::encodeArray`: lane-4 deltas, then the
    qmx-original core with the legacy tail-promotion typo preserved."""
    return qmx_original_encode(_d4_deltas(values), legacy_tail_bug=True)


def qmx_d4_decode(data: bytes, count: int) -> list[int]:
    deltas = qmx_original_decode(data, count)
    out: list[int] = []
    for i, d in enumerate(deltas):
        prev = out[i - 4] if i >= 4 else 0
        out.append((prev + d) & 0xFFFFFFFF)
    return out
