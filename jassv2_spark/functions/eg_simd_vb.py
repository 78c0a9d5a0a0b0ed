"""Group Elias Gamma SIMD with Variable-Byte tail — bit-exact vs the
reference (`source/compress_integer_elias_gamma_simd_vb.cpp:52-231`,
codec_tool name "Group Elias Delta SIMD with Variable Byte" — the
registry's display name; the class is elias_GAMMA_simd_vb).

Stream layout: a u32 header holding the byte length of the trailing
variable-byte section, then 68-byte codewords (u32 selector + 16 u32
payload words), then that vbyte tail.  Each codeword packs consecutive
16-integer column slices at a common width (bit_length of the OR of the
slice, min 1); the selector gamma-packs the widths first-slice-lowest
(width w contributes w bits holding 1<<(w-1)); a slice that does not fit
the remaining bits pads the previous width and restarts in a fresh
codeword (no cross-codeword carry — that is the plain EG-SIMD's trick,
eg_simd.py).

The VB part handles the final partial slice: either (a) the WHOLE final
codeword is discarded and all its integers re-encoded as JASS variable
byte (when that is strictly smaller than 64 payload bytes + vbyte of
just the tail), or (b) the final partial column is XORed back out of
the payload, its width merged into the previous column's selector code,
and only the tail integers go to the vbyte section
(`..._vb.cpp:136-178`).  An input that is a multiple of 16 has an empty
vbyte section (header 0).

Proven byte-identical by tests/test_codec_differential.py fuzz.
Exporter/research-harness use only (SURVEY §2.9).
"""

from __future__ import annotations

from jassv2_spark.functions.atire_codecs import (vbyte_array_decode,
                                                 vbyte_array_encode)

WORDS = 16
_M32 = 0xFFFFFFFF


def _vb_bytes(v: int) -> int:
    """compress_integer_variable_byte::bytes_needed_for (:157-172)."""
    for nbytes, limit in ((1, 1 << 7), (2, 1 << 14), (3, 1 << 21), (4, 1 << 28)):
        if v < limit:
            return nbytes
    return 5


def _selector(encodings: list[int]) -> int:
    value = 0
    for w in reversed(encodings):
        value = ((value << w) | (1 << (w - 1))) & _M32
    return value


def eg_simd_vb_encode(values) -> bytes:
    src = [int(v) & _M32 for v in values]
    n = len(src)
    body = bytearray()  # codewords, then maybe the vbyte tail
    pos = 0
    while True:
        cw_start = pos
        payload = [0] * WORDS
        encodings: list[int] = []
        remaining = 32
        cum = 0
        closed_mid = False
        for _slice in range(32):
            rem = n - pos
            orv = 1
            for w in range(WORDS):
                orv |= src[pos + w] if w < rem else 1
            mw = orv.bit_length()
            if mw > remaining:
                encodings[-1] += remaining  # pad and close this codeword
                closed_mid = True
                break
            encodings.append(mw)
            for w in range(WORDS):
                v = src[pos + w] if w < rem else 0
                payload[w] |= (v << cum) & _M32
            cum += mw
            remaining -= mw
            if rem <= WORDS:  # this slice held the last input integers
                encodings[-1] += remaining
                if rem == WORDS:  # exact fit: no vbyte section
                    body += _selector(encodings).to_bytes(4, "little")
                    for w in payload:
                        body += w.to_bytes(4, "little")
                    return (0).to_bytes(4, "little") + bytes(body)
                elias_size = WORDS * 4 + sum(_vb_bytes(v) for v in src[pos:n])
                vbyte_size = sum(_vb_bytes(v) for v in src[cw_start:n])
                if vbyte_size < elias_size:
                    # (a) drop the whole codeword, vbyte everything in it
                    vb = vbyte_array_encode(src[cw_start:n])
                    return len(vb).to_bytes(4, "little") + bytes(body) + vb
                # (b) XOR the final column back out, keep the codeword
                for w in range(WORDS):
                    v = src[pos + w] if w < rem else 0
                    payload[w] ^= (v << (cum - mw)) & _M32
                merged = encodings[:-1]
                merged[-1] += encodings[-1]
                body += _selector(merged).to_bytes(4, "little")
                for w in payload:
                    body += w.to_bytes(4, "little")
                vb = vbyte_array_encode(src[pos:n])
                return len(vb).to_bytes(4, "little") + bytes(body) + vb
            pos += WORDS
        else:
            closed_mid = True
            encodings[-1] += remaining  # 32 slices filled exactly
        if closed_mid:
            body += _selector(encodings).to_bytes(4, "little")
            for w in payload:
                body += w.to_bytes(4, "little")
        # next codeword re-tries from the unconsumed position


def eg_simd_vb_decode(data: bytes, count: int) -> list[int]:
    out: list[int] = []
    if len(data) < 4:
        return out
    vb_len = int.from_bytes(data[0:4], "little")
    elias_end = len(data) - vb_len
    at = 4
    while at + 4 * (WORDS + 1) <= elias_end:
        sel = int.from_bytes(data[at : at + 4], "little")
        at += 4
        words = [
            int.from_bytes(data[at + 4 * i : at + 4 * i + 4], "little")
            for i in range(WORDS)
        ]
        at += 4 * WORDS
        cum = 0
        while sel:
            w = (sel & -sel).bit_length()  # lowest set bit index + 1
            sel >>= w
            mask = (1 << w) - 1
            out.extend((words[i] >> cum) & mask for i in range(WORDS))
            cum += w
    if vb_len:
        out.extend(vbyte_array_decode(data[elias_end:], count))
    return out[:count]
