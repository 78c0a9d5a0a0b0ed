"""Carryover-12 codec — bit-identical to the reference's
`compress_integer_carryover_12` (`source/compress_integer_carryover_12.cpp`,
Anh & Moffat's carryover scheme with JASS's 12-selector transition table).

Why this codec matters: the JASS v2 serialiser's default codex byte is
'g' (elias_gamma_simd_vb, `serialise_jass_v2.h:59`), but the living
binary resolves that name through `compress_integer_all::get_by_name`
whose table spells the entry "Group Elias **Delta** SIMD with Variable
Byte" (`compress_integer_all.cpp:52`) while `get_compressor` asks for
"Group Elias **Gamma** SIMD with Variable Byte"
(`serialise_jass_v1.cpp:245-247`).  The lookup misses and falls back to
`compressors[0]` — Carryover-12 (`compress_integer_all.h:161-168`).  So
every index `JASS_index -I2` writes is Carryover-12-encoded, and
byte-parity with the live binary (tests/test_reference_differential.py)
requires THIS codec, quirks included:

- the first integer is stored raw in word 0 under initial selector row
  23 ("l32"), whose encoder capacity check is 30 bits but whose decoder
  mask is 28 bits (`...carryover_12.cpp:79-81` vs the `case 23` mask
  0x0FFFFFFF) — replicated verbatim;
- a trailing all-zero codeword is always emitted because the encoder's
  do-while runs once even when only the first integer exists;
- 2-bit selector fields live either in the low 2 bits of the word they
  describe (30-bit payload rows 0-11) or in the high 2 bits of the
  PREVIOUS word (32-bit payload rows 12-23), per the transition table.
"""

from __future__ import annotations

# (bits, integers, next_selector_in_this_words_high_bits, new_selector[4])
# transcribed from `compress_integer_carryover_12.cpp:21-50`
_TABLE = [
    # selector stored in this word's low 2 bits (30-bit payload)
    (1, 30, False, (0, 1, 2, 11)),    # 0  a30
    (2, 15, False, (0, 1, 2, 11)),    # 1  b30
    (3, 10, False, (1, 2, 3, 11)),    # 2  c30
    (4, 7,  True,  (14, 15, 16, 23)), # 3  d30
    (5, 6,  False, (3, 4, 5, 11)),    # 4  e30
    (6, 5,  False, (4, 5, 6, 11)),    # 5  f30
    (7, 4,  True,  (17, 18, 19, 23)), # 6  g30
    (9, 3,  True,  (18, 19, 20, 23)), # 7  h30
    (10, 3, False, (7, 8, 9, 11)),    # 8  i30
    (14, 2, True,  (20, 21, 22, 23)), # 9  j30
    (15, 2, False, (8, 9, 10, 11)),   # 10 k30
    (28, 1, True,  (17, 20, 22, 23)), # 11 l30
    # selector stored in the previous word's high 2 bits (32-bit payload)
    (1, 32, False, (0, 1, 2, 11)),    # 12 a32
    (2, 16, False, (0, 1, 2, 11)),    # 13 b32
    (3, 10, True,  (13, 14, 15, 23)), # 14 c32
    (4, 8,  False, (2, 3, 4, 11)),    # 15 d32
    (5, 6,  True,  (15, 16, 17, 23)), # 16 e32
    (6, 5,  True,  (16, 17, 18, 23)), # 17 f32
    (7, 4,  True,  (17, 18, 19, 23)), # 18 g32
    (8, 4,  False, (6, 7, 8, 11)),    # 19 h32
    (10, 3, True,  (19, 20, 21, 23)), # 20 i32
    (15, 2, True,  (20, 21, 22, 23)), # 21 j32
    (16, 2, False, (8, 9, 10, 11)),   # 22 k32
    (30, 1, True,  (17, 20, 22, 23)), # 23 l32
]

_INITIAL = 23
_U32 = 0xFFFFFFFF


def _clog2(x: int) -> int:
    """`maths::ceiling_log2` (`source/maths.h:210`): bit-length, with
    clog2(0) == 0 and clog2(1) == 1."""
    return max(1, int(x).bit_length()) if x else 0


def carryover12_encode(values) -> bytes:
    """Encode exactly as `compress_integer_carryover_12::encode`
    (`compress_integer_carryover_12.cpp:56-172`), including the padding
    zero-values for short final groups and the trailing do-while word."""
    n = len(values)
    if n == 0:
        return b""
    first = int(values[0])
    if _clog2(first) > _TABLE[_INITIAL][0]:
        raise OverflowError("first integer exceeds 30 bits")
    words = [first & _U32]
    current = _INITIAL
    next_in_prev = True
    used = 1

    while True:  # the reference's do-while: runs at least once
        selector = 0
        trial = _TABLE[current][3][selector]
        # selector search — a literal transcription of the quirky loop at
        # `compress_integer_carryover_12.cpp:100-131` (including carrying
        # a failed iteration's `terms` into the next trial's fit test)
        while True:
            bits, cap, _nxt, _tr = _TABLE[trial]
            terms = 0
            while terms < cap and used + terms < n:
                if _clog2(int(values[used + terms])) > bits:
                    selector += 1
                    break
                terms += 1
            if selector < 4:
                trial = _TABLE[current][3][selector]
                if terms >= _TABLE[trial][1] or used + terms >= n:
                    break
            if selector >= 4:
                raise OverflowError("integer too large for carryover-12")

        bits, terms_cap, _nxt, _tr = _TABLE[trial]
        word = 0
        for term in range(terms_cap - 1, -1, -1):
            value = int(values[used + term]) if used + term < n else 0
            word = ((word << bits) | value) & _U32
        if next_in_prev:
            words[-1] |= selector << 30
        else:
            word = ((word << 2) | selector) & _U32
        words.append(word)
        used += terms_cap
        next_in_prev = _TABLE[trial][2]
        current = trial
        if used >= n:
            break

    return b"".join(w.to_bytes(4, "little") for w in words)


def carryover12_decode(data: bytes, count: int) -> list[int]:
    """Decode as `compress_integer_carryover_12::decode`
    (`compress_integer_carryover_12.cpp:178+`): row 23's payload is
    masked to 28 bits (the reference's decoder quirk)."""
    out: list[int] = []
    if count == 0:
        return out
    words = [int.from_bytes(data[i : i + 4], "little")
             for i in range(0, len(data), 4)]
    pos = 0
    selector = _INITIAL
    payload = words[pos]
    while len(out) < count:
        bits, cap, nxt, trans = _TABLE[selector]
        if selector == _INITIAL:
            out.append(payload & 0x0FFFFFFF)  # 28-bit mask despite bits=30
        else:
            mask = (1 << bits) - 1
            for i in range(cap):
                out.append((payload >> (i * bits)) & mask)
        if len(out) >= count:
            break
        if nxt:
            # next selector lives in THIS word's bits 30-31; the next row
            # is a 32-bit-payload row
            if selector >= 12 or selector == _INITIAL:
                field = (payload >> 30) & 3
            else:
                field = (payload >> 28) & 3  # payload was word >> 2
            selector = trans[field]
            pos += 1
            payload = words[pos]
        else:
            pos += 1
            field = words[pos] & 3
            selector = trans[field]
            payload = words[pos] >> 2
    return out[:count]
