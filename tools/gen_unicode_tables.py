"""Generate the pinned JASS Unicode tables from published Unicode data.

The reference engine does not use the platform's Unicode library: it
code-generates lookup tables (`source/unicode.cpp`) from the published
Unicode Character Database files — UnicodeData.txt, PropList.txt,
CaseFolding.txt (version 9.0.0, per the files its build consumes:
`tools/CMakeLists.txt:24`) — with `tools/unicode_database_to_c.cpp`.
This script reproduces that generator's OUTPUT SEMANTICS in Python and
emits `jassv2_spark/functions/_unicode_jass.py`, freezing the tokenizer's
character classes and JASS normalisation against the same published data
so they cannot drift with the Python runtime's Unicode version.

Faithfulness notes (all verified against the C generator's logic):
- alpha = categories Lu/Ll/Lt/Lm/Lo/Nl plus PropList Other_Alphabetic /
  Other_Lowercase / Other_Uppercase (`unicode_database_to_c.cpp:309-370,
  501-517`); digit = Nd/Nl/No; alnum = union.
- casefold = CaseFolding.txt statuses C and F only (`:705-755`).
- JASS normalisation per codepoint = recursive decomposition expansion
  (UnicodeData field 5, compatibility tags skipped) → drop non-alnum
  codepoints (keeping interior spaces) → casefold → trim edge spaces
  (`:568-700`).
- The C parser scans decomposition/casefold target lists with
  `strpbrk(";0123456789")`, so a target codepoint whose hex starts with
  A-F (e.g. the circled-Hangul targets AC00.., casefold target AB53) is
  MISPARSED from its first decimal digit. That quirk is part of the
  engine's shipped tables, so it is replicated here deliberately —
  table-for-table parity beats abstract correctness for this purpose.

Usage: python tools/gen_unicode_tables.py [ucd_dir] [out.py]
Default ucd_dir is the reference checkout's `external/Unicode`; the
emitted module records the data-file version header for provenance.
"""

from __future__ import annotations

import re
import sys
import zlib
import base64
import os

_HEX_RE = re.compile(r"[0-9a-fA-F]+")


def _sscanf_hex(s: str) -> int:
    m = _HEX_RE.match(s)
    return int(m.group(0), 16) if m else 0


def _strpbrk_targets(field: str) -> list[int] | None:
    """The C target-list scan: jump to the next of ';0123456789', stop at
    ';', else read hex (including letters) from there. Returns None when
    the field is empty up to the terminating ';' (identity)."""
    out: list[int] = []
    i = 0
    n = len(field)
    while True:
        while i < n and field[i] not in ";0123456789":
            i += 1
        if i >= n or field[i] == ";":
            return out if out else None
        out.append(_sscanf_hex(field[i:]))
        while i < n and field[i] not in " ;":
            i += 1


def parse_unicodedata(path: str):
    categories: dict[int, str] = {}
    decomp: dict[int, list[int]] = {}
    last = 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            fields = line.rstrip("\n").split(";")
            cp = int(fields[0], 16)
            if ", Last>" in fields[1]:
                start, end = last, cp
            else:
                start = end = cp
            last = cp
            cat = fields[2][:2]
            for c in range(start, end + 1):
                categories[c] = cat
            # JASS normalisation: field 5 for THIS LINE only (range
            # interiors have no entry → direct foldcase), C scan quirks
            # included. Empty field → identity [cp].
            rest = ";".join(fields[5:]) + ";"
            targets = _strpbrk_targets(rest)
            decomp[cp] = [cp] if targets is None else targets
    return categories, decomp


def parse_proplist(path: str):
    """Only the three Other_* properties feed alpha/alnum."""
    props: dict[str, list[tuple[int, int]]] = {
        "Other_Alphabetic": [], "Other_Lowercase": [], "Other_Uppercase": []
    }
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("#") or ";" not in line or "#" not in line:
                continue
            semi = line.index(";")
            hash_at = line.index("#")
            segment = line[semi:hash_at]
            rng = line[:semi].strip()
            if ".." in rng:
                lo, hi = (int(x, 16) for x in rng.split(".."))
            elif rng:
                lo = hi = int(rng, 16)
            else:
                continue
            for name, acc in props.items():
                if segment == f"; {name} ":
                    acc.append((lo, hi))
    return props


def parse_casefolding(path: str):
    fold: dict[int, list[int]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("#") or ";" not in line:
                continue
            m = re.match(r"\s*([0-9A-Fa-f]+);\s*(\w);", line)
            if not m or m.group(2) not in ("C", "F"):
                continue
            cp = int(m.group(1), 16)
            second = line.index(";", line.index(";") + 1)
            fold[cp] = _strpbrk_targets(line[second + 1 :] + ";") or []
    return fold


def ranges_of(points: set[int]) -> list[tuple[int, int]]:
    out = []
    for cp in sorted(points):
        if out and cp == out[-1][1] + 1:
            out[-1] = (out[-1][0], cp)
        else:
            out.append((cp, cp))
    return out


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    ucd = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/external/Unicode"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(here, "..", "jassv2_spark", "functions", "_unicode_jass.py")
    )
    categories, decomp = parse_unicodedata(os.path.join(ucd, "UnicodeData.txt"))
    props = parse_proplist(os.path.join(ucd, "PropList.txt"))
    fold = parse_casefolding(os.path.join(ucd, "CaseFolding.txt"))
    with open(os.path.join(ucd, "CaseFolding.txt"), encoding="utf-8") as f:
        version = f.readline().strip("#  \n")

    alpha = {cp for cp, cat in categories.items()
             if cat in ("Lu", "Ll", "Lt", "Lm", "Lo", "Nl")}
    for name in ("Other_Alphabetic", "Other_Lowercase", "Other_Uppercase"):
        for lo, hi in props[name]:
            alpha.update(range(lo, hi + 1))
    digit = {cp for cp, cat in categories.items() if cat in ("Nd", "Nl", "No")}
    alnum = alpha | digit

    def foldcase(out: list[int], cp: int) -> None:
        targets = fold.get(cp) or None
        if targets is None:
            if cp in alnum or cp == 0x20:
                out.append(cp)
        else:
            for point in targets:
                # NOTE: `cp == 0x20` (the SOURCE codepoint, not `point`)
                # mirrors the C generator verbatim
                # (`unicode_database_to_c.cpp:562`) — almost certainly a
                # quirk there, but engine-table parity requires keeping
                # it; with UCD 9.0 data the clause is unreachable (space
                # has no C/F fold entry) so shipped tables are unaffected.
                if point in alnum or cp == 0x20:
                    out.append(point)

    def expand(out: list[int], head: int) -> None:
        rules = decomp.get(head)
        if not rules:
            foldcase(out, head)
            return
        for cp in rules:
            child = decomp.get(cp)
            if child is not None and len(child) == 1 and child[0] == head:
                foldcase(out, cp)
            else:
                expand(out, cp)

    norm_exc: dict[int, str] = {}
    max_cp = 0x110000
    for cp in range(max_cp):
        answer: list[int] = []
        expand(answer, cp)
        while answer and answer[0] == 0x20:
            answer.pop(0)
        while answer and answer[-1] == 0x20:
            answer.pop()
        text = "".join(map(chr, answer))
        default = chr(cp) if cp in alnum else ""
        if text != default:
            norm_exc[cp] = text

    flat_alpha = [x for pair in ranges_of(alpha) for x in pair]
    flat_digit = [x for pair in ranges_of(digit) for x in pair]
    flat_alnum = [x for pair in ranges_of(alnum) for x in pair]
    exc_blob = "\n".join(
        f"{cp:X}:{' '.join(f'{ord(c):X}' for c in s)}" for cp, s in sorted(norm_exc.items())
    )
    packed = base64.b85encode(zlib.compress(exc_blob.encode(), 9)).decode()

    with open(out_path, "w", encoding="utf-8") as f:
        f.write('"""GENERATED by tools/gen_unicode_tables.py — do not edit.\n\n')
        f.write(f"Pinned JASS Unicode tables from published UCD data ({version}),\n")
        f.write("the same files the reference engine's table generator consumes\n")
        f.write("(`tools/unicode_database_to_c.cpp`, `tools/CMakeLists.txt:24`).\n")
        f.write(f"alpha ranges: {len(flat_alpha)//2}; digit ranges: {len(flat_digit)//2}; ")
        f.write(f"normalisation exceptions: {len(norm_exc)}.\n\"\"\"\n\n")
        f.write("import base64 as _b64\nimport zlib as _zlib\n\n")
        f.write(f"VERSION = {version!r}\n\n")
        for name, flat in (("ALPHA_FLAT", flat_alpha), ("DIGIT_FLAT", flat_digit),
                           ("ALNUM_FLAT", flat_alnum)):
            f.write(f"{name} = (\n")
            for i in range(0, len(flat), 16):
                f.write("    " + ", ".join(map(str, flat[i : i + 16])) + ",\n")
            f.write(")\n\n")
        f.write("_EXC_PACKED = (\n")
        for i in range(0, len(packed), 96):
            f.write(f"    {packed[i:i+96]!r}\n")
        f.write(")\n\n\n")
        f.write(
            "def load_exceptions() -> dict:\n"
            '    """cp -> normalised string, for codepoints whose JASS\n'
            "    normalisation differs from the default (identity when alnum,\n"
            '    empty otherwise)."""\n'
            "    text = _zlib.decompress(_b64.b85decode(_EXC_PACKED)).decode()\n"
            "    out = {}\n"
            "    for line in text.split(\"\\n\"):\n"
            "        if not line:\n"
            "            continue\n"
            "        cp, _, rest = line.partition(\":\")\n"
            "        out[int(cp, 16)] = \"\".join(\n"
            "            chr(int(x, 16)) for x in rest.split() if x\n"
            "        )\n"
            "    return out\n"
        )
    print(f"wrote {out_path}: {len(flat_alpha)//2} alpha ranges, "
          f"{len(flat_digit)//2} digit ranges, {len(norm_exc)} exceptions, "
          f"packed {len(packed)} chars")


if __name__ == "__main__":
    main()
