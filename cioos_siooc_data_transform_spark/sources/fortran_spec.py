"""Minimal Fortran FORMAT record reader (SURVEY.md §2.10 U1).

The reference delegates to the `fortranformat` package
(IDT/ObsFile.py:242-245); that package is not available here, so this is a
from-scratch reader covering the spec subset that appears in IOS files:
edit descriptors E/F/I/G/D/A with optional repeat counts (e.g.
"(E15.7,E15.7)", "(5E15.7)", "(F8.1,2F9.4)") and X skips ("3X").

Semantics matched to the reference's usage (`[float(r) for r in
ffline.read(line)]`): each descriptor consumes `w` characters; blank
fields raise (which in the reference aborts the FORMAT strategy and falls
back to fixed-width parsing).
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"\s*(?:(\d*)\s*([EFIGDA])\s*(\d+)(?:\.(\d+))?|(\d*)\s*X)\s*$", re.I)


class FortranFormatError(ValueError):
    pass


def parse_format(formatline: str) -> list[tuple[str, int]]:
    """'(E15.7,E15.7)' → [('E', 15), ('E', 15)]; X skips → ('X', n)."""
    s = formatline.strip()
    if s.startswith("(") and s.endswith(")"):
        s = s[1:-1]
    fields: list[tuple[str, int]] = []
    if not s.strip():
        raise FortranFormatError(f"empty format: {formatline!r}")
    for tok in s.split(","):
        m = _TOKEN.match(tok)
        if not m:
            raise FortranFormatError(f"unsupported descriptor {tok!r} in {formatline!r}")
        if m.group(2):  # E/F/I/G/D/A descriptor
            rep = int(m.group(1)) if m.group(1) else 1
            fields.extend([(m.group(2).upper(), int(m.group(3)))] * rep)
        else:  # X skip
            rep = int(m.group(5)) if m.group(5) else 1
            fields.append(("X", rep))
    return fields


def read_record(fields: list[tuple[str, int]], line: str) -> list[float]:
    """Slice one data line per the parsed format; numeric fields → float."""
    out: list[float] = []
    pos = 0
    for kind, width in fields:
        raw = line[pos : pos + width]
        pos += width
        if kind == "X":
            continue
        token = raw.strip()
        if kind == "A":
            out.append(token)  # type: ignore[arg-type]
            continue
        if not token:
            raise FortranFormatError(f"blank numeric field at {pos - width}:{pos}")
        # Fortran allows D exponents (1.5D+02) — normalize to E.
        out.append(float(token.replace("D", "E").replace("d", "e")))
    return out
