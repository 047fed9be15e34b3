"""Spark-free reference-parity constants shared by the SQL-expression
path (functions/convert.py) and the executor-side Python parser
(sources/ios_format.py) — one definition so the two paths cannot drift.

Hours to ADD to a zone-local timestamp to obtain UTC (reference's map,
IDT/ObsFile.py:185-203). Deliberately fixed offsets, not IANA zones —
the reference applies constant offsets for the NA zones regardless of
DST. SURVEY.md §1.3.1.
"""

from __future__ import annotations

FIXED_TZ_OFFSET_HOURS: dict[str, int] = {
    "UTC": 0,
    "GMT": 0,
    "PST": 8,
    "PDT": 7,
    "MST": 7,
    "MDT": 6,
    "AST": 4,
    "ADT": 3,
}

# Weight vector for the 5-field TIME INCREMENT (day hr min sec ms),
# IDT/ObsFile.py TIME INCREMENT decode.
TIME_INCREMENT_WEIGHTS: tuple[float, ...] = (86400.0, 3600.0, 60.0, 1.0, 0.001)
