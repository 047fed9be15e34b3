"""Conversion expressions: DMS→decimal degrees, fixed-offset timezones,
time-increment decode, epoch seconds.

Reference parity (all re-implemented as Catalyst expressions, no copying):
- DMS→decimal: IDT/ObsFile.py:261-274 (deg + min/60, negate for S/W).
- Fixed-offset timezone map: IDT/ObsFile.py:185-203 — the reference applies
  *fixed* hour offsets for PST/PDT/MST/MDT/AST/ADT (NOT IANA/DST-aware);
  we replicate that contract exactly (SURVEY.md §1.3.1).
- TIME INCREMENT decode: IDT/ObsFile.py:149-159 — 5-field
  "day hr min sec ms" dot-product with [86400, 3600, 60, 1, 0.001].
- Epoch seconds: IDT/OceanNcVar.py:65-72 — seconds since 1970-01-01 UTC.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared with the executor-side parser — one definition, no drift.
from cioos_siooc_data_transform_spark.functions.constants import (  # noqa: F401
    FIXED_TZ_OFFSET_HOURS,
    TIME_INCREMENT_WEIGHTS,
)


def dms_to_decimal(degrees: Column, minutes: Column, hemisphere: Column) -> Column:
    """Degrees + decimal-minutes + hemisphere → signed decimal degrees."""
    dec = degrees.cast("double") + minutes.cast("double") / F.lit(60.0)
    return F.when(F.upper(hemisphere).isin("S", "W"), -dec).otherwise(dec)


def fixed_offset_hours(zone: Column) -> Column:
    """Map a timezone abbreviation to its fixed hour offset (to-UTC)."""
    pairs = []
    for z, h in FIXED_TZ_OFFSET_HOURS.items():
        pairs.extend([F.lit(z), F.lit(h)])
    return F.create_map(*pairs)[F.upper(zone)]


def to_utc_fixed_offset(ts_local: Column, zone: Column) -> Column:
    """Convert a zone-local timestamp to UTC using the fixed-offset map.

    Unknown zones yield NULL (the reference raises; NULL + a validation
    filter is the relational equivalent — callers may raise_error on it).
    """
    off = fixed_offset_hours(zone)
    return ts_local + F.make_dt_interval(F.lit(0), off, F.lit(0), F.lit(0.0))


def time_increment_seconds(increment_str: Column) -> Column:
    """Decode 'day hr min sec ms' (whitespace-separated) into float seconds.

    Pure array expression: split → cast → zip_with(×weights) → aggregate(sum).
    """
    parts = F.transform(F.split(F.trim(increment_str), r"\s+"), lambda x: x.cast("double"))
    weights = F.array(*[F.lit(w) for w in TIME_INCREMENT_WEIGHTS])
    products = F.zip_with(parts, weights, lambda a, b: a * b)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def epoch_seconds(ts: Column) -> Column:
    """Timestamp → seconds since 1970-01-01 UTC as double (ms precision)."""
    return F.unix_millis(ts) / F.lit(1000.0)
