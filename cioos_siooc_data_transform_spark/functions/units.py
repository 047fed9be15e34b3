"""Unit canonicalization expressions.

Reference parity: IDT/OceanNcVar.py:86-89 (dbar/dbars/decibar → decibar,
else error) and the BODC canonical-unit tables at IDT/OceanNcVar.py:160-258
(mL/L, umol/kg, S/m, mS/cm, PSS-78, PPT, deg C, umol/L).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# raw spelling (lower-cased) → canonical unit
CANONICAL_UNITS: dict[str, str] = {
    "dbar": "decibar",
    "dbars": "decibar",
    "decibar": "decibar",
    "deg c (its90)": "deg C",
    "deg c (ipts68)": "deg C",
    "deg c": "deg C",
    "psu": "PSS-78",
    "pss-78": "PSS-78",
    "ppt": "PPT",
    "ml/l": "mL/L",
    "umol/kg": "umol/kg",
    "umol/l": "umol/L",
    "s/m": "S/m",
    "ms/cm": "mS/cm",
    "m": "metres",
    "metres": "metres",
}


def canonical_unit(units: Column) -> Column:
    """Map a raw unit spelling to its canonical form; unknown → NULL."""
    pairs = []
    for raw, canon in CANONICAL_UNITS.items():
        pairs.extend([F.lit(raw), F.lit(canon)])
    return F.create_map(*pairs)[F.lower(F.trim(units))]


def canonical_pressure_unit(units: Column) -> Column:
    """decibar-family spellings → 'decibar'; anything else NULL (caller
    decides whether NULL is an error, matching the reference's raise)."""
    return F.when(
        F.lower(F.trim(units)).isin("dbar", "dbars", "decibar"), F.lit("decibar")
    ).otherwise(F.lit(None).cast("string"))
