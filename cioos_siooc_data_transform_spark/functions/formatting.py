"""Identifier formatting / extraction expressions.

Reference parity:
- mission id '{:04d}-{:03d}': IDT/write_ctd_ncfile.py:50-51.
- profile id with zero-filled event: IDT/write_ctd_ncfile.py:87
  (event.zfill(4)).
- event-number defaulting chain (header EVENT NUMBER → filename suffix →
  '0000'): IDT/write_ctd_ncfile.py:79-85, IDT/write_mctd_ncfile.py:78-83.
- basename-without-extension key: IDT/utils.py:91-92.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mission_id(year: Column, seq: Column) -> Column:
    """'%04d-%03d' mission identifier."""
    return F.format_string("%04d-%03d", year.cast("int"), seq.cast("int"))


def profile_id(year: Column, seq: Column, event: Column) -> Column:
    """mission id + '-' + event zero-filled to 4."""
    return F.concat_ws("-", mission_id(year, seq), F.lpad(event.cast("string"), 4, "0"))


def event_id_default(event: Column, filename: Column) -> Column:
    """EVENT NUMBER, else trailing digits of the filename stem, else '0000'."""
    from_name = F.regexp_extract(filename, r"-(\d+)\.[A-Za-z]+$", 1)
    return F.coalesce(
        F.nullif(event.cast("string"), F.lit("")),
        F.nullif(from_name, F.lit("")),
        F.lit("0000"),
    )


def basename_key(path: Column) -> Column:
    """Basename of a path minus its extension ('a/b/x.ctd' → 'x')."""
    return F.regexp_extract(path, r"([^/\\]+?)(?:\.[^./\\]*)?$", 1)
