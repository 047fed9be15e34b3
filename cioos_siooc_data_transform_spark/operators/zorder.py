"""Z-order (Morton) multi-dimensional clustering for data layout.

The 100 TB problem this solves: parquet/ORC data skipping works off
per-file (and per-row-group) min/max statistics, but sorting by ONE
column destroys locality in every other column. Interleaving the bits
of two (or more) dimension keys into a single Morton code and
range-partitioning + sorting the write by that code gives every file a
tight bounding BOX in both dimensions, so a conjunctive range predicate
(x BETWEEN .. AND y BETWEEN ..) prunes files/row-groups on both axes —
the technique behind Delta/Iceberg OPTIMIZE ZORDER, built here from
plain Spark expressions (bit ops are whole-stage codegen; the write is
one repartitionByRange shuffle).

The bit-interleave is generated symmetrically for Spark Columns and for
ANSI/DuckDB SQL text so the key itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_expr(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Clamp + scale a numeric column to an integer in [0, 2^bits)."""
    n = 1 << bits
    scaled = (col - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n))
    b = F.floor(scaled).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(n - 1).cast("long"), b))


def binned_sql(col: str, lo: float, hi: float, bits: int = 16) -> str:
    """The identical binning as SQL text (DuckDB oracle side)."""
    n = 1 << bits
    return (
        f"greatest(CAST(0 AS BIGINT), least(CAST({n - 1} AS BIGINT), "
        f"CAST(floor(({col} - {lo!r}) / {hi - lo!r} * {float(n)!r}) AS BIGINT)))"
    )


def interleave_expr(xb: Column, yb: Column, bits: int = 16) -> Column:
    """Morton code: bit i of x lands at position 2i, of y at 2i+1.

    A chain of 2*bits shift/and/or terms — all integer codegen, no
    Python. For d dims generalize to stride d (cost d*bits terms)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def interleave_sql(xb: str, yb: str, bits: int = 16) -> str:
    """The identical interleave as SQL text (| and << and >> are ANSI-ish
    and DuckDB-native)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: Column,
    num_files: int = 8,
) -> None:
    """Range-partition by the Morton code and sort within partitions, so
    each output file covers a contiguous z-range = a tight 2-D box.
    One shuffle; Spark samples range bounds, so skewed z-densities still
    split evenly. At cluster scale num_files tracks target file size
    (e.g. total/1 GB), not parallelism."""
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
