"""Window / sequence operators (SURVEY.md §2.5).

- occurrence_numbering (W2): nth channel mapping to the same code base gets
  a numeric suffix — reference probes code+'{:02d}' against already-assigned
  names in file order (IDT/OceanNcVar.py:95-110). Relational form:
  row_number() OVER (PARTITION BY group, base ORDER BY stable_idx).
- regular_timeseries (W1): obs_time[i] = start + i·dt
  (IDT/ObsFile.py:455-456, 507-508) via sequence + posexplode.
- record_index (W3): stable per-partition ordinal.

Scale notes: window functions shuffle on the partition key once; the keys
(file_id / user_id) are high-cardinality so partitions stay balanced. The
sequence+posexplode generation is executor-side row expansion — no driver
loop, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def occurrence_numbering(
    df: DataFrame,
    partition_cols: list[str],
    base_col: str,
    order_col: str,
    out_col: str = "code",
    width: int = 2,
) -> DataFrame:
    """Append a per-(partition, base) occurrence number to the base code."""
    w = Window.partitionBy(*partition_cols, base_col).orderBy(order_col)
    rn = F.row_number().over(w)
    return df.withColumn(out_col, F.format_string(f"%s%0{width}d", F.col(base_col), rn))


def record_index(df: DataFrame, partition_cols: list[str], order_col: str) -> DataFrame:
    """0-based stable ordinal within each partition (W3)."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    return df.withColumn("record_idx", F.row_number().over(w) - F.lit(1))


def regular_timeseries(
    starts: DataFrame, start_col: str, n_col: str, dt_seconds_col: str
) -> DataFrame:
    """Expand (start, n, dt) rows into n rows each with
    obs_ts = start + i·dt (integer-second dt).

    Executor-side: sequence(0, n-1) + posexplode; no driver loop. The
    n >= 1 guard matters: Spark's sequence(0, -1) counts DOWN to
    [0, -1], so an unguarded n=0 row would fabricate two observations,
    one of them BEFORE the series start (DuckDB's generate_series(0,-1)
    is empty — the engines genuinely differ here).

    NB: sources/ios_source.py::ios_observation_times implements the same
    W1 expansion inline with unix_micros arithmetic (its oracle needs
    the exact integer-microsecond form); a semantic fix here must be
    mirrored there.
    """
    idx = F.posexplode(
        F.when(
            F.col(n_col) >= 1,
            F.sequence(F.lit(0), (F.col(n_col) - 1).cast("int")),
        ).otherwise(F.array().cast("array<int>"))
    )
    exploded = starts.select("*", idx.alias("_pos", "record_idx"))
    obs = F.col(start_col) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0),
        (F.col("record_idx") * F.col(dt_seconds_col)).cast("double"),
    )
    return exploded.withColumn("obs_ts", obs).drop("_pos")
