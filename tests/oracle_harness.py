"""Local re-implementation of the driver's Spark-vs-DuckDB comparison so
mismatches are caught before the driver runs.

Byte-faithful to the driver's canonicalization (reconstructed from the
CORRECTNESS_r02.json error tracebacks + failure modes):

* both sides are materialized as pandas DataFrames (``sdf.toPandas()`` /
  ``con.execute(sql).df()``),
* columns are ordered by name, rows sorted with pandas ``sort_values``
  over ALL columns (so an array-typed cell raises ``TypeError:
  unhashable type: 'list'`` here exactly as it does in the driver),
* values are hashed by their exact Python text after ``tolist()`` —
  dtype-visible, so float64 ``3.0`` != int64 ``3`` (the DuckDB
  HUGEINT→float64 failure) and ``-0.0`` != ``0.0`` (the DuckDB
  ``round()`` signed-zero failure). No rounding, no tolerance.

The round-2 harness rounded floats to 9 dp, tuple-ized lists and treated
``-0.0 == 0.0`` — all three tolerances hid real driver failures. Do not
re-add them.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted
    by every column (pandas sort_values — raises on unhashable cells,
    matching the driver's behavior on array columns)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _cell_text(v) -> str:
    # tolist() already converted numpy scalars to native Python types, so
    # repr is the exact value text: float64 3.0 -> '3.0', int 3 -> '3',
    # -0.0 -> '-0.0', NaN -> 'nan'.
    return repr(v)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for col in df.columns:
        h.update(str(col).encode())
        h.update(b"\x00")
        for v in df[col].tolist():
            h.update(_cell_text(v).encode())
            h.update(b"\x01")
    return h.hexdigest()


def _first_diff(s: pd.DataFrame, d: pd.DataFrame) -> str:
    for col in s.columns:
        sv = s[col].tolist()
        dv = d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if _cell_text(a) != _cell_text(b):
                return (
                    f"first diff in column {col!r} at sorted row {i}: "
                    f"spark={_cell_text(a)} duckdb={_cell_text(b)}"
                )
    return "hash differs but no cell-text diff found (column order?)"


#: DuckDB result-column types that have burned a driver round (or would):
#: HUGEINT → pandas float64 while Spark emits int64 (r02 sessionize_gap);
#: LIST/STRUCT/MAP → unhashable cells crash the canonicalizer (r02
#: embedding queries); DATE → collects as pandas Timestamp while Spark
#: DateType collects as datetime.date (repr mismatch); TIME similarly;
#: DECIMAL → repr('Decimal(..)') never matches a Spark double.
#: (TIMESTAMP is fine — both engines collect it as pandas Timestamp —
#: so the time ban is exact-match TIME/TIMETZ, not a prefix.)
_BANNED_TYPE_PREFIXES = ("HUGEINT", "UHUGEINT", "DATE", "DECIMAL")
_BANNED_TYPE_EXACT = ("TIME", "TIMETZ")
_BANNED_TYPE_MARKERS = ("[]", "STRUCT", "MAP(")


def lint_oracle_types(con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Static driver-canon lint: prepare (not execute) the oracle and flag
    any result-column type from a class that has previously produced a
    local-green/driver-red divergence. Returns 'col: TYPE' findings."""
    rel = con.sql(oracle)
    findings = []
    for col, typ in zip(rel.columns, (str(t) for t in rel.types)):
        if (
            typ.startswith(_BANNED_TYPE_PREFIXES)
            or typ in _BANNED_TYPE_EXACT
            or any(m in typ for m in _BANNED_TYPE_MARKERS)
        ):
            findings.append(f"{col}: {typ}")
    return findings


def compare_query(spark, sf_dir: str, query_fn, oracle: str):
    """Return (ok, message) for one query/oracle pair, judged exactly as
    the driver judges it: row count, column-name set, value hash of the
    canonical frame."""
    sdf = query_fn(spark, sf_dir)
    s_pd = sdf.toPandas()

    con = duckdb_connection(sf_dir)
    try:
        d_pd = con.execute(oracle).df()
    finally:
        con.close()

    if sorted(s_pd.columns) != sorted(d_pd.columns):
        return (
            False,
            f"column mismatch: spark={sorted(s_pd.columns)} "
            f"duckdb={sorted(d_pd.columns)}",
        )
    if len(s_pd) != len(d_pd):
        return False, f"row-count mismatch: spark={len(s_pd)} duckdb={len(d_pd)}"

    try:
        s_c = canon(s_pd)
        d_c = canon(d_pd)
    except TypeError as exc:
        # The driver's canonicalizer would raise the same error and record
        # the query as err (unhashable array cells, mixed types, ...).
        return False, f"canonicalizer error (driver would err identically): {exc!r}"

    if value_hash(s_c) != value_hash(d_c):
        return False, f"value-hash mismatch: {_first_diff(s_c, d_c)}"
    return True, f"ok ({len(s_pd)} rows)"
