"""Local re-implementation of the driver's Spark-vs-DuckDB comparison so
mismatches are caught before the driver runs.

Comparison contract (per /root/repo/__spark_entry__.py docstring): row count,
schema (column names), and order-insensitive value hash with columns sorted
by name. Floats are compared with a tight relative tolerance here; the
queries themselves round float aggregates so exact hashing also passes.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

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


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant-ish decimals to absorb last-ulp noise
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (int, str)):
        return v
    return str(v)


def normalized_rows(columns, rows):
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [columns[i] for i in order], out


def compare_query(spark, sf_dir: str, query_fn, oracle: str):
    """Return (ok, message) for one query/oracle pair."""
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    _, s_norm = normalized_rows(s_cols, s_rows)
    _, d_norm = normalized_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        if a != b:
            return False, f"value mismatch at sorted row {i}: spark={a!r} duckdb={b!r}"
    return True, f"ok ({len(s_rows)} rows)"
