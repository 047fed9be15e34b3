"""Every registered query must hash-match its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_SMOKE
from tests.oracle_harness import compare_query


def _pairs():
    from cioos_siooc_data_transform_spark.plans import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    return [(name, queries[name], oracles.get(name)) for name in sorted(queries)]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, oracle):
    if oracle is None:
        df = fn(spark, SF_DIR_SMOKE)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare_query(spark, SF_DIR_SMOKE, fn, oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
