"""Consistency of the __spark_entry__ driver contract: the priority
ordering must be a permutation of the registry, the fixed-first list must
name real queries, and every query must keep an oracle (no silent
rows-only regressions)."""

from __future__ import annotations


def test_priority_order_is_permutation_of_registry():
    import __spark_entry__ as e
    from cioos_siooc_data_transform_spark.plans import all_oracles, all_queries

    qs = e.queries()
    assert list(qs) != sorted(qs), "priority ordering collapsed to plain sort?"
    assert set(qs) == set(all_queries())
    assert set(e.oracle_sql()) == set(all_oracles())


def test_fixed_first_names_exist_and_lead():
    import __spark_entry__ as e

    qs = list(e.queries())
    for i, name in enumerate(e._FIXED_FIRST):
        assert qs[i] == name, f"fixed-first query {name} not at position {i}"


def test_checked_set_names_are_registered():
    import __spark_entry__ as e
    from cioos_siooc_data_transform_spark.plans import all_queries

    missing = e._CHECKED - set(all_queries())
    assert not missing, f"_CHECKED contains unregistered names: {sorted(missing)}"


def test_every_query_is_oracle_paired():
    from cioos_siooc_data_transform_spark.plans import all_oracles, all_queries

    unpaired = set(all_queries()) - set(all_oracles())
    assert not unpaired, f"rows-only queries (no oracle): {sorted(unpaired)}"
