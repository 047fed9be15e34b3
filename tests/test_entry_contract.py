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


def test_fresh_names_lead_the_sampling_order():
    """Never-driver-checked queries must sample before already-green
    ones — the driver takes the first 50, so a fresh query buried past
    position 49 would never earn a CORRECTNESS row."""
    import __spark_entry__ as e

    qs = list(e.queries())
    first_seen_checked = next(
        (i for i, n in enumerate(qs) if n in e._CHECKED), len(qs)
    )
    for i, name in enumerate(qs[:first_seen_checked]):
        assert name not in e._CHECKED
    assert all(n in e._CHECKED for n in qs[first_seen_checked:]), (
        "a fresh (never-checked) query is ordered after already-checked ones"
    )


def test_checked_set_names_are_registered():
    import __spark_entry__ as e
    from cioos_siooc_data_transform_spark.plans import all_queries

    missing = e._CHECKED - set(all_queries())
    assert not missing, f"_CHECKED contains unregistered names: {sorted(missing)}"


def test_every_query_is_oracle_paired():
    from cioos_siooc_data_transform_spark.plans import all_oracles, all_queries

    unpaired = set(all_queries()) - set(all_oracles())
    assert not unpaired, f"rows-only queries (no oracle): {sorted(unpaired)}"


def test_fresh_budget_within_driver_sample():
    """The driver samples exactly 50 queries per round. If more than 50
    registered names lack a _CHECKED entry, the overflow would NEVER be
    driver-verified (the round-3 defect class). Register new queries
    only when (new + still-unchecked) <= 50, and promote driver-green
    names into _CHECKED at the start of each round."""
    import __spark_entry__ as e

    fresh = [n for n in e.queries() if n not in e._CHECKED]
    assert len(fresh) <= 50, (
        f"{len(fresh)} fresh queries exceed the driver's 50-query sample; "
        f"overflow would never earn a CORRECTNESS row: {fresh[50:]}"
    )
