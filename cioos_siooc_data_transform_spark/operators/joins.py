"""Join operators (SURVEY.md §2.3).

- containment_code_join: the J1 pattern (point/value containment against a
  small broadcast dimension, ALL matches concatenated deterministically;
  no match → 'None'). Reference: IDT/ObsFile.py:392-399 + IDT/utils.py:70-81.
  The reference concatenates in dict-insertion order; we sort matches for
  determinism (SURVEY.md §1.3.4 decision, documented divergence).
- reconcile_anti / reconcile_semi: the J2 file-reconciliation pattern.
  Reference: IDT/utils.py:84-97 ('not-in' → LEFT ANTI, 'in' → LEFT SEMI).
- lookup_join: J3 broadcast code-table lookup (BODC mapping,
  IDT/OceanNcVar.py:160-258).

Scale notes (100 TB): the dimension side of J1/J3 is tiny (dozens-to-
thousands of rows) → always broadcast; the fact side never shuffles for the
join itself. The groupBy in containment_code_join aggregates on the fact
key — partial aggregation (map-side combine) keeps the shuffle to one row
per fact key. reconcile_* on two large sides becomes a shuffled hash join;
key-salting is unnecessary because keys are near-unique (file ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def containment_code_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_name: str,
    condition: Column,
    out_col: str = "geo_code",
) -> DataFrame:
    """For each fact row, concatenate the names of ALL dimension rows whose
    ``condition`` holds, '-'-joined in sorted order; no match → 'None'.

    One broadcast nested-loop join + one hash aggregation; never a shuffle
    of the dimension.

    Precondition: ``fact_key`` must uniquely identify fact rows — the
    result is one row per key with the matched codes concatenated, and
    non-key fact columns are NOT carried (join the result back on the
    key to re-attach them). Duplicate keys would silently merge their
    matches into one concatenated string.
    """
    joined = facts.join(F.broadcast(dim), on=condition, how="left")
    agg = joined.groupBy(fact_key).agg(
        F.concat_ws("-", F.sort_array(F.collect_list(F.col(dim_name)))).alias(out_col)
    )
    return agg.withColumn(
        out_col, F.when(F.col(out_col) == "", F.lit("None")).otherwise(F.col(out_col))
    )


def reconcile_anti(existing: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Keys in ``existing`` with no counterpart in ``source`` (orphans to
    delete — reference 'not-in')."""
    return existing.join(source, on=key, how="left_anti")


def reconcile_semi(existing: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Keys in ``existing`` that DO have a counterpart in ``source``."""
    return existing.join(source, on=key, how="left_semi")


def lookup_join(
    facts: DataFrame, code_table: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Broadcast equi-join against a small literal code table."""
    return facts.join(F.broadcast(code_table), on=on, how=how)
