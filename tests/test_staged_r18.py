"""Keep the STAGED round-18 queries green while parked
(plans/staged_r18.py — the round-18 runway seed, started in round 10;
activation order is staged_r11 (round 11) -> ... -> staged_r17
(round 17) -> this module)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_SMOKE, slow_gate

# Parked slate: not in the live registry, never sampled by the
# grading driver. Full coverage re-runs behind SPARK_GRAFT_SLOW_TESTS=1
# and at activation time (round 14, VERDICT item 1: keep the default
# pytest run inside the driver's verify window).
pytestmark = slow_gate


def _staged():
    from cioos_siooc_data_transform_spark.plans.staged_r18 import (
        STAGED_ORACLES,
        STAGED_QUERIES,
    )

    return STAGED_QUERIES, STAGED_ORACLES


def test_staged_not_registered():
    from cioos_siooc_data_transform_spark.plans import all_queries

    qs, os_ = _staged()
    assert set(qs) == set(os_)
    leaked = set(qs) & set(all_queries())
    assert not leaked, f"staged r18 queries leaked into the live registry: {leaked}"


def test_budget():
    """Fresh-name budget: the driver samples 50 names per round."""
    qs, _ = _staged()
    assert len(qs) <= 50


def test_no_collision_with_earlier_slates():
    """A staged_r18 name colliding with the (not-yet-activated)
    r11-r17 slates would silently no-op at round-18 activation."""
    import importlib

    qs, _ = _staged()
    earlier: set[str] = set()
    for mod_name in (
        "staged_r11",
        "staged_r12",
        "staged_r13",
        "staged_r14",
        "staged_r15",
        "staged_r16",
        "staged_r17",
    ):
        mod = importlib.import_module(
            f"cioos_siooc_data_transform_spark.plans.{mod_name}"
        )
        earlier |= set(mod.STAGED_QUERIES)
        earlier |= set(getattr(mod, "STAGED_REPLACEMENTS", {}))
    clash = set(qs) & earlier
    assert not clash, f"staged_r18 names collide with r11-r17: {clash}"


STAGED_NAMES = [
    # wave A — data-contract / key-space audits
    "lineitem_contract_violation_audit",
    "orders_key_date_rank_corr",
    "orders_priority_mix_by_value_decile",
    # wave B — behavioral
    "events_session_depth_curve",
    "events_first_session_conversion",
    "events_user_concentration_topk",
    # wave C — classical statistics
    "orders_gap_anderson_darling",
    "customer_acctbal_bimodality",
    "lineitem_price_index_fisher",
    # wave D — LLM-pipeline audits
    "decontam_perplexity_outliers",
    "multimodal_modality_mix",
    "dedup_candidate_budget_by_cap",
    "orders_pareto_crossing_point",
    # wave E — classical statistics (round-11 top-up to the 50 budget)
    "events_value_cramer_von_mises",
    "orders_price_dagostino_skew_test",
    "events_type_engagement_cronbach_alpha",
    "lineitem_brand_return_eb_shrinkage",
    "events_interarrival_memory_coeff",
    # wave F — business / finance series
    "orders_qoq_growth_profile",
    "orders_nation_market_beta",
    "orders_conformal_forecast_coverage",
    "orders_price_digit_preference",
    "orders_trailing_30d_revenue",
    # wave G — relational surface (ROLLUP, PIVOT, equi-depth ntile)
    "orders_revenue_grouping_sets",
    "orders_priority_year_pivot",
    "events_equi_depth_value_histogram",
    # wave H — data-quality / contract audits
    "orders_amount_reconciliation_audit",
    "lineitem_linenumber_bias_profile",
    "lineitem_order_fanout_histogram",
    "orders_same_day_multiorder_profile",
    "orders_orderkey_gap_profile",
    "part_brand_type_coverage",
    "lineitem_amount_rounding_audit",
    # wave I — LLM-pipeline operators
    "docs_dedup_survivor_length_bias",
    "source_temperature_sampling_mix",
    "docs_code_switching_share",
    "embedding_quantization_bits_sweep",
    "multimodal_payload_exact_dedup",
    "events_value_overlap_coefficient",
    "pack_waste_vs_lower_bound",
    # wave J — event-stream health
    "events_zero_activity_windows",
    "events_bot_rate_heuristic",
    "streaming_dedup_state_sweep",
    # wave K — embedding-index audits
    "similarity_metric_rank_agreement",
    "similarity_topk_diversity_audit",
    "embedding_norm_by_label_audit",
    # wave L — oceanographic QC on the real IOS parse path
    "ios_depth_bin_climatology",
    "ios_spike_test_qc",
    "ios_monotonic_depth_audit",
    "ios_channel_unit_consistency",
]

# Seed-time detector results (plan_guards.find_unpartitioned_windows,
# sf0.001): declared bounded-axis windows that need an
# _ALLOWED_UNPARTITIONED_WINDOWS entry at activation.
EXPECTED_BOUNDED_WINDOW_QUERIES: dict[str, str] = {
    "orders_qoq_growth_profile": (
        "runs over the per-QUARTER rollup (calendar-bounded axis)"
    ),
    "orders_conformal_forecast_coverage": (
        "runs over the per-DAY calibration residual table "
        "(calendar-bounded axis)"
    ),
    "events_zero_activity_windows": (
        "runs over the missing-minute subset of the calendar minute grid "
        "(calendar-bounded axis)"
    ),
}


def test_staged_name_list_is_complete():
    qs, _ = _staged()
    assert sorted(qs) == sorted(STAGED_NAMES)


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_staged_query_matches_oracle(spark, name):
    from tests.oracle_harness import compare_query

    qs, os_ = _staged()
    ok, msg = compare_query(spark, SF_DIR_SMOKE, qs[name], os_[name])
    assert ok, f"{name}: {msg}"


def test_activate_not_called_is_noop_guard():
    """Parked state: nothing from this module is live."""
    from cioos_siooc_data_transform_spark.plans import all_queries
    from cioos_siooc_data_transform_spark.plans.staged_r18 import (
        STAGED_QUERIES,
    )

    live = all_queries()
    for name in STAGED_QUERIES:
        assert name not in live


def test_seed_time_detector_clean(spark):
    """Every staged_r18 plan is free of non-operator-internal
    unpartitioned windows EXCEPT the declared bounded-axis list above."""
    from cioos_siooc_data_transform_spark.plan_guards import (
        find_unpartitioned_windows,
        is_operator_internal,
    )

    qs, _ = _staged()
    offenders: dict[str, list[str]] = {}
    for name, fn in qs.items():
        plan = (
            fn(spark, SF_DIR_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        found = [
            sig
            for (_w, sig) in find_unpartitioned_windows(plan)
            if not is_operator_internal(sig)
        ]
        if found and name not in EXPECTED_BOUNDED_WINDOW_QUERIES:
            offenders[name] = found
    assert not offenders, (
        "staged_r18 plans with undeclared unpartitioned windows "
        f"(migrate or declare in EXPECTED_BOUNDED_WINDOW_QUERIES): {offenders}"
    )
