"""Keep the STAGED round-17 queries green while parked
(plans/staged_r17.py — the round-17 runway seed, started early in
round 10; activation order is staged_r11 (round 11) -> ... ->
staged_r16 (round 16) -> this module)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_SMOKE, slow_gate

# Parked slate: not in the live registry, never sampled by the
# grading driver. Full coverage re-runs behind SPARK_GRAFT_SLOW_TESTS=1
# and at activation time (round 14, VERDICT item 1: keep the default
# pytest run inside the driver's verify window).
pytestmark = slow_gate


def _staged():
    from cioos_siooc_data_transform_spark.plans.staged_r17 import (
        STAGED_ORACLES,
        STAGED_QUERIES,
    )

    return STAGED_QUERIES, STAGED_ORACLES


def test_staged_not_registered():
    from cioos_siooc_data_transform_spark.plans import all_queries

    qs, os_ = _staged()
    assert set(qs) == set(os_)
    leaked = set(qs) & set(all_queries())
    assert not leaked, f"staged r17 queries leaked into the live registry: {leaked}"


def test_budget():
    """Fresh-name budget: the driver samples 50 names per round."""
    qs, _ = _staged()
    assert len(qs) <= 50


def test_no_collision_with_earlier_slates():
    """A staged_r17 name colliding with the (not-yet-activated)
    r11-r16 slates would silently no-op at round-17 activation."""
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
    ):
        mod = importlib.import_module(
            f"cioos_siooc_data_transform_spark.plans.{mod_name}"
        )
        earlier |= set(mod.STAGED_QUERIES)
        earlier |= set(getattr(mod, "STAGED_REPLACEMENTS", {}))
    clash = set(qs) & earlier
    assert not clash, f"staged_r17 names collide with r11-r16: {clash}"


STAGED_NAMES = [
    # wave A — econometric / time-series tests
    "orders_variance_ratio",
    "orders_durbin_watson",
    "events_ar1_tstat",
    "orders_kpss_stationarity",
    "orders_ses_backtest",
    "events_self_excitation_ratio",
    "orders_bartlett_test",
    "customer_mcnemar_activity",
    "events_zero_inflation_score",
    # wave B — embedding / similarity audits
    "embedding_dim_auc_sweep",
    "similarity_coarse_ndcg_audit",
    "embedding_norm_uniformity_audit",
    "embedding_knn_consistency_curve",
    "similarity_query_difficulty",
    "embedding_hopkins_statistic",
    # wave C — graph texture
    "graph_katz_centrality_3hop",
    "graph_linkpred_rank_agreement",
    "graph_support_geometric_fit",
    # wave D — pipeline audits
    "dedup_keeper_policy_bias",
    "dedup_token_yield_by_source",
    "decontam_flag_rate_by_length",
    "sample_design_effect_by_lang",
    "mixture_reweighting_audit",
    "dedup_prefix_vs_full_agreement",
    # wave E — text
    "text_lexical_sophistication",
    "vocab_gini_concentration",
    "text_bigram_coverage",
    # wave F — top-up batch 2
    "multimodal_frame_budget_apportionment",
    "customer_nation_segment_gtest",
    "ios_profile_thermocline_depth",
    "lineitem_dose_response_monotonicity",
    "events_type_transition_lift",
    "orders_dom_seasonality_chisq",
    # wave G — top-up batch 3
    "supplier_welch_anova_nation",
    "embedding_subspace_variance_balance",
    "text_positional_entropy_profile",
    "doc_opener_share_by_source",
    "events_weekly_value_psi",
    "embedding_exact_duplicate_audit",
    "lm_addk_smoothing_sweep",
    "vocab_zipf_slope_by_band",
    # wave H — slate completion
    "orders_daily_revenue_cvar",
    "events_daily_counts_nb_fit",
    "dedup_lsh_recall_by_similarity_bin",
    "ios_mld_thermocline_consistency",
    "lm_oov_rate_by_source",
    "orders_orderkey_density_audit",
    "events_type_share_dirichlet_mom",
    "doc_quality_by_length_decile",
    "part_brand_share_stability",
]

# Seed-time detector results (plan_guards.find_unpartitioned_windows,
# sf0.001): these queries carry a bounded unpartitioned window and need
# an _ALLOWED_UNPARTITIONED_WINDOWS entry at activation. Everything
# else in the slate must stay detector-clean.
EXPECTED_BOUNDED_WINDOW_QUERIES = {
    "events_ar1_tstat": "lag window over the per-DAY rollup (calendar-bounded axis)",
    "orders_durbin_watson": "lag window over the per-DAY residual rollup (calendar-bounded axis)",
    "orders_kpss_stationarity": "running sum over the per-DAY rollup (calendar-bounded axis)",
    "orders_ses_backtest": "row_number over the per-MONTH rollup (calendar-bounded axis)",
    "orders_variance_ratio": "lag window over the per-DAY rollup (calendar-bounded axis)",
    "lineitem_dose_response_monotonicity": "lag over the 11-bracket discount alphabet (bounded)",
    "orders_daily_revenue_cvar": "rank window over the per-DAY rollup (calendar-bounded axis)",
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
    from cioos_siooc_data_transform_spark.plans.staged_r17 import (
        STAGED_QUERIES,
    )

    live = all_queries()
    for name in STAGED_QUERIES:
        assert name not in live


def test_seed_time_detector_clean(spark):
    """Every staged_r17 plan is free of non-operator-internal
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
        "staged_r17 plans with undeclared unpartitioned windows "
        f"(migrate or declare in EXPECTED_BOUNDED_WINDOW_QUERIES): {offenders}"
    )
