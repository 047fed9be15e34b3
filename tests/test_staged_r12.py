"""Keep the STAGED round-12 queries green while parked
(plans/staged_r12.py — the round-12 runway seed; activation order is
staged_r8 (round 8) -> ... -> staged_r11 (round 11) -> this
module)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_SMOKE


def _staged():
    from cioos_siooc_data_transform_spark.plans.staged_r12 import (
        STAGED_ORACLES,
        STAGED_QUERIES,
        STAGED_REPLACEMENTS,
    )

    return STAGED_QUERIES, STAGED_ORACLES, STAGED_REPLACEMENTS


def test_staged_not_registered():
    from cioos_siooc_data_transform_spark.plans import all_queries

    qs, os_, reps = _staged()
    assert set(qs) == set(os_)
    leaked = set(qs) & set(all_queries())
    assert not leaked, f"staged r11 queries leaked into the live registry: {leaked}"
    live = all_queries()
    for name, (fn, _) in reps.items():
        assert name in live, f"replacement {name} has no live twin"
        assert live[name] is not fn, f"replacement {name} activated early"


def test_budget():
    """Fresh-name budget: the driver samples 50 names per round."""
    qs, _, reps = _staged()
    assert len(qs) + len(reps) <= 50


def test_no_collision_with_earlier_slates():
    """A staged_r12 name colliding with the (not-yet-activated)
    r8..r11 slates would silently no-op at round-12 activation —
    catch it at build time instead (the lineitem_benford_audit
    lesson)."""
    from cioos_siooc_data_transform_spark.plans import (
        staged_r8,
        staged_r9,
        staged_r10,
        staged_r11,
    )

    qs, _, reps = _staged()
    earlier = set()
    for mod in (staged_r8, staged_r9, staged_r10, staged_r11):
        earlier |= set(mod.STAGED_QUERIES)
        earlier |= set(getattr(mod, "STAGED_REPLACEMENTS", {}))
    clash = (set(qs) | set(reps)) & earlier
    assert not clash, f"staged_r12 names collide with r8..r11: {clash}"


STAGED_NAMES: list[str] = [
    # wave A — GSW CT-derivative tranche (symdiff)
    "gsw_ct_first_derivatives",
    "gsw_ct_second_derivatives",
    "gsw_pt_first_derivatives",
    "gsw_entropy_first_derivatives",
    # wave B — robust trend / spectrum / variance components
    "orders_theil_sen_trend",
    "events_spectral_flatness",
    "customer_spend_intraclass_corr",
    # wave C — sampling/index composition audits
    "sample_pps_horvitz_thompson",
    "multimodal_frame_hash_dedup",
    "dedup_lsh_band_tradeoff",
    # wave D — GSW completions + paired rank test + acquisition mix
    "gsw_specvol_second_derivatives",
    "gsw_t_from_pt0_ice",
    "orders_wilcoxon_signed_rank",
    "orders_new_customer_share_trend",
    # wave E — chain-rule closure + null models + knob sweeps
    "gsw_entropy_second_derivatives",
    "decontam_ngram_size_sweep",
    "graph_triangle_config_null",
    "embedding_centroid_classifier_confusion",
    # wave F — enthalpy curvature, data profiling, regional decomposition
    "gsw_enthalpy_second_derivatives",
    "tpch_fd_violation_audit",
    "nation_revenue_shift_share",
    # wave G — reference-domain depth
    "ios_channel_unit_profile",
    # wave H — information structure, windows, budgets, demand patterns
    "text_ngram_entropy_rate_curve",
    "text_sttr_by_source",
    "multimodal_fps_sweep",
    "part_demand_sbc_classification",
    # wave I — enthalpy-coordinate derivatives, winnowing sweep, rank
    # fidelity, attribute assortativity
    "gsw_rho_first_derivatives_wrt_enthalpy",
    "dedup_winnowing_window_sweep",
    "graph_price_assortativity",
    # wave J — rank fidelity, truncated counts, calibration, QTE
    "similarity_adc_rank_correlation",
    "customer_order_count_ztp_fit",
    "text_langid_calibration_curve",
    "orders_quantile_treatment_effect",
    # wave K — distribution distance, index balance, cell audits
    "customer_energy_distance_segments",
    "similarity_ivf_cell_balance",
    "part_price_ending_digits",
    "events_type_hour_stdres_outliers",
    # wave L — process tests and coverage/threshold curves
    "orders_gap_exponentiality_ks",
    "text_oov_vocab_curve",
    "graph_support_threshold_sweep",
    "supplier_type_concentration_cr4",
    # wave M — freezing inversion in t, guard cost curve, retention,
    # stochastic dominance
    "gsw_sa_freezing_from_t",
    "dedup_bucket_cap_sweep",
    "events_dayk_retention_curve",
    "orders_priority_stochastic_dominance",
    # wave N — slate close-out part 2
    "sketch_cm_width_sweep",
    "part_unit_price_dispersion",
    "partsupp_stock_cover_audit",
    "customer_discounted_ltv",
    "similarity_srp_bit_independence",
]


REPLACEMENT_NAMES: list[str] = []


def test_staged_name_list_is_complete():
    qs, _, reps = _staged()
    assert sorted(qs) == sorted(STAGED_NAMES)
    assert sorted(reps) == sorted(REPLACEMENT_NAMES)


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_staged_query_matches_oracle(spark, name):
    from tests.oracle_harness import compare_query

    qs, os_, _ = _staged()
    ok, msg = compare_query(spark, SF_DIR_SMOKE, qs[name], os_[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", REPLACEMENT_NAMES)
def test_replacement_matches_oracle(spark, name):
    from tests.oracle_harness import compare_query

    _, _, reps = _staged()
    fn, oracle = reps[name]
    ok, msg = compare_query(spark, SF_DIR_SMOKE, fn, oracle)
    assert ok, f"{name}: {msg}"


def test_activate_not_called_is_noop_guard():
    """Importing the module must not mutate the live registry."""
    import importlib

    from cioos_siooc_data_transform_spark.plans import all_queries

    before = set(all_queries())
    import cioos_siooc_data_transform_spark.plans.staged_r12 as m

    importlib.reload(m)
    assert set(all_queries()) == before
