"""Keep the STAGED round-13 queries green while parked
(plans/staged_r13.py — the round-13 runway seed; activation order is
staged_r8 (round 8) -> ... -> staged_r11 (round 11) -> this
module)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_SMOKE


def _staged():
    from cioos_siooc_data_transform_spark.plans.staged_r13 import (
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
    """A staged_r13 name colliding with the (not-yet-activated)
    r8..r12 slates would silently no-op at round-13 activation —
    catch it at build time instead (the lineitem_benford_audit
    lesson)."""
    from cioos_siooc_data_transform_spark.plans import (
        staged_r8,
        staged_r9,
        staged_r10,
        staged_r11,
        staged_r12,
    )

    qs, _, reps = _staged()
    earlier = set()
    for mod in (staged_r8, staged_r9, staged_r10, staged_r11, staged_r12):
        earlier |= set(mod.STAGED_QUERIES)
        earlier |= set(getattr(mod, "STAGED_REPLACEMENTS", {}))
    clash = (set(qs) | set(reps)) & earlier
    assert not clash, f"staged_r13 names collide with r8..r12: {clash}"


STAGED_NAMES: list[str] = [
    # wave A — inversion, inequality, seasonal trend, kNN mutuality
    "gsw_ct_from_rho",
    "customer_spend_atkinson_index",
    "orders_seasonal_mann_kendall",
    "embedding_knn_mutuality",
    # wave B — error isolation, allocation, margin/lead-time audits
    "ios_malformed_file_audit",
    "sample_neyman_allocation",
    "part_margin_audit",
    "supplier_leadtime_consistency",
    # wave C — sequential drift, blocked ranks, precision, language mix
    "events_page_hinkley_drift",
    "events_friedman_dow_test",
    "dedup_lsh_precision_audit",
    "text_multilingual_doc_audit",
    # wave D — model adequacy and definition sweeps
    "orders_backtest_residual_ljungbox",
    "text_langid_stopword_budget",
    "customer_churn_window_sweep",
    "dedup_shingle_size_sweep",
    # wave E — clumpiness, label AUC, semantic tau sweep, truncation
    "customer_purchase_clumpiness",
    "embedding_cosine_label_auc",
    "dedup_semantic_tau_sweep",
    "pack_truncation_loss_audit",
    # wave F — Weibull shape, dup-quality, header completeness,
    # ice enthalpy at freezing
    "orders_gap_weibull_shape",
    "text_dup_quality_association",
    "ios_header_completeness_profile",
    "gsw_pot_enthalpy_ice_freezing",
    # wave G — rank stability, seasonality growth, char affinity
    "nation_rank_stability_tau",
    "orders_seasonal_amplitude_trend",
    "text_char_trigram_lang_affinity",
    # wave H — drift index, percolation robustness, sampling pair bias
    "orders_value_psi_drift",
    "graph_hub_removal_robustness",
    "dedup_sample_pair_bias",
    # wave I — exact-Gibbs (IAPWS-08) *_t_exact surfaces via symdiff
    "gsw_specvol_rho_t_exact",
    "gsw_sound_speed_t_exact",
    "gsw_kappa_t_exact",
    "gsw_alpha_beta_t_exact",
    "gsw_enthalpy_t_exact",
    "gsw_chem_potential_dilution_t_exact",
    "gsw_pot_rho_t_exact",
    # wave J — PSS-78 conductivity/salinity battery
    "gsw_sp_from_c",
    "gsw_c_from_sp",
    "gsw_hill_ratio_at_sp2",
    "gsw_salinity_scale_roundtrips",
    # wave K — freezing polynomial family
    "gsw_ct_freezing_poly",
    "gsw_t_freezing_poly",
    "gsw_sa_freezing_from_ct_poly",
    "gsw_ct_freezing_derivs_poly",
    # wave L — height/pressure conversions
    "gsw_z_from_p",
    "gsw_p_from_z",
    # wave M — forward conversions, ice-melt equilibrium, lapse from CT
    "gsw_ct_entropy_from_pt",
    "gsw_melting_ice_equilibrium_ratio",
    "gsw_adiabatic_lapse_rate_from_ct",
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
    import cioos_siooc_data_transform_spark.plans.staged_r13 as m

    importlib.reload(m)
    assert set(all_queries()) == before
