"""The round-13 slate (plans/staged_r13.py) is FULLY LIVE as of round
14: round 13 activated 40 slate names (+ the 5 staged_r12
DEFER_TO_R13 carry-overs + 5 rotated _CHECKED names = that round's
50-fresh sample); round 14's ``activate(include_deferred=True)``
brought in the GSW freezing-poly + Saunders + wave-M family
(DEFER_TO_R14), registry 630 -> 640. The one calendar-bounded window
in the slate (events_page_hinkley_drift) carries its justified
allowlist entry in tests/test_plans.py."""

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


def _deferred():
    from cioos_siooc_data_transform_spark.plans.staged_r13 import DEFER_TO_R14

    return DEFER_TO_R14


def test_staged_now_registered_except_deferred():
    """Round 14 activated the slate fully (round 13 brought the
    non-deferred 40, round 14's activate(include_deferred=True) the
    DEFER_TO_R14 GSW family): every staged name must be live in the
    registry with its oracle."""
    from cioos_siooc_data_transform_spark.plans import all_oracles, all_queries

    qs, os_, reps = _staged()
    deferred = _deferred()
    assert set(qs) == set(os_)
    assert deferred <= set(qs), "DEFER_TO_R14 names must be staged names"
    live_q, live_o = all_queries(), all_oracles()
    missing = set(qs) - set(live_q)
    assert not missing, f"staged queries not activated: {missing}"
    missing_o = set(os_) - set(live_o)
    assert not missing_o, f"staged oracles not activated: {missing_o}"
    for name, (fn, _) in reps.items():
        assert name in live_q, f"replacement {name} has no live twin"
        assert live_q[name] is fn, f"replacement {name} not applied"


def test_budget():
    """Fresh-name budget: the driver samples 50 names per round.
    Round 13 spends them as 5 staged_r12.DEFER_TO_R13 carry-overs +
    40 activated slate names + 5 rotated _CHECKED names (the second
    executed rotation)."""
    qs, _, reps = _staged()
    deferred = _deferred()
    assert len(qs) + len(reps) == 50
    assert len(deferred) == 10
    assert len(set(qs) - deferred) + len(reps) == 40


ROTATED_R13 = {
    "graph_pagerank_iterations",
    "geo_containment_join",
    "ranking_window_bodc",
    "tz_fixed_offset",
    "dedup_exact",
}


def test_rotation_names_are_fresh():
    """The 5 round-13 rotated names earned their fresh green rows
    (CORRECTNESS_r13) and must have REJOINED _CHECKED in round 14,
    and still be live registry entries."""
    from cioos_siooc_data_transform_spark.plans import all_queries

    import __spark_entry__ as entrymod

    not_back = ROTATED_R13 - entrymod._CHECKED
    assert not not_back, f"r13-rotated names did not rejoin _CHECKED: {not_back}"
    live = set(all_queries())
    assert ROTATED_R13 <= live, f"rotated names missing from registry: {ROTATED_R13 - live}"


ROTATED_R14 = {
    # round-13 optimization-moved names (moved-code-rotates-first)
    "dedup_semantic_clusters",
    "similarity_lsh_topk",
    "dedup_embedding_cosine",
    "knn_graph_degree_stats",
    "dedup_fingerprint_winnowing",
    "embedding_random_projection",
    "similarity_pq_adc_topk",
    # oldest load-bearing round-1 greens
    "dedup_minhash_lsh",
    "ios_parse_measurements",
    "filter_projection",
    "anti_join_orphans",
    # mid-round-14 moves: edge derivation moved to
    # operators/graphs.py::copurchase_pair_support
    "market_basket_pairs",
    "graph_triangle_count",
    # mid-round-14 moves: the shared _distinct_shingles reuse anchor
    # changed from a global distinct to repartition(doc_id) (same rows,
    # new plan) — all 24 checked consumers rotate with it
    "dedup_transitivity_audit", "dedup_component_source_purity",
    "dedup_minhash_hashes_sweep", "dedup_shingle_df_profile",
    "dedup_pipeline_pairs", "dedup_pipeline_pairs_xxhash",
    "dedup_ngram_jaccard", "dedup_components", "dedup_cross_snapshot",
    "dedup_minhash_estimate_accuracy", "dedup_containment_pairs",
    "dedup_lsh_precision_audit", "text_dup_quality_association",
    "dedup_sample_pair_bias", "dedup_lsh_band_tradeoff",
    "dedup_bucket_cap_sweep", "dedup_bbit_minhash",
    "dedup_bag_jaccard_pairs", "dedup_component_size_histogram",
    "dedup_layer_funnel", "dedup_sorted_neighborhood",
    "dedup_jaccard_threshold_sweep", "minhash_band_tuning_audit",
    "dedup_lsh_recall_audit",
}


def test_fresh_sample_leads_round14():
    """The driver takes the FIRST 50 names in dict order; the fresh
    (not-in-_CHECKED) prefix must be exactly the 10 activated
    DEFER_TO_R14 names + the 37 round-14 rotated names (11 from the
    committed queue + 2 copurchase moved-code rotations + 24
    shingle-anchor moved-code rotations), and must lead the dict order
    so the driver's 50-name sample covers them all (the remaining
    slots fall to _CHECKED names as regression coverage)."""
    import __spark_entry__ as entrymod

    deferred = _deferred()
    names = list(entrymod.queries())
    fresh = [n for n in names if n not in entrymod._CHECKED]
    expected = set(deferred) | ROTATED_R14
    assert set(fresh) == expected, (
        f"unexpected fresh set: +{set(fresh) - expected} -{expected - set(fresh)}"
    )
    assert len(fresh) <= 50, "fresh names must fit the driver's 50-name sample"
    assert names[: len(fresh)] == fresh, "fresh names must lead the dict order"


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


def test_activate_idempotent_after_import():
    """plans/__init__.py already ran activate(include_deferred=True)
    in round 14; further calls must be no-ops (0 newly-registered
    names) and the deferred family must be live."""
    from cioos_siooc_data_transform_spark.plans import all_queries, staged_r13

    assert staged_r13.activate() == 0
    assert staged_r13.activate(include_deferred=True) == 0
    assert _deferred() <= set(all_queries())


def test_registered_callables_are_the_staged_ones():
    """Activation must not have been shadowed by an earlier slate's
    same-name registration (the silent-no-op trap: activate() skips
    names that already exist)."""
    from cioos_siooc_data_transform_spark.plans import all_queries

    qs, _, _ = _staged()
    deferred = _deferred()
    live = all_queries()
    shadowed = {
        n for n, fn in qs.items() if n not in deferred and live.get(n) is not fn
    }
    assert not shadowed, f"staged_r13 names shadowed by earlier slates: {shadowed}"


def test_reload_does_not_mutate_registry():
    """Re-importing the module must not mutate the live registry
    (activation happens only from plans/__init__.py)."""
    import importlib

    from cioos_siooc_data_transform_spark.plans import all_queries

    before = set(all_queries())
    import cioos_siooc_data_transform_spark.plans.staged_r13 as m

    importlib.reload(m)
    assert set(all_queries()) == before
