"""The round-11 slate (plans/staged_r11.py) is LIVE as of round 11:
activated from plans/__init__.py, same cycle the round-5..10 slates
followed (parked one round to respect the driver's 50-fresh-sample
budget, then activated per the pre-audited activation note at
plans/staged_r11.py:30-50). The three calendar-bounded windows in the
slate (events_changepoint_binseg2, orders_max_drawdown,
orders_rolling_corr_12m) carry justified allowlist entries in
tests/test_plans.py."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_SMOKE


def _staged():
    from cioos_siooc_data_transform_spark.plans.staged_r11 import (
        STAGED_ORACLES,
        STAGED_QUERIES,
        STAGED_REPLACEMENTS,
    )

    return STAGED_QUERIES, STAGED_ORACLES, STAGED_REPLACEMENTS


def test_staged_now_registered():
    """Round 11 activated the slate: every staged name must be live in
    the registry with its oracle (the reverse of round 10's parked
    invariant)."""
    from cioos_siooc_data_transform_spark.plans import all_oracles, all_queries

    qs, os_, reps = _staged()
    assert set(qs) == set(os_)
    live_q, live_o = all_queries(), all_oracles()
    missing = set(qs) - set(live_q)
    assert not missing, f"staged queries not activated: {missing}"
    missing_o = set(os_) - set(live_o)
    assert not missing_o, f"staged oracles not activated: {missing_o}"
    for name, (fn, _) in reps.items():
        assert name in live_q, f"replacement {name} has no live twin"
        assert live_q[name] is fn, f"replacement {name} not applied"


def test_budget():
    """Fresh-name budget: the driver samples 50 names per round, and
    this slate activated at exactly 50 (50 new, 0 replacements)."""
    qs, _, reps = _staged()
    assert len(qs) + len(reps) == 50


def test_activate_idempotent_after_import():
    """plans/__init__.py already ran activate(); a second call must be a
    no-op (0 newly-registered names)."""
    from cioos_siooc_data_transform_spark.plans import staged_r11

    assert staged_r11.activate() == 0


def test_registered_callables_are_the_staged_ones():
    """Activation must not have been shadowed by an earlier slate's
    same-name registration (the silent-no-op trap: activate() skips
    names that already exist)."""
    from cioos_siooc_data_transform_spark.plans import all_queries

    qs, _, _ = _staged()
    live = all_queries()
    shadowed = {n for n, fn in qs.items() if live.get(n) is not fn}
    assert not shadowed, f"staged_r11 names shadowed by earlier slates: {shadowed}"


STAGED_NAMES: list[str] = [
    # wave A — dedup/cluster-quality and corpus-health audits
    "dedup_transitivity_audit",
    "text_burrows_delta",
    "embedding_intrinsic_dim_two_nn",
    "graph_rich_club_coefficient",
    # wave B — time-series / econometric statistics
    "lineitem_weighted_price_quantiles",
    "orders_max_drawdown",
    "events_extremal_index_intervals",
    "orders_fixed_effects_trend",
    "events_conversion_lag",
    "lineitem_median_polish",
    # wave C — GSW Gibbs-derivative tail (symbolic differentiation)
    "gsw_cp_t_exact",
    "gsw_pot_enthalpy_from_t_ice",
    # wave D — Gibbs symdiff battery + pipeline/queueing audits
    "gsw_chem_potential_t_derivative",
    "dedup_component_source_purity",
    "orders_littles_law_audit",
    # wave E — knob-tuning sweeps over existing machinery
    "embedding_prefix_dim_recall",
    "pack_chunk_size_sweep",
    # wave F — GSW twin tail (ice coefficients, spiciness refs, Baltic)
    "gsw_ice_expansion_coefficients",
    "gsw_spiciness1_2",
    "gsw_sa_from_sp_baltic",
    # wave G — diagnostics battery
    "lineitem_grubbs_outlier_test",
    "events_allan_variance",
    "lineitem_breusch_pagan_test",
    # wave H — structure-quality audits
    "dedup_simhash_bit_balance",
    "graph_brand_modularity",
    "partsupp_price_spread_audit",
    # wave I — inversions and distribution machinery
    "gsw_pt_from_entropy",
    "events_ks_two_sample",
    "embedding_davies_bouldin",
    # wave J — temporal joins/windows
    "events_time_to_conversion",
    "orders_rolling_corr_12m",
    # wave K — distribution-shape battery
    "lineitem_jarque_bera",
    "lineitem_lorenz_asymmetry",
    "events_gpd_return_levels",
    "docs_lang_source_mutual_info",
    # wave L — composition tail
    "gsw_entropy_from_ct",
    "customer_segment_dissimilarity_index",
    "events_user_count_nbd_fit",
    "orders_tail_model_comparison",
    # wave M — index/process-health audits
    "similarity_pq_codebook_utilization",
    "customer_acctbal_bowley_skew",
    "lineitem_return_rate_p_chart",
    "text_chars_per_token_by_lang",
    # wave N — slate close-out
    "events_attribution_window_join",
    "lineitem_chow_test",
    "orders_annual_harmonic_fit",
    "events_changepoint_binseg2",
    "dedup_minhash_hashes_sweep",
    "sketch_hll_precision_sweep",
    "text_langid_confusion_matrix",
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

