"""Keep the STAGED round-11 queries green while parked
(plans/staged_r11.py — the round-11 runway seed; activation order is
staged_r8 (round 8) -> staged_r9 (round 9) -> staged_r10 (round 10)
-> this module)."""

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
    """A staged_r11 name colliding with the (not-yet-activated)
    r8/r9/r10 slates would silently no-op at round-11 activation —
    catch it at build time instead (the lineitem_benford_audit
    lesson)."""
    from cioos_siooc_data_transform_spark.plans import (
        staged_r8,
        staged_r9,
        staged_r10,
    )

    qs, _, reps = _staged()
    earlier = (
        set(staged_r8.STAGED_QUERIES)
        | set(staged_r9.STAGED_QUERIES)
        | set(staged_r9.STAGED_REPLACEMENTS)
        | set(staged_r10.STAGED_QUERIES)
        | set(staged_r10.STAGED_REPLACEMENTS)
    )
    clash = (set(qs) | set(reps)) & earlier
    assert not clash, f"staged_r11 names collide with r8/r9/r10: {clash}"


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


def test_activate_not_called_is_noop_guard():
    """Importing the module must not mutate the live registry."""
    import importlib

    from cioos_siooc_data_transform_spark.plans import all_queries

    before = set(all_queries())
    import cioos_siooc_data_transform_spark.plans.staged_r11 as m

    importlib.reload(m)
    assert set(all_queries()) == before
