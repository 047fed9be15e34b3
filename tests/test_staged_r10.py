"""The round-10 slate (plans/staged_r10.py) is LIVE as of round 10:
activated from plans/__init__.py, same cycle the round-5..9 slates
followed (parked one round to respect the driver's 50-fresh-sample
budget, then activated). Pre-activation migration: graph_degree_gini
moved onto ranked_cumsum_two_pass (the round-9 verdict's one parked
key-scaled window); round-10 top-up doc_context_overflow_rate brings
the slate to the exact 50-fresh budget."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_SMOKE


def _staged():
    from cioos_siooc_data_transform_spark.plans.staged_r10 import (
        STAGED_ORACLES,
        STAGED_QUERIES,
        STAGED_REPLACEMENTS,
    )

    return STAGED_QUERIES, STAGED_ORACLES, STAGED_REPLACEMENTS


def test_staged_now_registered():
    """Round 10 activated the slate: every staged name must be live in
    the registry with its oracle (the reverse of round 9's parked
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
    this slate activated at exactly 50 (49 round-9-parked + the
    doc_context_overflow_rate top-up)."""
    qs, _, reps = _staged()
    assert len(qs) + len(reps) == 50


def test_activate_idempotent_after_import():
    """plans/__init__.py already ran activate(); a second call must be a
    no-op (0 newly-registered names)."""
    from cioos_siooc_data_transform_spark.plans import staged_r10

    assert staged_r10.activate() == 0


def test_registered_callables_are_the_staged_ones():
    """Activation must not have been shadowed by an earlier slate's
    same-name registration (the silent-no-op trap: activate() skips
    names that already exist)."""
    from cioos_siooc_data_transform_spark.plans import all_queries

    qs, _, _ = _staged()
    live = all_queries()
    shadowed = {n for n, fn in qs.items() if live.get(n) is not fn}
    assert not shadowed, f"staged_r10 names shadowed by earlier slates: {shadowed}"


STAGED_NAMES = [
    # wave A — GSW closed-form tail
    "gsw_adiabatic_lapse_rate_ice",
    "gsw_specvol_ice",
    "gsw_salinity_scale_conversions",
    "gsw_o2sol_sp_pt",
    # wave B — Newton/fixed-slope inversions
    "gsw_pt0_from_t_ice",
    "gsw_pressure_freezing_ct",
    "gsw_sa_freezing_from_ct",
    # wave C — classical statistical tests from integer-exact sums
    "lineitem_welch_ttest",
    "lineitem_cramers_v",
    "lineitem_spearman_discount_qty",
    "events_runs_test",
    "events_ljung_box",
    "events_dispersion_index",
    # wave D — business/pipeline audits
    "orders_association_lift",
    "customer_rfm_segments",
    "orders_kaplan_meier",
    "events_ewma_daily",
    "orders_bollinger_bands",
    "tpch_referential_integrity_profile",
    # wave E — text retrieval/readability/vocabulary
    "text_bm25_topk",
    "text_readability_flesch",
    "source_vocab_jaccard",
    # wave F — graph analytics on the co-purchase edge set
    "graph_kcore3_peeling",
    "graph_adamic_adar_linkpred",
    "graph_degree_gini",
    # wave G — embedding-corpus health audits
    "embedding_anisotropy_audit",
    "embedding_label_margin",
    "embedding_pca_power_iteration",
    # wave H — dedup-adjacent pipeline machinery
    "dedup_sorted_neighborhood",
    "dedup_blocking_quality_audit",
    "sample_hash_uniformity_chisq",
    "dedup_jaccard_threshold_sweep",
    # wave I — events extreme-value / temporal texture
    "events_pot_gpd_fit",
    "events_interarrival_burstiness",
    # wave J — GSW 75-term analytic-derivative tail + ITS-90 scales
    "gsw_specvol_first_derivatives",
    "gsw_rho_second_derivatives",
    "gsw_temperature_scale_conversions",
    # wave K — robust/econometric statistics
    "customer_acctbal_levene_test",
    "events_daily_mad_anomalies",
    "orders_seasonal_naive_backtest",
    "orders_diff_in_diff_holiday",
    # wave L — probabilistic-structure audits
    "sketch_bloom_fpr_audit",
    "sample_stratified_split_audit",
    # wave M — corpus-distribution text analytics
    "text_source_unigram_jsd",
    "text_sentence_length_profile",
    # wave N — embedding-space geometry audits
    "embedding_knn_hubness",
    "embedding_triplet_margin_violations",
    # wave O — two-pass-rank operator reuse
    "customer_segment_migration",
    "events_kruskal_wallis_value",
    # wave P — round-10 top-up: context-length budget audit
    "doc_context_overflow_rate",
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


