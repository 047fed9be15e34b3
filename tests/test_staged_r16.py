"""Keep the STAGED round-16 queries green while parked
(plans/staged_r16.py — the round-16 runway seed; activation order is
staged_r10 (round 10) -> ... -> staged_r15 (round 15) -> this
module)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_SMOKE, slow_gate

# Parked slate: not in the live registry, never sampled by the
# grading driver. Full coverage re-runs behind SPARK_GRAFT_SLOW_TESTS=1
# and at activation time (round 14, VERDICT item 1: keep the default
# pytest run inside the driver's verify window).
pytestmark = slow_gate


def _staged():
    from cioos_siooc_data_transform_spark.plans.staged_r16 import (
        STAGED_ORACLES,
        STAGED_QUERIES,
    )

    return STAGED_QUERIES, STAGED_ORACLES


def test_staged_not_registered():
    from cioos_siooc_data_transform_spark.plans import all_queries

    qs, os_ = _staged()
    assert set(qs) == set(os_)
    leaked = set(qs) & set(all_queries())
    assert not leaked, f"staged r16 queries leaked into the live registry: {leaked}"


def test_budget():
    """Fresh-name budget: the driver samples 50 names per round."""
    qs, _ = _staged()
    assert len(qs) <= 50


def test_no_collision_with_earlier_slates():
    """A staged_r16 name colliding with the (not-yet-activated)
    r11-r15 slates would silently no-op at round-16 activation — catch
    it at build time instead (the lineitem_benford_audit lesson)."""
    import importlib

    qs, _ = _staged()
    earlier: set[str] = set()
    for mod_name in (
        "staged_r11",
        "staged_r12",
        "staged_r13",
        "staged_r14",
        "staged_r15",
    ):
        mod = importlib.import_module(
            f"cioos_siooc_data_transform_spark.plans.{mod_name}"
        )
        earlier |= set(mod.STAGED_QUERIES)
        earlier |= set(getattr(mod, "STAGED_REPLACEMENTS", {}))
    clash = set(qs) & earlier
    assert not clash, f"staged_r16 names collide with r11-r15: {clash}"


STAGED_NAMES = [
    # wave A — inequality decomposition + classical tests
    "lineitem_theil_decomposition",
    "lineitem_tax_anova",
    "customer_acctbal_epps_singleton",
    "customer_acctbal_brunner_munzel",
    "part_brand_kendall_w",
    "orders_tail_pareto_vs_exp_llr",
    "tpch_table_ratio_profile",
    # wave B — events time-series texture
    "events_daily_counts_hurst_rs",
    "events_parkinson_volatility",
    "events_markov2_entropy_rate",
    "events_hourweek_profile_drift",
    "events_fano_factor_scale_curve",
    "events_type_burst_overlap",
    "events_activity_decay_halflife",
    "events_rayleigh_by_type",
    "events_permutation_entropy_daily",
    # wave C — co-purchase graph texture
    "graph_hub_bfs_3hop",
    "graph_degree_mutual_information",
    "graph_closure_by_degree_bin",
    "graph_edge_weight_disparity",
    # wave D — dedup / similarity / embedding audits
    "dedup_component_length_spread",
    "dedup_method_agreement",
    "sketch_ams_f2_estimate",
    "embedding_participation_ratio",
    "similarity_relative_contrast",
    "similarity_rrf_fusion_topk",
    "embedding_jl_distortion_sweep",
    "dedup_minhash_jackknife",
    "embedding_label_projection_gap",
    "dedup_effective_sample_size",
    # wave E — text / LM
    "text_log_odds_dirichlet",
    "lm_kneser_ney_bigram",
    "lm_unigram_heldout_perplexity",
    "text_bm25_parameter_sweep",
    "source_vocab_overlap_by_rank_band",
    "text_heaps_law_by_lang",
    "text_self_repetition_curve",
    "text_char_token_entropy_ratio",
    # wave F — oceanographic profile integrals
    "ios_potential_energy_anomaly",
    "ios_ts_watermass_census",
    "ios_profile_heat_content",
    # wave G — pipeline ops & audits
    "pack_curriculum_quality_buckets",
    "sample_two_proportion_power",
    "events_weekly_value_gini",
    "pack_truncation_loss_sweep",
    "multimodal_metadata_consistency",
    "doc_lexicon_polarity_by_source",
    "lineitem_price_by_qty_decile",
    "doc_langid_margin_by_source",
    "part_sourcing_depth_price_spread",
]

# Seed-time detector results (plan_guards.find_unpartitioned_windows,
# sf0.001): these queries carry a bounded unpartitioned window and need
# an _ALLOWED_UNPARTITIONED_WINDOWS entry at activation with the listed
# justification. Everything else in the slate must stay detector-clean.
EXPECTED_BOUNDED_WINDOW_QUERIES = {
    "events_permutation_entropy_daily": "lead window over the per-DAY rollup (calendar-bounded axis)",
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
    from cioos_siooc_data_transform_spark.plans.staged_r16 import (
        STAGED_QUERIES,
    )

    live = all_queries()
    for name in STAGED_QUERIES:
        assert name not in live


def test_seed_time_detector_clean(spark):
    """Every staged_r16 plan is free of non-operator-internal
    unpartitioned windows EXCEPT the declared bounded-axis list above
    — so activation cannot surprise the registry-wide CI detector
    (the graph_degree_gini lesson from round 10)."""
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
        "staged_r16 plans with undeclared unpartitioned windows "
        f"(migrate or declare in EXPECTED_BOUNDED_WINDOW_QUERIES): {offenders}"
    )
