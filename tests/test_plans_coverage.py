"""Family-based physical-plan audits for queries that previously had no
direct test reference (round-8 coverage sweep).

Each family pins the ONE plan property its queries' 100 TB posture depends
on, via the same parsed-facts audit as tests/test_plans.py:

- aggregation-shaped queries must keep the map-side partial aggregate
  (losing it means the full fact table crosses the shuffle);
- join-shaped queries must never degrade to CartesianProduct (a blocked /
  bucketed candidate join that silently goes cartesian is the single worst
  scale regression this repo can have);
- filter-first scans must push their predicates into the parquet scan;
- pure scalar-function pipelines must stay map-only (zero exchanges —
  paying a shuffle for a projection is a plan bug).

Queries whose builders run real streams or driver-coordinated iterations
are exercised by their own e2e tests and the oracle sweeps, not here —
audit_of() builds (and for eager builders executes) the plan at the test
scale factor, so this module sticks to lazily-built batch queries.
"""

from __future__ import annotations

import pytest

from tests.test_plans import REGISTRY, audit_of

# agg-shaped: a missing partial_ means the whole fact relation shuffles.
PARTIAL_AGG = [
    "q15_agg_groupby_basic",
    "q16_agg_distinct",
    "q18_agg_rollup",
    "q19_agg_cube",
    "q20_agg_filtered",
    "q21_agg_collect",
    "q22_agg_stats",
    "q23_agg_global",
    "q50_contentops_analytics",
    "q61_term_frequency",
    "q93_text_stats_breakdown",
    "q94_time_hierarchy_rollup",
    "q114_histogram",
    "q115_data_profile",
    "q144_customer_distribution",
    "q154_char_trigram_entropy",
    "q194_distribution_drift",
    "q201_seasonal_anomaly",
    "q203_pareto_concentration",
    "q225_benford_screen",
    "q230_chisq_independence",
    "q237_weighted_median",
    "q238_trimmed_mean",
    "q241_wow_growth",
    "q249_wilson_intervals",
    "q250_eb_smoothed_rates",
    "q261_ab_test_analysis",
    "q272_interpolated_quantiles",
    "q274_rfm_segmentation",
    "q279_calibration_bins",
    "q284_k_anonymity_audit",
    "q45_fn_map_struct",  # explodes then aggregates — the agg is the point
    # batch 2 (shapes probed before listing: every entry measured
    # partial=True at sf0.001)
    "q04_conditional_case",
    "q31_union_all",
    "q44_fn_explode",
    "q62_tfidf_top_terms",
    "q63_lang_id_heuristic",
    "q76_timeseries_similarity",
    "q83_lexicon_sentiment",
    "q85_variant_json",
    "q86_salted_skew_agg",  # salt stage + final: partial combine is the point
    "q87_setops_all_variants",
    "q88_except_all",
    "q95_pivot",
    "q100_stratified_sample",
    "q101_priority_routing",
    "q127_unpivot_measures",
    "q169_listagg_sorted",
    "q208_chunk_mean_pooling",
    "q211_histogram_merge_quantiles",
    "q223_linear_interpolation",
    "q239_event_runs_rle",
    "q256_sliding_distinct_bitmap",
]

# join-shaped: candidate generation is blocked/bucketed by construction and
# must stay an equi-join (or an explicitly-broadcast nested loop) — never
# CartesianProduct.
NO_CARTESIAN = [
    "q08_join_full_outer",
    "q09_join_semi",
    "q10_join_anti",
    "q11_join_cross_theta",
    "q14_join_self",
    "q68_ngram_jaccard_pairs",
    "q70_simhash_pairs",
    "q71_embedding_near_dup",
    "q73_ann_lsh_bucketed",
    "q74_knn_vote",
    "q75_ivf_probe_search",
    "q90_dedup_clusters",
    "q99_ann_multiprobe_lsh",
    # (q144 lives in PARTIAL_AGG, whose test already asserts no-cartesian)
    "q162_schema_evolution_union",
    "q167_lang_confusion_matrix",
    "q173_keeper_longest_doc",
    "q174_incremental_minhash_index",
    "q184_entity_resolution",
    "q198_data_contract_checks",
    "q202_time_to_convert",
    "q204_dead_letter_accounting",
    "q215_prefix_filter_jaccard",
    "q218_or_predicate_revenue",
    "q220_excess_share_suppliers",
    "q234_selective_backfill",
    "q235_join_fanout_preflight",
    "q236_rbo_rank_agreement",
    "q240_common_session_paths",
    "q252_federated_union_scan",
    "q255_incremental_join_maintenance",
    "q266_cdc_net_changes",
    "q271_kmv_theta_set_ops",
    "q273_boolean_postings_and",
    "q275_bitemporal_asof",
    "q278_skipgram_pairs",
    "q282_kaplan_meier",
    "q283_seasonal_naive_backtest",
    "q318_snapshot_time_travel",
    "q391_join_strategy_advisor",
    # batch 2: set-op / join-backed queries (intersect/except compile to
    # semi/anti joins; the TF-IDF and confusion-matrix queries carry
    # broadcast joins)
    "q33_intersect",
    "q34_except",
]

# filter-first scans: the predicate must reach the parquet reader.
PUSHDOWN = [
    "q03_filter_predicates",
    "q35_sql_shipping_priority",
]

# window/quantile-shaped screens: one keyed shuffle is the contract; a
# second exchange would mean an accidental re-partition of the scored rows.
SINGLE_EXCHANGE = [
    "q64_quality_score",
    # batch 2: partitioned-window / grouped-map queries — exactly the one
    # keyed shuffle their semantics require (all measured exch=1, and the
    # window is partitioned — never a "No Partition Defined" global sort)
    "q24_win_ranking",
    "q25_win_lag_lead",
    "q26_win_frames",
    "q27_win_latest_state",
    "q28_win_topk_per_group",
    "q47_contentops_latest_state",
    "q60_text_tokenize",
    "q79_media_frame_sample",
    "q84_pandas_centroid_udaf",
    "q130_win_distribution",
    "q185_group_cap_sample",
    "q291_arrow_map_bytes",
]

# pure scalar-function / filter pipelines: map-only, zero exchanges.
# (q48's publish-event filter is on a JSON-derived column, so nothing is
# parquet-pushable — its scale property is precisely that it stays a pure
# codegen map with no shuffle; q290's CollectMetrics ride along the scan.)
MAP_ONLY = [
    "q36_fn_string",
    "q37_fn_datetime",
    "q38_fn_math",
    "q40_fn_json",
    "q41_fn_null_handling",
    "q48_contentops_publish_events",
    "q65_token_count_regex",
    "q66_doc_fingerprint",
    "q290_observed_metrics",
    # batch 2 (all measured exch=0 at sf0.001; q77's single join is a
    # zero-exchange broadcast, q29's top-k is TakeOrderedAndProject)
    "q02_projection_compute",
    "q29_sort_nulls_limit",
    "q39_fn_array_higher_order",
    "q42_fn_hash_portable",
    "q46_contentops_decode",
    "q49_contentops_provenance",
    "q77_multimodal_assembly",
    "q89_fn_map_json_zip",
    "q91_deterministic_split",
    "q134_try_arithmetic",
]


@pytest.mark.parametrize("name", PARTIAL_AGG)
def test_agg_family_keeps_partial_agg(spark, sf_dir, name):
    facts = audit_of(spark, sf_dir, name)
    assert facts.has_partial_agg, f"{name}: map-side partial aggregate lost"
    assert not facts.has_cartesian


@pytest.mark.parametrize("name", NO_CARTESIAN)
def test_join_family_never_cartesian(spark, sf_dir, name):
    assert not audit_of(spark, sf_dir, name).has_cartesian, (
        f"{name}: a blocked/bucketed join degraded to CartesianProduct"
    )


@pytest.mark.parametrize("name", PUSHDOWN)
def test_filter_family_pushes_predicates(spark, sf_dir, name):
    facts = audit_of(spark, sf_dir, name)
    assert facts.pushed_filters, f"{name}: no predicate reached the scan"


@pytest.mark.parametrize("name", SINGLE_EXCHANGE)
def test_windowed_screen_single_shuffle(spark, sf_dir, name):
    facts = audit_of(spark, sf_dir, name)
    assert facts.n_exchanges <= 1, (
        f"{name}: windowed screen pays {facts.n_exchanges} exchanges"
    )
    assert "No Partition Defined" not in facts.text, (
        f"{name}: window runs as an unpartitioned global sort"
    )
    assert not facts.has_cartesian


@pytest.mark.parametrize("name", MAP_ONLY)
def test_scalar_fn_family_is_map_only(spark, sf_dir, name):
    facts = audit_of(spark, sf_dir, name)
    assert facts.n_exchanges == 0, (
        f"{name}: scalar-function pipeline pays {facts.n_exchanges} exchange(s)"
    )
