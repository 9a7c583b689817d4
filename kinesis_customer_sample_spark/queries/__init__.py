"""Query modules. Importing this package registers every named query.

Module map (mirrors SURVEY.md §2B groups):
- flagship        — the entry() pricing-summary query (M0)
- relational      — projection / filter / conditional / join family (M1)
- aggregation     — group-by, distinct, rollup/cube, filtered, stats (M1)
- windows         — ranking / analytic / frames / latest-state (M1)
- setops          — sort, limit, top-k, union/intersect/except (M1)
- functions_scalar— string/date/math/array/json/null/hash families (M2)
- content_ops     — reference pipeline semantics, batch form (M3, guide:58-145)
- llm_text        — tokenize, TF-IDF, language stats, quality, lexicon (M5)
- llm_dedup       — exact / ngram-jaccard / minhash-LSH / simhash dedup (M5)
- llm_similarity  — cosine, top-k ANN, all-pairs, kNN vote, multimodal (M5)
"""

# Import order is only a baseline for driver-visit order; the explicit
# reorder below (registry.reorder_registry) sets the true priority, since
# the driver walks queries() front-to-back and round 1's walk stopped after
# exactly 50 entries. Dependency constraints on imports: streaming_queries
# imports content_ops; dedup imports text_analysis; pipeline_ops imports
# dedup.
from kinesis_customer_sample_spark.queries import (  # noqa: F401
    relational,
    windows,
    setops,
    scale_patterns,
    sources_scan,
    similarity,
    content_ops,
    streaming_queries,
    aggregation,
    text_analysis,
    dedup,
    flagship,
    functions_scalar,
    multimodal,
    pipeline_ops,
    composites2,
    composites3,
    composites4,
    composites5,
    composites6,
    curation,
    corpus_scoring,
    warehouse_ops,
    sketch_retrieval,
    graph_quality_ops,
    entity_ops,
    temporal_ops,
    conflation_ops,
    timeseries_ops,
    profiling_ops,
    sequence_ops,
    media_neardup,
    bpe_ops,
    quality_screens,
    analytics_fits,
    attribution_stats,
    spatial_ops,
    backfill_ops,
    sequence_analytics,
    retrieval_rerank,
    python_extensions,
    stats_tests,
    alerting_ops,
    pq_ann,
    quantile_ops,
    ml_eval_ops,
    graph_components,
    sql_frontends,
    trend_ops,
    streaming_gate,
    streaming_ml,
    basket_ops,
    graph_ranking,
    eval_prep_ops,
    stats_assoc,
    forecast_eval_ops,
    robust_stats_ops,
    text_linkage_ops,
    risk_model_ops,
)

from kinesis_customer_sample_spark.registry import reorder_registry

# Round-9 driver-walk priority (the driver's correctness walk has stopped
# after exactly 50 entries in every round so far; the first 50 slots are the
# round's verification budget). Round 8 was 50/50 green, certifying q288 and
# q290-q338 (333/514 distinct certified). Slots 1-50 are now the oldest
# never-driver-checked queries (q339..q388); the remaining 131 never-checked
# entries follow in registration-age order so future rounds inherit the age
# sort, and all certified queries fall to the tail in registration order.
# Regenerate with scripts/next_priority.py.
reorder_registry(
    [
        "q339_stream_sprt_sequential",  # 1 NEW
        "q340_percent_of_parent",  # 2 NEW
        "q341_ndcg_mrr_eval",  # 3 NEW
        "q342_target_encoding_oof",  # 4 NEW
        "q343_gini_by_segment",  # 5 NEW
        "q344_positional_delete_apply",  # 6 NEW
        "q345_degree_assortativity",  # 7 NEW
        "q346_l_diversity_audit",  # 8 NEW
        "q347_dwell_bounce_rollup",  # 9 NEW
        "q348_stream_stream_semi_join",  # 10 NEW
        "q349_quantile_normalization",  # 11 NEW
        "q350_encoding_advisor",  # 12 NEW
        "q351_merkle_range_diff",  # 13 NEW
        "q352_greedy_set_cover",  # 14 NEW
        "q353_temporal_embargo_split",  # 15 NEW
        "q354_partition_profile_drift",  # 16 NEW
        "q355_dynamic_pivot",  # 17 NEW
        "q356_json_schema_inference",  # 18 NEW
        "q357_dynamic_partition_pruning",  # 19 NEW
        "q358_zipf_rank_frequency",  # 20 NEW
        "q359_zone_map_skipping",  # 21 NEW
        "q360_sparse_cosine_join",  # 22 NEW
        "q361_compaction_bin_packing",  # 23 NEW
        "q362_priority_sampling",  # 24 NEW
        "q363_boilerplate_strip",  # 25 NEW
        "q364_stream_full_outer_join",  # 26 NEW
        "q365_information_gain",  # 27 NEW
        "q366_star_schema_conformance",  # 28 NEW
        "q367_ucb1_arm_ranking",  # 29 NEW
        "q368_sla_burn_rate",  # 30 NEW
        "q369_bom_explosion",  # 31 NEW
        "q370_rfm_segmentation",  # 32 NEW
        "q371_negative_sampling",  # 33 NEW
        "q372_time_weighted_average",  # 34 NEW
        "q373_negation_funnel",  # 35 NEW
        "q374_stream_anti_join",  # 36 NEW
        "q375_vacuum_planning",  # 37 NEW
        "q376_functional_dependency_audit",  # 38 NEW
        "q377_readability_score",  # 39 NEW
        "q378_brier_calibration",  # 40 NEW
        "q379_t_closeness_audit",  # 41 NEW
        "q380_kmv_distinct_sketch",  # 42 NEW
        "q381_feature_hashing",  # 43 NEW
        "q382_pinball_loss_eval",  # 44 NEW
        "q383_conformal_intervals",  # 45 NEW
        "q384_kaplan_meier",  # 46 NEW
        "q385_kcore_peel",  # 47 NEW
        "q386_bloom_sizing_advisor",  # 48 NEW
        "q387_trajectory_stops",  # 49 NEW
        "q388_fixed_width_parse",  # 50 NEW <-- driver walk cap
        "q389_cdc_changelog_producer",  # 51 NEW
        "q390_scd2_integrity_audit",  # 52 NEW
        "q391_join_strategy_advisor",  # 53 NEW
        "q392_interval_union_coverage",  # 54 NEW
        "q393_naive_bayes_langid",  # 55 NEW
        "q394_decision_stump",  # 56 NEW
        "q395_diff_in_diff",  # 57 NEW
        "q396_item_item_jaccard_cf",  # 58 NEW
        "q397_wl_refinement",  # 59 NEW
        "q398_asof_tolerance_join",  # 60 NEW
        "q399_winsorization",  # 61 NEW
        "q400_maintenance_report",  # 62 NEW
        "q401_trending_leaderboard",  # 63 NEW
        "q402_rate_limit_audit",  # 64 NEW
        "q403_median_of_means",  # 65 NEW
        "q404_consistent_hash_rebalance",  # 66 NEW
        "q405_clamped_running_balance",  # 67 NEW
        "q406_schema_drift_diff",  # 68 NEW
        "q407_partition_sizing_advisor",  # 69 NEW
        "q408_stream_twap_stateful",  # 70 NEW
        "q409_release_gate_capstone",  # 71 NEW
        "q410_stratified_interleave",  # 72 NEW
        "q411_forget_me_propagation",  # 73 NEW
        "q412_theil_decomposition",  # 74 NEW
        "q413_local_clustering_profile",  # 75 NEW
        "q414_spearman_rank_corr",  # 76 NEW
        "q415_kendall_tau_b",  # 77 NEW
        "q416_anova_oneway",  # 78 NEW
        "q417_cramers_v",  # 79 NEW
        "q418_js_divergence",  # 80 NEW
        "q419_psi_drift",  # 81 NEW
        "q420_average_precision",  # 82 NEW
        "q421_expected_calibration_error",  # 83 NEW
        "q422_trigram_substring_search",  # 84 NEW
        "q423_matryoshka_truncation_agreement",  # 85 NEW
        "q424_adamic_adar",  # 86 NEW
        "q425_harmonic_centrality_2hop",  # 87 NEW
        "q426_rolling_correlation",  # 88 NEW
        "q427_sax_motifs",  # 89 NEW
        "q428_markov_removal_attribution",  # 90 NEW
        "q429_hhi_concentration",  # 91 NEW
        "q430_ivf_nprobe_ann",  # 92 NEW
        "q431_jaro_winkler_linkage",  # 93 NEW
        "q432_rake_keyphrases",  # 94 NEW
        "q433_cohort_ltv_curve",  # 95 NEW
        "q434_personalized_pagerank",  # 96 NEW
        "q435_abc_xyz_classification",  # 97 NEW
        "q436_jl_projection_distortion",  # 98 NEW
        "q437_markov_next_event_accuracy",  # 99 NEW
        "q438_experiment_sample_size",  # 100 NEW
        "q439_stream_histogram_quantiles",  # 101 NEW
        "q440_mase_smape_scorecard",  # 102 NEW
        "q441_croston_intermittent",  # 103 NEW
        "q442_acf_profile",  # 104 NEW
        "q443_leadlag_crosscorr",  # 105 NEW
        "q444_max_drawdown",  # 106 NEW
        "q445_theil_sen_slope",  # 107 NEW
        "q446_huber_location",  # 108 NEW
        "q447_mutual_information",  # 109 NEW
        "q448_lorenz_curve",  # 110 NEW
        "q449_yule_walker_ar2",  # 111 NEW
        "q450_kn_bigram_heldout",  # 112 NEW
        "q451_burrows_delta",  # 113 NEW
        "q452_soundex_blocking",  # 114 NEW
        "q453_fellegi_sunter",  # 115 NEW
        "q454_embedding_novelty",  # 116 NEW
        "q455_expected_shortfall",  # 117 NEW
        "q456_logistic_newton",  # 118 NEW
        "q457_stream_psi_drift",  # 119 NEW
        "q458_model_eval_scorecard",  # 120 NEW
        "q459_nelson_aalen",  # 121 NEW
        "q460_walk_forward_backtest",  # 122 NEW
        "q461_source_mix_waterfill",  # 123 NEW
        "q462_ktruss_peel",  # 124 NEW
        "q463_holt_winters_additive",  # 125 NEW
        "q464_grid_dbscan",  # 126 NEW
        "q465_recsys_coverage_diversity",  # 127 NEW
        "q466_contribution_analysis",  # 128 NEW
        "q467_powerlaw_retention_fit",  # 129 NEW
        "q468_weekly_spectral_power",  # 130 NEW
        "q469_hierarchical_reconciliation",  # 131 NEW
        "q470_skew_salting_advisor",  # 132 NEW
        "q471_weighted_sample_es",  # 133 NEW
        "q472_brand_modularity",  # 134 NEW
        "q473_cluster_validity",  # 135 NEW
        "q474_kalman_local_level",  # 136 NEW
        "q475_newsvendor_stock",  # 137 NEW
        "q476_sharpe_sortino",  # 138 NEW
        "q477_mcnemar_paired_test",  # 139 NEW
        "q478_fleiss_kappa",  # 140 NEW
        "q479_classical_decomposition",  # 141 NEW
        "q480_western_electric_rules",  # 142 NEW
        "q481_borda_rank_fusion",  # 143 NEW
        "q482_reciprocal_best_match",  # 144 NEW
        "q483_mv_rewrite_audit",  # 145 NEW
        "q484_qini_uplift_curve",  # 146 NEW
        "q485_clustering_depth_audit",  # 147 NEW
        "q486_theta_forecast",  # 148 NEW
        "q487_signflip_permutation_test",  # 149 NEW
        "q488_capture_recapture",  # 150 NEW
        "q489_good_turing",  # 151 NEW
        "q490_heaps_vocabulary_growth",  # 152 NEW
        "q491_logrank_test",  # 153 NEW
        "q492_minhash_accuracy_audit",  # 154 NEW
        "q493_lsh_parameter_planner",  # 155 NEW
        "q494_sq8_distortion_audit",  # 156 NEW
        "q495_luhn_checksum_audit",  # 157 NEW
        "q496_spc_residual_capstone",  # 158 NEW
        "q497_session_gap_sensitivity",  # 159 NEW
        "q498_cv_stump_eval",  # 160 NEW
        "q499_audience_overlap",  # 161 NEW
        "q500_gwet_ac1",  # 162 NEW
        "q501_degree_powerlaw_fit",  # 163 NEW
        "q502_candidate_key_discovery",  # 164 NEW
        "q503_point_biserial_screen",  # 165 NEW
        "q504_pr_curve_f1",  # 166 NEW
        "q505_disparate_impact_audit",  # 167 NEW
        "q506_markov_stationary",  # 168 NEW
        "q507_littles_law_audit",  # 169 NEW
        "q508_financial_reconciliation",  # 170 NEW
        "q509_topk_with_ties",  # 171 NEW
        "q510_duplicate_payment_scan",  # 172 NEW
        "q511_semimarkov_holding_times",  # 173 NEW
        "q512_behavior_entropy",  # 174 NEW
        "q513_dedup_ensemble_venn",  # 175 NEW
        "q514_subject_access_report",  # 176 NEW
        "q515_asof_snapshot_matrix",  # 177 NEW
        "q516_funnel_wilson",  # 178 NEW
        "q517_selfcert_scorecard",  # 179 NEW
        "q519_brier_murphy_decomposition",  # 180 NEW
        "q520_decomposition_strength",  # 181 NEW
    ]
)
