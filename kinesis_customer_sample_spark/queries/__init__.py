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

# Round-8 driver-walk priority (the driver's correctness walk has stopped
# after exactly 50 entries in every round so far; the first 50 slots are the
# round's verification budget). Round 7 was 49/50 green, certifying
# q232-q289; the one red row (q288 round-on-quotient hash fragility) is
# fixed this round and re-proves in slot 1. Slots 2-50 are the oldest
# never-driver-checked queries (q290..q338); the remaining 181 never-checked
# entries follow in registration order so future rounds inherit the age
# sort. Regenerate with scripts/next_priority.py.
reorder_registry(
    [
        "q288_sql_pipe_syntax",  # 1 REGRESSION
        "q290_observed_metrics",  # 2 NEW
        "q291_arrow_map_bytes",  # 3 NEW
        "q292_connected_components",  # 4 NEW
        "q293_temporal_reachability",  # 5 NEW
        "q294_sql_scalar_udf",  # 6 NEW
        "q295_session_variables",  # 7 NEW
        "q296_modern_sql_sugar",  # 8 NEW
        "q297_holt_linear_trend",  # 9 NEW
        "q298_decayed_engagement",  # 10 NEW
        "q299_cohens_kappa",  # 11 NEW
        "q300_collated_grouping",  # 12 NEW
        "q301_identifier_clause",  # 13 NEW
        "q302_xml_ingest",  # 14 NEW
        "q303_stream_neardup_gate",  # 15 NEW
        "q304_isotonic_calibration",  # 16 NEW
        "q305_stream_minibatch_kmeans",  # 17 NEW
        "q306_transpose_metrics",  # 18 NEW
        "q307_point_in_polygon",  # 19 NEW
        "q308_association_rules",  # 20 NEW
        "q309_sql_scripting",  # 21 NEW
        "q310_variant_explode",  # 22 NEW
        "q311_embedding_gramian",  # 23 NEW
        "q312_deadline_funnel",  # 24 NEW
        "q313_null_aware_anti_join",  # 25 NEW
        "q314_hits_authorities",  # 26 NEW
        "q315_bellman_ford_cheapest",  # 27 NEW
        "q316_sorted_neighborhood_pairs",  # 28 NEW
        "q317_sprt_sequential_test",  # 29 NEW
        "q318_snapshot_time_travel",  # 30 NEW
        "q319_longest_prefix_match",  # 31 NEW
        "q320_sweepline_concurrency",  # 32 NEW
        "q321_feature_standardization_audit",  # 33 NEW
        "q322_neyman_stratified_sample",  # 34 NEW
        "q323_lag1_autocorrelation",  # 35 NEW
        "q324_stream_dedup_within_watermark",  # 36 NEW
        "q325_arrow_grouped_centroids",  # 37 NEW
        "q326_randomized_response_counts",  # 38 NEW
        "q327_emd_drift",  # 39 NEW
        "q328_positional_phrase_search",  # 40 NEW
        "q329_weekday_seasonal_adjust",  # 41 NEW
        "q330_binseg_changepoints",  # 42 NEW
        "q331_forecast_revenue_change",  # 43 NEW
        "q332_shipping_modes_priority",  # 44 NEW
        "q333_heavy_hitter_churn",  # 45 NEW
        "q334_interevent_burstiness",  # 46 NEW
        "q335_path_hierarchy_rollup",  # 47 NEW
        "q336_tokenizer_fertility_audit",  # 48 NEW
        "q337_training_mix_data_card",  # 49 NEW
        "q338_cross_source_leakage_matrix",  # 50 NEW <-- driver walk cap
        "q339_stream_sprt_sequential",  # 51 NEW
        "q340_percent_of_parent",  # 52 NEW
        "q341_ndcg_mrr_eval",  # 53 NEW
        "q342_target_encoding_oof",  # 54 NEW
        "q343_gini_by_segment",  # 55 NEW
        "q344_positional_delete_apply",  # 56 NEW
        "q345_degree_assortativity",  # 57 NEW
        "q346_l_diversity_audit",  # 58 NEW
        "q347_dwell_bounce_rollup",  # 59 NEW
        "q348_stream_stream_semi_join",  # 60 NEW
        "q349_quantile_normalization",  # 61 NEW
        "q350_encoding_advisor",  # 62 NEW
        "q351_merkle_range_diff",  # 63 NEW
        "q352_greedy_set_cover",  # 64 NEW
        "q353_temporal_embargo_split",  # 65 NEW
        "q354_partition_profile_drift",  # 66 NEW
        "q355_dynamic_pivot",  # 67 NEW
        "q356_json_schema_inference",  # 68 NEW
        "q357_dynamic_partition_pruning",  # 69 NEW
        "q358_zipf_rank_frequency",  # 70 NEW
        "q359_zone_map_skipping",  # 71 NEW
        "q360_sparse_cosine_join",  # 72 NEW
        "q361_compaction_bin_packing",  # 73 NEW
        "q362_priority_sampling",  # 74 NEW
        "q363_boilerplate_strip",  # 75 NEW
        "q364_stream_full_outer_join",  # 76 NEW
        "q365_information_gain",  # 77 NEW
        "q366_star_schema_conformance",  # 78 NEW
        "q367_ucb1_arm_ranking",  # 79 NEW
        "q368_sla_burn_rate",  # 80 NEW
        "q369_bom_explosion",  # 81 NEW
        "q370_rfm_segmentation",  # 82 NEW
        "q371_negative_sampling",  # 83 NEW
        "q372_time_weighted_average",  # 84 NEW
        "q373_negation_funnel",  # 85 NEW
        "q374_stream_anti_join",  # 86 NEW
        "q375_vacuum_planning",  # 87 NEW
        "q376_functional_dependency_audit",  # 88 NEW
        "q377_readability_score",  # 89 NEW
        "q378_brier_calibration",  # 90 NEW
        "q379_t_closeness_audit",  # 91 NEW
        "q380_kmv_distinct_sketch",  # 92 NEW
        "q381_feature_hashing",  # 93 NEW
        "q382_pinball_loss_eval",  # 94 NEW
        "q383_conformal_intervals",  # 95 NEW
        "q384_kaplan_meier",  # 96 NEW
        "q385_kcore_peel",  # 97 NEW
        "q386_bloom_sizing_advisor",  # 98 NEW
        "q387_trajectory_stops",  # 99 NEW
        "q388_fixed_width_parse",  # 100 NEW
        "q389_cdc_changelog_producer",  # 101 NEW
        "q390_scd2_integrity_audit",  # 102 NEW
        "q391_join_strategy_advisor",  # 103 NEW
        "q392_interval_union_coverage",  # 104 NEW
        "q393_naive_bayes_langid",  # 105 NEW
        "q394_decision_stump",  # 106 NEW
        "q395_diff_in_diff",  # 107 NEW
        "q396_item_item_jaccard_cf",  # 108 NEW
        "q397_wl_refinement",  # 109 NEW
        "q398_asof_tolerance_join",  # 110 NEW
        "q399_winsorization",  # 111 NEW
        "q400_maintenance_report",  # 112 NEW
        "q401_trending_leaderboard",  # 113 NEW
        "q402_rate_limit_audit",  # 114 NEW
        "q403_median_of_means",  # 115 NEW
        "q404_consistent_hash_rebalance",  # 116 NEW
        "q405_clamped_running_balance",  # 117 NEW
        "q406_schema_drift_diff",  # 118 NEW
        "q407_partition_sizing_advisor",  # 119 NEW
        "q408_stream_twap_stateful",  # 120 NEW
        "q409_release_gate_capstone",  # 121 NEW
        "q410_stratified_interleave",  # 122 NEW
        "q411_forget_me_propagation",  # 123 NEW
        "q412_theil_decomposition",  # 124 NEW
        "q413_local_clustering_profile",  # 125 NEW
        "q414_spearman_rank_corr",  # 126 NEW
        "q415_kendall_tau_b",  # 127 NEW
        "q416_anova_oneway",  # 128 NEW
        "q417_cramers_v",  # 129 NEW
        "q418_js_divergence",  # 130 NEW
        "q419_psi_drift",  # 131 NEW
        "q420_average_precision",  # 132 NEW
        "q421_expected_calibration_error",  # 133 NEW
        "q422_trigram_substring_search",  # 134 NEW
        "q423_matryoshka_truncation_agreement",  # 135 NEW
        "q424_adamic_adar",  # 136 NEW
        "q425_harmonic_centrality_2hop",  # 137 NEW
        "q426_rolling_correlation",  # 138 NEW
        "q427_sax_motifs",  # 139 NEW
        "q428_markov_removal_attribution",  # 140 NEW
        "q429_hhi_concentration",  # 141 NEW
        "q430_ivf_nprobe_ann",  # 142 NEW
        "q431_jaro_winkler_linkage",  # 143 NEW
        "q432_rake_keyphrases",  # 144 NEW
        "q433_cohort_ltv_curve",  # 145 NEW
        "q434_personalized_pagerank",  # 146 NEW
        "q435_abc_xyz_classification",  # 147 NEW
        "q436_jl_projection_distortion",  # 148 NEW
        "q437_markov_next_event_accuracy",  # 149 NEW
        "q438_experiment_sample_size",  # 150 NEW
        "q439_stream_histogram_quantiles",  # 151 NEW
        "q440_mase_smape_scorecard",  # 152 NEW
        "q441_croston_intermittent",  # 153 NEW
        "q442_acf_profile",  # 154 NEW
        "q443_leadlag_crosscorr",  # 155 NEW
        "q444_max_drawdown",  # 156 NEW
        "q445_theil_sen_slope",  # 157 NEW
        "q446_huber_location",  # 158 NEW
        "q447_mutual_information",  # 159 NEW
        "q448_lorenz_curve",  # 160 NEW
        "q449_yule_walker_ar2",  # 161 NEW
        "q450_kn_bigram_heldout",  # 162 NEW
        "q451_burrows_delta",  # 163 NEW
        "q452_soundex_blocking",  # 164 NEW
        "q453_fellegi_sunter",  # 165 NEW
        "q454_embedding_novelty",  # 166 NEW
        "q455_expected_shortfall",  # 167 NEW
        "q456_logistic_newton",  # 168 NEW
        "q457_stream_psi_drift",  # 169 NEW
        "q458_model_eval_scorecard",  # 170 NEW
        "q459_nelson_aalen",  # 171 NEW
        "q460_walk_forward_backtest",  # 172 NEW
        "q461_source_mix_waterfill",  # 173 NEW
        "q462_ktruss_peel",  # 174 NEW
        "q463_holt_winters_additive",  # 175 NEW
        "q464_grid_dbscan",  # 176 NEW
        "q465_recsys_coverage_diversity",  # 177 NEW
        "q466_contribution_analysis",  # 178 NEW
        "q467_powerlaw_retention_fit",  # 179 NEW
        "q468_weekly_spectral_power",  # 180 NEW
        "q469_hierarchical_reconciliation",  # 181 NEW
        "q470_skew_salting_advisor",  # 182 NEW
        "q471_weighted_sample_es",  # 183 NEW
        "q472_brand_modularity",  # 184 NEW
        "q473_cluster_validity",  # 185 NEW
        "q474_kalman_local_level",  # 186 NEW
        "q475_newsvendor_stock",  # 187 NEW
        "q476_sharpe_sortino",  # 188 NEW
        "q477_mcnemar_paired_test",  # 189 NEW
        "q478_fleiss_kappa",  # 190 NEW
        "q479_classical_decomposition",  # 191 NEW
        "q480_western_electric_rules",  # 192 NEW
        "q481_borda_rank_fusion",  # 193 NEW
        "q482_reciprocal_best_match",  # 194 NEW
        "q483_mv_rewrite_audit",  # 195 NEW
        "q484_qini_uplift_curve",  # 196 NEW
        "q485_clustering_depth_audit",  # 197 NEW
        "q486_theta_forecast",  # 198 NEW
        "q487_signflip_permutation_test",  # 199 NEW
        "q488_capture_recapture",  # 200 NEW
        "q489_good_turing",  # 201 NEW
        "q490_heaps_vocabulary_growth",  # 202 NEW
        "q491_logrank_test",  # 203 NEW
        "q492_minhash_accuracy_audit",  # 204 NEW
        "q493_lsh_parameter_planner",  # 205 NEW
        "q494_sq8_distortion_audit",  # 206 NEW
        "q495_luhn_checksum_audit",  # 207 NEW
        "q496_spc_residual_capstone",  # 208 NEW
        "q497_session_gap_sensitivity",  # 209 NEW
        "q498_cv_stump_eval",  # 210 NEW
        "q499_audience_overlap",  # 211 NEW
        "q500_gwet_ac1",  # 212 NEW
        "q501_degree_powerlaw_fit",  # 213 NEW
        "q502_candidate_key_discovery",  # 214 NEW
        "q503_point_biserial_screen",  # 215 NEW
        "q504_pr_curve_f1",  # 216 NEW
        "q505_disparate_impact_audit",  # 217 NEW
        "q506_markov_stationary",  # 218 NEW
        "q507_littles_law_audit",  # 219 NEW
        "q508_financial_reconciliation",  # 220 NEW
        "q509_topk_with_ties",  # 221 NEW
        "q510_duplicate_payment_scan",  # 222 NEW
        "q511_semimarkov_holding_times",  # 223 NEW
        "q512_behavior_entropy",  # 224 NEW
        "q513_dedup_ensemble_venn",  # 225 NEW
        "q514_subject_access_report",  # 226 NEW
        "q515_asof_snapshot_matrix",  # 227 NEW
        "q516_funnel_wilson",  # 228 NEW
        "q517_selfcert_scorecard",  # 229 NEW
        "q519_brier_murphy_decomposition",  # 230 NEW
        "q520_decomposition_strength",  # 231 NEW
    ]
)
