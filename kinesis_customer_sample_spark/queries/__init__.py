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

# Round-10 driver-walk priority (the driver walks exactly the FIRST 50
# registry entries per round; the first 50 slots are the round's
# verification budget). Round 9 was 50/50 green, certifying q339-q388
# (383/514 distinct certified). Slots 1-50 are now the oldest
# never-driver-checked queries (q389..q438); the remaining 81 never-checked
# entries follow in registration-age order so future rounds inherit the age
# sort, and all certified queries fall to the tail in registration order.
# Regenerate with scripts/next_priority.py.
reorder_registry(
    [
        "q389_cdc_changelog_producer",  # 1 NEW
        "q390_scd2_integrity_audit",  # 2 NEW
        "q391_join_strategy_advisor",  # 3 NEW
        "q392_interval_union_coverage",  # 4 NEW
        "q393_naive_bayes_langid",  # 5 NEW
        "q394_decision_stump",  # 6 NEW
        "q395_diff_in_diff",  # 7 NEW
        "q396_item_item_jaccard_cf",  # 8 NEW
        "q397_wl_refinement",  # 9 NEW
        "q398_asof_tolerance_join",  # 10 NEW
        "q399_winsorization",  # 11 NEW
        "q400_maintenance_report",  # 12 NEW
        "q401_trending_leaderboard",  # 13 NEW
        "q402_rate_limit_audit",  # 14 NEW
        "q403_median_of_means",  # 15 NEW
        "q404_consistent_hash_rebalance",  # 16 NEW
        "q405_clamped_running_balance",  # 17 NEW
        "q406_schema_drift_diff",  # 18 NEW
        "q407_partition_sizing_advisor",  # 19 NEW
        "q408_stream_twap_stateful",  # 20 NEW
        "q409_release_gate_capstone",  # 21 NEW
        "q410_stratified_interleave",  # 22 NEW
        "q411_forget_me_propagation",  # 23 NEW
        "q412_theil_decomposition",  # 24 NEW
        "q413_local_clustering_profile",  # 25 NEW
        "q414_spearman_rank_corr",  # 26 NEW
        "q415_kendall_tau_b",  # 27 NEW
        "q416_anova_oneway",  # 28 NEW
        "q417_cramers_v",  # 29 NEW
        "q418_js_divergence",  # 30 NEW
        "q419_psi_drift",  # 31 NEW
        "q420_average_precision",  # 32 NEW
        "q421_expected_calibration_error",  # 33 NEW
        "q422_trigram_substring_search",  # 34 NEW
        "q423_matryoshka_truncation_agreement",  # 35 NEW
        "q424_adamic_adar",  # 36 NEW
        "q425_harmonic_centrality_2hop",  # 37 NEW
        "q426_rolling_correlation",  # 38 NEW
        "q427_sax_motifs",  # 39 NEW
        "q428_markov_removal_attribution",  # 40 NEW
        "q429_hhi_concentration",  # 41 NEW
        "q430_ivf_nprobe_ann",  # 42 NEW
        "q431_jaro_winkler_linkage",  # 43 NEW
        "q432_rake_keyphrases",  # 44 NEW
        "q433_cohort_ltv_curve",  # 45 NEW
        "q434_personalized_pagerank",  # 46 NEW
        "q435_abc_xyz_classification",  # 47 NEW
        "q436_jl_projection_distortion",  # 48 NEW
        "q437_markov_next_event_accuracy",  # 49 NEW
        "q438_experiment_sample_size",  # 50 NEW <-- driver walk cap
        "q439_stream_histogram_quantiles",  # 51 NEW
        "q440_mase_smape_scorecard",  # 52 NEW
        "q441_croston_intermittent",  # 53 NEW
        "q442_acf_profile",  # 54 NEW
        "q443_leadlag_crosscorr",  # 55 NEW
        "q444_max_drawdown",  # 56 NEW
        "q445_theil_sen_slope",  # 57 NEW
        "q446_huber_location",  # 58 NEW
        "q447_mutual_information",  # 59 NEW
        "q448_lorenz_curve",  # 60 NEW
        "q449_yule_walker_ar2",  # 61 NEW
        "q450_kn_bigram_heldout",  # 62 NEW
        "q451_burrows_delta",  # 63 NEW
        "q452_soundex_blocking",  # 64 NEW
        "q453_fellegi_sunter",  # 65 NEW
        "q454_embedding_novelty",  # 66 NEW
        "q455_expected_shortfall",  # 67 NEW
        "q456_logistic_newton",  # 68 NEW
        "q457_stream_psi_drift",  # 69 NEW
        "q458_model_eval_scorecard",  # 70 NEW
        "q459_nelson_aalen",  # 71 NEW
        "q460_walk_forward_backtest",  # 72 NEW
        "q461_source_mix_waterfill",  # 73 NEW
        "q462_ktruss_peel",  # 74 NEW
        "q463_holt_winters_additive",  # 75 NEW
        "q464_grid_dbscan",  # 76 NEW
        "q465_recsys_coverage_diversity",  # 77 NEW
        "q466_contribution_analysis",  # 78 NEW
        "q467_powerlaw_retention_fit",  # 79 NEW
        "q468_weekly_spectral_power",  # 80 NEW
        "q469_hierarchical_reconciliation",  # 81 NEW
        "q470_skew_salting_advisor",  # 82 NEW
        "q471_weighted_sample_es",  # 83 NEW
        "q472_brand_modularity",  # 84 NEW
        "q473_cluster_validity",  # 85 NEW
        "q474_kalman_local_level",  # 86 NEW
        "q475_newsvendor_stock",  # 87 NEW
        "q476_sharpe_sortino",  # 88 NEW
        "q477_mcnemar_paired_test",  # 89 NEW
        "q478_fleiss_kappa",  # 90 NEW
        "q479_classical_decomposition",  # 91 NEW
        "q480_western_electric_rules",  # 92 NEW
        "q481_borda_rank_fusion",  # 93 NEW
        "q482_reciprocal_best_match",  # 94 NEW
        "q483_mv_rewrite_audit",  # 95 NEW
        "q484_qini_uplift_curve",  # 96 NEW
        "q485_clustering_depth_audit",  # 97 NEW
        "q486_theta_forecast",  # 98 NEW
        "q487_signflip_permutation_test",  # 99 NEW
        "q488_capture_recapture",  # 100 NEW
        "q489_good_turing",  # 101 NEW
        "q490_heaps_vocabulary_growth",  # 102 NEW
        "q491_logrank_test",  # 103 NEW
        "q492_minhash_accuracy_audit",  # 104 NEW
        "q493_lsh_parameter_planner",  # 105 NEW
        "q494_sq8_distortion_audit",  # 106 NEW
        "q495_luhn_checksum_audit",  # 107 NEW
        "q496_spc_residual_capstone",  # 108 NEW
        "q497_session_gap_sensitivity",  # 109 NEW
        "q498_cv_stump_eval",  # 110 NEW
        "q499_audience_overlap",  # 111 NEW
        "q500_gwet_ac1",  # 112 NEW
        "q501_degree_powerlaw_fit",  # 113 NEW
        "q502_candidate_key_discovery",  # 114 NEW
        "q503_point_biserial_screen",  # 115 NEW
        "q504_pr_curve_f1",  # 116 NEW
        "q505_disparate_impact_audit",  # 117 NEW
        "q506_markov_stationary",  # 118 NEW
        "q507_littles_law_audit",  # 119 NEW
        "q508_financial_reconciliation",  # 120 NEW
        "q509_topk_with_ties",  # 121 NEW
        "q510_duplicate_payment_scan",  # 122 NEW
        "q511_semimarkov_holding_times",  # 123 NEW
        "q512_behavior_entropy",  # 124 NEW
        "q513_dedup_ensemble_venn",  # 125 NEW
        "q514_subject_access_report",  # 126 NEW
        "q515_asof_snapshot_matrix",  # 127 NEW
        "q516_funnel_wilson",  # 128 NEW
        "q517_selfcert_scorecard",  # 129 NEW
        "q519_brier_murphy_decomposition",  # 130 NEW
        "q520_decomposition_strength",  # 131 NEW
    ]
)
