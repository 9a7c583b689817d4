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

# Round-11 driver-walk priority (the driver walks exactly the FIRST 50
# registry entries per round; the first 50 slots are the round's
# verification budget). Round 10 was 50/50 green, certifying q389-q438
# (433/514 distinct certified). Slots 1-50 are now the oldest
# never-driver-checked queries (q439..q488); the remaining 31 never-checked
# entries (q489..q520) follow in registration-age order so round 12 inherits
# the age sort, and all certified queries fall to the tail in registration
# order. Regenerate with scripts/next_priority.py.
reorder_registry(
    [
        "q439_stream_histogram_quantiles",  # 1 NEW
        "q440_mase_smape_scorecard",  # 2 NEW
        "q441_croston_intermittent",  # 3 NEW
        "q442_acf_profile",  # 4 NEW
        "q443_leadlag_crosscorr",  # 5 NEW
        "q444_max_drawdown",  # 6 NEW
        "q445_theil_sen_slope",  # 7 NEW
        "q446_huber_location",  # 8 NEW
        "q447_mutual_information",  # 9 NEW
        "q448_lorenz_curve",  # 10 NEW
        "q449_yule_walker_ar2",  # 11 NEW
        "q450_kn_bigram_heldout",  # 12 NEW
        "q451_burrows_delta",  # 13 NEW
        "q452_soundex_blocking",  # 14 NEW
        "q453_fellegi_sunter",  # 15 NEW
        "q454_embedding_novelty",  # 16 NEW
        "q455_expected_shortfall",  # 17 NEW
        "q456_logistic_newton",  # 18 NEW
        "q457_stream_psi_drift",  # 19 NEW
        "q458_model_eval_scorecard",  # 20 NEW
        "q459_nelson_aalen",  # 21 NEW
        "q460_walk_forward_backtest",  # 22 NEW
        "q461_source_mix_waterfill",  # 23 NEW
        "q462_ktruss_peel",  # 24 NEW
        "q463_holt_winters_additive",  # 25 NEW
        "q464_grid_dbscan",  # 26 NEW
        "q465_recsys_coverage_diversity",  # 27 NEW
        "q466_contribution_analysis",  # 28 NEW
        "q467_powerlaw_retention_fit",  # 29 NEW
        "q468_weekly_spectral_power",  # 30 NEW
        "q469_hierarchical_reconciliation",  # 31 NEW
        "q470_skew_salting_advisor",  # 32 NEW
        "q471_weighted_sample_es",  # 33 NEW
        "q472_brand_modularity",  # 34 NEW
        "q473_cluster_validity",  # 35 NEW
        "q474_kalman_local_level",  # 36 NEW
        "q475_newsvendor_stock",  # 37 NEW
        "q476_sharpe_sortino",  # 38 NEW
        "q477_mcnemar_paired_test",  # 39 NEW
        "q478_fleiss_kappa",  # 40 NEW
        "q479_classical_decomposition",  # 41 NEW
        "q480_western_electric_rules",  # 42 NEW
        "q481_borda_rank_fusion",  # 43 NEW
        "q482_reciprocal_best_match",  # 44 NEW
        "q483_mv_rewrite_audit",  # 45 NEW
        "q484_qini_uplift_curve",  # 46 NEW
        "q485_clustering_depth_audit",  # 47 NEW
        "q486_theta_forecast",  # 48 NEW
        "q487_signflip_permutation_test",  # 49 NEW
        "q488_capture_recapture",  # 50 NEW <-- driver walk cap
        "q489_good_turing",  # 51 NEW
        "q490_heaps_vocabulary_growth",  # 52 NEW
        "q491_logrank_test",  # 53 NEW
        "q492_minhash_accuracy_audit",  # 54 NEW
        "q493_lsh_parameter_planner",  # 55 NEW
        "q494_sq8_distortion_audit",  # 56 NEW
        "q495_luhn_checksum_audit",  # 57 NEW
        "q496_spc_residual_capstone",  # 58 NEW
        "q497_session_gap_sensitivity",  # 59 NEW
        "q498_cv_stump_eval",  # 60 NEW
        "q499_audience_overlap",  # 61 NEW
        "q500_gwet_ac1",  # 62 NEW
        "q501_degree_powerlaw_fit",  # 63 NEW
        "q502_candidate_key_discovery",  # 64 NEW
        "q503_point_biserial_screen",  # 65 NEW
        "q504_pr_curve_f1",  # 66 NEW
        "q505_disparate_impact_audit",  # 67 NEW
        "q506_markov_stationary",  # 68 NEW
        "q507_littles_law_audit",  # 69 NEW
        "q508_financial_reconciliation",  # 70 NEW
        "q509_topk_with_ties",  # 71 NEW
        "q510_duplicate_payment_scan",  # 72 NEW
        "q511_semimarkov_holding_times",  # 73 NEW
        "q512_behavior_entropy",  # 74 NEW
        "q513_dedup_ensemble_venn",  # 75 NEW
        "q514_subject_access_report",  # 76 NEW
        "q515_asof_snapshot_matrix",  # 77 NEW
        "q516_funnel_wilson",  # 78 NEW
        "q517_selfcert_scorecard",  # 79 NEW
        "q519_brier_murphy_decomposition",  # 80 NEW
        "q520_decomposition_strength",  # 81 NEW
    ]
)
