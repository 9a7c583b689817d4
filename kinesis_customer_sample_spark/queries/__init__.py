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

# Round-12 driver-walk priority (the driver walks exactly the FIRST 50
# registry entries per round; the first 50 slots are the round's
# verification budget). Round 11 was 50/50 green, certifying q439-q488
# (483/514 distinct certified). Slots 1-31 are the final never-driver-checked
# band (q489..q520 — the freeze's endgame); slots 32-50 are the 19
# oldest-certified queries due a re-check (q01..q19, last walked r1/r2).
# All other certified queries fall to the tail in registration order.
# Regenerate with scripts/next_priority.py.
reorder_registry(
    [
        "q489_good_turing",  # 1 NEW
        "q490_heaps_vocabulary_growth",  # 2 NEW
        "q491_logrank_test",  # 3 NEW
        "q492_minhash_accuracy_audit",  # 4 NEW
        "q493_lsh_parameter_planner",  # 5 NEW
        "q494_sq8_distortion_audit",  # 6 NEW
        "q495_luhn_checksum_audit",  # 7 NEW
        "q496_spc_residual_capstone",  # 8 NEW
        "q497_session_gap_sensitivity",  # 9 NEW
        "q498_cv_stump_eval",  # 10 NEW
        "q499_audience_overlap",  # 11 NEW
        "q500_gwet_ac1",  # 12 NEW
        "q501_degree_powerlaw_fit",  # 13 NEW
        "q502_candidate_key_discovery",  # 14 NEW
        "q503_point_biserial_screen",  # 15 NEW
        "q504_pr_curve_f1",  # 16 NEW
        "q505_disparate_impact_audit",  # 17 NEW
        "q506_markov_stationary",  # 18 NEW
        "q507_littles_law_audit",  # 19 NEW
        "q508_financial_reconciliation",  # 20 NEW
        "q509_topk_with_ties",  # 21 NEW
        "q510_duplicate_payment_scan",  # 22 NEW
        "q511_semimarkov_holding_times",  # 23 NEW
        "q512_behavior_entropy",  # 24 NEW
        "q513_dedup_ensemble_venn",  # 25 NEW
        "q514_subject_access_report",  # 26 NEW
        "q515_asof_snapshot_matrix",  # 27 NEW
        "q516_funnel_wilson",  # 28 NEW
        "q517_selfcert_scorecard",  # 29 NEW
        "q519_brier_murphy_decomposition",  # 30 NEW
        "q520_decomposition_strength",  # 31 NEW
        "q01_pricing_summary",  # 32 recheck
        "q02_projection_compute",  # 33 recheck
        "q03_filter_predicates",  # 34 recheck
        "q04_conditional_case",  # 35 recheck
        "q05_join_inner",  # 36 recheck
        "q06_join_broadcast_dims",  # 37 recheck
        "q07_join_left_outer",  # 38 recheck
        "q08_join_full_outer",  # 39 recheck
        "q09_join_semi",  # 40 recheck
        "q10_join_anti",  # 41 recheck
        "q11_join_cross_theta",  # 42 recheck
        "q12_join_range",  # 43 recheck
        "q13_join_asof",  # 44 recheck
        "q14_join_self",  # 45 recheck
        "q15_agg_groupby_basic",  # 46 recheck
        "q16_agg_distinct",  # 47 recheck
        "q17_agg_approx_distinct",  # 48 recheck
        "q18_agg_rollup",  # 49 recheck
        "q19_agg_cube",  # 50 recheck <-- cap
        "q20_agg_filtered",  # 51 recheck
        "q21_agg_collect",  # 52 recheck
        "q22_agg_stats",  # 53 recheck
        "q23_agg_global",  # 54 recheck
        "q24_win_ranking",  # 55 recheck
        "q25_win_lag_lead",  # 56 recheck
        "q26_win_frames",  # 57 recheck
        "q27_win_latest_state",  # 58 recheck
        "q28_win_topk_per_group",  # 59 recheck
        "q29_sort_nulls_limit",  # 60 recheck
    ]
)
