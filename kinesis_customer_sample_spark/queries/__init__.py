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
# STALEST-certified queries due a re-check (oldest green CORRECTNESS
# round first — q01/q02/q15-q23/q36-q43 are r1-certified; the rest of
# the registry follows in (last-green-round, registration-age) order, so
# the round-13 rotation inherits the correct horizon automatically).
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
        "q15_agg_groupby_basic",  # 34 recheck
        "q16_agg_distinct",  # 35 recheck
        "q17_agg_approx_distinct",  # 36 recheck
        "q18_agg_rollup",  # 37 recheck
        "q19_agg_cube",  # 38 recheck
        "q20_agg_filtered",  # 39 recheck
        "q21_agg_collect",  # 40 recheck
        "q22_agg_stats",  # 41 recheck
        "q23_agg_global",  # 42 recheck
        "q36_fn_string",  # 43 recheck
        "q37_fn_datetime",  # 44 recheck
        "q38_fn_math",  # 45 recheck
        "q39_fn_array_higher_order",  # 46 recheck
        "q40_fn_json",  # 47 recheck
        "q41_fn_null_handling",  # 48 recheck
        "q42_fn_hash_portable",  # 49 recheck
        "q43_fn_hash_native",  # 50 recheck <-- cap
        "q44_fn_explode",  # 51 recheck
        "q45_fn_map_struct",  # 52 recheck
        "q47_contentops_latest_state",  # 53 recheck
        "q48_contentops_publish_events",  # 54 recheck
        "q49_contentops_provenance",  # 55 recheck
        "q50_contentops_analytics",  # 56 recheck
        "q60_text_tokenize",  # 57 recheck
        "q61_term_frequency",  # 58 recheck
        "q62_tfidf_top_terms",  # 59 recheck
        "q64_quality_score",  # 60 recheck
    ]
)
