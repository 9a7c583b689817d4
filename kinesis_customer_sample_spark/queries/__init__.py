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

# Round-13 driver-walk priority (the driver walks exactly the FIRST 50
# registry entries per round; the first 50 slots are the round's
# verification budget). Round 12 was 50/50 green, certifying the final
# never-walked band q489-q520 — every one of the 514 registered queries
# now has a green driver CORRECTNESS row, and this is the first pure
# rotation round (SURVEY §7l maintenance mode): all 50 slots are
# re-checks of the STALEST-certified queries, ordered by
# (last-green-round, registration-age) via the FIXED next_priority.py
# (789ccdc sorts by last-green-round, not registration age). Slots 1-24
# are r1-certified queries not re-walked since round 1 (q44..q96 band);
# slots 25-50 are the oldest r2-certified band (q03..q73).
# Regenerate with scripts/next_priority.py.
reorder_registry(
    [
        "q44_fn_explode",  # 1 recheck (r1)
        "q45_fn_map_struct",  # 2 recheck (r1)
        "q47_contentops_latest_state",  # 3 recheck (r1)
        "q48_contentops_publish_events",  # 4 recheck (r1)
        "q49_contentops_provenance",  # 5 recheck (r1)
        "q50_contentops_analytics",  # 6 recheck (r1)
        "q60_text_tokenize",  # 7 recheck (r1)
        "q61_term_frequency",  # 8 recheck (r1)
        "q62_tfidf_top_terms",  # 9 recheck (r1)
        "q64_quality_score",  # 10 recheck (r1)
        "q65_token_count_regex",  # 11 recheck (r1)
        "q66_doc_fingerprint",  # 12 recheck (r1)
        "q67_exact_dedup",  # 13 recheck (r1)
        "q68_ngram_jaccard_pairs",  # 14 recheck (r1)
        "q69_minhash_lsh_pairs",  # 15 recheck (r1)
        "q71_embedding_near_dup",  # 16 recheck (r1)
        "q77_multimodal_assembly",  # 17 recheck (r1)
        "q78_media_feature_extract",  # 18 recheck (r1)
        "q79_media_frame_sample",  # 19 recheck (r1)
        "q84_pandas_centroid_udaf",  # 20 recheck (r1)
        "q89_fn_map_json_zip",  # 21 recheck (r1)
        "q90_dedup_clusters",  # 22 recheck (r1)
        "q91_deterministic_split",  # 23 recheck (r1)
        "q96_wire_decode_roundtrip",  # 24 recheck (r1)
        "q03_filter_predicates",  # 25 recheck (r2)
        "q04_conditional_case",  # 26 recheck (r2)
        "q05_join_inner",  # 27 recheck (r2)
        "q06_join_broadcast_dims",  # 28 recheck (r2)
        "q07_join_left_outer",  # 29 recheck (r2)
        "q08_join_full_outer",  # 30 recheck (r2)
        "q09_join_semi",  # 31 recheck (r2)
        "q10_join_anti",  # 32 recheck (r2)
        "q11_join_cross_theta",  # 33 recheck (r2)
        "q14_join_self",  # 34 recheck (r2)
        "q24_win_ranking",  # 35 recheck (r2)
        "q26_win_frames",  # 36 recheck (r2)
        "q27_win_latest_state",  # 37 recheck (r2)
        "q28_win_topk_per_group",  # 38 recheck (r2)
        "q29_sort_nulls_limit",  # 39 recheck (r2)
        "q30_topk_global",  # 40 recheck (r2)
        "q31_union_all",  # 41 recheck (r2)
        "q32_union_distinct",  # 42 recheck (r2)
        "q33_intersect",  # 43 recheck (r2)
        "q34_except",  # 44 recheck (r2)
        "q56_contentops_publish_exact",  # 45 recheck (r2)
        "q57_stream_static_join",  # 46 recheck (r2)
        "q63_lang_id_heuristic",  # 47 recheck (r2)
        "q70_simhash_pairs",  # 48 recheck (r2)
        "q72_cosine_topk_brute",  # 49 recheck (r2)
        "q73_ann_lsh_bucketed",  # 50 recheck (r2) <-- cap
        "q74_knn_vote",  # 51 recheck (r2)
        "q75_ivf_probe_search",  # 52 recheck (r2)
        "q80_csv_scan",  # 53 recheck (r2)
        "q81_jsonl_scan",  # 54 recheck (r2)
        "q82_parquet_sink_roundtrip",  # 55 recheck (r2)
        "q83_lexicon_sentiment",  # 56 recheck (r2)
        "q87_setops_all_variants",  # 57 recheck (r2)
        "q88_except_all",  # 58 recheck (r2)
        "q92_token_budget_packing",  # 59 recheck (r2)
        "q93_text_stats_breakdown",  # 60 recheck (r2)
    ]
)
