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

# Round-14 driver-walk priority (the driver walks exactly the FIRST 50
# registry entries per round; the first 50 slots are the round's
# verification budget). Round 13 was 50/50 green -- the first pure
# rotation round -- so round 14 is the second: all 50 slots are
# re-checks of the STALEST-certified queries, ordered by
# (last-green-round, registration-age) via next_priority.py. Slots
# 1-15 are the remaining r2-certified band (q74..q101); slots 16-50
# are the oldest r3-certified band (q12..q128). Zero overlap with
# r13's front-50 (the rotation keeps rotating); this band was
# pre-validated by round 13's synthetic simulation (SCALE.md).
# Regenerate with scripts/next_priority.py.
reorder_registry(
    [
        "q74_knn_vote",  # 1 recheck (r2)
        "q75_ivf_probe_search",  # 2 recheck (r2)
        "q80_csv_scan",  # 3 recheck (r2)
        "q81_jsonl_scan",  # 4 recheck (r2)
        "q82_parquet_sink_roundtrip",  # 5 recheck (r2)
        "q83_lexicon_sentiment",  # 6 recheck (r2)
        "q87_setops_all_variants",  # 7 recheck (r2)
        "q88_except_all",  # 8 recheck (r2)
        "q92_token_budget_packing",  # 9 recheck (r2)
        "q93_text_stats_breakdown",  # 10 recheck (r2)
        "q97_local_supplier_revenue",  # 11 recheck (r2)
        "q98_returned_item_report",  # 12 recheck (r2)
        "q99_ann_multiprobe_lsh",  # 13 recheck (r2)
        "q100_stratified_sample",  # 14 recheck (r2)
        "q101_priority_routing",  # 15 recheck (r2)
        "q12_join_range",  # 16 recheck (r3)
        "q13_join_asof",  # 17 recheck (r3)
        "q25_win_lag_lead",  # 18 recheck (r3)
        "q35_sql_shipping_priority",  # 19 recheck (r3)
        "q51_stream_tumbling_window",  # 20 recheck (r3)
        "q52_stream_sliding_window",  # 21 recheck (r3)
        "q53_session_window",  # 22 recheck (r3)
        "q76_timeseries_similarity",  # 23 recheck (r3)
        "q85_variant_json",  # 24 recheck (r3)
        "q86_salted_skew_agg",  # 25 recheck (r3)
        "q94_time_hierarchy_rollup",  # 26 recheck (r3)
        "q95_pivot",  # 27 recheck (r3)
        "q104_weighted_priority_sample",  # 28 recheck (r3)
        "q105_orc_sink_roundtrip",  # 29 recheck (r3)
        "q106_dedup_clusters_altstar",  # 30 recheck (r3)
        "q107_market_share",  # 31 recheck (r3)
        "q108_sessionize_batch",  # 32 recheck (r3)
        "q109_corpus_curation",  # 33 recheck (r3)
        "q110_zorder_clustering",  # 34 recheck (r3)
        "q111_stream_stream_join",  # 35 recheck (r3)
        "q114_histogram",  # 36 recheck (r3)
        "q115_data_profile",  # 37 recheck (r3)
        "q116_table_checksum",  # 38 recheck (r3)
        "q117_stream_dedup_watermark",  # 39 recheck (r3)
        "q118_scd2_history",  # 40 recheck (r3)
        "q119_fuzzy_join_levenshtein",  # 41 recheck (r3)
        "q120_copurchase_bfs",  # 42 recheck (r3)
        "q121_sq8_ann_rerank",  # 43 recheck (r3)
        "q122_token_pair_lift",  # 44 recheck (r3)
        "q123_cascaded_rollup",  # 45 recheck (r3)
        "q124_stream_update_upsert",  # 46 recheck (r3)
        "q125_table_diff",  # 47 recheck (r3)
        "q126_gap_fill_locf",  # 48 recheck (r3)
        "q127_unpivot_measures",  # 49 recheck (r3)
        "q128_iqr_outlier_fences",  # 50 recheck (r3) <-- cap
    ]
)
