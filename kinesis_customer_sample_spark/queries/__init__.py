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
)

from kinesis_customer_sample_spark.registry import reorder_registry

# Round-3 driver-walk priority (the driver's correctness walk stopped after
# exactly 50 entries in rounds 1 AND 2, so the first 50 slots are the round's
# verification budget):
# 1. the nine round-2 non-green rows, all fixed this round — seven errors
#    from the events.ts fixture dtype change (catalog.py now branches on the
#    read dtype) plus the q51/q52 streaming hash-fails (stale hard-coded
#    stream schema, same root cause);
# 2. the 41 highest-value never-driver-checked queries — every genuinely new
#    operator family (alternating-star CC, z-order, stream-stream join,
#    SCD2, fuzzy linkage, BFS, SQ8 ANN, profiling, curation pipeline, ...).
# Eleven never-checked TPC-H-shape composites (q102/q103/q112/q113/q135/
# q136/q143-q147) are deferred to round 4: they compose join/agg operators
# that already have green rows, so they carry the least new signal.
reorder_registry(
    [
        # round-2 errors (events.ts dtype), fixed
        "q12_join_range",
        "q13_join_asof",
        "q25_win_lag_lead",
        "q35_sql_shipping_priority",
        "q53_session_window",
        "q76_timeseries_similarity",
        "q85_variant_json",
        # round-2 streaming hash-fails (stale stream schema), fixed
        "q51_stream_tumbling_window",
        "q52_stream_sliding_window",
        # never driver-checked: scale patterns + sinks
        "q86_salted_skew_agg",
        "q94_time_hierarchy_rollup",
        "q95_pivot",
        "q105_orc_sink_roundtrip",
        # never driver-checked: streaming
        "q111_stream_stream_join",
        "q117_stream_dedup_watermark",
        "q124_stream_update_upsert",
        "q150_stream_corpus_ingest",
        # never driver-checked: analytics / relational patterns
        "q104_weighted_priority_sample",
        "q107_market_share",
        "q108_sessionize_batch",
        "q110_zorder_clustering",
        "q114_histogram",
        "q115_data_profile",
        "q116_table_checksum",
        "q118_scd2_history",
        "q119_fuzzy_join_levenshtein",
        "q120_copurchase_bfs",
        "q123_cascaded_rollup",
        "q125_table_diff",
        "q126_gap_fill_locf",
        "q127_unpivot_measures",
        "q128_iqr_outlier_fences",
        "q129_salted_skew_join",
        "q130_win_distribution",
        "q131_cohort_retention",
        "q132_funnel_analysis",
        "q133_equal_freq_binning",
        "q134_try_arithmetic",
        # never driver-checked: similarity / ML
        "q106_dedup_clusters_altstar",
        "q121_sq8_ann_rerank",
        "q149_kmeans_assign_update",
        # never driver-checked: LLM corpus pipeline
        "q109_corpus_curation",
        "q122_token_pair_lift",
        "q137_decontamination",
        "q138_repetition_filter",
        "q139_pii_redaction",
        "q140_domain_mixing",
        "q141_global_shuffle",
        "q142_chunk_dedup",
        "q148_training_pipeline",
        # slots 51+ (checked only if the driver's cap exceeds 50; else
        # round-4 front-runners): the round-3 sketch/retrieval, graph/
        # quality, and entity-resolution waves — new operator families,
        # highest remaining signal
        "q175_bloom_prefilter_join",
        "q176_bm25_search",
        "q177_last_touch_attribution",
        "q178_cms_frequency_estimate",
        "q179_leakage_safe_split",
        "q180_triangle_count",
        "q181_markov_transitions",
        "q182_referential_integrity",
        "q183_stream_outer_join",
        "q184_entity_resolution",
        "q185_group_cap_sample",
        "q186_media_blob_dedup",
        "q187_compaction_roundtrip",
        "q188_pit_scd2_join",
        "q189_asof_forward_join",
        "q190_session_conversion",
        "q191_hll_sketch_merge",
        "q192_containment_pairs",
        "q193_url_canonical_dedup",
        "q194_distribution_drift",
        "q195_golden_record_merge",
        "q196_order_displacement",
        "q197_late_arrival_rate",
        "q198_data_contract_checks",
        "q199_hybrid_search_rrf",
        "q200_rag_ingest_pipeline",
        "q201_seasonal_anomaly",
        "q202_time_to_convert",
        "q203_pareto_concentration",
        "q204_dead_letter_accounting",
        # round-3 session-2 wave: new operator families (stats inference,
        # alerting, DSIR, PQ, CDC squash, streaming sketch, zone maps,
        # densify, community detection)
        "q258_ks_two_sample",
        "q259_mann_whitney_u",
        "q260_poisson_bootstrap_ci",
        "q261_ab_test_analysis",
        "q262_hysteresis_alert_state",
        "q263_twap_interval_weighted",
        "q264_dsir_importance_select",
        "q265_pq_adc_ann",
        "q266_cdc_net_changes",
        "q267_stream_heavy_hitters",
        "q268_zonemap_file_skipping",
        "q269_date_spine_densify",
        "q270_label_propagation",
        "q271_kmv_theta_set_ops",
        "q272_interpolated_quantiles",
        "q273_boolean_postings_and",
        "q274_rfm_segmentation",
        "q275_bitemporal_asof",
        "q276_stream_hysteresis_alerts",
        "q277_audio_vad_segments",
        "q278_skipgram_pairs",
        "q279_calibration_bins",
        "q280_stream_kmv_distinct",
        "q281_auc_roc",
        "q282_kaplan_meier",
        "q283_seasonal_naive_backtest",
        "q284_k_anonymity_audit",
        "q285_stream_split_router",
        "q286_link_prediction_jaccard",
        "q287_inverse_cdf_sample",
        "q288_sql_pipe_syntax",
        "q289_lateral_topk_join",
        "q290_observed_metrics",
        "q291_arrow_map_bytes",
        # then the TPC-H-shape composites over already-green operator
        # families (least new signal)
        "q102_volume_shipping",
        "q103_waiting_suppliers",
        "q112_large_volume_customers",
        "q113_small_quantity_revenue",
        "q135_waiting_customers",
        "q136_rolling_active_users",
        "q143_order_priority_check",
        "q144_customer_distribution",
        "q145_top_supplier",
        "q146_supplier_variety",
        "q147_margin_by_nation",
    ]
)
