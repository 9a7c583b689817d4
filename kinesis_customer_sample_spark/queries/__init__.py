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

# Round-15 driver-walk priority (the driver walks exactly the FIRST 50
# registry entries per round; the first 50 slots are the round's
# verification budget). Slot 1 is q35_sql_shipping_priority -- the r14
# driver hash-FAIL (DECIMAL-vs-DOUBLE rendering drift, fixed this round
# with CAST AS DOUBLE + the Decimal-strict comparator) -- regressions
# always front-load. Slots 2-50 are the stalest-certified rotation band
# (r3/r4: q129..q196), ordered by (last-green-round, registration-age)
# via next_priority.py; this is round 14's pre-validated r15 band
# (SCALE.md) shifted by one slot (q197 drops to slot 51 for r16).
# Regenerate with scripts/next_priority.py.
reorder_registry(
    [
        "q35_sql_shipping_priority",  # 1 REGRESSION
        "q129_salted_skew_join",  # 2 recheck
        "q130_win_distribution",  # 3 recheck
        "q131_cohort_retention",  # 4 recheck
        "q132_funnel_analysis",  # 5 recheck
        "q133_equal_freq_binning",  # 6 recheck
        "q134_try_arithmetic",  # 7 recheck
        "q137_decontamination",  # 8 recheck
        "q138_repetition_filter",  # 9 recheck
        "q139_pii_redaction",  # 10 recheck
        "q140_domain_mixing",  # 11 recheck
        "q141_global_shuffle",  # 12 recheck
        "q142_chunk_dedup",  # 13 recheck
        "q148_training_pipeline",  # 14 recheck
        "q149_kmeans_assign_update",  # 15 recheck
        "q150_stream_corpus_ingest",  # 16 recheck
        "q46_contentops_decode",  # 17 recheck
        "q102_volume_shipping",  # 18 recheck
        "q103_waiting_suppliers",  # 19 recheck
        "q112_large_volume_customers",  # 20 recheck
        "q113_small_quantity_revenue",  # 21 recheck
        "q135_waiting_customers",  # 22 recheck
        "q136_rolling_active_users",  # 23 recheck
        "q143_order_priority_check",  # 24 recheck
        "q144_customer_distribution",  # 25 recheck
        "q145_top_supplier",  # 26 recheck
        "q146_supplier_variety",  # 27 recheck
        "q147_margin_by_nation",  # 28 recheck
        "q175_bloom_prefilter_join",  # 29 recheck
        "q176_bm25_search",  # 30 recheck
        "q177_last_touch_attribution",  # 31 recheck
        "q178_cms_frequency_estimate",  # 32 recheck
        "q179_leakage_safe_split",  # 33 recheck
        "q180_triangle_count",  # 34 recheck
        "q181_markov_transitions",  # 35 recheck
        "q182_referential_integrity",  # 36 recheck
        "q183_stream_outer_join",  # 37 recheck
        "q184_entity_resolution",  # 38 recheck
        "q185_group_cap_sample",  # 39 recheck
        "q186_media_blob_dedup",  # 40 recheck
        "q187_compaction_roundtrip",  # 41 recheck
        "q188_pit_scd2_join",  # 42 recheck
        "q189_asof_forward_join",  # 43 recheck
        "q190_session_conversion",  # 44 recheck
        "q191_hll_sketch_merge",  # 45 recheck
        "q192_containment_pairs",  # 46 recheck
        "q193_url_canonical_dedup",  # 47 recheck
        "q194_distribution_drift",  # 48 recheck
        "q195_golden_record_merge",  # 49 recheck
        "q196_order_displacement",  # 50 recheck  <-- cap
    ]
)
