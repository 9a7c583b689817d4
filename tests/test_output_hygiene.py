"""Registry-wide output-encoding hygiene guard.

The q288 post-mortem (SCALE.md) banned round-on-quotient output columns:
`round(x / 10^k, n)` and `round(<float quotient/transcendental>, n)` are
VERSION-fragile against the correctness driver's oracle environment —
they passed both local sweeps on this image's DuckDB and still red-rowed
on the driver. Rounds 8 and 9 migrated every then-uncertified query to
the shared floor-µ recipe (`CAST(floor(expr * 1e6) AS BIGINT)`); what
remains is the frozen set of DRIVER-CERTIFIED legacy sites whose hashes
are pinned (SCALE.md latent-hash ledger — migrating a green row risks a
red row today for a hazard that only fires on a driver-env change) plus
the documented exemptions (q431 cross-implementation tolerance,
q492/q513 bucket-feeding intermediates; q471's former identity
quantization migrated to integer cents in round 10 while unpinned).

This test freezes that set. A NEW query — or an edit to an existing one —
that introduces a round( span containing a division, sqrt, ln, log or exp
fails the suite with instructions to use floor-µ instead. Shrinking the
set (a ledger query migrated on contact per the SCALE.md recipe) is
allowed; growing it is not.
"""

from __future__ import annotations

import inspect
import re

from kinesis_customer_sample_spark.registry import load_registry

# Certified-legacy + documented-exemption queries carrying hazardous
# round( spans as of round 9 (see SCALE.md "latent-hash ledger" and the
# round-9 second-pass migration note). FROZEN: do not add names here —
# new queries must emit floor-µ integers.
_LEGACY_ALLOWED = {
    "q01_pricing_summary", "q04_conditional_case", "q06_join_broadcast_dims",
    "q12_join_range", "q15_agg_groupby_basic", "q18_agg_rollup",
    "q19_agg_cube", "q20_agg_filtered", "q23_agg_global",
    "q25_win_lag_lead", "q26_win_frames", "q35_sql_shipping_priority",
    "q38_fn_math", "q51_stream_tumbling_window", "q57_stream_static_join",
    "q62_tfidf_top_terms", "q64_quality_score", "q68_ngram_jaccard_pairs",
    "q69_minhash_lsh_pairs", "q74_knn_vote", "q75_ivf_probe_search",
    "q76_timeseries_similarity", "q82_parquet_sink_roundtrip",
    "q86_salted_skew_agg", "q94_time_hierarchy_rollup",
    "q97_local_supplier_revenue", "q98_returned_item_report",
    "q102_volume_shipping", "q107_market_share", "q108_sessionize_batch",
    "q109_corpus_curation", "q111_stream_stream_join",
    "q113_small_quantity_revenue", "q114_histogram",
    "q127_unpivot_measures", "q128_iqr_outlier_fences",
    "q129_salted_skew_join", "q138_repetition_filter",
    "q148_training_pipeline", "q152_hard_negative_mining",
    "q153_semantic_dedup", "q156_embedding_outliers",
    "q165_lsh_recall_eval", "q192_containment_pairs",
    "q215_prefix_filter_jaccard", "q223_linear_interpolation",
    "q228_groupwise_ols_trend", "q230_chisq_independence",
    "q238_trimmed_mean", "q249_wilson_intervals",
    "q258_ks_two_sample", "q259_mann_whitney_u",
    "q260_poisson_bootstrap_ci", "q261_ab_test_analysis",
    "q262_hysteresis_alert_state", "q263_twap_interval_weighted",
    "q271_kmv_theta_set_ops", "q272_interpolated_quantiles",
    "q276_stream_hysteresis_alerts", "q279_calibration_bins",
    "q280_stream_kmv_distinct", "q281_auc_roc", "q282_kaplan_meier",
    "q284_k_anonymity_audit", "q286_link_prediction_jaccard",
    "q288_sql_pipe_syntax", "q298_decayed_engagement",
    "q299_cohens_kappa", "q305_stream_minibatch_kmeans",
    "q307_point_in_polygon", "q308_association_rules",
    "q311_embedding_gramian", "q312_deadline_funnel",
    "q322_neyman_stratified_sample", "q323_lag1_autocorrelation",
    # comment-only mention of the banned shape (no round() in code):
    "q473_cluster_validity",
    # bucket-feeding intermediates, outputs already integer (SCALE.md r9):
    "q492_minhash_accuracy_audit", "q513_dedup_ensemble_venn",
    # Round-10 hazard extension (r9 ADVICE): native ratio functions —
    # round(list_cosine_similarity(...)) etc. — are the same quotient
    # hazard with the division hidden inside the engine builtin, so the
    # detector now flags them. The sites below predate the extension and
    # are DRIVER-CERTIFIED (hashes pinned; migrate on contact only per the
    # SCALE.md ledger recipe) — except q431, whose round IS the documented
    # cross-implementation tolerance (Spark vs DuckDB Jaro-Winkler are
    # independent implementations; 1e-6 quantization is the contract).
    "q71_embedding_near_dup", "q72_cosine_topk_brute",
    "q73_ann_lsh_bucketed", "q99_ann_multiprobe_lsh",
    "q121_sq8_ann_rerank", "q199_hybrid_search_rrf",
    "q236_rbo_rank_agreement", "q244_mmr_rerank",
    "q431_jaro_winkler_linkage",
}

_HAZARD = re.compile(
    r"/|sqrt|\bln\s*\(|\blog\s*\(|\bexp\s*\("
    # engine-native ratio/similarity builtins: the quotient is inside the
    # function, so a plain operator scan can't see it (r9 ADVICE)
    r"|cosine|jaccard|jaro|levenshtein|list_distance|list_inner_product",
    re.I,
)


def _round_spans(txt: str):
    """Yield each full round(...) span via paren matching (a flat regex
    cannot see a division nested inside the argument — the exact blind
    spot that let 13 queries slip past the round-8 sweep)."""
    for m in re.finditer(r"\bround\s*\(", txt, re.I):
        i, depth = m.end(), 1
        while i < len(txt) and depth:
            if txt[i] == "(":
                depth += 1
            elif txt[i] == ")":
                depth -= 1
            i += 1
        yield txt[m.start():i]


def test_no_new_round_on_quotient():
    reg = load_registry()
    offenders = {}
    for name, q in reg.items():
        if name in _LEGACY_ALLOWED:
            continue
        spans = []
        for txt in (q.oracle or "", inspect.getsource(q.fn)):
            spans += [
                " ".join(s.split())[:120]
                for s in _round_spans(txt)
                if _HAZARD.search(s)
            ]
        if spans:
            offenders[name] = spans
    assert not offenders, (
        "round-on-quotient outputs are banned (SCALE.md, q288 post-mortem); "
        "emit CAST(floor(expr * 1e6) AS BIGINT) in BOTH dialects instead. "
        f"Offending spans: {offenders}"
    )


def test_legacy_allowlist_only_shrinks():
    """Every allowlisted name must still exist in the registry (a rename
    would silently re-expose the renamed query to the main guard — good —
    but a stale entry here hides what the allowlist actually covers)."""
    reg = load_registry()
    stale = sorted(n for n in _LEGACY_ALLOWED if n not in reg)
    assert not stale, f"stale allowlist entries (renamed/removed?): {stale}"


# Frozen round-10 snapshot of the allowlist (r9 ADVICE: nothing mechanically
# enforced the no-growth rule). The live set must stay a SUBSET of this
# tuple: removing a migrated-on-contact query passes, adding a name fails
# loudly. Extending the snapshot itself is reserved for the one legitimate
# case — a detector broadened to catch previously-invisible hazards whose
# carriers are already driver-certified (how the round-10 batch got here) —
# and must be justified in the commit that does it.
_FROZEN_R10 = (
    "q01_pricing_summary", "q04_conditional_case", "q06_join_broadcast_dims",
    "q102_volume_shipping", "q107_market_share", "q108_sessionize_batch",
    "q109_corpus_curation", "q111_stream_stream_join",
    "q113_small_quantity_revenue", "q114_histogram", "q121_sq8_ann_rerank",
    "q127_unpivot_measures", "q128_iqr_outlier_fences", "q129_salted_skew_join",
    "q12_join_range", "q138_repetition_filter", "q148_training_pipeline",
    "q152_hard_negative_mining", "q153_semantic_dedup",
    "q156_embedding_outliers", "q15_agg_groupby_basic", "q165_lsh_recall_eval",
    "q18_agg_rollup", "q192_containment_pairs", "q199_hybrid_search_rrf",
    "q19_agg_cube", "q20_agg_filtered", "q215_prefix_filter_jaccard",
    "q223_linear_interpolation", "q228_groupwise_ols_trend",
    "q230_chisq_independence", "q236_rbo_rank_agreement", "q238_trimmed_mean",
    "q23_agg_global", "q244_mmr_rerank", "q249_wilson_intervals",
    "q258_ks_two_sample", "q259_mann_whitney_u", "q25_win_lag_lead",
    "q260_poisson_bootstrap_ci", "q261_ab_test_analysis",
    "q262_hysteresis_alert_state", "q263_twap_interval_weighted",
    "q26_win_frames", "q271_kmv_theta_set_ops", "q272_interpolated_quantiles",
    "q276_stream_hysteresis_alerts", "q279_calibration_bins",
    "q280_stream_kmv_distinct", "q281_auc_roc", "q282_kaplan_meier",
    "q284_k_anonymity_audit", "q286_link_prediction_jaccard",
    "q288_sql_pipe_syntax", "q298_decayed_engagement", "q299_cohens_kappa",
    "q305_stream_minibatch_kmeans", "q307_point_in_polygon",
    "q308_association_rules", "q311_embedding_gramian", "q312_deadline_funnel",
    "q322_neyman_stratified_sample", "q323_lag1_autocorrelation",
    "q35_sql_shipping_priority", "q38_fn_math", "q431_jaro_winkler_linkage",
    "q473_cluster_validity", "q492_minhash_accuracy_audit",
    "q513_dedup_ensemble_venn", "q51_stream_tumbling_window",
    "q57_stream_static_join", "q62_tfidf_top_terms", "q64_quality_score",
    "q68_ngram_jaccard_pairs", "q69_minhash_lsh_pairs",
    "q71_embedding_near_dup", "q72_cosine_topk_brute", "q73_ann_lsh_bucketed",
    "q74_knn_vote", "q75_ivf_probe_search", "q76_timeseries_similarity",
    "q82_parquet_sink_roundtrip", "q86_salted_skew_agg",
    "q94_time_hierarchy_rollup", "q97_local_supplier_revenue",
    "q98_returned_item_report", "q99_ann_multiprobe_lsh",
)


def test_legacy_allowlist_never_grows():
    """Mechanical no-growth pin (r9 ADVICE item): the live allowlist must be
    a subset of the frozen round-10 snapshot — removals (ledger queries
    migrated on contact) pass, any addition fails this test by name."""
    added = sorted(_LEGACY_ALLOWED - set(_FROZEN_R10))
    assert not added, (
        "new names added to _LEGACY_ALLOWED — the allowlist only shrinks; "
        f"migrate these to floor-µ instead: {added}"
    )
