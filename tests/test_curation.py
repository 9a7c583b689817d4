"""Plan + invariant tests for the curation wave (q137-q142) and the
rolling-WAU range join (q136). The oracle hash-match lives in
tests/test_oracle.py; these assert the *plan shapes* the 100 TB posture
depends on (broadcasts, no cartesians, partitioned windows, map-only
stages) and the semantic invariants no row-hash can express (permutation
totality, dedup conservation, sample-rate bounds)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kinesis_customer_sample_spark.plans import audit
from kinesis_customer_sample_spark.registry import load_registry

REGISTRY = load_registry()


def run(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir)


def audit_of(spark, sf_dir, name):
    return audit(run(spark, sf_dir, name))


# ---------------------------------------------------------------- plans


def test_decontamination_broadcasts_eval_set(spark, sf_dir):
    facts = audit_of(spark, sf_dir, "q137_decontamination")
    # the eval shingle set must broadcast; train postings must never
    # shuffle into a doc×doc comparison
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 1
    assert not facts.has_cartesian
    assert facts.has_partial_agg


def test_pii_redaction_map_only(spark, sf_dir):
    # regex detect+mask is a pure map: no exchange at all in the plan
    facts = audit_of(spark, sf_dir, "q139_pii_redaction")
    assert facts.n_exchanges == 0
    assert not facts.has_cartesian


def test_domain_mixing_broadcasts_rate_table(spark, sf_dir):
    facts = audit_of(spark, sf_dir, "q140_domain_mixing")
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 1
    assert not facts.has_cartesian


def test_global_shuffle_windows_all_partitioned(spark, sf_dir):
    # the q92 lesson, enforced for the permutation operator: every Window
    # node must carry a partition spec — a global `Window [...], [...]`
    # with an empty partition list serializes the corpus through one task
    df = run(spark, sf_dir, "q141_global_shuffle")
    text = audit(df).text
    for m in re.finditer(r"Arguments: \[[^\]]*row_number[^\]]*\], \[(?P<part>[^\]]*)\],", text):
        assert m.group("part").strip(), f"unpartitioned window in plan:\n{text}"


def test_chunk_dedup_no_cartesian_partial_agg(spark, sf_dir):
    facts = audit_of(spark, sf_dir, "q142_chunk_dedup")
    assert not facts.has_cartesian
    assert facts.has_partial_agg


def test_rolling_wau_no_cartesian(spark, sf_dir):
    # the day-spine range join must be a broadcast nested-loop over the
    # tiny spine (or better), never a CartesianProduct of events×events
    facts = audit_of(spark, sf_dir, "q136_rolling_active_users")
    assert not facts.has_cartesian


# ----------------------------------------------------------- invariants


def test_decontamination_counts_bounded(spark, sf_dir):
    rows = run(spark, sf_dir, "q137_decontamination").collect()
    assert rows, "train split is empty"
    for r in rows:
        assert 0 <= r.n_shared <= r.n_shingles
        assert r.contaminated == (r.n_shared > 0)


def test_repetition_filter_fracs_in_unit_interval(spark, sf_dir):
    rows = run(spark, sf_dir, "q138_repetition_filter").collect()
    assert rows
    for r in rows:
        assert 0 < r.top_tok_frac <= 1.0
        assert 0 <= r.dup_bigram_frac < 1.0
        assert r.n_distinct_bigrams <= r.n_bigrams


def test_pii_redaction_masks_everything(spark, sf_dir):
    df = run(spark, sf_dir, "q139_pii_redaction")
    rows = df.collect()
    assert rows
    for r in rows:
        # the planted email+phone are found, and nothing PII-shaped
        # survives in the redacted text
        assert r.n_emails >= 1 and r.n_phones >= 1
        assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted
        assert "@mail" not in r.redacted
        assert "+1-555-" not in r.redacted


def test_domain_mixing_rates_and_counts_bounded(spark, sf_dir):
    rows = run(spark, sf_dir, "q140_domain_mixing").collect()
    assert rows
    for r in rows:
        assert 0 < r.rate_bp <= 10000
        assert 0 <= r.n_after <= r.n_before
    # a full-rate source keeps everything (rate_bp 10000 → no sampling)
    for r in rows:
        if r.rate_bp == 10000:
            assert r.n_after == r.n_before


def test_global_shuffle_is_total_permutation(spark, sf_dir):
    df = run(spark, sf_dir, "q141_global_shuffle")
    n = df.count()
    stats = df.agg(
        F.countDistinct("global_pos").alias("d"),
        F.min("global_pos").alias("lo"),
        F.max("global_pos").alias("hi"),
    ).collect()[0]
    # positions are exactly 1..N: the permutation is total and gap-free
    assert (stats.d, stats.lo, stats.hi) == (n, 1, n)


def test_chunk_dedup_conserves_distinct_chunks(spark, sf_dir):
    df = run(spark, sf_dir, "q142_chunk_dedup")
    agg = df.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_chunks").alias("total")
    ).collect()[0]
    # exactly one survivor per distinct chunk across the corpus
    from kinesis_customer_sample_spark.queries.text_analysis import _SPARK_TOKS
    from kinesis_customer_sample_spark.catalog import table

    docs = table(spark, sf_dir, "documents").withColumn("toks", F.expr(_SPARK_TOKS))
    distinct_chunks = (
        docs.filter(F.size("toks") >= 1)
        .select(
            F.explode(
                F.expr("sequence(1, (size(toks) + 7) div 8)")
            ).alias("ci"),
            "toks",
        )
        .select(
            F.concat_ws(" ", F.expr("slice(toks, (ci - 1) * 8 + 1, 8)")).alias("chunk")
        )
        .distinct()
        .count()
    )
    assert agg.kept == distinct_chunks
    assert agg.kept <= agg.total


def test_rolling_wau_dominates_daily_active(spark, sf_dir):
    from kinesis_customer_sample_spark.catalog import table

    wau = {r.day: r.wau for r in run(spark, sf_dir, "q136_rolling_active_users").collect()}
    dau = {
        r.day: r.dau
        for r in (
            table(spark, sf_dir, "events")
            .select(
                F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date").alias("day"),
                "user_id",
            )
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias("dau"))
            .collect()
        )
    }
    assert set(wau) == set(dau)
    # a 7-day window can never see fewer distinct users than its last day
    for day, w in wau.items():
        assert w >= dau[day]


def test_training_pipeline_plan(spark, sf_dir):
    """q148 composes five stages into one tree: dims/eval-set/rates/offsets
    all broadcast, no cartesian, partial aggs map-side, and every Window
    carries a partition spec (dedup-keeper, bigram, and packing windows)."""
    df = run(spark, sf_dir, "q148_training_pipeline")
    facts = audit(df)
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 3
    assert not facts.has_cartesian
    assert facts.has_partial_agg
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", facts.text):
        spec = m.group(1)
        # a windowspecdefinition whose first arg is the frame spec (no
        # partition/order columns before it) is an unpartitioned window
        assert not spec.startswith("specifiedwindowframe"), facts.text


def test_training_pipeline_invariants(spark, sf_dir):
    """Every pipeline survivor is a train-bucket dedup keeper; shards are
    packed contiguously from 0 with no budget overrun by any single doc
    boundary (a shard id can exceed budget only via one oversized doc)."""
    from kinesis_customer_sample_spark.queries.curation import _PIPE_BUDGET

    rows = run(spark, sf_dir, "q148_training_pipeline").collect()
    assert rows
    shard_ids = sorted({r.shard_id for r in rows})
    assert shard_ids[0] == 0
    assert shard_ids == list(range(len(shard_ids)))  # contiguous shards
    # survivors are a subset of the standalone stages' keep sets
    keep_q67 = {
        r.keeper_doc_id for r in run(spark, sf_dir, "q67_exact_dedup").collect()
    }
    keep_q138 = {
        r.doc_id for r in run(spark, sf_dir, "q138_repetition_filter").collect() if r.keep
    }
    drop_q137 = {
        r.doc_id
        for r in run(spark, sf_dir, "q137_decontamination").collect()
        if r.contaminated
    }
    for r in rows:
        assert r.doc_id in keep_q67
        assert r.doc_id in keep_q138
        assert r.doc_id not in drop_q137


def test_kmeans_assignment_is_map_side(spark, sf_dir):
    """q149's cluster assignment must be pure map work: no Window node
    (the K-fan-out + per-vector argmin window would shuffle every
    embedding ×K), and the only exchanges are the deliberate round-robin
    input spread and the final 4-group aggregation."""
    facts = audit_of(spark, sf_dir, "q149_kmeans_assign_update")
    assert "Window" not in facts.text
    # allowed exchanges: the deliberate round-robin input spread, the
    # 4-row centroid collect (partial+final global agg), and the final
    # 4-group cluster agg — nothing may shuffle the corpus by key
    assert facts.n_exchanges <= 4
    assert not facts.has_cartesian  # centroid row arrives via broadcast NLJ
    assert facts.join_strategies.get("BroadcastNestedLoopJoin", 0) == 1
    assert facts.has_partial_agg


def test_kmeans_clusters_partition_the_corpus(spark, sf_dir):
    from kinesis_customer_sample_spark.catalog import table

    rows = run(spark, sf_dir, "q149_kmeans_assign_update").collect()
    n_vecs = table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    assert sorted(r.cluster for r in rows) == [0, 1, 2, 3]
    # seed vectors stay with their own centroid (distance 0)
    assert all(r.n_members >= 1 for r in rows)
