"""Round-3 wave: plan audits + the aHash band-recall pigeonhole property.

(Oracle parity for the same queries runs in test_oracle.py automatically —
these tests pin the SHAPE of each plan, which parity cannot see.)
"""

from __future__ import annotations

import random

from kinesis_customer_sample_spark.plans import audit
from kinesis_customer_sample_spark.registry import load_registry

REGISTRY = load_registry()


def audit_of(spark, sf_dir, name: str):
    return audit(REGISTRY[name].fn(spark, sf_dir))


def test_ohlc_is_one_partial_agg(spark, sf_dir):
    # OHLC bars: one hash aggregation, map-side combined; min_by/max_by
    # must not degrade into sort-based first/last (no global sort)
    facts = audit_of(spark, sf_dir, "q205_ohlc_downsample")
    assert facts.has_partial_agg
    assert facts.n_exchanges == 1
    assert "Window" not in facts.text


def test_ewma_single_group_shuffle(spark, sf_dir):
    # one shuffle on user_id; the fold happens inside the aggregate, so no
    # extra exchange or window may appear
    facts = audit_of(spark, sf_dir, "q206_ewma_smoothing")
    assert facts.n_exchanges == 1
    assert "Window" not in facts.text


def test_ngram_dup_rate_no_pair_join(spark, sf_dir):
    # the linear-cost dedup signal: postings⋈DF equi-join only — any
    # cartesian or pair-generation would defeat the point
    facts = audit_of(spark, sf_dir, "q207_ngram_dup_rate")
    assert not facts.has_cartesian
    assert facts.has_partial_agg


def test_key_skew_audit_no_global_sort(spark, sf_dir):
    # percentile() is an aggregate — the audit must not plan a global
    # sort/window over the per-key counts
    facts = audit_of(spark, sf_dir, "q209_key_skew_audit")
    assert "Window" not in facts.text
    assert facts.has_partial_agg


def test_ahash_neardup_banded_topk(spark, sf_dir):
    # candidates come from the band-bucket equi-join (never all-pairs) and
    # the report is TakeOrderedAndProject, not sort-the-world
    facts = audit_of(spark, sf_dir, "q210_media_ahash_neardup")
    assert not facts.has_cartesian
    assert "TakeOrderedAndProject" in facts.text


def test_sequence_match_one_shuffle(spark, sf_dir):
    facts = audit_of(spark, sf_dir, "q212_event_sequence_match")
    assert facts.n_exchanges == 1
    assert "Window" not in facts.text


def test_ahash_band_recall_pigeonhole():
    """A pair within Hamming ≤ 3 of 48 bits MUST collide on at least one of
    the 4 12-bit bands (4 bands, ≤3 flipped bits — pigeonhole). This is the
    recall-1.0 claim of q210's production gate, checked over randomized
    flips with a fixed seed."""
    rng = random.Random(0xA4A5)
    for _ in range(2000):
        h = rng.getrandbits(48)
        n_flips = rng.randint(0, 3)
        flipped = h
        for pos in rng.sample(range(48), n_flips):
            flipped ^= 1 << pos
        bands_equal = [
            ((h >> (12 * b)) & 0xFFF) == ((flipped >> (12 * b)) & 0xFFF)
            for b in range(4)
        ]
        assert any(bands_equal), (hex(h), hex(flipped), n_flips)


def test_min_cost_supplier_broadcasts_dims(spark, sf_dir):
    # Q2 shape: part/supplier/nation/region must broadcast; the only big
    # shuffle is the (part, supp) partial agg — and never a cartesian
    facts = audit_of(spark, sf_dir, "q216_min_cost_supplier")
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 4
    assert not facts.has_cartesian


def test_important_stock_global_threshold_broadcast(spark, sf_dir):
    # Q11 shape: the one-row global total must broadcast into the theta
    # filter (BroadcastNestedLoopJoin over a single row is the decorrelated
    # scalar subquery — cheap by construction), never a shuffled join
    facts = audit_of(spark, sf_dir, "q219_important_stock")
    assert (
        facts.join_strategies.get("BroadcastNestedLoopJoin", 0)
        + facts.join_strategies.get("BroadcastHashJoin", 0)
        >= 1
    )
    assert "SortMergeJoin" not in facts.join_strategies or (
        facts.join_strategies.get("SortMergeJoin", 0) == 0
    )


def test_promo_revenue_pushdown(spark, sf_dir):
    # Q14 shape: the shipdate range must reach the lineitem scan
    facts = audit_of(spark, sf_dir, "q217_promo_revenue")
    assert any("l_shipdate" in f for f in facts.pushed_filters)
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 1


def test_stream_ewma_multibatch_equals_batch(spark, sf_dir):
    """The EWMA recurrence must carry across MICRO-BATCH boundaries: replay
    the events table as three time-ordered files with maxFilesPerTrigger=1
    (three real micro-batches) and check the final per-user value equals
    the single-pass batch fold (q206). This is what the single-file oracle
    run of q213 cannot show — that state survives and composes between
    batches."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.catalog import table
    from kinesis_customer_sample_spark.queries.timeseries_ops import ewma_smoothing
    from kinesis_customer_sample_spark.streaming.replay import run_to_completion
    from kinesis_customer_sample_spark.streaming.stateful import ewma_stream

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    pdf = ev.orderBy("ts", "event_id").toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # ns would write INT64
    with tempfile.TemporaryDirectory() as td:
        n = len(pdf)
        # contiguous time ranges → per-user order is preserved across batches
        for i, lo in enumerate(range(0, n, (n + 2) // 3)):
            pdf.iloc[lo : lo + (n + 2) // 3].to_parquet(
                os.path.join(td, f"part-{i}.parquet"), index=False
            )
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, event_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(td)
        )
        updates = run_to_completion(ewma_stream(stream), output_mode="update")
        final = (
            updates.groupBy("user_id")
            .agg(
                F.max("n_obs").alias("n_obs"),
                F.floor(F.max_by("ewma", "n_obs") * F.lit(1000000.0))
                .cast("bigint")
                .alias("ewma_mu"),
            )
            .toPandas()
            .set_index("user_id")
            .sort_index()
        )
    batch = (
        ewma_smoothing(spark, sf_dir)
        .select("user_id", "n_obs", "ewma_mu")
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (final["n_obs"] == batch["n_obs"]).all()
    assert (final["ewma_mu"] == batch["ewma_mu"]).all()  # bit-exact, not approx


def test_histogram_sketch_shard_invariance(spark, sf_dir):
    """Merging per-shard histograms must give the same quantile report for
    ANY sharding — rerun q211's pipeline with a different (finer) shard key
    and compare to the registered query's output. Split-invariance is the
    sketch's structural claim; this pins it against regression."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.catalog import table
    from kinesis_customer_sample_spark.queries.profiling_ops import (
        _BIN_W,
        _N_BINS,
        _QUANTILES,
        histogram_merge_quantiles,
    )

    ev = table(spark, sf_dir, "events")
    partials = ev.groupBy(
        (F.col("user_id") % 13).alias("shard"),  # different, finer sharding
        F.least(
            F.lit(_N_BINS - 1),
            F.greatest(F.lit(0), F.floor(F.col("value") / _BIN_W).cast("bigint")),
        ).alias("bin"),
    ).agg(F.count(F.lit(1)).alias("c"))
    merged = partials.groupBy("bin").agg(F.sum("c").alias("n"))
    cdf = merged.select(
        "bin",
        F.sum("n").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)).alias("cum_n"),
    ).crossJoin(merged.agg(F.sum("n").alias("total")))
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QUANTILES])).alias("q_bp")
    )
    alt = (
        qs.join(cdf, F.col("cum_n") * 10000 >= F.col("q_bp") * F.col("total"))
        .groupBy("q_bp")
        .agg(
            F.min("bin").alias("est_bin"),
            F.min((F.col("bin") + 1) * _BIN_W).alias("est_upper_edge"),
            F.min("total").alias("total_n"),
        )
        .toPandas()
        .set_index("q_bp")
        .sort_index()
    )
    reg = (
        histogram_merge_quantiles(spark, sf_dir)
        .toPandas()
        .set_index("q_bp")
        .sort_index()
    )
    assert (alt == reg).all().all()


def test_linear_attribution_conserves_credit(spark, sf_dir):
    """Each attributed purchase's credit must sum to exactly 10000 bp
    (floor share + remainder-to-latest) — so the corpus total is exactly
    10000 × |purchases with ≥1 qualifying click|. The conservation law
    that makes fractional attribution auditable."""
    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.catalog import table
    from kinesis_customer_sample_spark.queries.attribution_stats import (
        linear_attribution,
    )

    total_credit = (
        linear_attribution(spark, sf_dir).agg(F.sum("credit_bp")).collect()[0][0]
    )
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts")
    )
    attributed = (
        p.join(
            c,
            (F.col("c_user_id") == F.col("user_id"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .count()
    )
    assert total_credit == 10000 * attributed


def test_bpe_pair_count_is_partial_agg(spark, sf_dir):
    # q221/q226's per-round pair count must combine map-side and take the
    # argmax via TakeOrderedAndProject — the scan-agg-limit shape, never a
    # global sort of the pair table
    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.queries.bpe_ops import _SPARK_PAIRS
    from kinesis_customer_sample_spark.queries.text_analysis import _SPARK_TOKS
    from kinesis_customer_sample_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.expr(_SPARK_TOKS)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split("word", ""))
    )
    top = (
        words.filter(F.size("syms") >= 2)
        .select("freq", F.explode(F.expr(_SPARK_PAIRS)).alias("pair"))
        .groupBy(F.col("pair.l").alias("l"), F.col("pair.r").alias("r"))
        .agg(F.sum("freq").alias("pair_freq"))
        .orderBy(F.desc("pair_freq"), "l", "r")
        .limit(1)
    )
    facts = audit(top)
    assert facts.has_partial_agg
    assert "TakeOrderedAndProject" in facts.text


def test_cusum_reduces_before_fold(spark, sf_dir):
    # q224: the day-level hash-agg is where data reduction happens; the
    # fold adds no window or extra exchange beyond the two grouping steps
    facts = audit_of(spark, sf_dir, "q224_cusum_changepoint")
    assert facts.has_partial_agg
    assert "Window" not in facts.text


def test_ols_is_pure_hash_agg_after_basis_window(spark, sf_dir):
    # q228: sufficient statistics are a hash-agg; the only window is the
    # per-user min-timestamp basis (partitioned — no global window)
    facts = audit_of(spark, sf_dir, "q228_groupwise_ols_trend")
    assert facts.has_partial_agg
    assert "No Partition Defined" not in facts.text


def test_skyline_no_pair_join(spark, sf_dir):
    # q227's sweep must not plan any join at all — dominance is resolved
    # by the partitioned window
    facts = audit_of(spark, sf_dir, "q227_skyline_pareto_front")
    assert not facts.join_strategies
    assert not facts.has_cartesian


def test_attribution_windows_partitioned(spark, sf_dir):
    # q229: credit windows are per-purchase; nothing may run unpartitioned
    facts = audit_of(spark, sf_dir, "q229_linear_attribution")
    assert not facts.has_cartesian
    assert "No Partition Defined" not in facts.text


def test_mad_medians_broadcast_back(spark, sf_dir):
    # q231: the |groups|-row median table must broadcast into the second
    # pass, never shuffle the fact side
    facts = audit_of(spark, sf_dir, "q231_mad_robust_outliers")
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 1
    assert "SortMergeJoin" not in facts.join_strategies


def test_grid_proximity_is_equi_join(spark, sf_dir):
    # q232: candidates must come from the cell equi-join — any
    # BroadcastNestedLoopJoin/cartesian would mean the grid key was lost
    facts = audit_of(spark, sf_dir, "q232_grid_proximity_join")
    assert not facts.has_cartesian
    assert "BroadcastNestedLoopJoin" not in facts.join_strategies
    assert (
        facts.join_strategies.get("BroadcastHashJoin", 0)
        + facts.join_strategies.get("SortMergeJoin", 0)
        + facts.join_strategies.get("ShuffledHashJoin", 0)
        >= 1
    )


def test_bpe_merge_fold_matches_reference(spark):
    """The greedy merge fold (q221/q226's rewrite lambda) must implement
    textbook left-to-right non-overlapping BPE merging. Reference
    implementation in Python; 200 adversarial words (seeded random over a
    2-letter alphabet — maximizes overlap chains like 'aaaa' and 'abab')
    merged with every pair from that alphabet, compared element-wise."""
    import random

    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.queries.bpe_ops import _spark_merge_expr

    def ref_merge(syms, l, r):
        out = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        return out

    rng = random.Random(0xBEEF)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    cases = [(w, l, r) for w in words for l in "ab" for r in "ab"]
    df = spark.createDataFrame(
        [(w, list(w), l, r) for w, l, r in cases],
        "word string, syms array<string>, l string, r string",
    )
    # one job per (l, r) pair: the merge pair is a compile-time literal
    for l in "ab":
        for r in "ab":
            got = {
                row["word"]: row["merged"]
                for row in df.filter((F.col("l") == l) & (F.col("r") == r))
                .withColumn("merged", F.expr(_spark_merge_expr(l, r)))
                .collect()
            }
            for w in words:
                assert got[w] == ref_merge(list(w), l, r), (w, l, r, got[w])


def test_tile_grid_map_only(spark, sf_dir):
    # q242: tile fan-out must stay map-only — only the deliberate
    # round-robin spread before the Python stage may exchange
    facts = audit_of(spark, sf_dir, "q242_media_tile_grid")
    assert facts.n_exchanges <= 1
    assert facts.round_robin_exchanges == facts.n_exchanges


def test_bitmap_distinct_shard_invariance(spark, sf_dir):
    """q253's bitmaps must be invariant to HOW partial words were formed:
    rebuild them with an extra shard key interposed (so partials merge
    across shards) and compare the daily counts — bit_or associativity is
    the structural claim, pinned like q211's histogram invariance."""
    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    alt = (
        ev.groupBy(
            F.col("ts").cast("date").alias("day"),
            (F.col("event_id") % 7).alias("shard"),  # interposed sharding
            F.expr("user_id div 63").alias("word_idx"),
        )
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)))"
            ).alias("bits")
        )
        .groupBy("day", "word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .groupBy("day")
        .agg(F.expr("CAST(sum(bit_count(bits)) AS BIGINT)").alias("n"))
    )
    reg = REGISTRY["q253_bitmap_distinct"].fn(spark, sf_dir).select(
        "day", F.col("n_distinct_users").alias("n")
    )
    assert alt.exceptAll(reg).count() == 0 and reg.exceptAll(alt).count() == 0


def test_zonemap_actually_skips_files(spark, sf_dir):
    """q268's manifest prune must drop real files for the 3-month predicate
    (the layout covers ~7 years in 16 range slices, so ≥ half must skip),
    and the survivors must still cover every matching row (the oracle
    equality proves losslessness; this asserts the SKIPPING)."""
    from kinesis_customer_sample_spark.queries.warehouse_ops import (
        zonemap_pruned_file_count,
    )

    REGISTRY["q268_zonemap_file_skipping"].fn(spark, sf_dir).collect()
    keep, total = zonemap_pruned_file_count(spark, sf_dir)
    assert total >= 8
    assert 0 < keep <= total // 2


def test_label_propagation_stable_on_cliques(spark):
    """On two disjoint triangles LPA must converge to one label per
    triangle (the min member id) within two rounds."""
    from kinesis_customer_sample_spark.queries import graph_quality_ops as g

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)], "a long, b long"
    )
    orig = g._copurchase_edges
    g._copurchase_edges = lambda spark, sf_dir: edges
    try:
        out = {
            (r.part_key, r.community)
            for r in REGISTRY["q270_label_propagation"].fn(spark, "unused").collect()
        }
    finally:
        g._copurchase_edges = orig
    assert out == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}


def test_kmv_sketch_merge_invariance(spark, sf_dir):
    """KMV mergeability: taking the k smallest of per-shard k-smallest
    sets must equal the k smallest of the whole stream — the associativity
    that lets q271's sketches build per-partition and merge upward."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.catalog import table
    from kinesis_customer_sample_spark.queries.sketch_retrieval import (
        _KMV_K,
        _kmv_hash,
    )

    hashes = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .select(F.expr(_kmv_hash("spark")).alias("h"))
    )
    whole = [r.h for r in hashes.orderBy("h").limit(_KMV_K).collect()]
    sharded = hashes.withColumn("shard", F.col("h") % 7)
    per_shard = (
        sharded.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("shard").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= _KMV_K)
        .select("h")
    )
    merged = [r.h for r in per_shard.orderBy("h").limit(_KMV_K).collect()]
    assert whole == merged


def test_stream_hist_quantiles_multibatch_equals_batch(spark, sf_dir):
    """q439's histogram state must MERGE across micro-batch boundaries:
    replay events as three files with maxFilesPerTrigger=1 and check the
    final per-type quantile floors equal the one-shot batch derivation
    (bin-count vectors are associative — three partial folds must land on
    the same histogram)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.catalog import table
    from kinesis_customer_sample_spark.registry import load_registry
    from kinesis_customer_sample_spark.streaming.replay import run_to_completion
    from kinesis_customer_sample_spark.streaming.stateful import (
        hist_quantile_stream,
    )

    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    pdf = ev.orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    with tempfile.TemporaryDirectory() as td:
        n = len(pdf)
        for i, lo in enumerate(range(0, n, (n + 2) // 3)):
            pdf.iloc[lo : lo + (n + 2) // 3].to_parquet(
                os.path.join(td, f"part-{i}.parquet"), index=False
            )
        stream = (
            spark.readStream.schema("event_type string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(td)
        )
        updates = run_to_completion(
            hist_quantile_stream(stream.select("event_type", "value")),
            output_mode="update",
        )
        final = (
            updates.groupBy("event_type")
            .agg(
                F.max("n_obs").alias("n_obs"),
                F.max_by("p50_lo_c", "n_obs").alias("p50_lo_c"),
                F.max_by("p90_lo_c", "n_obs").alias("p90_lo_c"),
                F.max_by("p99_lo_c", "n_obs").alias("p99_lo_c"),
            )
            .toPandas()
            .set_index("event_type")
            .sort_index()
        )
    reg = load_registry()
    batch = (
        reg["q439_stream_histogram_quantiles"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert final.equals(batch)


def test_stream_psi_drift_multibatch_equals_batch(spark, sf_dir):
    """q457's ref/cur histogram state must MERGE across micro-batch
    boundaries AND across the reference split: replay events as three
    time-ordered files with maxFilesPerTrigger=1 (so the split lands
    mid-replay) and check the final per-type bin vectors equal the
    one-shot batch derivation."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from kinesis_customer_sample_spark.catalog import table
    from kinesis_customer_sample_spark.streaming.replay import run_to_completion
    from kinesis_customer_sample_spark.streaming.stateful import (
        PSI_SPLIT_TS,
        psi_drift_stream,
    )

    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    pdf = ev.orderBy("ts").toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    with tempfile.TemporaryDirectory() as td:
        n = len(pdf)
        for i, lo in enumerate(range(0, n, (n + 2) // 3)):
            pdf.iloc[lo : lo + (n + 2) // 3].to_parquet(
                os.path.join(td, f"part-{i}.parquet"), index=False
            )
        stream = (
            spark.readStream.schema("event_type string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(td)
        )
        updates = run_to_completion(psi_drift_stream(stream), output_mode="update")
        final = (
            updates.withColumn("n_tot", F.col("n_ref") + F.col("n_cur"))
            .groupBy("event_type")
            .agg(
                F.max_by("ref_bins", "n_tot").alias("ref_bins"),
                F.max_by("cur_bins", "n_tot").alias("cur_bins"),
            )
            .toPandas()
            .set_index("event_type")
            .sort_index()
        )
    batch = (
        ev.select(
            "event_type",
            F.expr("least(CAST(round(value * 100) AS BIGINT) div 2500, 19)").alias(
                "bin"
            ),
            (F.col("ts") < F.lit(PSI_SPLIT_TS)).cast("int").alias("is_ref"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum("is_ref").alias("ref_c"),
            F.sum(1 - F.col("is_ref")).alias("cur_c"),
        )
        .collect()
    )
    exp = {}
    for r in batch:
        ref, cur = exp.setdefault(r["event_type"], ([0] * 20, [0] * 20))
        ref[r["bin"]] += r["ref_c"]
        cur[r["bin"]] += r["cur_c"]
    for et, (ref, cur) in exp.items():
        assert list(final.loc[et, "ref_bins"]) == ref, et
        assert list(final.loc[et, "cur_bins"]) == cur, et
