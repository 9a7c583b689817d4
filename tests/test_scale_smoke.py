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
