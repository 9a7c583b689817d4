"""Retrieval-evaluation and feature-prep operators — round-6 wave
(SURVEY.md §2B): NDCG@k + MRR ranking metrics, leakage-safe out-of-fold
target encoding, and cross-group quantile normalization. With q281 (AUC),
q279/q304 (calibration) and q165 (recall@k) these complete the offline
ranking-eval layer; target encoding and quantile normalization are the
two classic feature transforms whose NAIVE forms leak the label or the
group identity — both implemented in their leakage-safe variants.

Cross-engine determinism:
- NDCG's log2 discounts are the ONLY transcendental inputs, so they are
  computed once in Python and inlined as integer µ-unit literals into
  BOTH dialects — neither engine ever calls log.
- Target encoding keeps the smoothed mean as one integer rational
  (sum_excl·cnt_g + m·sum_g) / (cnt_g·(cnt_excl + m)) in milli-cents;
  products stay under int64 through sf0.1 (documented bound below).
- Quantile normalization averages integer n_chars at equal ranks —
  integer div, no floats anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.functions import tok_hash_expr
from kinesis_customer_sample_spark.queries.text_analysis import (
    _DUCK_TOKS,
    _docs_with_tokens,
)
from kinesis_customer_sample_spark.registry import query

_NDCG_K = 10
_NDCG_N_QUERIES = 8  # vec_id 0..7 are the query batch (q152's constant-batch pattern)

# Integer µ-unit DCG discounts: W[i] = round(1e6 / log2(i + 1)), i = 1..k.
# Computed HERE, inlined as literals into both dialects — the oracle gate
# must never depend on two engines' log implementations agreeing.
_DCG_W = [round(1_000_000 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)]
# Ideal-DCG prefix sums: _IDCG[j] = W[1] + … + W[j]  (j = 0..k)
_IDCG = [0]
for _w in _DCG_W:
    _IDCG.append(_IDCG[-1] + _w)


def _rank_case(col: str) -> str:
    """CASE mapping a 1-based rank to its µ-unit discount (same text in
    both dialects — pure integer literals)."""
    arms = " ".join(
        f"WHEN {col} = {i + 1} THEN {w}" for i, w in enumerate(_DCG_W)
    )
    return f"CASE {arms} ELSE 0 END"


def _idcg_case(col: str) -> str:
    """CASE mapping min(n_rel, k) to the ideal-DCG prefix sum."""
    arms = " ".join(
        f"WHEN {col} >= {_NDCG_K} THEN {_IDCG[_NDCG_K]}"
        if j == _NDCG_K
        else f"WHEN {col} = {j} THEN {_IDCG[j]}"
        for j in range(_NDCG_K, 0, -1)
    )
    return f"CASE {arms} ELSE 0 END"


@query(
    "q341_ndcg_mrr_eval",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel,
             [CAST(round(x * 1000) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings WHERE vec_id < {_NDCG_N_QUERIES}
    ),
    corpus AS (
      SELECT vec_id, label,
             [CAST(round(x * 1000) AS BIGINT) FOR x IN embedding] AS cv
      FROM embeddings WHERE vec_id >= {_NDCG_N_QUERIES}
    ),
    nrel AS (
      SELECT q.qid, count(*)::BIGINT AS n_rel
      FROM q JOIN corpus c ON c.label = q.qlabel
      GROUP BY q.qid
    ),
    scored AS (
      SELECT q.qid, q.qlabel, c.vec_id, c.label,
             list_sum([qv[i + 1] * cv[i + 1] FOR i IN range(64)]) AS s
      FROM q CROSS JOIN corpus c
    ),
    ranked AS (
      SELECT qid, qlabel, label,
             row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS r
      FROM scored
    ),
    top AS (SELECT * FROM ranked WHERE r <= {_NDCG_K}),
    perq AS (
      SELECT qid, any_value(qlabel) AS qlabel,
             sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)::BIGINT AS n_hits,
             sum(CASE WHEN label = qlabel
                      THEN {_rank_case("r")} ELSE 0 END)::BIGINT AS dcg_mu,
             coalesce(min(CASE WHEN label = qlabel THEN r END), 0)::BIGINT
               AS first_rel_rank
      FROM top GROUP BY qid
    )
    SELECT p.qid::BIGINT AS qid,
           p.qlabel::BIGINT AS qlabel,
           n.n_rel,
           p.n_hits,
           p.dcg_mu,
           ({_idcg_case("least(n.n_rel, " + str(_NDCG_K) + ")")})::BIGINT AS idcg_mu,
           (p.dcg_mu * 1000000
                 // ({_idcg_case("least(n.n_rel, " + str(_NDCG_K) + ")")}))::BIGINT
             AS ndcg_mu,
           p.first_rel_rank,
           (CASE WHEN p.first_rel_rank = 0 THEN 0
                 ELSE 1000000 // p.first_rel_rank END)::BIGINT AS rr_mu
    FROM perq p JOIN nrel n ON n.qid = p.qid
    """,
    tags=("ml-eval", "ndcg", "mrr", "ranking", "retrieval"),
)
def ndcg_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 and MRR for a constant query batch against the embedding
    corpus — the offline ranking-eval pair every retrieval stack reports
    alongside recall (q165) and AUC (q281). Relevance is binary label
    match; scores are exact integer dot products of milli-quantized
    vectors; the log2 position discounts are integer µ-unit LITERALS
    inlined into both dialects, so no engine evaluates a logarithm.

    Scale posture (100 TB): the query side is a constant-size broadcast
    (8 vectors — q152's constant-batch shape), so the scored relation is
    corpus-linear. Top-k selection is TWO-PHASE: a partition-local top-10
    per (query, shuffle partition) first, then the global rank window
    runs over ≤ queries·partitions·k survivor rows — never a k-partition
    window over the full scored relation (8 hot partitions of N rows is
    exactly the skew shape the two-phase select exists to avoid)."""
    emb = table(spark, sf_dir, "embeddings")
    milli = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))"
    q = (
        emb.filter(F.col("vec_id") < _NDCG_N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.expr(milli).alias("qv"),
        )
    )
    corpus = emb.filter(F.col("vec_id") >= _NDCG_N_QUERIES).select(
        "vec_id", "label", F.expr(milli).alias("cv")
    )
    n_rel = (
        corpus.join(F.broadcast(q.select("qid", "qlabel")), F.col("label") == F.col("qlabel"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    )
    dot = "aggregate(zip_with(qv, cv, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "qid", "qlabel", "vec_id", "label", F.expr(dot).alias("s")
    )
    # two-phase top-k: local top-10 within each (qid, physical partition)
    # is a superset of the global top-10 per qid for ANY row placement
    local = (
        scored.withColumn("pid", F.spark_partition_id())
        .withColumn(
            "lr",
            F.row_number().over(
                W.partitionBy("qid", "pid").orderBy(F.col("s").desc(), "vec_id")
            ),
        )
        .filter(F.col("lr") <= _NDCG_K)
    )
    top = (
        local.withColumn(
            "r",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("s").desc(), "vec_id")
            ),
        )
        .filter(F.col("r") <= _NDCG_K)
    )
    rel = F.col("label") == F.col("qlabel")
    perq = top.groupBy("qid").agg(
        F.first("qlabel").alias("qlabel"),
        F.sum(F.when(rel, 1).otherwise(0)).cast("bigint").alias("n_hits"),
        F.sum(F.when(rel, F.expr(_rank_case("r"))).otherwise(0))
        .cast("bigint")
        .alias("dcg_mu"),
        F.coalesce(F.min(F.when(rel, F.col("r"))), F.lit(0))
        .cast("bigint")
        .alias("first_rel_rank"),
    )
    idcg = F.expr(_idcg_case(f"least(n_rel, {_NDCG_K})")).cast("bigint")
    return (
        perq.join(F.broadcast(n_rel), "qid")
        .select(
            F.col("qid").cast("bigint").alias("qid"),
            F.col("qlabel").cast("bigint").alias("qlabel"),
            "n_rel",
            "n_hits",
            "dcg_mu",
            idcg.alias("idcg_mu"),
            # pure integer ratio (both sides integers): dcg·10⁶ div idcg —
            # no float quotient, no round (SCALE.md ban)
            F.expr(
                "CAST(dcg_mu * 1000000 div "
                f"({_idcg_case('least(n_rel, ' + str(_NDCG_K) + ')')}) AS BIGINT)"
            ).alias("ndcg_mu"),
            "first_rel_rank",
            F.when(F.col("first_rel_rank") == 0, F.lit(0))
            .otherwise(F.expr("1000000 div first_rel_rank"))
            .cast("bigint")
            .alias("rr_mu"),
        )
    )


_TE_FOLDS = 5
_TE_SMOOTH_M = 20  # pseudo-count weight of the global prior


@query(
    "q342_target_encoding_oof",
    oracle=f"""
    WITH base AS (
      SELECT o.o_orderkey % {_TE_FOLDS} AS fold,
             c.c_mktsegment AS segment,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    per_fold AS (
      SELECT segment, fold, count(*)::BIGINT AS cnt_f, sum(cents)::BIGINT AS sum_f
      FROM base GROUP BY segment, fold
    ),
    per_seg AS (
      SELECT segment, sum(cnt_f)::BIGINT AS cnt_s, sum(sum_f)::BIGINT AS sum_s
      FROM per_fold GROUP BY segment
    ),
    tot AS (
      SELECT sum(cnt_s)::BIGINT AS cnt_g, sum(sum_s)::BIGINT AS sum_g FROM per_seg
    )
    SELECT f.segment,
           f.fold::BIGINT AS fold,
           f.cnt_f AS n_fold,
           ((((s.sum_s - f.sum_f)::HUGEINT * g.cnt_g
              + {_TE_SMOOTH_M} * g.sum_g::HUGEINT) * 1000)
            // (g.cnt_g::HUGEINT * ((s.cnt_s - f.cnt_f) + {_TE_SMOOTH_M})))::BIGINT
             AS enc_millicents
    FROM per_fold f
    JOIN per_seg s ON s.segment = f.segment
    CROSS JOIN tot g
    """,
    tags=("ml-prep", "target-encoding", "leakage-safe", "feature-store"),
)
def target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding — the leakage-safe form of the classic
    categorical feature: each (segment, fold) cell's encoding is the
    smoothed mean order value computed WITHOUT that fold's own rows
    (encode-time rows never see their own target), shrunk toward the
    global mean with m=20 pseudo-counts. The smoothed mean
    (sum_excl + m·mean_g)/(cnt_excl + m) is kept as ONE integer rational
    (sum_excl·cnt_g + m·sum_g)·1000 / (cnt_g·(cnt_excl + m)) in
    milli-cents — no float division anywhere. The numerator product is
    ~3·10²⁰ at sf0.1 (sum_excl ≈ 2.25e12 cents × cnt_g ≈ 1.5e5 × 1000),
    past int64, so both engines evaluate the rational in 128-bit-class
    integers: Spark as DECIMAL(38,0) (exact to 10³⁸, good past sf 10⁶),
    DuckDB as HUGEINT. `div` on decimals and `//` on hugeints both
    truncate toward zero; every quantity is positive, so the results
    are the identical floor.

    Scale posture (100 TB): one fact-dim hash join, then two cascaded
    hash aggs whose outputs are (segments×folds)- and segment-sized; the
    global totals are a 1-row broadcast. Folds come from a deterministic
    key hash, so the encoding is reproducible row-for-row."""
    o = table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % _TE_FOLDS).alias("fold"),
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    base = o.join(c, "o_custkey")
    per_fold = base.groupBy("segment", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_f"),
        F.sum("cents").cast("bigint").alias("sum_f"),
    )
    per_seg = per_fold.groupBy("segment").agg(
        F.sum("cnt_f").cast("bigint").alias("cnt_s"),
        F.sum("sum_f").cast("bigint").alias("sum_s"),
    )
    glob = per_seg.agg(
        F.sum("cnt_s").cast("bigint").alias("cnt_g"),
        F.sum("sum_s").cast("bigint").alias("sum_g"),
    )
    return (
        per_fold.join(per_seg, "segment")
        .crossJoin(F.broadcast(glob))
        .select(
            "segment",
            F.col("fold").cast("bigint").alias("fold"),
            F.col("cnt_f").alias("n_fold"),
            F.expr(
                f"(CAST(sum_s - sum_f AS DECIMAL(38,0)) * cnt_g "
                f"+ {_TE_SMOOTH_M} * CAST(sum_g AS DECIMAL(38,0))) * 1000 "
                f"div (CAST(cnt_g AS DECIMAL(38,0)) * ((cnt_s - cnt_f) + {_TE_SMOOTH_M}))"
            )
            .cast("bigint")
            .alias("enc_millicents"),
        )
    )


@query(
    "q349_quantile_normalization",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r
      FROM documents
    ),
    ref AS (
      SELECT r, sum(n_chars)::BIGINT AS sum_chars, count(*)::BIGINT AS n_srcs
      FROM ranked GROUP BY r
    )
    SELECT k.source, k.r::BIGINT AS r, k.n_chars,
           (ref.sum_chars * 1000 // ref.n_srcs)::BIGINT AS norm_millichars
    FROM ranked k JOIN ref ON ref.r = k.r
    """,
    tags=("ml-prep", "quantile-normalization", "window"),
)
def quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-group quantile normalization (the bioinformatics/feature-prep
    standard): within each source, rank documents by n_chars; the
    normalized value at rank r is the mean across sources of the r-th
    order statistic, so every source ends up with an identical value
    distribution while each document keeps its within-source rank. The
    fixture's equal group sizes make the rank-mean form exact; unequal
    groups would interpolate to a common grid first (documented
    restriction, same family as q272's interpolated quantiles).

    Scale posture (100 TB): the rank window is PARTITIONED by source
    (never global); the reference distribution is a rank-keyed hash agg
    of group-count size; the re-join is rank-keyed. Integer n_chars and
    integer div keep both engines bit-identical."""
    d = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    ranked = d.withColumn(
        "r",
        F.row_number().over(W.partitionBy("source").orderBy("n_chars", "doc_id")),
    )
    ref = ranked.groupBy("r").agg(
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_srcs"),
    )
    return (
        ranked.join(ref, "r")
        .select(
            "source",
            F.col("r").cast("bigint").alias("r"),
            "n_chars",
            F.expr("sum_chars * 1000 div n_srcs").cast("bigint").alias("norm_millichars"),
        )
    )


# Brier/calibration synthetic model: deterministic mixed-hash "score" in
# basis points, shifted upward for true positives so the reliability
# curve has signal at fixture scale
_BRIER_MIX = 2_654_435_761
_BRIER_P = 1_000_000_007


@query(
    "q378_brier_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id,
             (label % 2)::BIGINT AS y,
             least(9999, ((vec_id * {_BRIER_MIX}) % {_BRIER_P}) % 7000
                          + (label % 2) * 2500)::BIGINT AS p_bp
      FROM embeddings
    ),
    binned AS (
      SELECT (p_bp // 1000)::BIGINT AS bin, y, p_bp,
             (p_bp - y * 10000) * (p_bp - y * 10000) AS sq
      FROM scored
    )
    SELECT bin,
           count(*)::BIGINT                        AS n,
           (sum(p_bp) // count(*))::BIGINT         AS mean_p_bp,
           (sum(y) * 10000 // count(*))::BIGINT    AS frac_pos_bp,
           abs(sum(p_bp) // count(*)
               - sum(y) * 10000 // count(*))::BIGINT AS calib_gap_bp,
           (sum(sq) // count(*))::BIGINT           AS brier_e8
    FROM binned GROUP BY 1
    """,
    tags=("eval", "calibration", "brier", "ml-metrics"),
)
def brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + reliability (calibration) bins — the probabilistic-
    model eval next to AUC (q281) and NDCG (q341): predictions in integer
    basis points are binned by decile, and each bin reports predicted
    mean vs observed positive rate (their gap is the reliability-diagram
    deviation) plus the per-bin Brier contribution (p − y)², exact in
    integer bp² (e-8 units). The synthetic model is a deterministic
    mixed hash shifted by the true label, so the curve has signal and
    both engines derive identical predictions.

    Scale posture (100 TB): pure map to (bin, y, p) then ONE hash agg to
    the 10-row bin grid; every metric folds into the same agg — no
    second pass, no window, no join."""
    scored = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.least(
            F.lit(9999),
            ((F.col("vec_id") * _BRIER_MIX) % _BRIER_P) % 7000
            + (F.col("label") % 2) * 2500,
        ).cast("bigint").alias("p_bp"),
    )
    binned = scored.select(
        F.expr("p_bp div 1000").cast("bigint").alias("bin"),
        "y",
        "p_bp",
        ((F.col("p_bp") - F.col("y") * 10000) * (F.col("p_bp") - F.col("y") * 10000)).alias("sq"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(p_bp) div count(1)").cast("bigint").alias("mean_p_bp"),
        F.expr("sum(y) * 10000 div count(1)").cast("bigint").alias("frac_pos_bp"),
        F.expr(
            "abs(sum(p_bp) div count(1) - sum(y) * 10000 div count(1))"
        ).cast("bigint").alias("calib_gap_bp"),
        F.expr("sum(sq) div count(1)").cast("bigint").alias("brier_e8"),
    )


# feature-hashing dials: dimension and the signed-hash split point
_FH_DIM = 64

# duck-dialect mirror of the portable token hash (the q151 discipline:
# one definition per dialect, textually adjacent)
from kinesis_customer_sample_spark.functions.porthash import (  # noqa: E402
    tok_hash_expr as _th,
)

_DUCK_TOK_HASH = _th("tok", dialect="duckdb")


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_customer_sample_spark.queries.text_analysis import (
        _docs_with_tokens,
    )

    return _docs_with_tokens(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("tok")
    )


@query(
    "q381_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             ({_DUCK_TOK_HASH}) % {_FH_DIM} AS bucket,
             CASE WHEN (({_DUCK_TOK_HASH}) // {_FH_DIM}) % 2 = 0
                  THEN 1 ELSE -1 END AS sign
      FROM tok
    ),
    vec AS (
      SELECT doc_id, bucket, sum(sign)::BIGINT AS v
      FROM hashed GROUP BY 1, 2
    )
    SELECT bucket,
           count(*)::BIGINT                          AS n_docs_touching,
           sum(abs(v))::BIGINT                       AS l1_mass,
           (sum(v * v) % 1000000007)::BIGINT         AS checksum_modp
    FROM vec GROUP BY bucket
    """,
    tags=("llm", "feature-hashing", "training-prep", "sparse"),
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the "hashing trick", Weinberger et al.) — the
    fixed-dimension sparse featurizer that needs NO vocabulary table:
    each token hashes to one of {_FH_DIM} buckets with a ±1 sign drawn
    from an independent hash bit (the signed variant that makes the
    estimator unbiased under collisions). The per-document sparse vector
    is the signed count per bucket; the output audits the bucket-level
    mass distribution and a mod-P checksum of the squared values.

    Scale posture (100 TB): bucket/sign are pure expressions on the
    portable token hash — no dictionary join, which is the entire point
    of the trick at web scale; one hash agg to (doc × bucket), one to
    the {_FH_DIM}-row bucket grid. Vocabulary growth costs nothing."""
    tok = _docs_tokens(spark, sf_dir)
    h = tok_hash_expr("tok", dialect="spark")
    hashed = tok.select(
        "doc_id",
        F.expr(f"({h}) % {_FH_DIM}").alias("bucket"),
        F.expr(
            f"CASE WHEN (({h}) div {_FH_DIM}) % 2 = 0 THEN 1 ELSE -1 END"
        ).alias("sign"),
    )
    vec = hashed.groupBy("doc_id", "bucket").agg(F.sum("sign").alias("v"))
    return vec.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs_touching"),
        F.sum(F.abs(F.col("v"))).alias("l1_mass"),
        (F.sum(F.col("v") * F.col("v")) % 1_000_000_007)
        .cast("bigint")
        .alias("checksum_modp"),
    )


# forecast-eval dials: trailing window width in days, pinball quantiles in
# basis points, conformal calibration cut and miscoverage level
_FC_TRAIL = 7
_PINBALL_Q_BP = (5_000, 9_000)
_CONF_CAL_DAYS = 20
_CONF_ALPHA_BP = 1_000  # 90% target coverage


def _daily_forecast_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared q382/q383 front end: per (event_type × day) actual daily
    cents plus the trailing-{_FC_TRAIL}-day-mean forecast (known at day
    start — the window ends at -1). Grid-sized everywhere."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_FC_TRAIL, -1)
    )
    return daily.select(
        "event_type",
        "day",
        "cents",
        F.count(F.lit(1)).over(w).alias("n_trail"),
        F.expr(
            f"sum(cents) OVER (PARTITION BY event_type ORDER BY day "
            f"ROWS BETWEEN {_FC_TRAIL} PRECEDING AND 1 PRECEDING) "
            f"div count(1) OVER (PARTITION BY event_type ORDER BY day "
            f"ROWS BETWEEN {_FC_TRAIL} PRECEDING AND 1 PRECEDING)"
        ).alias("fcast"),
    ).filter(F.col("n_trail") == _FC_TRAIL)


_DUCK_DAILY_GRID = f"""
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT event_type, day, cents,
             count(*) OVER w AS n_trail,
             (sum(cents) OVER w // count(*) OVER w) AS fcast
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_FC_TRAIL} PRECEDING AND 1 PRECEDING)
    ),
    ready AS (SELECT * FROM grid WHERE n_trail = {_FC_TRAIL})
"""


@query(
    "q382_pinball_loss_eval",
    oracle=f"""
    WITH {_DUCK_DAILY_GRID},
    tall AS (
      SELECT event_type, day, cents, fcast, q_bp
      FROM ready CROSS JOIN (VALUES ({_PINBALL_Q_BP[0]}), ({_PINBALL_Q_BP[1]}))
        AS q(q_bp)
    )
    SELECT event_type, q_bp::BIGINT AS q_bp,
           count(*)::BIGINT AS n_days,
           (sum(greatest(q_bp * (cents - fcast),
                         (q_bp - 10000) * (cents - fcast))) // 10000)::BIGINT
             AS pinball_sum_cents,
           (sum(abs(cents - fcast)) // count(*))::BIGINT AS mae_cents
    FROM tall GROUP BY 1, 2
    """,
    tags=("eval", "forecast", "pinball", "quantile-loss"),
)
def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss backtest — the forecast-eval metric for
    asymmetric cost: L_q(y, ŷ) = max(q·(y−ŷ), (q−1)·(y−ŷ)), evaluated
    at q = 0.5 and 0.9 against a trailing-{_FC_TRAIL}-day-mean daily
    forecast. Everything is integer: quantiles in basis points, losses
    summed before one final div — exact cross-engine. MAE rides along
    for reference (pinball at q=0.5 is MAE/2, a free sanity identity).

    Scale posture (100 TB): actuals reduce to the (series × day) grid in
    one hash agg; the forecast window and the loss both run on grid
    rows. Constant quantile fan-out (×2) is map-side."""
    grid = _daily_forecast_grid(spark, sf_dir)
    qs = F.broadcast(
        grid.sparkSession.createDataFrame(
            [(q,) for q in _PINBALL_Q_BP], "q_bp bigint"
        )
    )
    tall = grid.crossJoin(qs)
    diff = F.col("cents") - F.col("fcast")
    return tall.groupBy("event_type", "q_bp").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr(
            "sum(greatest(q_bp * (cents - fcast), "
            "(q_bp - 10000) * (cents - fcast))) div 10000"
        ).cast("bigint").alias("pinball_sum_cents"),
        F.expr("sum(abs(cents - fcast)) div count(1)")
        .cast("bigint")
        .alias("mae_cents"),
    )


@query(
    "q383_conformal_intervals",
    oracle=f"""
    WITH {_DUCK_DAILY_GRID},
    anchored AS (
      SELECT r.*,
             (SELECT min(day) FROM ready) AS d0
      FROM ready r
    ),
    split AS (
      SELECT event_type, day, abs(cents - fcast) AS resid,
             (day < d0 + INTERVAL {_CONF_CAL_DAYS} DAY) AS is_cal
      FROM anchored
    ),
    cal AS (
      SELECT event_type, resid,
             row_number() OVER (PARTITION BY event_type ORDER BY resid) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_cal
      FROM split WHERE is_cal
    ),
    qhat AS (
      SELECT event_type, n_cal::BIGINT AS n_cal, resid::BIGINT AS qhat
      FROM cal
      WHERE rn = least(n_cal,
                       CAST(ceil((n_cal + 1) * (10000 - {_CONF_ALPHA_BP}) / 10000.0)
                            AS BIGINT))
    )
    SELECT s.event_type, q.n_cal, q.qhat,
           count(*)::BIGINT AS n_test,
           (count(*) FILTER (s.resid <= q.qhat) * 10000 // count(*))::BIGINT
             AS coverage_bp
    FROM split s JOIN qhat q USING (event_type)
    WHERE NOT s.is_cal
    GROUP BY 1, 2, 3
    """,
    tags=("eval", "forecast", "conformal", "uncertainty"),
)
def conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction — the distribution-free uncertainty
    wrapper: calibrate the residual quantile q̂ at rank
    ⌈(n+1)(1−α)⌉ on the first {_CONF_CAL_DAYS} days, then audit the
    guaranteed ≥(1−α) coverage of ŷ ± q̂ on the held-out days. The rank
    selection is exact-disc (the q368 discipline) so q̂ is an integer
    from the data, and coverage lands in basis points.

    Scale posture (100 TB): everything after the daily hash agg runs on
    the (series × day) grid; the calibration window is a partitioned
    rank window over ≤{_CONF_CAL_DAYS} rows per series; q̂ broadcasts
    back to the test slice."""
    grid = _daily_forecast_grid(spark, sf_dir)
    d0 = F.broadcast(grid.agg(F.min("day").alias("d0")))
    split = (
        grid.crossJoin(d0)
        .select(
            "event_type",
            "day",
            F.abs(F.col("cents") - F.col("fcast")).alias("resid"),
            (F.col("day") < F.date_add(F.col("d0"), _CONF_CAL_DAYS)).alias("is_cal"),
        )
    )
    wcal = W.partitionBy("event_type")
    cal = split.filter("is_cal").select(
        "event_type",
        "resid",
        F.row_number().over(wcal.orderBy("resid")).alias("rn"),
        F.count(F.lit(1)).over(wcal).alias("n_cal"),
    )
    qhat = cal.filter(
        F.col("rn")
        == F.least(
            F.col("n_cal"),
            F.ceil(
                (F.col("n_cal") + 1) * (10000 - _CONF_ALPHA_BP) / F.lit(10000.0)
            ).cast("bigint"),
        )
    ).select(
        "event_type", F.col("n_cal").cast("bigint"), F.col("resid").alias("qhat")
    )
    return (
        split.filter(~F.col("is_cal"))
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "qhat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.expr(
                "count_if(resid <= qhat) * 10000 div count(1)"
            ).cast("bigint").alias("coverage_bp"),
        )
    )


# q461: budget share (exact rational 2/5 of the corpus token total) and
# the quality-weight definition (English-doc count + 1 per source)
_WF_B_NUM, _WF_B_DEN = 2, 5


@query(
    "q461_source_mix_waterfill",
    oracle=f"""
    WITH docs AS (
      SELECT source, lang, len({_DUCK_TOKS}) AS n_toks FROM documents
    ),
    src AS (
      SELECT source,
             sum(n_toks)::BIGINT AS cap,
             (count(*) FILTER (WHERE lang = 'en') + 1)::BIGINT AS w
      FROM docs GROUP BY source
    ),
    tot AS (
      SELECT sum(cap)::BIGINT AS t, sum(w)::BIGINT AS wt,
             (({_WF_B_NUM} * sum(cap)) // {_WF_B_DEN})::BIGINT AS b
      FROM src
    ),
    ordered AS (
      SELECT s.source, s.cap, s.w, t.b, t.wt,
             coalesce(sum(s.cap) OVER (
               ORDER BY CAST(s.cap AS DOUBLE) / s.w, s.source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cumcap,
             coalesce(sum(s.w) OVER (
               ORDER BY CAST(s.cap AS DOUBLE) / s.w, s.source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cumw
      FROM src s CROSS JOIN tot t
    ),
    flagged AS (
      SELECT *,
             CASE WHEN cap * (wt - cumw) <= (b - cumcap) * w
                  THEN 1 ELSE 0 END AS pred
      FROM ordered
    ),
    capped AS (
      SELECT *,
             min(pred) OVER (
               ORDER BY CAST(cap AS DOUBLE) / w, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS is_capped
      FROM flagged
    ),
    waterline AS (
      SELECT (SELECT b FROM tot) - sum(CASE WHEN is_capped = 1 THEN cap ELSE 0 END)
               AS b_k,
             (SELECT wt FROM tot) - sum(CASE WHEN is_capped = 1 THEN w ELSE 0 END)
               AS w_k
      FROM capped
    )
    SELECT c.source, c.cap AS cap_tokens, c.w AS weight,
           c.is_capped::BIGINT AS is_capped,
           CASE WHEN c.is_capped = 1 THEN c.cap
                ELSE (wl.b_k * c.w) // wl.w_k END::BIGINT AS alloc_tokens
    FROM capped c CROSS JOIN waterline wl
    ORDER BY c.source
    """,
    tags=("training-prep", "data-mixing", "waterfill", "allocator"),
)
def source_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix waterfilling allocator: distribute a token budget
    B = {n}/{d} of the corpus across sources proportionally to a
    quality weight (English-doc count + 1), capped by each source's
    available tokens — the exact solver for max Σ alloc s.t.
    alloc_s ≤ cap_s, alloc_s ∝ w_s among uncapped sources. Solved
    CLOSED-FORM, not iteratively: sort sources by cap/w (the ratio at
    which each source saturates), find the capped prefix with the
    integer predicate cap·W_rem ≤ B_rem·w evaluated against prefix
    sums, and give every uncapped source (B_k·w) div W_k — the
    data-mixing step every multi-source pretraining pipeline runs.

    Determinism: caps/weights/budget are integers; the saturation
    order uses one IEEE division with a source tie-break; the capped
    boundary is an integer predicate under a running min; allocations
    are integer floor divisions.

    Scale: one token hash-agg to the |sources| grid; everything after
    (sort, prefix sums, waterline) is algebra on that broadcast-sized
    grid — the allocator output then drives a map-side weighted
    sampler (q100/q322) over the corpus."""
    docs = _docs_with_tokens(spark, sf_dir).select(
        "source", "lang", F.expr("size(toks)").alias("n_toks")
    )
    src = docs.groupBy("source").agg(
        F.sum("n_toks").alias("cap"),
        (F.count(F.when(F.col("lang") == "en", 1)) + 1).alias("w"),
    )
    tot = src.agg(
        F.sum("cap").alias("t"),
        F.sum("w").alias("wt"),
        F.expr(f"({_WF_B_NUM} * sum(cap)) div {_WF_B_DEN}").alias("b"),
    )
    order = [(F.col("cap").cast("double") / F.col("w")), F.col("source")]
    w_pre = W.orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    w_cur = W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("cumcap", F.coalesce(F.sum("cap").over(w_pre), F.lit(0)))
        .withColumn("cumw", F.coalesce(F.sum("w").over(w_pre), F.lit(0)))
        .withColumn(
            "pred",
            F.expr(
                "CASE WHEN cap * (wt - cumw) <= (b - cumcap) * w "
                "THEN 1 ELSE 0 END"
            ),
        )
        .withColumn("is_capped", F.min("pred").over(w_cur))
    )
    waterline = flagged.agg(
        (F.first("b") - F.sum(F.expr("CASE WHEN is_capped = 1 THEN cap ELSE 0 END")))
        .alias("b_k"),
        (F.first("wt") - F.sum(F.expr("CASE WHEN is_capped = 1 THEN w ELSE 0 END")))
        .alias("w_k"),
    )
    return (
        flagged.crossJoin(F.broadcast(waterline))
        .select(
            "source",
            F.col("cap").alias("cap_tokens"),
            F.col("w").alias("weight"),
            F.col("is_capped").cast("long").alias("is_capped"),
            F.expr(
                "CAST(CASE WHEN is_capped = 1 THEN cap "
                "ELSE (b_k * w) div w_k END AS BIGINT)"
            ).alias("alloc_tokens"),
        )
        .orderBy("source")
    )


# ---- q519: Murphy decomposition of the Brier score -----------------------------


@query(
    "q519_brier_murphy_decomposition",
    oracle=f"""
    WITH scored AS (
      SELECT (label % 2)::BIGINT AS y,
             least(9999, ((vec_id * {_BRIER_MIX}) % {_BRIER_P}) % 7000
                          + (label % 2) * 2500)::BIGINT AS p_bp
      FROM embeddings
    ),
    bins AS (
      SELECT (p_bp // 1000)::BIGINT AS bin,
             count(*)::BIGINT AS n_k,
             sum(p_bp)::BIGINT AS sp,
             sum(p_bp::HUGEINT * p_bp) AS spp,
             sum(y)::BIGINT AS sy,
             sum(CASE WHEN y = 1 THEN p_bp ELSE 0 END)::BIGINT AS spy
      FROM scored GROUP BY 1
    ),
    tot AS (
      SELECT sum(n_k)::BIGINT AS n, sum(sy)::BIGINT AS yy,
             sum(spp) AS spp_tot, sum(spy)::BIGINT AS spy_tot
      FROM bins
    )
    SELECT t.n,
           CAST(floor((CAST(t.spp_tot AS DOUBLE) - 20000.0 * t.spy_tot
                  + 100000000.0 * t.yy) / t.n / 1e8 * 1e6) AS BIGINT) AS brier_mu,
           CAST(floor((SELECT sum((CAST(b.sp AS DOUBLE) - 10000.0 * b.sy)
                             * (CAST(b.sp AS DOUBLE) - 10000.0 * b.sy) / b.n_k)
                  FROM bins b) / t.n / 1e8 * 1e6) AS BIGINT) AS reliability_mu,
           CAST(floor((SELECT sum(100000000.0
                             * (CAST(b.sy AS DOUBLE) * t.n - CAST(t.yy AS DOUBLE) * b.n_k)
                             * (CAST(b.sy AS DOUBLE) * t.n - CAST(t.yy AS DOUBLE) * b.n_k)
                             / (CAST(b.n_k AS DOUBLE) * t.n * t.n))
                  FROM bins b) / t.n / 1e8 * 1e6) AS BIGINT) AS resolution_mu,
           CAST(floor(100000000.0 * t.yy * (t.n - t.yy)
                 / (CAST(t.n AS DOUBLE) * t.n) / 1e8 * 1e6) AS BIGINT) AS uncertainty_mu,
           CAST(floor((SELECT sum(CAST(b.spp AS DOUBLE)
                             - CAST(b.sp AS DOUBLE) * b.sp / b.n_k)
                  FROM bins b) / t.n / 1e8 * 1e6) AS BIGINT) AS within_bin_var_mu,
           CAST(floor((SELECT sum(10000.0 * (CAST(b.spy AS DOUBLE)
                             - CAST(b.sp AS DOUBLE) * b.sy / b.n_k))
                  FROM bins b) / t.n / 1e8 * 1e6) AS BIGINT) AS within_bin_cov_mu
    FROM tot t
    """,
    tags=("eval", "brier", "murphy-decomposition", "calibration"),
)
def brier_murphy_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERALIZED Murphy decomposition of the Brier score — BS =
    reliability - resolution + uncertainty + within-bin variance -
    2 x within-bin covariance (the Stephenson-style exact form: the
    classic three-term Murphy identity only closes when forecasts are
    CONSTANT within each bin; with continuous scores binned into
    deciles, the within-bin spread AND the within-bin forecast-outcome
    covariance terms are both required — the r11 pre-pin identity test
    measured the covariance gap at 1934 µ on the fixture before this
    term was added): reliability is what calibration (q304/q421) can
    fix, resolution is the model's actual skill, uncertainty is the
    task's irreducible floor. q378 plots the reliability DIAGRAM; this
    emits the decomposition that says whether retraining (resolution)
    or recalibrating (reliability) is the right spend. Same
    deterministic synthetic scorer as q378, so the two reports
    reconcile bin for bin. The recomposition identity is pinned by
    tests/test_properties.py::test_murphy_decomposition_identity.

    Determinism: per-bin sufficient statistics (n, sum p, sum p^2 in
    HUGEINT/DECIMAL, sum y, sum py) are exact integers; each component
    is one shared double expression over those integers, emitted as
    floor-µ BIGINT (the SCALE.md quantization discipline — round(x, 6)
    on a true quotient is the banned round-on-quotient shape).

    Scale posture (100 TB): one map + ONE hash-agg to the 10-bin grid
    (sum py now lives in the same per-bin statistics, so the former
    second global scan is gone); every component is grid algebra over
    10 rows."""
    scored = table(spark, sf_dir, "embeddings").select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.expr(
            f"least(9999, ((vec_id * {_BRIER_MIX}) % {_BRIER_P}) % 7000"
            " + (label % 2) * 2500)"
        )
        .cast("bigint")
        .alias("p_bp"),
    )
    bins = scored.groupBy(F.expr("p_bp div 1000").cast("bigint").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("p_bp").cast("bigint").alias("sp"),
        F.sum(F.expr("CAST(p_bp AS DECIMAL(38,0)) * p_bp")).alias("spp"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CASE WHEN y = 1 THEN p_bp ELSE 0 END"))
        .cast("bigint")
        .alias("spy"),
    )
    tot = bins.agg(
        F.sum("n_k").cast("bigint").alias("n"),
        F.sum("sy").cast("bigint").alias("yy"),
        F.sum("spp").alias("spp_tot"),
        F.sum("spy").cast("bigint").alias("spy_tot"),
    )
    comp = bins.crossJoin(F.broadcast(tot)).agg(
        F.first("n").alias("n"),
        F.first("yy").alias("yy"),
        F.first("spp_tot").alias("spp_tot"),
        F.first("spy_tot").alias("spy_tot"),
        F.sum(
            F.expr(
                "(CAST(sp AS DOUBLE) - 10000.0 * sy)"
                " * (CAST(sp AS DOUBLE) - 10000.0 * sy) / n_k"
            )
        ).alias("rel_num"),
        F.sum(
            F.expr(
                "100000000.0 * (CAST(sy AS DOUBLE) * n - CAST(yy AS DOUBLE) * n_k)"
                " * (CAST(sy AS DOUBLE) * n - CAST(yy AS DOUBLE) * n_k)"
                " / (CAST(n_k AS DOUBLE) * n * n)"
            )
        ).alias("res_num"),
        F.sum(
            F.expr("CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / n_k")
        ).alias("wbv_num"),
        F.sum(
            F.expr("10000.0 * (CAST(spy AS DOUBLE) - CAST(sp AS DOUBLE) * sy / n_k)")
        ).alias("wcov_num"),
    )
    return comp.select(
        "n",
        F.expr(
            "CAST(floor((CAST(spp_tot AS DOUBLE) - 20000.0 * spy_tot"
            " + 100000000.0 * yy) / n / 1e8 * 1e6) AS BIGINT)"
        ).alias("brier_mu"),
        F.expr("CAST(floor(rel_num / n / 1e8 * 1e6) AS BIGINT)").alias(
            "reliability_mu"
        ),
        F.expr("CAST(floor(res_num / n / 1e8 * 1e6) AS BIGINT)").alias(
            "resolution_mu"
        ),
        F.expr(
            "CAST(floor(100000000.0 * yy * (n - yy)"
            " / (CAST(n AS DOUBLE) * n) / 1e8 * 1e6) AS BIGINT)"
        ).alias("uncertainty_mu"),
        F.expr("CAST(floor(wbv_num / n / 1e8 * 1e6) AS BIGINT)").alias(
            "within_bin_var_mu"
        ),
        F.expr("CAST(floor(wcov_num / n / 1e8 * 1e6) AS BIGINT)").alias(
            "within_bin_cov_mu"
        ),
    )
