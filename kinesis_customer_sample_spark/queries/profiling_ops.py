"""Corpus/warehouse profiling operators — round-3 wave (SURVEY.md §2B):
n-gram duplication rate (the corpus-level "how much of each document is
boilerplate" signal), positional chunk mean-pooling over embeddings,
shuffle-key skew auditing, and mergeable-histogram quantile estimation.

Scale posture (100 TB):
- q207: postings explode → DF hash-agg (map-side combined) → join back on
  the shingle key → per-doc agg. Two shuffles, both on high-cardinality
  keys; the shingle DF table never broadcasts (it is corpus-sized) and no
  pair join exists at all — this is the linear-cost cousin of q68.
- q208: posexplode multiplies rows ×dim, but partial aggregation reduces
  each (chunk, pos) cell before the exchange, so the shuffle carries
  |chunks|·dim cells regardless of corpus size. For small fixed chunks an
  `aggregate(zip_with(...))` fold avoids the explode entirely; the explode
  form is kept because it stays linear when chunks are unbounded.
- q209: per-key counts (one hash-agg) reduce to ONE summary row via exact
  `percentile` aggregates — fine while |distinct keys| fits a reducer
  (millions); at larger cardinalities swap `percentile` for
  `approx_percentile` without changing the output contract. No global
  sort, no global window.
- q211: the sketch IS the scale story — per-shard fixed-width histograms
  (32 bins) merge by summing cell counts (associative + commutative, so
  map-side partial agg does the merge), and quantiles are read off the
  merged CDF. Every post-scan operator touches ≤ 32·|shards| rows; the
  window that cumulates the CDF runs over exactly 32 rows by construction
  (sketch size, not data size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.queries.text_analysis import _DUCK_TOKS, _SPARK_TOKS
from kinesis_customer_sample_spark.registry import query

# 5-token shingles (distinct), per dialect — same normalization as q60/q68
_N = 5
_SPARK_SH5 = (
    f"array_distinct(transform(sequence(1, size(toks) - {_N - 1}), "
    f"i -> concat_ws(' ', slice(toks, i, {_N}))))"
)
_DUCK_SH5 = (
    f"list_distinct([array_to_string(toks[i:i+{_N - 1}], ' ') "
    f"for i in range(1, len(toks) - {_N - 2})])"
)


@query(
    "q207_ngram_dup_rate",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SH5} AS shs
      FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
      WHERE len(toks) >= {_N}
    ),
    postings AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
    df AS (SELECT sh, count(*) AS df FROM postings GROUP BY sh)
    SELECT p.doc_id,
           count(*)::BIGINT                                   AS n_shingles,
           count(*) FILTER (WHERE df.df >= 2)::BIGINT         AS n_dup,
           (count(*) FILTER (WHERE df.df >= 2) * 10000
              // count(*))::BIGINT                            AS dup_rate_bp
    FROM postings p JOIN df ON p.sh = df.sh
    GROUP BY p.doc_id
    """,
    tags=("text", "dedup", "profiling"),
)
def ngram_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram duplication rate: the fraction of a document's
    distinct 5-token shingles that occur in at least one OTHER document
    (df ≥ 2; shingles are distinct per doc, so df counts documents) — the
    standard "how duplicated is this doc" curation signal, and the
    linear-cost alternative to pairwise dedup: no document pair is ever
    formed, only shingle document-frequencies. Rate emitted in integer
    basis points (floor division) so no float crosses the oracle."""
    # persist the computed shingle arrays BEFORE the explode: Generate over
    # an inline lambda column re-evaluates the chain many times per row
    # (the barrier rationale in text_analysis._docs_with_tokens), and the
    # postings feed two consumers (DF agg + join-back) — measured ~4× on
    # the bench
    docs = (
        table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("toks", F.expr(_SPARK_TOKS))
        .filter(F.size("toks") >= _N)
        .select("doc_id", F.expr(_SPARK_SH5).alias("shs"))
        .persist()
    )
    postings = docs.select("doc_id", F.explode("shs").alias("sh"))
    df_tab = postings.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    n_dup = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        postings.join(df_tab, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_dup.alias("n_dup"),
            F.expr(
                "CAST(sum(IF(df >= 2, 1, 0)) * 10000 div count(1) AS BIGINT)"
            ).alias("dup_rate_bp"),
        )
    )


@query(
    "q208_chunk_mean_pooling",
    oracle="""
    SELECT chunk_id, pos,
           count(*)::BIGINT        AS n_vecs,
           round(avg(v), 6)        AS mean_val
    FROM (
      SELECT vec_id // 8                           AS chunk_id,
             generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(embedding)                     AS v
      FROM embeddings
    )
    GROUP BY 1, 2
    """,
    tags=("similarity", "pooling", "multimodal"),
)
def chunk_mean_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional mean-pooling of consecutive embedding chunks (8 vectors
    per chunk — the token-embeddings→segment-embedding reduction every
    retrieval pipeline runs before indexing). Shape: posexplode the vector
    to (chunk, dim-position) cells, hash-aggregate the mean per cell —
    partial agg collapses cells map-side, so the exchange carries
    |chunks|·dim rows however large the corpus. Contrast with q84, which
    pools per LABEL via a pandas UDAF: this is the pure-codegen positional
    form with a derived integer chunk key."""
    emb = table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    cells = emb.select(
        (F.col("vec_id") / 8).cast("bigint").alias("chunk_id"),
        F.posexplode("embedding").alias("pos", "v"),
    )
    return cells.groupBy("chunk_id", "pos").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("v"), 6).alias("mean_val"),
    )


@query(
    "q209_key_skew_audit",
    oracle="""
    WITH per_key AS (
      SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY user_id
    )
    SELECT count(*)::BIGINT                              AS n_keys,
           sum(c)::BIGINT                                AS n_rows,
           max(c)::BIGINT                                AS max_key_rows,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY c), 4) AS p50,
           round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY c), 4) AS p90,
           round(percentile_cont(0.99) WITHIN GROUP (ORDER BY c), 4) AS p99,
           (max(c) * 10000 // sum(c))::BIGINT            AS top1_share_bp
    FROM per_key
    """,
    tags=("profiling", "skew", "aggregation"),
)
def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit for a prospective join/agg key (events.user_id):
    the distribution OF per-key row counts — key cardinality, hottest key,
    exact interpolated p50/p90/p99 of key sizes, and the hottest key's
    share in basis points. This is the diagnostic you run BEFORE deciding
    whether a key needs salting (q86/q129 are the treatments; this is the
    triage). Exact `percentile` is an aggregate, not a global sort/window;
    at extreme key cardinality substitute approx_percentile — the report
    schema is unchanged."""
    ev = table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
        F.round(F.expr("percentile(c, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(c, 0.99)"), 4).alias("p99"),
        F.expr("CAST(max(c) * 10000 div sum(c) AS BIGINT)").alias("top1_share_bp"),
    )


_BIN_W = 16
_N_BINS = 32
_QUANTILES = (5000, 9500, 9900)  # basis points


@query(
    "q211_histogram_merge_quantiles",
    oracle=f"""
    WITH partials AS (
      SELECT event_type,
             least({_N_BINS - 1}, greatest(0, floor(value / {_BIN_W})::BIGINT)) AS bin,
             count(*)::BIGINT AS c
      FROM events GROUP BY 1, 2
    ),
    merged AS (SELECT bin, sum(c)::BIGINT AS n FROM partials GROUP BY bin),
    cdf AS (
      SELECT bin, n,
             sum(n) OVER (ORDER BY bin)::BIGINT AS cum_n,
             (SELECT sum(n) FROM merged)::BIGINT AS total
      FROM merged
    )
    SELECT q.q_bp,
           min(cdf.bin)::BIGINT                       AS est_bin,
           min((cdf.bin + 1) * {_BIN_W})::BIGINT      AS est_upper_edge,
           min(cdf.total)::BIGINT                     AS total_n
    FROM (SELECT unnest([{", ".join(str(q) for q in _QUANTILES)}]) AS q_bp) q
    JOIN cdf ON cdf.cum_n * 10000 >= q.q_bp * cdf.total
    GROUP BY q.q_bp
    """,
    tags=("profiling", "sketch", "quantile"),
)
def histogram_merge_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from a MERGEABLE fixed-width histogram sketch:
    per-shard (event_type) 32-bin histograms merge by summing cell counts —
    associativity is the split-invariance guarantee (merge(partials) ==
    histogram(whole), exactly, by construction) — then p50/p95/p99 are read
    off the merged CDF as the first bin whose cumulative count reaches the
    target rank (compared in integer cross-multiplied form, no division).
    The estimate is deterministic (bin upper edge), unlike a sampling
    sketch, so it is hash-checkable. All post-scan state is ≤ 32·|shards|
    rows; the CDF window cumulates exactly 32 rows by construction."""
    ev = table(spark, sf_dir, "events")
    partials = ev.groupBy(
        "event_type",
        F.least(
            F.lit(_N_BINS - 1),
            F.greatest(F.lit(0), F.floor(F.col("value") / _BIN_W).cast("bigint")),
        ).alias("bin"),
    ).agg(F.count(F.lit(1)).alias("c"))
    merged = partials.groupBy("bin").agg(F.sum("c").alias("n"))
    from pyspark.sql import Window as W

    # 32-row window by construction (sketch cells), not a data-sized sort
    cdf = merged.select(
        "bin",
        "n",
        F.sum("n").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)).alias("cum_n"),
    ).crossJoin(merged.agg(F.sum("n").alias("total")))
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QUANTILES])).alias("q_bp")
    )
    hit = qs.join(cdf, F.col("cum_n") * 10000 >= F.col("q_bp") * F.col("total"))
    return hit.groupBy("q_bp").agg(
        F.min("bin").alias("est_bin"),
        F.min((F.col("bin") + 1) * _BIN_W).alias("est_upper_edge"),
        F.min("total").alias("total_n"),
    )


_KANON_K = 3


@query(
    "q284_k_anonymity_audit",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, (n_chars // 100)::BIGINT AS size_bucket,
             count(*)::BIGINT AS n
      FROM documents
      GROUP BY 1, 2, 3
    )
    SELECT lang, source, size_bucket, n,
           (n >= {_KANON_K}) AS k_anonymous,
           round(1.0 / n, 6) AS reident_risk
    FROM cells
    """,
    tags=("governance", "privacy", "k-anonymity"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit over the quasi-identifier tuple (lang, source,
    length bucket): every equivalence class with fewer than k=3 members
    is a re-identification risk — the privacy gate a dataset must pass
    before release, complementing q139's PII redaction (which removes
    direct identifiers; this measures what the REMAINING attributes still
    leak). One hash-agg to the QI cells (map-side combined), a map-side
    flag, and the 1/n worst-case link probability per cell. Generalizing
    a failing dimension (coarser buckets) and re-running IS the
    anonymization loop. At 100 TB the cell table is the product of QI
    cardinalities — the operator's honest output size."""
    d = table(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang",
        "source",
        F.expr("n_chars div 100").cast("bigint").alias("size_bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return cells.select(
        "lang",
        "source",
        "size_bucket",
        "n",
        (F.col("n") >= _KANON_K).alias("k_anonymous"),
        F.round(F.lit(1.0) / F.col("n"), 6).alias("reident_risk"),
    )


_RR_MULT = 2654435761  # portable multiplicative hash (q319's constant)
_RR_MOD = 4294967296
_RR_FLIP_PCT = 25  # flip probability 25% → eps = ln((1-p)/p) = ln 3


@query(
    "q326_randomized_response_counts",
    oracle=f"""
    WITH truth AS (
      SELECT user_id,
             user_id % 10 AS cohort,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      FROM events GROUP BY user_id
    ),
    reported AS (
      SELECT cohort, b,
             CASE WHEN (user_id * {_RR_MULT}) % {_RR_MOD} % 100 < {_RR_FLIP_PCT}
                  THEN 1 - b ELSE b END AS rb
      FROM truth
    )
    SELECT cohort::BIGINT AS cohort,
           count(*)::BIGINT AS n_users,
           sum(rb)::BIGINT AS reported_pos,
           sum(b)::BIGINT AS true_pos,
           (greatest(sum(rb) * 10000 - {_RR_FLIP_PCT} * 100 * count(*), 0)
              // (100 - 2 * {_RR_FLIP_PCT}))::BIGINT AS debiased_bp
    FROM reported GROUP BY cohort
    """,
    tags=("privacy", "differential-privacy", "randomized-response"),
)
def randomized_response_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized-response private counting (Warner's mechanism, the
    local-DP primitive behind RAPPOR): each user's true bit ("ever
    purchased") is flipped with probability p=25% before aggregation —
    ε = ln((1−p)/p) = ln 3 local differential privacy — and the
    aggregate is debiased as (reported − p·n)/(1 − 2p), emitted in
    integer basis points. The "coin" is a portable multiplicative hash
    of the user id, so the mechanism is deterministic and
    oracle-checkable while keeping the exact production dataflow (a
    deployment swaps the hash for client-side randomness; every shuffle
    and aggregate is unchanged — the q78-stub philosophy applied to
    noise). true_pos sits alongside for utility measurement at fixture
    scale; a real release would not compute it.

    Scale posture: one per-user max-agg (keyed on the natural key), one
    10-key rollup — map-side partial both times; the flip is a scalar
    expression. Companion to q284 (k-anonymity audit): that measures
    re-identification risk, this bounds it mechanically."""
    truth = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("b")
        )
        .select("user_id", (F.col("user_id") % 10).alias("cohort"), "b")
    )
    flip = ((F.col("user_id") * _RR_MULT) % _RR_MOD % 100) < _RR_FLIP_PCT
    reported = truth.withColumn(
        "rb", F.when(flip, 1 - F.col("b")).otherwise(F.col("b"))
    )
    denom = 100 - 2 * _RR_FLIP_PCT
    return reported.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("rb").cast("bigint").alias("reported_pos"),
        F.sum("b").cast("bigint").alias("true_pos"),
        # greatest(…, 0): a sampling dip below p·n would make the numerator
        # negative — clamp to 0 on BOTH sides. The clamp guards estimator
        # noise only (a negative debiased rate is meaningless); it is NOT a
        # division-semantics patch: DuckDB `//` truncates toward zero
        # (-7//2 = -3), same as Spark `div`, so the engines agree either way.
        F.expr(
            f"greatest(sum(rb) * 10000 - {_RR_FLIP_PCT} * 100 * count(1), 0) div {denom}"
        )
        .cast("bigint")
        .alias("debiased_bp"),
    ).select(
        F.col("cohort").cast("bigint").alias("cohort"),
        "n_users",
        "reported_pos",
        "true_pos",
        "debiased_bp",
    )
