"""Guards for the dedup family's scale posture: the document-frequency cap
that bounds the hottest posting list (dedup.capped_postings), and the
LSH-recall property — the band-bucket candidate generator must never lose a
pair the exact shingle-Jaccard operator finds (the whole point of LSH is
recall at a fraction of the pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_customer_sample_spark.queries.dedup import (
    DF_CAP,
    capped_postings,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def _synthetic_postings(spark, n_docs: int, hot_every: int):
    """n_docs docs; every doc posts one unique shingle plus, for every
    `hot_every`-th doc, the same viral shingle 'HOT'."""
    rows = []
    for d in range(n_docs):
        rows.append((d, "en", f"unique-{d}"))
        if d % hot_every == 0:
            rows.append((d, "en", "HOT"))
    return spark.createDataFrame(rows, "doc_id int, lang string, sh string")


def test_df_cap_drops_only_hot_keys(spark):
    postings = _synthetic_postings(spark, n_docs=200, hot_every=2)  # df(HOT)=100
    capped = capped_postings(postings, cap=50)
    left = capped.groupBy("sh").count().collect()
    assert all(r["sh"] != "HOT" for r in left)  # viral shingle gone
    assert len(left) == 200  # every unique shingle survives intact


def test_df_cap_bounds_candidate_pairs(spark):
    """With the cap, the postings self-join generates zero pairs from the
    viral key (unique shingles never collide); without it, the hot key
    alone contributes df·(df-1)/2 pairs — the O(df²) blow-up the cap
    exists to prevent."""
    postings = _synthetic_postings(spark, n_docs=100, hot_every=1)  # df(HOT)=100

    def n_pairs(p):
        a, b = p.alias("a"), p.alias("b")
        return a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).count()

    assert n_pairs(postings) == 100 * 99 // 2
    assert n_pairs(capped_postings(postings, cap=50)) == 0


def test_df_cap_default_is_inert_at_test_scale(spark, sf_dir):
    """DF_CAP must sit above the corpus's max document frequency so the
    oracle-checked q68 results are unchanged — this pins that headroom."""
    from kinesis_customer_sample_spark.queries.dedup import _shingle_sets

    sh = _shingle_sets(spark, sf_dir).select("doc_id", "lang", "shs")
    postings = sh.select("doc_id", "lang", F.explode("shs").alias("sh"))
    max_df = (
        postings.groupBy("lang", "sh")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert max_df <= DF_CAP


def test_lsh_recall_covers_exact_pairs(spark, sf_dir):
    """Band math regression guard: every exact 3-shingle-Jaccard >= 0.5
    pair (q68) must also be found by the MinHash-LSH pipeline (q69). With
    4 bands x 4 rows, a pair at s >= 0.5 collides on some band with
    p = 1-(1-s^4)^4 — on the fixture corpus the near-dup pairs are clones
    (s near 1), so recall must be exact, not probabilistic."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    assert exact  # fixture must actually contain near-dups
    assert exact <= lsh


def test_positional_filter_lossless_and_pruning(spark, sf_dir):
    """q215's PPJoin positional + length filters must (a) strictly shrink
    the pre-verify candidate set vs the plain prefix-postings distinct —
    that reduction is the whole point of carrying token positions — and
    (b) lose NOTHING: every pair the exact verify keeps must survive the
    filtered candidate generation (the filters are upper-bound prunes,
    provably lossless, so equality of the final pair sets is exact)."""
    from kinesis_customer_sample_spark.queries.dedup import (
        _PF_TAU,
        _pf_candidates,
        _pf_prefix_postings,
    )

    docs, ranked = _pf_prefix_postings(spark, sf_dir)
    plain = _pf_candidates(ranked, positional=False)
    pruned = _pf_candidates(ranked, positional=True)
    n_plain, n_pruned = plain.count(), pruned.count()
    assert n_pruned < n_plain, (n_pruned, n_plain)

    def verify(cand):
        da = docs.select(
            F.col("doc_id").alias("doc_a"),
            F.col("toks").alias("toks_a"),
            F.col("n").alias("na"),
        )
        db = docs.select(
            F.col("doc_id").alias("doc_b"),
            F.col("toks").alias("toks_b"),
            F.col("n").alias("nb"),
        )
        j = (
            cand.join(da, "doc_a")
            .join(db, "doc_b")
            .withColumn("c", F.size(F.array_intersect("toks_a", "toks_b")))
        )
        jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
        return {
            (r["doc_a"], r["doc_b"])
            for r in j.filter(jac >= _PF_TAU).select("doc_a", "doc_b").collect()
        }

    assert verify(pruned) == verify(plain)
