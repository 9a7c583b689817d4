"""The pandas-UDF surface must agree with its pure-SQL twins
(operators/vector_udafs.py policy: fast path and oracle-checkable path are
interchangeable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.functions import cosine_expr
from kinesis_customer_sample_spark.operators.vector_udafs import cosine_udf, shingle_udtf
from kinesis_customer_sample_spark.queries.dedup import _SPARK_SHINGLES
from kinesis_customer_sample_spark.queries.text_analysis import _SPARK_TOKS


def test_cosine_udf_matches_expr(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea")).filter("va < 10")
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb")).filter("vb < 10")
    pairs = a.join(b, F.col("va") < F.col("vb"))
    both = pairs.select(
        "va",
        "vb",
        cosine_udf("ea", "eb").alias("py"),
        F.expr(cosine_expr("ea", "eb", dialect="spark")).alias("sql"),
    ).collect()
    assert len(both) == 45
    for r in both:
        assert r.py == r.sql, (r.va, r.vb, r.py, r.sql)


def test_shingle_udtf_matches_expr(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    via_udtf = {
        (r.doc_id, r.shingle_idx): r.shingle for r in shingle_udtf(docs).collect()
    }
    via_expr = (
        docs.withColumn("toks", F.expr(_SPARK_TOKS))
        .filter(F.size("toks") >= 3)
        # non-distinct shingles, positional (the UDTF emits every occurrence)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2), i -> "
                    "concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))"
                )
            ).alias("shingle_idx", "shingle"),
        )
        .collect()
    )
    assert via_udtf  # non-empty
    assert len(via_udtf) == len(via_expr)
    for r in via_expr:
        assert via_udtf[(r.doc_id, r.shingle_idx)] == r.shingle


def test_native_udtf_matches_mapinpandas(spark, sf_dir):
    from kinesis_customer_sample_spark.operators.vector_udafs import make_shingle_udtf

    docs = table(spark, sf_dir, "documents").limit(10)
    spark.udtf.register("shingles", make_shingle_udtf())
    docs.createOrReplaceTempView("udtf_docs")
    via_native = {
        (r.doc_id, r.shingle_idx): r.shingle
        for r in spark.sql(
            "SELECT s.* FROM udtf_docs, LATERAL shingles(doc_id, text) s"
        ).collect()
    }
    via_batched = {
        (r.doc_id, r.shingle_idx): r.shingle for r in shingle_udtf(docs).collect()
    }
    assert via_native == via_batched and len(via_native) > 0
