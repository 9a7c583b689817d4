"""Spark 4 Python extension surfaces — round-3 wave (SURVEY.md §2B UDF/
UDTF rows): a REAL Python UDTF (the `@udtf` table function, lateral-joined
in SQL) and a custom Python DataSource (the `pyspark.sql.datasource`
extension point) — the two APIs through which users graft imperative
row-generating logic into the declarative engine.

Scale posture (100 TB):
- q246: the UDTF runs Arrow-batched (`useArrow=True`) and is a pure
  per-row fan-out — no state, no shuffle; the lateral join multiplies
  rows inside the map stage exactly like mapInPandas fan-outs (q79/q242),
  so cost is one pass over text. UDTFs are still the Python path: the
  chunk arithmetic here exists as pure-SQL twins (q157), and the UDTF
  form is API-surface coverage, benchmarked against that twin's plan.
- q247: a custom DataSource plans ITS OWN partitions (four here) — the
  contract that makes third-party sources parallelize; each partition
  generates its slice independently (seeded arithmetic, no driver
  funnel). The oracle recomputes the generator's closed form, so the
  scan's content — including partition boundaries — is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

_CHUNK_W = 64


@query(
    "q246_python_udtf_chunks",
    oracle=f"""
    SELECT doc_id,
           t AS chunk_idx,
           length(substr(text, t * {_CHUNK_W} + 1, {_CHUNK_W}))::INTEGER AS piece_len,
           sha256(substr(text, t * {_CHUNK_W} + 1, {_CHUNK_W}))          AS piece_sha
    FROM documents,
         (SELECT unnest(generate_series(0, 50)) AS t)
    WHERE t * {_CHUNK_W} < length(text)
    """,
    tags=("llm", "udtf", "python", "chunking"),
)
def python_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width chunking as a REAL Python UDTF (`@udtf(useArrow=True)`),
    lateral-joined in SQL — one (chunk_idx, len, sha256) row per 64-char
    window of each document. The generator yields per input row with no
    state, so the lateral join stays inside the map stage. The oracle
    re-derives every chunk boundary and digest with substr arithmetic
    (ASCII fixture: byte slicing == char slicing), making the Python
    fan-out hash-verified against pure SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, piece_len int, piece_sha string", useArrow=True)
    class Chunker:
        def eval(self, text: str):
            import hashlib

            t = text or ""
            for i in range(0, len(t), _CHUNK_W):
                piece = t[i : i + _CHUNK_W]
                yield (
                    i // _CHUNK_W,
                    len(piece),
                    hashlib.sha256(piece.encode("utf-8")).hexdigest(),
                )

    spark.udtf.register("kcss_chunker", Chunker)
    table(spark, sf_dir, "documents").createOrReplaceTempView("kcss_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.piece_len, c.piece_sha
        FROM kcss_docs_udtf d, LATERAL kcss_chunker(d.text) c
        """
    )


_DS_N = 10_000
_DS_PARTS = 4


@query(
    "q247_python_datasource_scan",
    oracle=f"""
    SELECT i // {_DS_N // _DS_PARTS}                        AS slice_id,
           count(*)::BIGINT                                 AS n,
           min(i)::BIGINT                                   AS first_id,
           max(i)::BIGINT                                   AS last_id,
           sum((i * 2654435761) % 1000003)::BIGINT          AS val_sum
    FROM (SELECT unnest(generate_series(0, {_DS_N - 1})) AS i)
    GROUP BY 1
    """,
    tags=("source", "python-datasource", "extension"),
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A custom Python DataSource (pyspark.sql.datasource): the source
    plans four partitions itself and each generates its id-range slice
    independently (seeded multiplicative-hash values — no driver funnel,
    the contract that makes third-party sources parallelize). The query
    aggregates per-slice counts, id ranges, and value checksums; the oracle recomputes
    the generator's closed form, so content AND partition-boundary
    correctness are hash-verified."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SynthReader(DataSourceReader):
        def partitions(self):
            step = _DS_N // _DS_PARTS
            return [InputPartition((p * step, min((p + 1) * step, _DS_N))) for p in range(_DS_PARTS)]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i, (i * 2654435761) % 1000003)

    class SynthSource(DataSource):
        @classmethod
        def name(cls):
            return "kcss_synth"

        def schema(self):
            return "id bigint, val bigint"

        def reader(self, schema):
            return SynthReader()

    spark.dataSource.register(SynthSource)
    df = spark.read.format("kcss_synth").load()
    step = _DS_N // _DS_PARTS
    return df.groupBy(F.expr(f"id div {step}").alias("slice_id")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("first_id"),
        F.max("id").alias("last_id"),
        F.sum("val").alias("val_sum"),
    )
