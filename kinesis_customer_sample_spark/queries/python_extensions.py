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


@query(
    "q290_observed_metrics",
    oracle="""
    SELECT count(*)::BIGINT AS n_input,
           sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
             AS n_returned,
           sum(CAST(floor(l_extendedprice * 100) AS BIGINT))::BIGINT
             AS gross_cents
    FROM lineitem
    """,
    tags=("observability", "metrics", "observe"),
)
def observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via `Observation`/`df.observe` (Spark's
    named-metrics API): accumulator-style metrics (input rows, returned-
    flag rows, gross cents) ride ON the query's own pass — collected by
    the executors as the scan streams by, surfaced to the driver after
    one action, with NO second scan of the input. This is how a
    production pipeline audits itself (row counts in = rows out + drops)
    without doubling its I/O; the oracle recomputes the same totals
    as a plain aggregate, so the metric values themselves are
    hash-verified. Metrics are integers only (cents) — observe() sums
    float columns non-deterministically otherwise."""
    from pyspark.sql import Observation

    li = table(spark, sf_dir, "lineitem")
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returned"
        ),
        F.sum(F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).alias(
            "gross_cents"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()  # one real pass
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_input"]), int(m["n_returned"]), int(m["gross_cents"]))],
        "n_input long, n_returned long, gross_cents long",
    )


_ARROW_OUT = "doc_id bigint, n_bytes bigint, byte_sum bigint"


@query(
    "q291_arrow_map_bytes",
    oracle="""
    SELECT doc_id,
           strlen(text)::BIGINT AS n_bytes,
           list_sum([ord(x)::BIGINT for x in string_split(text, '')])::BIGINT
             AS byte_sum
    FROM documents
    WHERE strlen(text) = length(text)
    """,
    tags=("python", "arrow", "mapInArrow"),
)
def arrow_map_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` — the third and lowest-level Python batch edge (raw
    pyarrow RecordBatches, no pandas conversion at all): per-document
    byte length and byte sum computed by numpy directly on the Arrow
    offsets/data buffers — zero per-row Python, zero pandas
    materialization, which is the right edge for codecs and wire
    formats. The output is a pure function of the payload (the q46/q96/
    q277 decode-edge contract), so the SQL oracle recomputes it from
    character codes and the whole Python stage is hash-verified. The
    oracle's code-point sum equals the byte sum only for ASCII payloads,
    so BOTH sides guard on bytelen==charlen (FIXTURES.md documents the
    fixture as all-ASCII; the guard makes a future non-ASCII fixture
    degrade to a smaller verified set instead of a silent hash break).
    Map-only: one pass, no shuffle, blobs never leave their partition."""
    import numpy as np
    import pyarrow as pa

    def batch_stats(batches):
        for batch in batches:
            ids = batch.column("doc_id")
            texts = batch.column("text")
            # str columns arrive as string (int32 offsets) or large_string
            # (int64); read the offsets + utf-8 data buffers directly.
            odtype = np.int64 if pa.types.is_large_string(texts.type) else np.int32
            off = np.frombuffer(texts.buffers()[1], dtype=odtype)[
                texts.offset : texts.offset + len(texts) + 1
            ]
            data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
            csum = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(data, dtype=np.int64, out=csum[1:])
            n_bytes = (off[1:] - off[:-1]).astype(np.int64)
            byte_sum = csum[off[1:]] - csum[off[:-1]]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(n_bytes, pa.int64()), pa.array(byte_sum, pa.int64())],
                names=["doc_id", "n_bytes", "byte_sum"],
            )

    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return (
        docs.select("doc_id", "text")
        .filter("octet_length(text) = char_length(text)")
        .mapInArrow(batch_stats, _ARROW_OUT)
    )


@query(
    "q325_arrow_grouped_centroids",
    oracle="""
    WITH v AS (
      SELECT label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS vi
      FROM embeddings
    ),
    ex AS (
      SELECT label, g.d AS dim, vi[g.d] AS x
      FROM v CROSS JOIN generate_series(1, 64) g(d)
    )
    SELECT label::BIGINT AS label, dim::BIGINT AS dim,
           count(*)::BIGINT AS n,
           (CASE WHEN sum(x) >= 0 THEN sum(x) // count(*)
                 ELSE -((-sum(x)) // count(*)) END)::BIGINT AS mean_milli
    FROM ex GROUP BY label, dim
    """,
    tags=("python", "arrow", "applyInArrow", "grouped-map"),
)
def arrow_grouped_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().applyInArrow` (Spark 4.0) — the zero-copy grouped-map
    surface below applyInPandas: each label group's embeddings arrive as
    ONE Arrow table, per-dim integer centroid sums run as numpy int64
    column math (no pandas boxing, no per-row Python), and the result is
    a 64-row Arrow batch per group. Means are milli-quantized with
    TRUNCATING division toward zero, the semantics Spark `div` and
    DuckDB `//` already share (-7//2 = -3 in both engines); only
    Python/numpy `//` FLOORS negatives, so the Arrow kernel handles
    negative sums explicitly and both engines emit identical integers.

    Scale posture (100 TB): one shuffle on label; per-group work is a
    single C-speed reduction over the group's Arrow buffers; output is
    k·64 rows total. A group materializes as ONE columnar Arrow table
    (raw buffers — far cheaper than applyInPandas' boxed objects, the
    reason to choose applyInArrow for numeric kernels), so per-group
    size must fit a worker: for labels too hot for that, this exact
    reduction decomposes into the two-stage integer agg q305 uses.
    Cites q305 (integer centroid algebra) and q291 (arrow byte-level
    map) as the adjacent surfaces."""
    import numpy as np
    import pyarrow as pa

    milli = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))"
    v = table(spark, sf_dir, "embeddings").select(
        "label", F.expr(milli).alias("vi")
    )

    def centroid(tbl: "pa.Table") -> "pa.Table":
        vi = tbl.column("vi")
        flat = np.asarray(vi.combine_chunks().flatten(), dtype=np.int64)
        x = flat.reshape(-1, 64)
        acc = x.sum(axis=0)
        n = x.shape[0]
        label = tbl.column("label")[0].as_py()
        # truncating division toward zero (matches Spark `div` and the
        # oracle's CASE): np floor-divides, so handle negatives explicitly
        means = np.array(
            [int(a // n) if a >= 0 else -int((-a) // n) for a in acc],
            dtype=np.int64,
        )
        return pa.table(
            {
                "label": np.full(64, label, dtype=np.int64),
                "dim": np.arange(1, 65, dtype=np.int64),
                "n": np.full(64, n, dtype=np.int64),
                "mean_milli": means,
            }
        )

    return v.groupBy("label").applyInArrow(
        centroid, "label bigint, dim bigint, n bigint, mean_milli bigint"
    )
