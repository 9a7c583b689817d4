"""Product-quantization ANN (ADC scan + exact rerank) — round-3 wave
(SURVEY.md §2B similarity rows): the codebook-compression half of the ANN
design space. q121 (SQ8) compresses per DIMENSION; PQ compresses per
SUBSPACE — the embedding splits into M=4 sub-vectors, each encoded as the
id of its nearest centroid in a 16-entry per-subspace codebook, so a
64-float vector becomes 4 bytes and query-time distance is M table
lookups (ADC — asymmetric distance computation, Jégou et al., 'Product
Quantization for Nearest Neighbor Search').

Cross-engine determinism: vectors are quantized to integer milli-units
(round(x·1000)) BEFORE any distance math, so sub-distances, code
assignments (argmin with (dist, cid) tie-break), ADC lookups, and the
exact rerank are all int64 arithmetic — both engines produce identical
shortlists and ranks, no float tolerance anywhere.

Scale posture (100 TB):
- The codebook is a deterministic 16-row sample (vec_id < 16), broadcast;
  training-by-k-means would slot in via q149 without changing the plan.
- Encoding: corpus × 16-row broadcast, sub-distances computed inside one
  zip_with/aggregate lambda per (vec, centroid) — map-side; the argmin is
  a (vec, m)-keyed hash-agg carrying a single (dist, cid) struct through
  partial/final (min on struct ordering), so no row explosion survives
  the map stage.
- ADC scan: codes join the 64-row query lookup table (broadcast), sum M
  rows per vector — map-side combine; shortlist via TakeOrderedAndProject;
  exact rerank touches 50 vectors only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

_PQ_DIM = 64
_PQ_M = 4  # subspaces
_PQ_SUB = _PQ_DIM // _PQ_M  # dims per subspace
_PQ_K = 16  # centroids per subspace codebook
_PQ_QUERY = 42
_PQ_SHORTLIST = 50
_PQ_TOPK = 10



@query(
    "q265_pq_adc_ann",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             [CAST(round(x * 1000) AS BIGINT) FOR x IN embedding] AS qi
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, qi AS cqi FROM e WHERE vec_id < {_PQ_K}),
    dists AS (
      SELECT e.vec_id, c.cid, t.d // {_PQ_SUB} AS m,
             sum((e.qi[t.d + 1] - c.cqi[t.d + 1])
                 * (e.qi[t.d + 1] - c.cqi[t.d + 1]))::BIGINT AS dist
      FROM e, cent c, range({_PQ_DIM}) t(d)
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, m, cid FROM dists
      QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) = 1
    ),
    qd AS (SELECT m, cid, dist AS qdist FROM dists WHERE vec_id = {_PQ_QUERY}),
    approx AS (
      SELECT k.vec_id, sum(q.qdist)::BIGINT AS approx_l2
      FROM codes k JOIN qd q ON q.m = k.m AND q.cid = k.cid
      WHERE k.vec_id != {_PQ_QUERY}
      GROUP BY k.vec_id
    ),
    shortlist AS (
      SELECT vec_id, approx_l2 FROM approx
      ORDER BY approx_l2, vec_id LIMIT {_PQ_SHORTLIST}
    ),
    qv AS (SELECT qi AS qqi FROM e WHERE vec_id = {_PQ_QUERY}),
    exact AS (
      SELECT s.vec_id, any_value(s.approx_l2) AS approx_l2,
             any_value(e.label) AS label,
             sum((e.qi[t.d + 1] - qv.qqi[t.d + 1])
                 * (e.qi[t.d + 1] - qv.qqi[t.d + 1]))::BIGINT AS exact_l2
      FROM shortlist s
      JOIN e ON e.vec_id = s.vec_id
      CROSS JOIN qv, range({_PQ_DIM}) t(d)
      GROUP BY s.vec_id
    )
    SELECT vec_id, label, approx_l2, exact_l2
    FROM exact ORDER BY exact_l2, vec_id LIMIT {_PQ_TOPK}
    """,
    tags=("similarity", "ann", "product-quantization", "rerank"),
)
def pq_adc_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate nearest neighbors with exact rerank: encode each
    embedding as 4 codebook ids (one per 16-dim subspace, nearest of 16
    centroids by integer L2, ties to the lower centroid id), precompute
    the query's 4×16 centroid-distance lookup table, scan the corpus by
    summed table lookups (ADC), shortlist 50, and rerank the shortlist by
    exact integer L2. All distance math on milli-unit-quantized integers,
    so code assignment, ADC scores, and the final ranking hash-match the
    oracle exactly.

    The codebook is BOUNDED (16 centroids × 64 dims), so it is collected
    once per run (quantization evaluated Spark-side — the integers are
    the engine's own; q328's bounded-scalar-probe convention) and both
    code assignment and the ADC lookup fold into ROW-LOCAL expressions
    with the centroid values as literals: per subspace the 16 integer
    sub-distances are ONE `transform` of the literal 16×16 centroid
    array (`zip_with`/`aggregate` against the subspace slice of qi),
    bound as a column so argmin-with-low-cid-ties (array_position of
    array_min) reads it without re-evaluation, and the query's lookup
    table is a literal array indexed by that code. The corpus×16
    interpreted-lambda fan-out, the corpus×64 argmin shuffle, the lookup
    join and the rerank joins of the relational form all disappear: the
    whole query is one map pass + TakeOrderedAndProject(50) + a 50-row
    post-limit exact rerank — zero joins, zero shuffles (guide §2.4,
    §4.2). NOTE (r16): the first literal form inlined the 16×16×16-term
    sub-distance arithmetic as ~8k flat expression nodes and re-stated
    the array per argmin reference — past the JVM method-size limit, so
    whole-stage codegen fell back to interpreted eval and the task
    binary carried a 4.7 MiB plan; driver bench doubled. The compact
    HOF-against-literal-array form restores a small expression tree."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))"
        ).alias("qi"),
    )
    cent_rows = e.filter(F.col("vec_id") < _PQ_K).select("vec_id", "qi").collect()
    cents = {int(r["vec_id"]): list(r["qi"]) for r in cent_rows}
    qqi = list(
        e.filter(F.col("vec_id") == _PQ_QUERY).select("qi").collect()[0]["qi"]
    )
    # query ADC table: exact Python int math over the Spark-quantized values
    # — identical to the engine-side sub-distances it replaces
    qd = [
        [
            sum(
                (qqi[m * _PQ_SUB + d] - cents[c][m * _PQ_SUB + d]) ** 2
                for d in range(_PQ_SUB)
            )
            for c in range(_PQ_K)
        ]
        for m in range(_PQ_M)
    ]

    # Per subspace: the 16 sub-distances as ONE transform over the literal
    # 16x16 centroid array, bound as a column (_d{m}) so the argmin's two
    # references (array_position + array_min) don't duplicate the work —
    # CollapseProject keeps non-cheap multiply-referenced aliases in their
    # own Project, so each _d{m} is evaluated exactly once per row.
    proj = e.filter(F.col("vec_id") != _PQ_QUERY)
    for m in range(_PQ_M):
        cent_lit = ", ".join(
            "array("
            + ", ".join(f"{cents[c][m * _PQ_SUB + d]}L" for d in range(_PQ_SUB))
            + ")"
            for c in range(_PQ_K)
        )
        proj = proj.withColumn(
            f"_d{m}",
            F.expr(
                f"transform(array({cent_lit}), cv -> aggregate("
                f"zip_with(slice(qi, {m * _PQ_SUB + 1}, {_PQ_SUB}), cv, "
                f"(x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t))"
            ),
        )
    approx_terms = []
    for m in range(_PQ_M):
        qd_arr = "array(" + ", ".join(f"{v}L" for v in qd[m]) + ")"
        approx_terms.append(
            f"element_at({qd_arr}, "
            f"CAST(array_position(_d{m}, array_min(_d{m})) AS INT))"
        )
    qqi_lit = "array(" + ", ".join(f"{v}L" for v in qqi) + ")"
    exact_l2 = (
        f"aggregate(zip_with(qi, {qqi_lit}, (x, y) -> (x - y) * (x - y)), "
        f"0L, (acc, t) -> acc + t)"
    )
    shortlist = (
        proj.select(
            "vec_id",
            "label",
            "qi",
            F.expr(" + ".join(approx_terms)).cast("bigint").alias("approx_l2"),
        )
        .orderBy("approx_l2", "vec_id")
        .limit(_PQ_SHORTLIST)
    )
    # exact rerank rides ABOVE the limit: evaluated on the 50 survivors only
    return (
        shortlist.select(
            "vec_id", "label", "approx_l2", F.expr(exact_l2).alias("exact_l2")
        )
        .orderBy("exact_l2", "vec_id")
        .limit(_PQ_TOPK)
    )


# q430 (round 7): IVF-nprobe ANN — the inverted-file cell-probe index
# completing the ANN family (q99 multiprobe LSH buckets, q121 SQ8 scan,
# q265 PQ-ADC codes; IVF is what FAISS/Milvus actually shard at scale).
_IVF_NCELLS = 16   # coarse-quantizer cells (centroids = vec_id 0..15)
_IVF_NPROBE = 4    # cells probed per query
_IVF_NQ = 4        # probe queries: vec_id 16..19
_IVF_CORP0 = 20    # corpus = vec_id >= 20
_IVF_K = 10


@query(
    "q430_ivf_nprobe_ann",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid,
             [CAST(round(x * 1000) AS BIGINT) FOR x IN embedding] AS cv
      FROM embeddings WHERE vec_id < {_IVF_NCELLS}
    ),
    corp AS (
      SELECT vec_id,
             [CAST(round(x * 1000) AS BIGINT) FOR x IN embedding] AS v
      FROM embeddings WHERE vec_id >= {_IVF_CORP0}
    ),
    qs AS (
      SELECT vec_id AS qid,
             [CAST(round(x * 1000) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings
      WHERE vec_id >= {_IVF_NCELLS} AND vec_id < {_IVF_NCELLS + _IVF_NQ}
    ),
    assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT c.vec_id, c.v, ct.cid,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY list_sum([(v[i + 1] - cv[i + 1]) * (v[i + 1] - cv[i + 1])
                                    FOR i IN range(64)]), ct.cid) AS r
        FROM corp c CROSS JOIN cent ct)
      WHERE r = 1
    ),
    probes AS (
      SELECT qid, cid FROM (
        SELECT q.qid, ct.cid,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY list_sum([(qv[i + 1] - cv[i + 1]) * (qv[i + 1] - cv[i + 1])
                                    FOR i IN range(64)]), ct.cid) AS r
        FROM qs q CROSS JOIN cent ct)
      WHERE r <= {_IVF_NPROBE}
    ),
    cand AS (
      SELECT p.qid, a.vec_id,
             list_sum([(q.qv[i + 1] - a.v[i + 1]) * (q.qv[i + 1] - a.v[i + 1])
                       FOR i IN range(64)]) AS d2
      FROM probes p
      JOIN assign a ON a.cid = p.cid
      JOIN qs q ON q.qid = p.qid
    )
    SELECT qid, rank::BIGINT AS rank, vec_id, d2::BIGINT AS d2 FROM (
      SELECT qid, vec_id, d2,
             row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rank
      FROM cand)
    WHERE rank <= {_IVF_K}
    ORDER BY qid, rank
    """,
    tags=("similarity", "ann", "ivf", "cell-probe"),
)
def ivf_nprobe_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-nprobe approximate nearest neighbor: the corpus is inverted
    into {nc} coarse-quantizer cells (nearest centroid by exact integer
    L2 over milli-quantized vectors, ties broken by cell id), each query
    probes its {np} nearest cells, and only those cells' members pay the
    exact distance rerank — the FAISS `IndexIVFFlat` search geometry.
    Centroids here are fixed seed vectors (training is q149's Lloyd
    job); assignment, probe ranking, and rerank are all integer L2 with
    (distance, id) total orders, so the result is bit-deterministic.

    Scale posture: assignment is ONE map-side pass against the broadcast
    centroid table (the standard IVF build cost — at 100 TB it is a
    materialized, cell-partitioned layout, exactly like q155's partition
    pruning); the probe step touches nprobe/ncells of the corpus instead
    of all of it (the measured candidate fraction is asserted in the
    properties test), and the per-query rerank is a rank window
    partitioned by query.""".format(nc=_IVF_NCELLS, np=_IVF_NPROBE)
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))").alias(
            "v"
        ),
    )
    cent = F.broadcast(
        e.filter(F.col("vec_id") < _IVF_NCELLS).select(
            F.col("vec_id").alias("cid"), F.col("v").alias("cv")
        )
    )
    corp = e.filter(F.col("vec_id") >= _IVF_CORP0)
    qs = F.broadcast(
        e.filter(
            (F.col("vec_id") >= _IVF_NCELLS)
            & (F.col("vec_id") < _IVF_NCELLS + _IVF_NQ)
        ).select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    )
    l2 = (
        "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )
    assign = (
        corp.crossJoin(cent)
        .select("vec_id", "v", "cid", F.expr(l2.format(a="v", b="cv")).alias("d"))
        .withColumn(
            "r",
            F.row_number().over(W.partitionBy("vec_id").orderBy("d", "cid")),
        )
        .filter(F.col("r") == 1)
        .select("vec_id", "v", "cid")
    )
    probes = (
        qs.crossJoin(cent)
        .select("qid", "cid", F.expr(l2.format(a="qv", b="cv")).alias("d"))
        .withColumn(
            "r", F.row_number().over(W.partitionBy("qid").orderBy("d", "cid"))
        )
        .filter(F.col("r") <= _IVF_NPROBE)
        .select("qid", "cid")
    )
    cand = (
        probes.join(assign, "cid")
        .join(qs, "qid")
        .select("qid", "vec_id", F.expr(l2.format(a="qv", b="v")).alias("d2"))
    )
    return (
        cand.withColumn(
            "rank", F.row_number().over(W.partitionBy("qid").orderBy("d2", "vec_id"))
        )
        .filter(F.col("rank") <= _IVF_K)
        .select("qid", F.col("rank").cast("bigint").alias("rank"), "vec_id", "d2")
        .orderBy("qid", "rank")
    )
