"""Selective backfill & join-size preflight — round-3 wave (SURVEY.md §2B):
the two operational moves a warehouse team makes before/after reprocessing —
recompute ONLY the partitions a late batch touches, and predict a join's
output size from per-key multiplicities without running it.

Scale posture (100 TB):
- q234: the backfill recomputes only the day-cells present in the late
  batch (a broadcast semi-join of affected days against the base scan —
  at scale this is partition pruning on the date-partitioned layout:
  only affected partitions are re-read), then merges recomputed cells
  over the untouched ones. Equality with the full recompute is the
  oracle itself — the correctness property selective backfills usually
  take on faith.
- q235: the preflight is two per-key hash-aggs and one equi-join of
  KEY-cardinality tables (never the facts): exact output-row prediction
  Σ cnt_a(k)·cnt_b(k) plus the max per-side fanouts that tell you
  whether the join needs a skew treatment (q129) before you pay for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

# the "late batch": a deterministic subset that arrives after the base load
_LATE_PRED_SQL = "event_id % 17 = 0"


@query(
    "q234_selective_backfill",
    oracle="""
    SELECT ts::DATE AS day, event_type,
           count(*)::BIGINT AS n,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS total_cents
    FROM events
    GROUP BY 1, 2
    """,
    tags=("warehouse", "backfill", "incremental"),
)
def selective_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data selective backfill, proven lossless: split events into a
    base load and a deterministic late batch (event_id % 17 == 0), build
    the daily rollup from the base only, then repair it by recomputing
    JUST the (day) cells the late batch touches — full data for affected
    days, untouched base cells carried over — and return the repaired
    table. The oracle is the full-data rollup: hash-match proves the
    selective repair equals the full recompute (the invariant backfills
    usually assert only in prose). At scale "affected days" is a
    broadcast semi-join = partition pruning on a date-partitioned
    layout."""
    ev = table(spark, sf_dir, "events")
    late = ev.filter(F.expr(_LATE_PRED_SQL))
    base = ev.filter(~F.expr(_LATE_PRED_SQL))

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("total_cents"),
        )

    base_rollup = rollup(base)
    affected_days = late.select(F.col("ts").cast("date").alias("day")).distinct()
    # recompute affected days from FULL data (base ∪ late)
    repaired = rollup(
        ev.join(F.broadcast(affected_days), F.col("ts").cast("date") == F.col("day"), "left_semi")
    )
    untouched = base_rollup.join(F.broadcast(affected_days), "day", "left_anti")
    return untouched.unionByName(repaired)


@query(
    "q235_join_fanout_preflight",
    oracle="""
    WITH a AS (SELECT o_custkey AS k, count(*)::BIGINT AS ca FROM orders GROUP BY 1),
    b AS (SELECT user_id % 1500 AS k, count(*)::BIGINT AS cb FROM events GROUP BY 1),
    j AS (SELECT a.k, ca, cb FROM a JOIN b USING (k))
    SELECT count(*)::BIGINT                        AS n_shared_keys,
           sum(ca * cb)::BIGINT                    AS predicted_rows,
           max(ca)::BIGINT                         AS max_fanout_a,
           max(cb)::BIGINT                         AS max_fanout_b,
           max(ca * cb)::BIGINT                    AS max_key_output
    FROM j
    """,
    tags=("warehouse", "preflight", "cardinality"),
)
def join_fanout_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size preflight: predict the EXACT output cardinality of a
    prospective (orders ⋈ events-by-derived-user) join from per-key
    multiplicities — Σ over shared keys of cnt_a·cnt_b — plus the
    per-side max fanouts and the hottest key's output contribution, the
    numbers that decide whether the real join needs q129's salting or a
    q175-style prefilter BEFORE a cluster pays for it. Touches only two
    key-cardinality tables (the facts reduce map-side), never the join
    itself."""
    o = table(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("ca"))
    e = table(spark, sf_dir, "events").groupBy(
        (F.col("user_id") % 1500).alias("k")
    ).agg(F.count(F.lit(1)).alias("cb"))
    j = o.join(e, "k")
    return j.agg(
        F.count(F.lit(1)).alias("n_shared_keys"),
        F.sum(F.col("ca") * F.col("cb")).alias("predicted_rows"),
        F.max("ca").alias("max_fanout_a"),
        F.max("cb").alias("max_fanout_b"),
        F.max(F.col("ca") * F.col("cb")).alias("max_key_output"),
    )
