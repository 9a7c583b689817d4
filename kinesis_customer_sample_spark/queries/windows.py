"""Window functions: ranking, analytic (lag/lead), frames, latest-state.

The latest-state window (q27) is the batch form of the reference's keyed
document tracking (R9, guide:78-82,143): one row per key, newest by event
time — the same row_number()=1 pattern the streaming path uses per
micro-batch.

Window order keys always include a unique tiebreaker (primary key) so
row_number is deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query


@query(
    "q24_win_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY row_number() OVER w <= 10
    """,
    tags=("window", "ranking"),
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per nation, top-10 kept."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 10)
    )


@query(
    "q25_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, event_type,
           round(epoch_us(ts) / 1000000.0
                 - epoch_us(lag(ts) OVER w) / 1000000.0, 3)  AS gap_s,
           lead(event_type) OVER w                           AS next_type,
           first_value(event_type) OVER w                    AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "analytic"),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first over per-user event streams (sessionization primitive)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(us / 1000000.0 - prev_us / 1000000.0, 3).alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
    )


@query(
    "q26_win_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2)
                                                                    AS running_spend,
           round(avg(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0, 4)  AS moving_avg3,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
             RANGE BETWEEN 31536000000000 PRECEDING AND CURRENT ROW) AS n_1y_window
    FROM orders
    """,
    tags=("window", "frames"),
)
def win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames (running sum, moving avg) and a RANGE frame over event
    time (orders in the trailing 365 days), per customer."""
    o = table(spark, sf_dir, "orders")
    w_rows = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_range = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-31536000000000, 0)  # 365 days in microseconds
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).over(
                w_rows.rowsBetween(W.unboundedPreceding, 0)
            )
            / 100.0,
            2,
        ).alias("running_spend"),
        F.round(
            F.avg(F.round(F.col("o_totalprice") * 100).cast("bigint")).over(
                w_rows.rowsBetween(-2, 0)
            )
            / 100.0,
            4,
        ).alias("moving_avg3"),
        F.count(F.lit(1)).over(w_range).alias("n_1y_window"),
    )


@query(
    "q27_win_latest_state",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           o_orderdate AS latest_date, o_orderstatus AS latest_status
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
    tags=("window", "latest-state"),
)
def win_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key — batch form of the reference's keyed document
    state (R9): insert-replaces semantics reduce to newest-event-wins
    (guide:72,78-82,143)."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_date"),
            F.col("o_orderstatus").alias("latest_status"),
        )
    )


@query(
    "q28_win_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           rank() OVER (PARTITION BY p_brand
                        ORDER BY p_retailprice DESC, p_partkey) AS price_rank
    FROM part
    QUALIFY price_rank <= 3
    """,
    tags=("window", "topk"),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: 3 priciest parts per brand (rank + filter)."""
    p = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )
