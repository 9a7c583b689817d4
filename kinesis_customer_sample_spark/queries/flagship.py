"""Flagship query: pricing summary (TPC-H Q1 shape).

One plan touching scan → filter (pushed to parquet) → project → hash
aggregate (partial+final, map-side combine automatic) → sort. This is the
`entry(spark)` smoke query and the first oracle-checked query.

Scale notes: single shuffle on the 6-value (returnflag, linestatus) grouping
key; partial aggregation reduces each map task's output to ≤6 rows, so the
shuffle is O(tasks), not O(rows) — this plan survives 100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

_CUTOFF = "1998-09-02 00:00:00"


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
                                                                       AS sum_base_price,
      round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
            / 10000.0, 2)                                              AS sum_disc_price,
      round(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           * 1000000) AS BIGINT)) / 1000000.0, 2)      AS sum_charge,
      round(sum(l_quantity) / count(*), 4)                             AS avg_qty,
      round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
            / count(*), 4)                                             AS avg_price,
      round(sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0
            / count(*), 6)                                             AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("relational", "aggregation", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # money sums/avgs in integer fixed-point units (q288 convention):
    # associative, so the 2/4/6-dp roundings cannot flip under shuffle
    # order. l_quantity is integer-valued — its double sum is already exact.
    from kinesis_customer_sample_spark.functions import fixed_sum

    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            fixed_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            fixed_sum(disc_price, scale=4).alias("sum_disc_price"),
            fixed_sum(disc_price * (1 + F.col("l_tax")), scale=6).alias("sum_charge"),
            F.round(F.sum("l_quantity") / n, 4).alias("avg_qty"),
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")) / 100.0 / n,
                4,
            ).alias("avg_price"),
            F.round(
                F.sum(F.round(F.col("l_discount") * 100).cast("bigint")) / 100.0 / n, 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
