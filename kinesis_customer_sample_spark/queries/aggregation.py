"""Aggregation surface: hash agg, distinct, approx, rollup/cube, filtered,
collect, statistics, global agg (SURVEY.md §2B "Aggregation").

All group-bys rely on Spark's automatic partial aggregation (map-side
combine): the shuffle carries one row per (task, group), so low-cardinality
groups cost O(tasks) network regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.functions import duck_fixed_sum, fixed_sum
from kinesis_customer_sample_spark.registry import query

# Money sums use integer fixed-point units (q288 convention, see
# functions.fixed_sum): double summation order can flip a half-cent
# rounding between engines; integer sums are associative and cannot.


@query(
    "q15_agg_groupby_basic",
    oracle=f"""
    SELECT o_orderpriority,
           count(*)                     AS n,
           {duck_fixed_sum("o_totalprice")}  AS total,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                 / count(*), 4)         AS avg_price,
           round(min(o_totalprice), 2)  AS min_price,
           round(max(o_totalprice), 2)  AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregation",),
)
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        fixed_sum(F.col("o_totalprice")).alias("total"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0
            / F.count(F.lit(1)),
            4,
        ).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "q16_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)                    AS n_customers,
           count(DISTINCT o_orderpriority)              AS n_priorities,
           round(sum(DISTINCT round(o_totalprice, 0)), 2) AS sum_distinct_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregation",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates in one group-by (expand-based plan)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.round(F.sum_distinct(F.round(F.col("o_totalprice"), 0)), 2).alias(
            "sum_distinct_price"
        ),
    )


@query(
    "q17_agg_approx_distinct",
    oracle=None,  # HLL sketches differ across engines — driver rows-only check
    tags=("aggregation", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++); exact value is engine-specific,
    so this is a rows-only query. tests/test_operators.py bounds its error
    against the exact count instead."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@query(
    "q18_agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           grouping(r_name, n_name) AS gid,
           count(*)                 AS n_cust,
           {duck_fixed_sum("c_acctbal")} AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("aggregation", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region → nation → grand total, with grouping_id."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_cust"),
            fixed_sum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


@query(
    "q19_agg_cube",
    oracle=f"""
    SELECT c_mktsegment, o_orderstatus,
           grouping(c_mktsegment, o_orderstatus) AS gid,
           count(*)                  AS n,
           {duck_fixed_sum("o_totalprice")} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    """,
    tags=("aggregation", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all four grouping sets in one pass."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            fixed_sum(F.col("o_totalprice")).alias("total"),
        )
    )


@query(
    "q20_agg_filtered",
    oracle=f"""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05)                 AS n_discounted,
           {duck_fixed_sum("CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END")}
                                                                     AS bulk_revenue,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   FILTER (WHERE l_tax = 0) / 100.0, 2)              AS tax_free_rev
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregation", "filtered"),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if, sum(CASE), and FILTER-style sums."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        fixed_sum(
            F.when(F.col("l_quantity") > 25, F.col("l_extendedprice")).otherwise(0.0)
        ).alias("bulk_revenue"),
        F.round(
            F.sum(
                F.when(
                    F.col("l_tax") == 0,
                    F.round(F.col("l_extendedprice") * 100).cast("bigint"),
                )
            )
            / 100.0,
            2,
        ).alias("tax_free_rev"),
    )


@query(
    "q21_agg_collect",
    oracle="""
    SELECT n_name,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           count(DISTINCT c_mktsegment)                                 AS n_segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("aggregation", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted → string-joined (deterministic array agg).

    Joined to a string because list hashing is representation-sensitive
    across engines; the sort makes the set order-stable.
    """
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


@query(
    "q22_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)                 AS sd_qty,
           round(var_samp(l_discount), 8)                    AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(quantile_cont(l_quantity, 0.5), 4)          AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregation", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar + exact median."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
    )


@query(
    "q23_agg_global",
    oracle=f"""
    SELECT count(*)                            AS n_rows,
           count(DISTINCT l_orderkey)          AS n_orders,
           {duck_fixed_sum("l_extendedprice")}  AS total_price,
           round(avg(l_quantity), 6)           AS avg_qty,
           round(min(l_discount), 2)           AS min_disc,
           round(max(l_tax), 2)                AS max_tax
    FROM lineitem
    """,
    tags=("aggregation",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) aggregation — single-row result via two-stage agg."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        fixed_sum(F.col("l_extendedprice")).alias("total_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.min("l_discount"), 2).alias("min_disc"),
        F.round(F.max("l_tax"), 2).alias("max_tax"),
    )
