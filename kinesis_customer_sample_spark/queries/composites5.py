"""Fifth composite wave — the TPC-H decorrelation shapes the suite didn't
cover yet, adapted to the trimmed fixture schemas (no partsupp / comment /
commit-receipt columns — each docstring notes the substitution):

- q143 order-priority check with EXISTS semi-join          (TPC-H Q4 shape)
- q144 customer order-count distribution (double agg)      (TPC-H Q13 shape)
- q145 top supplier(s) by revenue via scalar max join      (TPC-H Q15 shape)
- q146 supplier variety per part group with NOT IN         (TPC-H Q16 shape)
- q147 margin by nation and year (6-way star)              (TPC-H Q9 shape)

All money math is integer cents before aggregation (the round-tie rule in
the registry docstring); every aggregate is aliased identically on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

_LATE_SHIP_DAYS = 60  # proxy for Q4's commitdate<receiptdate (columns absent)


@query(
    "q143_order_priority_check",
    oracle=f"""
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_SHIP_DAYS} DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("composite", "tpch-q4", "exists", "semi-join"),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter that had at least one late
    shipment, counted by priority. The fixture has no commit/receipt
    dates, so "late" = a lineitem shipped more than 60 days after the
    order date — the correlated EXISTS is unchanged. Spark-first plan: the
    EXISTS decorrelates to a LEFT SEMI join on orderkey with the
    correlated date predicate as a join condition; the quarter filter
    prunes orders at the scan, and only (orderkey, orderdate) rows reach
    the semi-join — never full orders, never a subquery per row."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), _LATE_SHIP_DAYS)
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q144_customer_distribution",
    oracle="""
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderdate >= DATE '1998-01-01'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("composite", "tpch-q13", "left-join", "double-agg"),
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders
    (recent orders only — the fixture's comment-filter stand-in, and it
    keeps the zero bucket populated since every fixture customer has at
    least one lifetime order). The left join preserves order-less
    customers; count(o_orderkey) counts only matches. Both aggregations
    are hash-aggs with map-side partials; the second one's input is one
    row per customer, and the result is a tiny distribution table. At
    100 TB the join shuffles on custkey once — the filter on orders is
    pushed to the scan side before the shuffle."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-01-01"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q145_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             -- ::BIGINT: DuckDB sum(BIGINT) is HUGEINT → float64 in pandas
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT
               AS total_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_cents = (SELECT max(total_cents) FROM revenue)
    """,
    tags=("composite", "tpch-q15", "scalar-subquery", "broadcast"),
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter. The view + scalar subquery decorrelates to: aggregate revenue
    per supplier once, reduce that table to a 1-row global max, broadcast
    it back as an equi-join — the revenue table is computed a single time
    and reused for both sides (no re-scan of lineitem for the max).
    Integer-cents revenue makes the max comparison exact — a double `=`
    between two engines' float sums is a coin flip."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(cents).alias("total_cents"))
    )
    best = revenue.agg(F.max("total_cents").alias("best_cents"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best), F.col("total_cents") == F.col("best_cents"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_cents")
    )


@query(
    "q146_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_size % 5 AS size_class,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= 20
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, size_class
    """,
    tags=("composite", "tpch-q16", "not-in", "anti-join", "distinct-agg"),
)
def supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide each part
    group, excluding a denylist (negative-balance suppliers — the
    fixture's stand-in for the complaints filter). The NOT IN subquery
    decorrelates to a LEFT ANTI join against the tiny denylist, which
    broadcasts; part joins broadcast too (dimension); the only shuffle is
    the distinct-count agg on the group keys. NULL-safety note: NOT IN
    with NULLs is three-valued in SQL — the denylist key is a primary key
    here, so anti-join semantics match exactly."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    deny = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(deny), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", (F.col("p_size") % 5).alias("size_class"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q147_margin_by_nation",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
               - CAST(round(p.p_retailprice * 80) AS BIGINT) * CAST(l.l_quantity AS BIGINT)
              )::BIGINT AS margin_cents
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    """,
    tags=("composite", "tpch-q9", "star-join", "broadcast"),
)
def margin_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: margin on a part-name subset by supplier nation and
    order year. The fixture has no partsupp supply cost, so margin =
    revenue − 80% of retail price × quantity (integer cents — the exact
    arithmetic survives any summation order). Plan: part (name-filtered),
    supplier, and nation broadcast; the two fact tables shuffle once on
    their join keys; the aggregate's partials combine map-side. This is
    the same star-join posture as q97, plan-tested there."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    cost_cents = F.round(F.col("p_retailprice") * 80).cast("bigint") * F.col(
        "l_quantity"
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(rev_cents - cost_cents).alias("margin_cents"))
    )
