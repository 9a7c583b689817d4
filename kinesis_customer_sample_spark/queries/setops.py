"""Sort / limit / top-k and set operations, plus the SQL entry point.

Order-insensitive hashing can't see sort order directly, so every sort query
pairs the sort with a LIMIT over a unique total order — the selected set is
then exactly the sort's prefix, making sort correctness observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import register_views, table
from kinesis_customer_sample_spark.registry import query


@query(
    "q29_sort_nulls_limit",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_np, o_totalprice
    FROM orders
    ORDER BY status_np ASC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("sort",),
)
def sort_nulls_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement + limit (TopK exec)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_np").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
    )


@query(
    "q30_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "topk"),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    no full sort, no full shuffle. The right plan at any scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q31_union_all",
    oracle="""
    SELECT custkey, count(*) AS n_sources FROM (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
      UNION ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    ) u
    GROUP BY custkey
    """,
    tags=("setop",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — multiplicity surfaced via group-count."""
    rich = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    big = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return rich.unionByName(big).groupBy("custkey").agg(F.count(F.lit(1)).alias("n_sources"))


@query(
    "q32_union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setop",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics) = unionByName + distinct."""
    rich = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    big = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return rich.unionByName(big).distinct()


@query(
    "q33_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers holding both finished and open orders."""
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f_cust.intersect(o_cust)


@query(
    "q34_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop",),
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with finished orders and no pending ones."""
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    p_cust = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    return f_cust.subtract(p_cust)  # EXCEPT (distinct) semantics


@query(
    "q35_sql_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 / 10000.0, 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 20
    """,
    tags=("relational", "sql"),
)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority query (TPC-H Q3 shape) via the spark.sql entry point
    over registered views — same Catalyst plan as the DataFrame API.

    The revenue column is CAST to DOUBLE: in Spark SQL the literal ``10000.0``
    parses as DECIMAL, so without the cast the division yields decimal(24,2)
    while DuckDB's ``/`` yields DOUBLE — numerically identical to the cent but
    rendered differently (``381126.20`` vs ``381126.2``), which fails the
    driver's value hash (the r14 red row). DataFrame-API queries are immune:
    Python float literals lower to DoubleType."""
    register_views(spark, sf_dir, only=("customer", "orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 / 10000.0, 2) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 20
        """
    )


@query(
    "q87_setops_all_variants",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ) t
    """,
    tags=("setops", "multiset"),
)
def setops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops (the _ALL variants keep duplicates with bag
    semantics — min(multiplicity) for intersect): customers by order-status
    cohort. Distinct from q33's set semantics; a customer with 3 'F' and 2
    'O' orders appears twice here, once there."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersectAll(op)


@query(
    "q88_except_all",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ) t
    """,
    tags=("setops", "multiset"),
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference (multiplicity = max(0, n_left − n_right))
    — which repeat-'F' customers exceed their 'O' order count."""
    o = table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.exceptAll(op)


@query(
    "q313_null_aware_anti_join",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer)::BIGINT AS n_customers,
      (SELECT count(*) FROM customer
       WHERE c_custkey NOT IN
         (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
          FROM orders WHERE o_orderstatus = 'F'))::BIGINT AS n_pass_nullable,
      (SELECT count(*) FROM customer
       WHERE c_custkey NOT IN
         (SELECT o_custkey FROM orders
          WHERE o_orderstatus = 'F'))::BIGINT AS n_pass_clean
    """,
    tags=("setops", "null-aware", "anti-join", "three-valued-logic"),
)
def null_aware_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN under three-valued logic — the correctness trap every SQL
    migration hits: one NULL in the subquery list makes `x NOT IN (...)`
    never TRUE, so the nullable-list variant must return 0 rows passing
    (here ~150 of the F-status orders contribute NULL keys), while the
    clean-list variant anti-joins normally. Spark executes the nullable
    case as a NULL-AWARE anti join (a single-key broadcast with the
    streamed-side null check — plan-pinned), NOT a naive anti join that
    would silently return wrong results. The oracle is the identical
    standard SQL in DuckDB, so the hash match certifies both engines
    agree on 3VL semantics — the reason q146-style denylists must
    guarantee null-free lists or use NOT EXISTS."""
    from kinesis_customer_sample_spark.catalog import register_views

    register_views(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(
        """
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_customers,
          (SELECT CAST(count(*) AS BIGINT) FROM customer
           WHERE c_custkey NOT IN
             (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
              FROM orders WHERE o_orderstatus = 'F')) AS n_pass_nullable,
          (SELECT CAST(count(*) AS BIGINT) FROM customer
           WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders
              WHERE o_orderstatus = 'F')) AS n_pass_clean
        """
    )


# ---- q509: top-k WITH TIES semantics ------------------------------------------
_WT_K = 10


@query(
    "q509_topk_with_ties",
    oracle=f"""
    WITH metric AS (
      SELECT p.p_brand, date_trunc('month', o.o_orderdate) AS month,
             CAST(round(sum(l.l_quantity)) AS BIGINT) AS qty
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT p_brand, month, qty,
             rank() OVER (PARTITION BY month ORDER BY qty DESC) AS rk,
             row_number() OVER (PARTITION BY month
                                ORDER BY qty DESC, p_brand) AS rn
      FROM metric
    )
    SELECT month, p_brand, qty,
           rk::BIGINT AS rank,
           CASE WHEN rn <= {_WT_K} THEN 1 ELSE 0 END AS in_plain_topk,
           1 AS tie_spillover_marker
    FROM ranked
    -- months with fewer than k rows keep everything (the WITH TIES
    -- contract): coalesce the absent k-th-rank threshold to +inf
    WHERE rk <= coalesce((SELECT max(r2.rk) FROM ranked r2
                 WHERE r2.month = ranked.month AND r2.rn = {_WT_K}),
                 9223372036854775807)
    ORDER BY month, rank, p_brand
    """,
    tags=("topk", "with-ties", "rank", "sql-surface"),
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (ANSI `FETCH FIRST k ROWS WITH TIES`) — the
    rank-complete form of a leaderboard: every row tying the k-th
    value is kept, so the report can never silently drop half of a tie
    group the way a plain LIMIT k does. Emitted per month over brand
    quantity with the plain-top-k membership flag, so the diff between
    the two semantics (the tie spillover a LIMIT would cut) is visible
    row by row — the q497-style parameter-semantics advisor for every
    "top sellers" report built on this engine.

    Determinism: the metric is an exact integer; WITH TIES is
    rank() <= rank(row_number() = k) — pure integer window logic with
    total tiebreaks on the row_number side.

    Scale posture (100 TB): one fact hash-agg to the (brand, month)
    grid; both windows partition by month over the bounded grid; the
    k-th-rank threshold is a per-month scalar from the same window
    pass (a self-join against the grid, month-keyed)."""
    metric = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(table(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.round(F.sum("l_quantity")).cast("bigint").alias("qty"))
    )
    wm = W.partitionBy("month")
    ranked = metric.select(
        "p_brand",
        "month",
        "qty",
        F.rank().over(wm.orderBy(F.col("qty").desc())).alias("rk"),
        F.row_number().over(wm.orderBy(F.col("qty").desc(), "p_brand")).alias("rn"),
    )
    kth = ranked.filter(F.col("rn") == _WT_K).select(
        F.col("month").alias("month_k"), F.col("rk").alias("rk_at_k")
    )
    return (
        ranked.join(
            F.broadcast(kth), ranked.month == F.col("month_k"), "left"
        )
        .filter(F.col("rk") <= F.coalesce("rk_at_k", F.lit(_WT_K)))
        .select(
            "month",
            "p_brand",
            "qty",
            F.col("rk").cast("bigint").alias("rank"),
            F.expr(f"CASE WHEN rn <= {_WT_K} THEN 1 ELSE 0 END").alias(
                "in_plain_topk"
            ),
            F.lit(1).alias("tie_spillover_marker"),
        )
        .orderBy("month", "rank", "p_brand")
    )
