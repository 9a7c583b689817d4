"""Relational core: projection, filters, conditionals, and the join family.

Every join type from SURVEY.md §2B: inner, broadcast, left/right/full outer,
semi, anti, cross+theta, range, as-of, self. Joins keep dimension sides
broadcast (no shuffle) and fact-fact joins equi-keyed so Catalyst plans
sort-merge/shuffled-hash with AQE skew handling — the shapes that survive
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.functions import duck_fixed_sum, fixed_sum
from kinesis_customer_sample_spark.operators.asof import asof_join
from kinesis_customer_sample_spark.registry import query


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# ---------------------------------------------------------------- projection


@query(
    "q02_projection_compute",
    oracle="""
    SELECT
      p_partkey,
      upper(p_brand)                       AS brand_uc,
      p_name || '/' || p_type              AS name_type,
      round(p_retailprice * 1.1, 2)        AS marked_up,
      p_size % 10                          AS size_mod,
      length(p_name)                       AS name_len
    FROM part
    """,
    tags=("relational", "projection"),
)
def projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns + aliasing; column pruning should reach the scan."""
    return table(spark, sf_dir, "part").select(
        F.col("p_partkey"),
        F.upper("p_brand").alias("brand_uc"),
        F.concat_ws("/", "p_name", "p_type").alias("name_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        (F.col("p_size") % 10).alias("size_mod"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "q03_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 300000
      AND o_orderpriority LIKE '%H%'
      AND (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F'
           OR o_orderstatus = 'O')
    """,
    tags=("relational", "filter"),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison, IN, BETWEEN, LIKE, and null-safe equality in one predicate."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000, 300000)
        & F.col("o_orderpriority").like("%H%")
        & (
            F.nullif(F.col("o_orderstatus"), F.lit("P")).eqNullSafe(F.lit("F"))
            | (F.col("o_orderstatus") == "O")
        )
    ).select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus")


@query(
    "q04_conditional_case",
    oracle=f"""
    SELECT
      c_mktsegment,
      CASE WHEN c_acctbal < 0 THEN 'debt'
           WHEN c_acctbal < 5000 THEN 'mid'
           ELSE 'high' END                       AS tier,
      count(*)                                   AS n,
      {duck_fixed_sum("c_acctbal")}              AS total_bal
    FROM customer
    GROUP BY c_mktsegment, tier
    """,
    tags=("relational", "conditional"),
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise chain (the decode-branch shape, guide:32-47)."""
    c = table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        c.withColumn("tier", tier)
        .groupBy("c_mktsegment", "tier")
        .agg(F.count(F.lit(1)).alias("n"), fixed_sum(F.col("c_acctbal")).alias("total_bal"))
    )


# --------------------------------------------------------------------- joins


@query(
    "q05_join_inner",
    oracle="""
    SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 350000
    """,
    tags=("relational", "join"),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, row-level output (join itself under test, not an agg)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "q06_join_broadcast_dims",
    oracle=f"""
    SELECT r_name, n_name,
           {duck_fixed_sum("l_extendedprice * (1 - l_discount)", scale=4)} AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("relational", "join", "broadcast"),
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with every dimension broadcast — zero shuffles before the agg.

    At 100 TB the fact table never moves: supplier/nation/region ship to
    executors, the only exchange is the final 2-key aggregation.
    """
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            fixed_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q07_join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey)                    AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("relational", "join"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (n_orders = 0)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@query(
    "q08_join_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nk, count(*) AS n_supp
      FROM supplier WHERE s_acctbal > 4000 GROUP BY s_nationkey
    )
    SELECT coalesce(cust.nk, supp.nk) AS nationkey, n_cust, n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
    tags=("relational", "join"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with gaps on both sides (filters force missing keys)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 4000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "q09_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    tags=("relational", "join"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one large order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q10_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    tags=("relational", "join"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no large order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q11_join_cross_theta",
    oracle="""
    SELECT n_name, r_name
    FROM nation CROSS JOIN region
    WHERE r_regionkey < n_regionkey
    """,
    tags=("relational", "join"),
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + theta predicate (nested-loop shape; both sides tiny)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.crossJoin(r)
        .filter(F.col("r_regionkey") < F.col("n_regionkey"))
        .select("n_name", "r_name")
    )


@query(
    "q12_join_range",
    oracle="""
    SELECT a.user_id, count(*) AS n_pairs,
           round(avg(epoch_us(b.ts) - epoch_us(a.ts)) / 1000000, 2) AS avg_gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 30 MINUTE
    GROUP BY a.user_id
    """,
    tags=("relational", "join", "range"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join: event pairs within 30 minutes per user.

    Equi key (user_id) carries the shuffle; the interval predicate is applied
    inside the sort-merge join, so no cross-join blowup — the scalable form of
    an interval join when a blocking key exists.
    """
    ev = table(spark, sf_dir, "events")
    a = ev.alias("a")
    # merge hint: at test scale events fits under the broadcast threshold,
    # and Spark's BroadcastHashJoin evaluates the interval predicate on the
    # (single-file → single-task) streamed side — measured 3-8× slower AND
    # the opposite of the at-scale plan, where a fact table can never
    # broadcast. Forcing sort-merge keeps the local plan identical to the
    # 100 TB plan and deterministic across runs.
    b = ev.hint("merge").alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.avg(
                    F.unix_micros(F.col("b.ts").cast("timestamp"))
                    - F.unix_micros(F.col("a.ts").cast("timestamp"))
                )
                / 1000000,
                2,
            ).alias("avg_gap_s"),
        )
    )


@query(
    "q13_join_asof",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts AS purchase_ts, r.ts AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    tags=("relational", "join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest 'view' at or before each 'purchase', per user.

    Implemented with the union+window operator (operators/asof.py) — one
    shuffle, O(n+m), no pair materialization. Oracle cross-validates against
    DuckDB's native ASOF JOIN, a completely independent implementation.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    return asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts", right_payload=["ts"]
    ).select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "asof_ts")


@query(
    "q14_join_self",
    oracle="""
    SELECT a.c_nationkey AS nationkey, count(*) AS n_pairs
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE a.c_mktsegment = 'BUILDING' AND b.c_mktsegment = 'BUILDING'
    GROUP BY a.c_nationkey
    """,
    tags=("relational", "join"),
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with aliases: same-nation customer pairs in one segment."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    a = c.alias("a")
    b = c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .groupBy(F.col("a.c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "q97_local_supplier_revenue",
    oracle=f"""
    SELECT n_name,
           {duck_fixed_sum("l_extendedprice * (1 - l_discount)", scale=4)} AS revenue,
           count(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("relational", "join", "composite", "tpch-q5"),
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join tree with a same-nation predicate
    between customer and supplier. The two fact tables shuffle on their join
    keys; supplier/nation/region broadcast; Catalyst pushes the region and
    date filters below the joins (dynamic partition pruning at scale). The
    plan Catalyst picks here is the one a 1000-executor run wants — no
    hand-ordering needed."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            fixed_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q98_returned_item_report",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {duck_fixed_sum("l_extendedprice * (1 - l_discount)", scale=4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "composite", "tpch-q10"),
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the returned-item revenue report — who returned the
    most value last quarter. Fact⋈fact on order key, nation broadcast,
    top-20 via TakeOrderedAndProject (rounded revenue + custkey tiebreak
    for cross-engine determinism)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            fixed_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q288_sql_pipe_syntax",
    oracle="""
    SELECT n_name,
           count(*)::BIGINT AS n_customers,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS total_acctbal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0
    GROUP BY n_name
    """,
    tags=("relational", "sql", "pipe-syntax"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4 / GoogleSQL `|>` operators): the same
    customer-per-nation rollup q06 plans, authored as a linear pipeline —
    `FROM … |> JOIN … |> WHERE … |> AGGREGATE … GROUP BY` — the syntax
    surface that reads in execution order instead of inside-out. Catalyst
    lowers it to the identical logical plan as the nested form (same
    broadcast dim join, same partial agg), so this is a front-end
    coverage query: the oracle is plain ANSI SQL and must hash-match,
    proving pipe-lowered plans compute the same relation. Output is
    integer cents (BIGINT) — the earlier `round(cents / 100.0, 2)` shape
    hash-diverged on the driver's oracle environment at a .xx5-adjacent
    quotient (round-on-quotient hazard, SCALE.md; r7 red row post-mortem)."""
    from kinesis_customer_sample_spark.catalog import register_views

    register_views(spark, sf_dir, only=("customer", "nation"))
    return spark.sql(
        """
        FROM customer
        |> JOIN nation ON c_nationkey = n_nationkey
        |> WHERE c_acctbal > 0
        |> AGGREGATE count(*) AS n_customers,
                     sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS cents
           GROUP BY n_name
        |> SELECT n_name, CAST(n_customers AS BIGINT) AS n_customers,
                  cents AS total_acctbal_cents
        """
    )


@query(
    "q289_lateral_topk_join",
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice, 2) AS price,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      FROM lineitem
    )
    SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
           r.l_linenumber, r.price
    FROM orders o JOIN ranked r ON r.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000 AND r.rn <= 2
    """,
    tags=("relational", "join", "lateral", "topk"),
)
def lateral_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (SQL:1999 LATERAL / CROSS APPLY): for each
    big order, its top-2 priciest line items via a correlated ordered-
    limit subquery — the per-row-subquery SURFACE of what q28 expresses
    with a window. Catalyst DECORRELATES the lateral subquery into a
    ranked join (DomainJoin → window + join), so the plan is the same
    partitioned top-k, not an O(|orders|) loop of point queries — which
    is exactly why the construct survives at 100 TB and why the oracle is
    the explicit window form. The outer filter (o_totalprice > 400k)
    pushes into the orders scan before the join."""
    from kinesis_customer_sample_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
               l.l_linenumber, l.price
        FROM orders o
        JOIN LATERAL (
          SELECT l_linenumber, round(l_extendedprice, 2) AS price
          FROM lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber
          LIMIT 2
        ) l
        WHERE o.o_totalprice > 400000
        """
    )
