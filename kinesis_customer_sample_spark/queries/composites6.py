"""Sixth composite wave — the last TPC-H shapes the suite lacked, adapted
to the trimmed fixture schemas (there is no `partsupp` table, so lineitem
doubles as the part–supplier relation; each docstring notes the
substitution):

- q216 min-cost supplier per part (correlated min, ties kept)  (TPC-H Q2 shape)
- q217 promo revenue share, one month                          (TPC-H Q14 shape)
- q218 OR-of-predicate-groups discounted revenue               (TPC-H Q19 shape)
- q219 important-stock parts above a global value threshold    (TPC-H Q11 shape)
- q220 excess-share suppliers (per-part majority shippers)     (TPC-H Q20 shape)

All money math is integer cents before aggregation; quantities are cast to
BIGINT (the fixture generates integral quantities) so threshold comparisons
can never flip on a float ulp. Every aggregate is aliased identically on
both sides.

Scale posture: the decorrelation patterns ARE the point — Q2/Q11/Q20's
correlated subqueries become (a) a per-key partial agg joined back on the
key (q216/q220) or (b) a one-row global agg broadcast under a theta
condition (q219). Dims (part, supplier, nation, region) broadcast; facts
shuffle once on their join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

_CENTS_SQL = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _cents_col() -> F.Column:
    return F.expr(_CENTS_SQL)


@query(
    "q216_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS cost_cents
      FROM lineitem GROUP BY 1, 2
    ),
    best AS (SELECT l_partkey, min(cost_cents) AS min_cost FROM supply GROUP BY 1)
    SELECT p.p_partkey, p.p_type, p.p_size,
           s.s_suppkey, s.s_name, n.n_name AS nation,
           sp.cost_cents AS min_cost_cents
    FROM supply sp
    JOIN best b ON sp.l_partkey = b.l_partkey AND sp.cost_cents = b.min_cost
    JOIN part p ON p.p_partkey = sp.l_partkey
    JOIN supplier s ON s.s_suppkey = sp.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
    """,
    tags=("composite", "tpch-q2", "correlated-min"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the European supplier(s)
    offering it at the minimum cost. `partsupp.ps_supplycost` is absent, so
    cost = the cheapest observed extendedprice per (part, supplier) in
    lineitem — same correlated-scalar-min structure. Decorrelated the
    standard way: per-(part, supplier) partial agg → per-part min → equi
    join back on (part, min). Ties keep every minimal supplier (Q2
    semantics). part/supplier/nation/region broadcast; the only big
    shuffle is the lineitem partial agg on (partkey, suppkey)."""
    li = table(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias(
            "cost_cents"
        )
    )
    best = supply.groupBy("l_partkey").agg(F.min("cost_cents").alias("min_cost"))
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        supply.join(
            best,
            (supply["l_partkey"] == best["l_partkey"])
            & (supply["cost_cents"] == best["min_cost"]),
        )
        .drop(best["l_partkey"])
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "p_partkey",
            "p_type",
            "p_size",
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("cost_cents").alias("min_cost_cents"),
        )
    )


@query(
    "q217_promo_revenue",
    oracle=f"""
    SELECT sum(CASE WHEN p.p_type = 'PROMO' THEN {_CENTS_SQL} ELSE 0 END)::BIGINT
             AS promo_cents,
           sum({_CENTS_SQL})::BIGINT AS total_cents,
           (sum(CASE WHEN p.p_type = 'PROMO' THEN {_CENTS_SQL} ELSE 0 END) * 10000
              // sum({_CENTS_SQL}))::BIGINT AS promo_share_bp
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-03-01' AND l.l_shipdate < DATE '1996-04-01'
    """,
    tags=("composite", "tpch-q14", "conditional-agg"),
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the share of March-1996 revenue earned by PROMO
    parts, in integer basis points (floor division — no float ratio
    crosses the oracle). One broadcast join (part is the dim), one global
    conditional agg; the shipdate predicate pushes to the lineitem scan."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = _cents_col()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
    total = F.sum(cents)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            promo.alias("promo_cents"),
            total.alias("total_cents"),
            F.expr(
                f"CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_CENTS_SQL} ELSE 0L END) * 10000 "
                f"div sum({_CENTS_SQL}) AS BIGINT)"
            ).alias("promo_share_bp"),
        )
    )


@query(
    "q218_or_predicate_revenue",
    oracle=f"""
    SELECT count(*)::BIGINT AS n_lines,
           sum({_CENTS_SQL})::BIGINT AS revenue_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
             AND l.l_quantity >= 1 AND l.l_quantity <= 15)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 5 AND 25
             AND l.l_quantity >= 10 AND l.l_quantity <= 25)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 15 AND 50
             AND l.l_quantity >= 20 AND l.l_quantity <= 35)
    """,
    tags=("composite", "tpch-q19", "or-predicates"),
)
def or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd predicate groups, each
    mixing part attributes (brand, size) with lineitem attributes
    (quantity) — the disjunctive-predicate join the optimizer cannot split
    into separate scans without a union. Spark evaluates the OR after the
    broadcast join exactly like the oracle; the per-group conjuncts that
    touch only `part` prune the broadcast side at build time."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    groups = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & q.between(1, 15))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(5, 25) & q.between(10, 25))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(15, 50) & q.between(20, 35))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(groups)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_cents_col()).alias("revenue_cents"),
        )
    )


@query(
    "q219_important_stock",
    oracle=f"""
    WITH per_part AS (
      SELECT l.l_partkey, sum({_CENTS_SQL})::BIGINT AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT l_partkey, value_cents
    FROM per_part
    WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM per_part)
    """,
    tags=("composite", "tpch-q11", "global-threshold"),
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supplied value (from NATION_3
    suppliers) exceeds 0.1% of that nation's total supplied value — the
    correlated GLOBAL scalar subquery, decorrelated as a one-row aggregate
    broadcast into a theta filter (cross-multiplied integers: value·1000 >
    total, i.e. value > total/1000, no division). The per-part agg and the
    global total share one scan lineage; supplier/nation broadcast."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    per_part = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents_col()).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("grand_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("grand_total"))
        .select("l_partkey", "value_cents")
    )


@query(
    "q220_excess_share_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS BIGINT))::BIGINT AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2
    ),
    part_tot AS (
      SELECT l_partkey, sum(supp_qty) AS part_qty FROM shipped GROUP BY 1
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM shipped sh
    JOIN part_tot pt ON sh.l_partkey = pt.l_partkey
    JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_type = 'SMALL'
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sh.supp_qty * 2 > pt.part_qty
    """,
    tags=("composite", "tpch-q20", "threshold-semi-join"),
)
def excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of some SMALL
    part's 1996 volume (`partsupp.ps_availqty` is absent, so "excess
    availability" becomes majority share of shipped quantity — the same
    per-key-threshold-vs-correlated-total structure). Quantities are
    BIGINT sums and the threshold is cross-multiplied (qty·2 > total), so
    no float appears anywhere. Plan: one lineitem partial agg on
    (part, supp), a per-part rollup of THAT (tiny), equi join back, dims
    broadcast, DISTINCT to supplier grain."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("supp_qty")
    )
    part_tot = shipped.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select("p_partkey")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        shipped.join(part_tot, "l_partkey")
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .distinct()
    )


@query(
    "q331_forecast_revenue_change",
    oracle="""
    SELECT count(*)::BIGINT AS n_lines,
           (sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
              / 10000.0)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "aggregation", "tpch-q6"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): the pure filter-scan
    aggregate — what additional revenue would have come in had these
    discounts been eliminated. The last missing TPC-H shape: with q331
    and q332 every expressible TPC-H query has a named twin (Q12's
    shipmode columns don't exist in the fixture; q332 remaps its shape).
    All four predicates push into the parquet scan (plan-audited); the
    sum is one map-side-partial global agg in integer 1e-4 units (the
    discount·price product has 4 decimals — fixed_sum convention).
    The BETWEEN on a double column compares against exactly-representable
    0.05/0.07 boundary literals, and fixture discounts are 2-decimal
    doubles — both engines make identical inclusion decisions."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000)
                    .cast("bigint")
                )
                / 10000.0
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "q332_shipping_modes_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("relational", "join", "tpch-q12"),
)
def shipping_modes_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes & order priority), remapped onto
    the fixture's columns: the fixture lineitem carries no
    l_shipmode/l_commitdate/l_receiptdate, so the ship-class dimension
    is l_returnflag and the late-delivery window is the ship-date year —
    the SHAPE under test (fact⋈fact equi-join feeding per-class
    conditional priority counts) is Q12's exactly. One join keyed on
    orderkey, one hash agg with two CASE sums — both map-side-partial;
    the date filter pushes into the lineitem scan before the join."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_returnflag")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )
