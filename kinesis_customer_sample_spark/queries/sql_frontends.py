"""Spark 4 SQL front-end surface (SURVEY.md §2B, API-surface family —
companions to q288 pipe syntax / q289 LATERAL / q85 VariantType): SQL
scalar UDFs, session variables + parameterized SQL, and the modern
projection/grouping sugar (GROUP BY ALL, ORDER BY ALL, SELECT * EXCEPT,
lateral column aliases).

These are front-ends, not new operators: each query's value is proving the
sugar lowers to exactly the plan the explicit form produces (plan tests in
tests/test_plans.py) and that results match an oracle written WITHOUT the
sugar — i.e. the convenience surface a reference user would actually type
is safe to adopt wholesale.

Determinism: money flows as integer cents end-to-end (the round-3 parity
rule); the one derived threshold (q295) is computed as a single division of
exact integers, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (plan tests import this module)

from kinesis_customer_sample_spark.catalog import register_views
from kinesis_customer_sample_spark.registry import query

# Quantity band edges for the SQL-UDF CASE ladder (shared literals)
_BAND_LO, _BAND_HI = 15, 35


@query(
    "q294_sql_scalar_udf",
    oracle=f"""
    WITH t AS (
      SELECT CASE WHEN l_quantity < {_BAND_LO} THEN 'small'
                  WHEN l_quantity < {_BAND_HI} THEN 'mid'
                  ELSE 'bulk' END AS band,
             CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
               AS cents
      FROM lineitem
      WHERE l_returnflag <> 'R'
    )
    SELECT band,
           count(*)::BIGINT AS n_lines,
           sum(cents)::BIGINT AS revenue_cents,
           round(sum(cents) / 100.0, 2) AS revenue
    FROM t
    GROUP BY band
    """,
    tags=("sql", "udf", "frontend"),
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (Spark 4 `CREATE TEMPORARY FUNCTION … RETURN expr`):
    `disc_cents` computes discounted revenue in integer cents and
    `qty_band` the quantity band; both are declared in SQL and used from a
    plain query. Catalyst INLINES SQL UDF bodies into the calling plan
    (they are definitions, not black boxes), so the whole query stays in
    codegen — unlike a Python UDF, there is no serialization boundary; the
    plan test asserts no BatchEvalPython appears. The oracle is the same
    query with the UDF bodies textually inlined — matching proves
    definition-inlining preserves semantics."""
    register_views(spark, sf_dir, only=("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(p * (1.0 - d) * 100.0) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE) RETURNS STRING "
        f"RETURN CASE WHEN q < {_BAND_LO} THEN 'small' "
        f"WHEN q < {_BAND_HI} THEN 'mid' ELSE 'bulk' END"
    )
    return spark.sql(
        """
        SELECT qty_band(l_quantity) AS band,
               CAST(count(*) AS BIGINT) AS n_lines,
               sum(disc_cents(l_extendedprice, l_discount)) AS revenue_cents,
               round(sum(disc_cents(l_extendedprice, l_discount)) / 100.0, 2)
                 AS revenue
        FROM lineitem
        WHERE l_returnflag <> 'R'
        GROUP BY qty_band(l_quantity)
        """
    )


@query(
    "q295_session_variables",
    oracle="""
    WITH thr AS (
      SELECT CAST(round(avg(CAST(round(c_acctbal * 100.0) AS BIGINT))) AS BIGINT)
               AS v
      FROM customer
    )
    SELECT c_mktsegment,
           count(*)::BIGINT AS n_rich,
           sum(CAST(round(c_acctbal * 100.0) AS BIGINT))::BIGINT AS bal_cents
    FROM customer, thr
    WHERE CAST(round(c_acctbal * 100.0) AS BIGINT) > thr.v
      AND c_mktsegment <> 'MACHINERY'
    GROUP BY c_mktsegment
    """,
    tags=("sql", "session-variables", "parameterized", "frontend"),
)
def session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 `DECLARE VARIABLE` / `SET VAR`) plus
    named-parameter `spark.sql(..., args=...)`: the mean account balance
    (integer cents, one exact-integer division) is computed INTO a session
    variable, then a parameterized query filters customers above it,
    excluding a segment passed as a named parameter. Variables and
    parameters are bound at analysis time — the optimized plan carries
    only literals, so pushdown/pruning see constants (same posture as a
    BI tool's templated dashboards). Oracle: the same query with the
    variable computed in a CTE and the parameter inlined."""
    register_views(spark, sf_dir, only=("customer",))
    spark.sql("DECLARE OR REPLACE VARIABLE rich_thr BIGINT")
    spark.sql(
        "SET VAR rich_thr = ("
        "SELECT CAST(round(avg(CAST(round(c_acctbal * 100.0) AS BIGINT))) AS BIGINT)"
        " FROM customer)"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_rich,
               sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS bal_cents
        FROM customer
        WHERE CAST(round(c_acctbal * 100.0) AS BIGINT) > rich_thr
          AND c_mktsegment <> :excl
        GROUP BY c_mktsegment
        """,
        args={"excl": "MACHINERY"},
    )


@query(
    "q296_modern_sql_sugar",
    oracle="""
    WITH p AS (
      SELECT o_orderpriority,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             concat(o_orderpriority, '#', CAST(year(o_orderdate) AS BIGINT))
               AS prio_yr,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders
    ),
    g AS (
      SELECT prio_yr, o_orderpriority, yr,
             count(*)::BIGINT AS n_orders,
             sum(cents)::BIGINT AS cents
      FROM p
      GROUP BY prio_yr, o_orderpriority, yr
    )
    SELECT prio_yr, o_orderpriority, yr, n_orders,
           round(cents / 100.0, 2) AS total
    FROM g
    ORDER BY prio_yr, o_orderpriority, yr, n_orders, total
    """,
    tags=("sql", "group-by-all", "star-except", "lateral-alias", "frontend"),
)
def modern_sql_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL projection/grouping sugar in one query: a lateral column
    alias (`prio_yr` built from the `yr` alias defined in the same
    SELECT), GROUP BY ALL (group keys inferred from the non-aggregate
    select list), SELECT * EXCEPT (drop the intermediate cents column),
    and ORDER BY ALL. All four are analysis-time rewrites — the optimized
    plan matches the explicit form (plan test) — so adopting them costs
    nothing at 100 TB. Oracle: the fully explicit equivalent. (Lateral
    aliases may not feed GROUP BY ALL inside the SAME select block —
    Spark raises UNSUPPORTED_FEATURE — hence the two-level shape, which
    is also the readable one.)"""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        SELECT * EXCEPT (cents), round(cents / 100.0, 2) AS total
        FROM (
          SELECT prio_yr, o_orderpriority, yr,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 sum(cents) AS cents
          FROM (
            SELECT o_orderpriority,
                   CAST(year(o_orderdate) AS BIGINT) AS yr,
                   concat(o_orderpriority, '#', yr) AS prio_yr,
                   CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
            FROM orders
          )
          GROUP BY ALL
        )
        ORDER BY ALL
        """
    )
