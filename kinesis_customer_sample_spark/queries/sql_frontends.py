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

from kinesis_customer_sample_spark.catalog import register_views, table
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
           sum(cents)::BIGINT AS revenue_cents
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
               sum(disc_cents(l_extendedprice, l_discount)) AS revenue_cents
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
           cents AS total_cents
    FROM g
    ORDER BY prio_yr, o_orderpriority, yr, n_orders, total_cents
    """,
    tags=("sql", "group-by-all", "star-except", "lateral-alias", "frontend"),
)
def modern_sql_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL projection/grouping sugar in one query: a lateral column
    alias (`prio_yr` built from the `yr` alias defined in the same
    SELECT), GROUP BY ALL (group keys inferred from the non-aggregate
    select list), SELECT * EXCEPT (drop the intermediate cents column,
    re-emitted as integer total_cents — the round-on-quotient money shape
    is banned, SCALE.md hazards), and ORDER BY ALL. All four are analysis-time rewrites — the optimized
    plan matches the explicit form (plan test) — so adopting them costs
    nothing at 100 TB. Oracle: the fully explicit equivalent. (Lateral
    aliases may not feed GROUP BY ALL inside the SAME select block —
    Spark raises UNSUPPORTED_FEATURE — hence the two-level shape, which
    is also the readable one.)"""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        SELECT * EXCEPT (cents), cents AS total_cents
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


@query(
    "q300_collated_grouping",
    oracle="""
    WITH dim(seg, weight) AS (
      VALUES ('building', 5), ('automobile', 4), ('machinery', 3),
             ('household', 2), ('furniture', 1)
    )
    SELECT lower(c_mktsegment) AS segment_ci,
           count(*)::BIGINT AS n_customers,
           sum(CAST(round(c_acctbal * 100.0) AS BIGINT))::BIGINT AS bal_cents,
           max(dim.weight)::BIGINT AS weight
    FROM customer
    JOIN dim ON dim.seg = lower(c_mktsegment)
    GROUP BY lower(c_mktsegment)
    """,
    tags=("sql", "collation", "frontend", "spark4"),
)
def collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): the market segment is deliberately
    re-cased three ways (upper/lower/initcap by customer key), then
    grouped AND joined under the UTF8_LCASE collation — the engine merges
    the case variants natively, with no lower() scrubbing in the hot
    path. Engine reality worth knowing at scale: collated keys do not
    support binary equality, so Spark 4.1 disables HASH-based joins on
    them — even the 5-row dim join runs as SortMergeJoin (plan-test
    pinned). Collation is therefore free for grouping/filter/compare,
    but join keys on 100 TB facts should be normalized (lower()) before
    the join rather than collated through it. The
    oracle needs no case gymnastics at all: lower() of ANY variant equals
    lower() of the original — which is exactly the semantic contract
    UTF8_LCASE must reproduce; the visible group key is projected through
    lower() so both engines emit identical bytes."""
    register_views(spark, sf_dir, only=("customer",))
    return spark.sql(
        """
        WITH recased AS (
          SELECT CASE CAST(c_custkey % 3 AS INT)
                   WHEN 0 THEN upper(c_mktsegment)
                   WHEN 1 THEN lower(c_mktsegment)
                   ELSE initcap(lower(c_mktsegment))
                 END AS seg_mixed,
                 CAST(round(c_acctbal * 100.0) AS BIGINT) AS cents
          FROM customer
        ),
        dim(seg, weight) AS (
          VALUES ('building', 5), ('automobile', 4), ('machinery', 3),
                 ('household', 2), ('furniture', 1)
        )
        SELECT lower(k) AS segment_ci,
               CAST(count(*) AS BIGINT) AS n_customers,
               sum(cents) AS bal_cents,
               CAST(max(weight) AS BIGINT) AS weight
        FROM (
          SELECT collate(seg_mixed, 'UTF8_LCASE') AS k, cents, dim.weight
          FROM recased
          JOIN dim ON collate(seg_mixed, 'UTF8_LCASE')
                      = collate(dim.seg, 'UTF8_LCASE')
        )
        GROUP BY k
        """
    )


@query(
    "q301_identifier_clause",
    oracle="""
    SELECT o_orderpriority AS grp_key,
           count(*)::BIGINT AS n,
           sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS cents
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("sql", "identifier", "parameterized", "frontend", "spark4"),
)
def identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTIFIER() clause: table, grouping column, and measure column
    all arrive as named PARAMETERS and are resolved as identifiers at
    analysis time — the safe form of dynamic SQL (a templated dashboard
    can never be injected through a parameter, because IDENTIFIER only
    accepts a name, not an expression). The resolved plan is byte-for-byte
    the static query's plan; the oracle is that static query."""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS grp_key,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(round(IDENTIFIER(:val) * 100.0) AS BIGINT)) AS cents
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp)
        """,
        args={"tbl": "orders", "grp": "o_orderpriority", "val": "o_totalprice"},
    )


@query(
    "q302_xml_ingest",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority,
             printf('<o><id>%d</id><prio>%s</prio><total>%d</total></o>',
                    o_orderkey, o_orderpriority,
                    CAST(round(o_totalprice * 100.0) AS BIGINT)) AS xml,
             o_orderkey, CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderpriority AS prio,
           count(*)::BIGINT AS n_orders,
           sum(cents)::BIGINT AS cents,
           min(o_orderkey)::BIGINT AS min_key,
           CAST(regexp_extract(min(xml), '<id>([0-9]+)</id>', 1) AS BIGINT)
             AS xp_min_xml_id
    FROM x
    GROUP BY o_orderpriority
    """,
    tags=("sql", "xml", "sources", "frontend", "spark4"),
)
def xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 `from_xml` + the `xpath_*` family):
    each order is serialized to an XML record (the shape a legacy feed
    would deliver), then parsed back — the typed path through from_xml
    with an explicit schema, plus an xpath_long extraction exercised at
    GROUP granularity (per-row xpath instantiates an evaluator per call
    — the measured anti-pattern; from_xml streams). Aggregating the PARSED fields must reproduce
    the aggregate over the base columns (the oracle): a full
    serialize→parse round-trip proof, the same contract the q96 wire
    decode and q277 byte-edge queries pin for their codecs. Scale: both
    serialization and parsing are map-side codegen'd expressions — no
    shuffle is added by the format hop."""
    orders = table(spark, sf_dir, "orders")
    xml = orders.select(
        F.format_string(
            "<o><id>%d</id><prio>%s</prio><total>%d</total></o>",
            F.col("o_orderkey"),
            F.col("o_orderpriority"),
            F.expr("CAST(round(o_totalprice * 100.0) AS BIGINT)"),
        ).alias("xml")
    )
    parsed = xml.select(
        "xml",
        F.expr("from_xml(xml, 'id BIGINT, prio STRING, total BIGINT')").alias("r"),
    )
    # xpath_* spins a javax XPath evaluator PER CALL — measured 10×+ the
    # whole query's cost when run per row late in a long JVM session — so
    # the per-row path is from_xml (streaming parser) and the xpath API is
    # exercised on the post-aggregation rows only: one call per group.
    return (
        parsed.groupBy(F.col("r.prio").alias("prio"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("r.total").cast("bigint").alias("cents"),
            F.min("r.id").cast("bigint").alias("min_key"),
            F.min("xml").alias("min_xml"),
        )
        .select(
            "prio",
            "n_orders",
            "cents",
            "min_key",
            F.expr("xpath_long(min_xml, '/o/id/text()')").alias("xp_min_xml_id"),
        )
    )


@query(
    "q306_transpose_metrics",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment AS seg,
             count(*)::BIGINT AS n,
             sum(CAST(round(c_acctbal * 100.0) AS BIGINT))::BIGINT AS cents
      FROM customer GROUP BY c_mktsegment
    )
    SELECT 'n' AS key,
           max(CASE WHEN seg = 'AUTOMOBILE' THEN n END)::BIGINT AS "AUTOMOBILE",
           max(CASE WHEN seg = 'BUILDING'   THEN n END)::BIGINT AS "BUILDING",
           max(CASE WHEN seg = 'FURNITURE'  THEN n END)::BIGINT AS "FURNITURE",
           max(CASE WHEN seg = 'HOUSEHOLD'  THEN n END)::BIGINT AS "HOUSEHOLD",
           max(CASE WHEN seg = 'MACHINERY'  THEN n END)::BIGINT AS "MACHINERY"
    FROM m
    UNION ALL
    SELECT 'cents',
           max(CASE WHEN seg = 'AUTOMOBILE' THEN cents END),
           max(CASE WHEN seg = 'BUILDING'   THEN cents END),
           max(CASE WHEN seg = 'FURNITURE'  THEN cents END),
           max(CASE WHEN seg = 'HOUSEHOLD'  THEN cents END),
           max(CASE WHEN seg = 'MACHINERY'  THEN cents END)
    FROM m
    """,
    tags=("sql", "transpose", "reshape", "frontend", "spark4"),
)
def transpose_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4): flip a per-segment metrics table so
    metrics become rows and segments become columns — the report-style
    reshape analysts otherwise hand-roll with one conditional aggregate
    per column (which is exactly what the oracle does). transpose() is
    driver-side only in its column-header collection (the distinct values
    of the pivot column — segment cardinality, a bounded dimension); the
    data pass is a pivot. Both metrics are BIGINT so the transposed
    common type stays integral — no float formatting enters the frame."""
    seg_metrics = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr("CAST(round(c_acctbal * 100.0) AS BIGINT)"))
            .cast("bigint")
            .alias("cents"),
        )
        .orderBy("seg")
    )
    return seg_metrics.transpose()


_BISECT_K = 100


@query(
    "q309_sql_scripting",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS c FROM orders
    ),
    kth AS (
      SELECT c AS kc FROM cents ORDER BY c DESC LIMIT 1 OFFSET {_BISECT_K - 1}
    )
    SELECT (kth.kc - 1)::BIGINT AS threshold_cents,
           (SELECT count(*) FROM cents WHERE c > kth.kc - 1)::BIGINT AS n_above
    FROM kth
    """,
    tags=("sql", "scripting", "control-flow", "frontend", "spark4"),
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN/DECLARE/WHILE/SET): a bisection loop
    over integer cents finds the largest threshold T with ≥100 orders
    strictly above it — i.e. the stored-procedure-style control flow a
    reference user would otherwise ship to an external driver program,
    run engine-native. Each iteration assigns a scalar COUNT subquery
    into a script variable; ~26 halvings converge exactly. The oracle is
    the closed form (the 100th-largest value minus one), so the hash
    match proves the loop's fixed point. This is deliberately a
    SEMANTICS demo: at 100 TB you precompute a histogram/quantile sketch
    (q114/q272) instead of scanning per iteration — the script shows the
    control-flow surface exists and converges, not the recommended plan."""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(
        """
        BEGIN
          DECLARE lo BIGINT DEFAULT -1;
          DECLARE hi BIGINT;
          DECLARE mid BIGINT;
          DECLARE cnt BIGINT;
          SET hi = (SELECT max(CAST(round(o_totalprice * 100.0) AS BIGINT))
                    FROM orders);
          WHILE hi - lo > 1 DO
            SET mid = (lo + hi) DIV 2;
            SET cnt = (SELECT count(*) FROM orders
                       WHERE CAST(round(o_totalprice * 100.0) AS BIGINT) > mid);
            IF cnt >= 100 THEN
              SET lo = mid;
            ELSE
              SET hi = mid;
            END IF;
          END WHILE;
          SELECT lo AS threshold_cents,
                 (SELECT CAST(count(*) AS BIGINT) FROM orders
                  WHERE CAST(round(o_totalprice * 100.0) AS BIGINT) > lo)
                   AS n_above;
        END
        """
    )


@query(
    "q310_variant_explode",
    oracle="""
    WITH kv AS (
      SELECT unnest(json_keys(props)) AS key,
             CAST(json_extract(props, '$.' || unnest(json_keys(props)))
                  AS BIGINT) AS val
      FROM events
    )
    SELECT key,
           count(*)::BIGINT AS n,
           sum(val)::BIGINT AS total,
           min(val)::BIGINT AS vmin,
           max(val)::BIGINT AS vmax
    FROM kv GROUP BY key
    """,
    tags=("sql", "variant", "tvf", "lateral", "frontend", "spark4"),
)
def variant_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The variant_explode table-valued function (Spark 4, companion to
    q85's variant_get): every event's props JSON is parsed ONCE to a
    VariantType and laterally exploded into (key, value) rows — the
    schema-on-read path for semi-structured payloads whose key set is
    not known at query time (q85 requires naming each path; this
    discovers them). Per-key stats aggregate the exploded values. The
    explode is a lateral generator over a map-side parse: no shuffle
    before the final per-key aggregation at any scale."""
    register_views(spark, sf_dir, only=("events",))
    return spark.sql(
        """
        SELECT v.key,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(v.value AS BIGINT)) AS total,
               min(CAST(v.value AS BIGINT)) AS vmin,
               max(CAST(v.value AS BIGINT)) AS vmax
        FROM events, LATERAL variant_explode(parse_json(props)) v
        GROUP BY v.key
        """
    )


@query(
    "q355_dynamic_pivot",
    oracle="""
    SELECT user_id % 10 AS cohort,
           sum(CASE WHEN event_type = 'click'    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS click,
           sum(CASE WHEN event_type = 'error'    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS error,
           sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS purchase,
           sum(CASE WHEN event_type = 'signup'   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS signup,
           sum(CASE WHEN event_type = 'view'     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS view
    FROM events GROUP BY 1
    """,
    tags=("sql", "pivot", "dynamic", "two-phase"),
)
def dynamic_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot — q95 pivots over a HARD-CODED value list; real
    report queries don't know the columns until runtime, so this runs
    the two-phase mechanic every engine (and Spark's own values-less
    `pivot()`) uses under the hood, made explicit: phase 1 collects the
    DISTINCT pivot values (bounded driver metadata, sorted so column
    order is deterministic); phase 2 pivots with that explicit list —
    which, unlike the implicit form, makes the plan reproducible and
    caps the column blow-up at a declared bound.

    Scale posture (100 TB): the distinct-values scan is column-pruned
    and hash-agg'd (event-type-sized result — the sanctioned bounded
    driver read); the pivot itself is one hash agg with map-side
    partials over (cohort × type) cells. A value list exceeding the
    bound fails fast instead of minting a million columns."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("cohort"),
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    values = sorted(
        r["event_type"]
        for r in ev.select("event_type").distinct().collect()
    )
    if len(values) > 50:  # declared column-blow-up bound
        raise ValueError(f"pivot would mint {len(values)} columns (cap 50)")
    return (
        ev.groupBy("cohort")
        .pivot("event_type", values)
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint"))
        .select(
            F.col("cohort").cast("bigint").alias("cohort"),
            *[F.coalesce(F.col(v), F.lit(0)).cast("bigint").alias(v) for v in values],
        )
    )


@query(
    "q356_json_schema_inference",
    oracle="""
    WITH parsed AS (
      SELECT json_extract(props, '$.k')::INT AS k FROM events
    )
    SELECT count(*)::BIGINT AS n_rows,
           count(k)::BIGINT AS n_with_k,
           sum(k)::BIGINT AS k_sum,
           min(k) AS k_min,
           max(k) AS k_max
    FROM parsed
    """,
    tags=("sql", "json", "schema-inference", "two-phase"),
)
def json_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase JSON schema inference — how schemaless payload columns
    become typed at scale: phase 1 samples a BOUNDED prefix of documents
    (deterministic: lowest event_ids) and infers the struct schema via
    schema_of_json on the driver; phase 2 parses EVERY row with the
    inferred schema through from_json — one typed parse, no per-row
    re-inference, and rows missing an inferred field surface as NULLs
    (the R4 error→null posture) instead of failing the scan. This is
    `spark.read.json`'s samplingRatio mechanic made explicit and
    deterministic, the upgrade path for the reference's unbounded `body`
    documents (guide:112-114).

    Scale posture (100 TB): the sample is k rows by explicit id order
    (TakeOrderedAndProject — bounded driver bytes); the full-scan parse
    is a map-only typed projection feeding one hash agg. Schema unions
    across samples happen driver-side on metadata, never on data."""
    ev = table(spark, sf_dir, "events").select("event_id", "props")
    sample = [
        r["props"]
        for r in ev.orderBy("event_id").limit(16).collect()
    ]
    schemas = {
        spark.range(1)
        .select(F.schema_of_json(F.lit(s)).alias("s"))
        .collect()[0]["s"]
        for s in sample
    }
    if len(schemas) != 1:
        # field unions would merge driver-side here; the fixture payload
        # is homogeneous, so a plurality means the sample logic broke
        raise ValueError(f"inconsistent inferred schemas: {schemas}")
    schema = schemas.pop()
    parsed = ev.select(F.from_json("props", schema).alias("p"))
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("p.k").cast("bigint").alias("n_with_k"),
        F.sum("p.k").cast("bigint").alias("k_sum"),
        F.min("p.k").cast("int").alias("k_min"),
        F.max("p.k").cast("int").alias("k_max"),
    )
