"""Data-conflation & stream-quality operators — the twelfth wave
(SURVEY.md §2B): field-level golden-record survivorship across ranked
feeds, out-of-order displacement measurement, late-arrival rate
monitoring, and declarative data-contract validation.

Scale posture (100 TB):
- q195 is ONE hash-agg keyed by the record key: per-field survivorship is
  a max_by over (feed priority) per field inside the same aggregation —
  never N self-joins. Feed count multiplies rows linearly; the agg
  reduces them back to one golden row per key with map-side partials.
- q196/q197 are single partitioned windows over the per-user / global
  arrival order — the displacement and late-rate metrics are the batch
  twins of what a streaming watermark monitor accumulates, and both
  reduce to integers before any aggregation.
- q198's checks are independent global aggregates over one scan (Spark
  collapses them into a single pass); the report is |checks| rows, so
  the validation cost is the scan, not the rules.
No Python UDFs; all whole-stage-codegen'd SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query


def _feeds_expr(dialect: str) -> str:
    """Three synthetic feeds from `documents`, each dropping a different
    field (deterministically by doc id), with feed 1 the most trusted.
    Textually parallel across dialects."""
    null_s = "CAST(NULL AS STRING)" if dialect == "spark" else "NULL::VARCHAR"
    null_l = "CAST(NULL AS BIGINT)" if dialect == "spark" else "NULL::BIGINT"
    return (
        # feed 1: authoritative but drops lang on doc_id % 3 = 0
        f"SELECT doc_id, 1 AS feed, "
        f"CASE WHEN doc_id % 3 = 0 THEN {null_s} ELSE lang END AS lang, "
        f"source, CAST(n_chars AS BIGINT) AS n_chars FROM documents "
        f"UNION ALL "
        # feed 2: drops source on doc_id % 3 = 1
        f"SELECT doc_id, 2 AS feed, lang, "
        f"CASE WHEN doc_id % 3 = 1 THEN {null_s} ELSE source END AS source, "
        f"CAST(n_chars AS BIGINT) AS n_chars FROM documents "
        f"UNION ALL "
        # feed 3: drops n_chars on doc_id % 3 = 2
        f"SELECT doc_id, 3 AS feed, lang, source, "
        f"CASE WHEN doc_id % 3 = 2 THEN {null_l} "
        f"ELSE CAST(n_chars AS BIGINT) END AS n_chars FROM documents"
    )


@query(
    "q195_golden_record_merge",
    oracle=f"""
    WITH feeds AS ({_feeds_expr("duckdb")})
    SELECT doc_id,
           max_by(lang, -feed)    FILTER (lang IS NOT NULL)    AS lang,
           max_by(source, -feed)  FILTER (source IS NOT NULL)  AS source,
           max_by(n_chars, -feed) FILTER (n_chars IS NOT NULL) AS n_chars,
           count(*)::BIGINT AS n_feeds
    FROM feeds GROUP BY doc_id
    """,
    tags=("conflation", "golden-record", "survivorship", "mdm"),
)
def golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level golden-record merge: the same entity arrives from
    three feeds of descending trust, each with different fields missing;
    survivorship picks EVERY FIELD independently from the most-trusted
    feed where it is non-null (max_by over -feed, null rows filtered per
    field) — the MDM conflation step record-level keepers (q173, q184)
    cannot express, because the winning record may still carry nulls the
    runner-up can fill. One hash-agg keyed by doc_id, map-side partials;
    N feeds cost N× input rows, never N joins. Feeds are synthesized
    deterministically so every survivorship branch is exercised."""
    register = table(spark, sf_dir, "documents")
    register.createOrReplaceTempView("documents")
    feeds = spark.sql(_feeds_expr("spark"))
    return feeds.groupBy("doc_id").agg(
        F.expr("max_by(lang, -feed) FILTER (WHERE lang IS NOT NULL)").alias("lang"),
        F.expr("max_by(source, -feed) FILTER (WHERE source IS NOT NULL)").alias(
            "source"
        ),
        F.expr("max_by(n_chars, -feed) FILTER (WHERE n_chars IS NOT NULL)").alias(
            "n_chars"
        ),
        F.count(F.lit(1)).alias("n_feeds"),
    )


@query(
    "q196_order_displacement",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS arrival_rk,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS time_rk
      FROM events
    )
    SELECT user_id,
           count(*)::BIGINT                    AS n_events,
           sum(abs(arrival_rk - time_rk))::BIGINT AS total_displacement,
           max(abs(arrival_rk - time_rk))::BIGINT AS max_displacement,
           (sum(abs(arrival_rk - time_rk)) = 0)   AS in_order
    FROM ranked GROUP BY user_id
    """,
    tags=("quality", "ordering", "window", "monitoring"),
)
def order_displacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order displacement per user stream: rank events by arrival
    (event_id ≈ shard sequence number, guide:13) and by event time, and
    measure how far each event sits from its time-ordered position —
    total and max |arrival rank − time rank|. The batch twin of the
    reorder-buffer sizing question: max displacement bounds the state a
    streaming operator needs to emit in timestamp order, and a zero
    total proves the feed is already time-ordered. Two windows over the
    SAME partition key and a hash-agg — one user_id shuffle total."""
    ev = table(spark, sf_dir, "events")
    warr = W.partitionBy("user_id").orderBy("event_id")
    wtime = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id",
        F.row_number().over(warr).alias("arrival_rk"),
        F.row_number().over(wtime).alias("time_rk"),
    )
    disp = F.abs(F.col("arrival_rk") - F.col("time_rk"))
    return ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(disp).cast("long").alias("total_displacement"),
        F.max(disp).cast("long").alias("max_displacement"),
        (F.sum(disp) == 0).alias("in_order"),
    )


@query(
    "q197_late_arrival_rate",
    oracle="""
    WITH arr AS (
      SELECT event_id, ts,
             max(ts) OVER (PARTITION BY user_id % 8 ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS high_water
      FROM events
    )
    SELECT CAST(ts AS DATE) AS day,
           count(*)::BIGINT AS n_events,
           count(*) FILTER (ts < high_water - INTERVAL 10 MINUTE)::BIGINT
             AS n_late,
           (count(*) FILTER (ts < high_water - INTERVAL 10 MINUTE)
            * 10000 // count(*))::BIGINT AS late_bp
    FROM arr GROUP BY 1
    """,
    tags=("quality", "late-data", "watermark", "monitoring"),
)
def late_arrival_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arrival rate against a 10-minute watermark, replayed in
    per-shard arrival order: an event is late when its timestamp trails
    its shard's running event-time high-water mark by more than the
    allowed delay — exactly the rows a `withWatermark("ts", "10
    minutes")` stream would drop (guide:104-106's late-ingestion
    concern, quantified). The high-water mark is tracked PER SHARD
    (user_id % 8 — the partition-key model of the reference's stream,
    whose ordering guarantee is per-shard only, guide:13), which is both
    the faithful semantics and the scale-safe plan: the running max is a
    partitioned window, never a single global task. Reported per day in
    integer basis points — the number that says whether the watermark
    delay is sized right BEFORE late data silently vanishes."""
    ev = table(spark, sf_dir, "events")
    warr = (
        W.partitionBy(F.expr("user_id % 8"))
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    arr = ev.select(
        "ts",
        F.max("ts").over(warr).alias("high_water"),
    )
    late = F.col("ts") < F.col("high_water") - F.expr("INTERVAL 10 MINUTES")
    return arr.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(late, 1)).alias("n_late"),
        F.expr(
            "count(CASE WHEN ts < high_water - INTERVAL 10 MINUTES THEN 1 END)"
            " * 10000 div count(1)"
        )
        .cast("long")
        .alias("late_bp"),
    )


@query(
    "q198_data_contract_checks",
    oracle="""
    SELECT 'orders.o_totalprice_positive' AS check_name,
           (SELECT count(*) FROM orders)::BIGINT AS n_rows,
           (SELECT count(*) FROM orders WHERE o_totalprice <= 0
             OR o_totalprice IS NULL)::BIGINT AS n_violations
    UNION ALL
    SELECT 'orders.o_orderpriority_enum',
           (SELECT count(*) FROM orders)::BIGINT,
           (SELECT count(*) FROM orders
             WHERE o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                OR o_orderpriority IS NULL)::BIGINT
    UNION ALL
    SELECT 'lineitem.l_discount_range',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM lineitem
             WHERE l_discount < 0 OR l_discount > 1
                OR l_discount IS NULL)::BIGINT
    UNION ALL
    SELECT 'lineitem.l_quantity_positive',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM lineitem
             WHERE l_quantity <= 0 OR l_quantity IS NULL)::BIGINT
    UNION ALL
    SELECT 'events.event_type_enum',
           (SELECT count(*) FROM events)::BIGINT,
           (SELECT count(*) FROM events
             WHERE event_type NOT IN ('click','view','purchase','signup','error')
                OR event_type IS NULL)::BIGINT
    UNION ALL
    SELECT 'documents.doc_id_unique',
           (SELECT count(*) FROM documents)::BIGINT,
           (SELECT count(*) - count(DISTINCT doc_id) FROM documents)::BIGINT
    """,
    tags=("quality", "contract", "validation"),
)
def data_contract_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract validation (the dbt-test / Great-
    Expectations shape as one query): positivity, range, enum-membership,
    nullability, and key-uniqueness rules per table, reported as
    (check, rows, violations). ALL checks over one table run inside ONE
    aggregate over ONE scan — a violation counter per check as parallel
    agg columns, then `stack` unpivots the single agg row to the
    per-check report rows. (The original shape unioned one agg per
    check and trusted Catalyst to share the scan; the round-15 plan
    audit showed it does not — union branches don't CSE, so orders and
    lineitem were each scanned twice. One-agg-per-table makes the
    sharing true by construction; a plan test pins scans-per-table
    == 1.) The report is |checks| rows whatever the data volume — the
    contract gate a 100 TB ingest runs before publishing a partition.
    Composes with q182 (referential integrity) for the full pre-publish
    audit."""

    def check_table(df: DataFrame, checks: list) -> DataFrame:
        # One scan, one agg: n_rows + one conditional counter per check,
        # unpivoted to (check_name, n_rows, n_violations) rows.
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                expr.cast("long").alias(f"v{i}")
                for i, (_, expr) in enumerate(checks)
            ],
        )
        stack = ", ".join(f"'{name}', v{i}" for i, (name, _) in enumerate(checks))
        return agg.selectExpr(
            f"stack({len(checks)}, {stack}) AS (check_name, n_violations)",
            "n_rows",
        ).select("check_name", "n_rows", "n_violations")

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    events = table(spark, sf_dir, "events")
    documents = table(spark, sf_dir, "documents")
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    etypes = ["click", "view", "purchase", "signup", "error"]
    parts = [
        check_table(
            orders,
            [
                (
                    "orders.o_totalprice_positive",
                    F.count(
                        F.when(
                            (F.col("o_totalprice") <= 0)
                            | F.col("o_totalprice").isNull(),
                            1,
                        )
                    ),
                ),
                (
                    "orders.o_orderpriority_enum",
                    F.count(
                        F.when(
                            ~F.col("o_orderpriority").isin(prio)
                            | F.col("o_orderpriority").isNull(),
                            1,
                        )
                    ),
                ),
            ],
        ),
        check_table(
            lineitem,
            [
                (
                    "lineitem.l_discount_range",
                    F.count(
                        F.when(
                            (F.col("l_discount") < 0)
                            | (F.col("l_discount") > 1)
                            | F.col("l_discount").isNull(),
                            1,
                        )
                    ),
                ),
                (
                    "lineitem.l_quantity_positive",
                    F.count(
                        F.when(
                            (F.col("l_quantity") <= 0)
                            | F.col("l_quantity").isNull(),
                            1,
                        )
                    ),
                ),
            ],
        ),
        check_table(
            events,
            [
                (
                    "events.event_type_enum",
                    F.count(
                        F.when(
                            ~F.col("event_type").isin(etypes)
                            | F.col("event_type").isNull(),
                            1,
                        )
                    ),
                ),
            ],
        ),
        check_table(
            documents,
            [
                (
                    "documents.doc_id_unique",
                    F.count(F.lit(1)) - F.countDistinct("doc_id"),
                ),
            ],
        ),
    ]
    out = parts[0]
    for c in parts[1:]:
        out = out.unionByName(c)
    return out


@query(
    "q201_seasonal_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    keyed AS (
      SELECT *, date_part('dow', day)::BIGINT AS dow FROM daily
    ),
    baseline AS (
      SELECT dow, event_type,
             (sum(n) // count(*))::BIGINT AS expected
      FROM keyed GROUP BY dow, event_type
    )
    SELECT k.day, k.event_type, k.n, b.expected,
           (abs(k.n - b.expected) * 10000 // b.expected)::BIGINT AS dev_bp,
           (abs(k.n - b.expected) * 10000 // b.expected > 2000) AS anomalous
    FROM keyed k JOIN baseline b USING (dow, event_type)
    """,
    tags=("monitoring", "anomaly", "seasonality"),
)
def seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware volume anomaly detection: each (day, event
    type)'s count is compared against its OWN day-of-week baseline (mean
    daily count for that weekday, truncating integer division), flagging
    deviations above 20% in basis points — the monitor that doesn't page
    on every quiet Sunday. Two hash-aggs over day-granular cells (the
    daily rollup is corpus-reducing; everything after is |days × types|
    rows) and one broadcast-sized join on (dow, type). Day-of-week is
    aligned across engines (Spark dayofweek−1 == DuckDB dow, Sunday=0).
    All integer arithmetic — no float baselines to drift."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    keyed = daily.withColumn(
        "dow", (F.dayofweek("day") - 1).cast("long")
    )
    baseline = keyed.groupBy("dow", "event_type").agg(
        F.expr("sum(n) div count(1)").cast("long").alias("expected")
    )
    joined = keyed.join(F.broadcast(baseline), ["dow", "event_type"])
    dev = F.expr("abs(n - expected) * 10000 div expected")
    return joined.select(
        "day",
        "event_type",
        "n",
        "expected",
        dev.cast("long").alias("dev_bp"),
        (dev > 2000).alias("anomalous"),
    )


@query(
    "q202_time_to_convert",
    oracle="""
    WITH lagged AS (
      SELECT ((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000)::BIGINT AS lag_s
      FROM events p
      JOIN LATERAL (
        SELECT ts FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 7 DAY
        ORDER BY ts DESC, event_id DESC LIMIT 1
      ) c ON TRUE
      WHERE p.event_type = 'purchase'
    ),
    bucketed AS (
      SELECT CASE WHEN lag_s < 60 THEN '0_under_1m'
                  WHEN lag_s < 600 THEN '1_1m_10m'
                  WHEN lag_s < 3600 THEN '2_10m_1h'
                  WHEN lag_s < 21600 THEN '3_1h_6h'
                  WHEN lag_s < 86400 THEN '4_6h_24h'
                  ELSE '5_over_1d' END AS bucket
      FROM lagged
    )
    SELECT bucket, count(*)::BIGINT AS n,
           (count(*) * 10000 // sum(count(*)) OVER ())::BIGINT AS share_bp
    FROM bucketed GROUP BY bucket
    """,
    tags=("analytics", "attribution", "histogram"),
)
def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: click→purchase lags (q177's
    attribution machinery, attributed purchases only) bucketed into six
    latency bands with integer basis-point shares — the marketing answer
    to "how long does the funnel take?". The engine side reuses
    last_touch_attribution verbatim (union+window as-of, one user
    shuffle); the bucket rollup is six rows, and the share window runs
    over those six. Deterministic bucket labels sort chronologically."""
    from kinesis_customer_sample_spark.queries.sketch_retrieval import (
        last_touch_attribution,
    )

    lagged = last_touch_attribution(spark, sf_dir).filter(
        F.col("lag_s").isNotNull()
    )
    bucket = (
        F.when(F.col("lag_s") < 60, "0_under_1m")
        .when(F.col("lag_s") < 600, "1_1m_10m")
        .when(F.col("lag_s") < 3600, "2_10m_1h")
        .when(F.col("lag_s") < 21600, "3_1h_6h")
        .when(F.col("lag_s") < 86400, "4_6h_24h")
        .otherwise("5_over_1d")
    )
    counts = lagged.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "bucket",
        "n",
        F.expr("n * 10000 div sum(n) OVER ()").cast("long").alias("share_bp"),
    )


@query(
    "q203_pareto_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_custkey, n.n_name,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS cents
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, n.n_name
    ),
    ranked AS (
      SELECT n_name, cents,
             sum(cents) OVER (PARTITION BY n_name
                              ORDER BY cents DESC, c_custkey
                              ROWS UNBOUNDED PRECEDING) AS running,
             sum(cents) OVER (PARTITION BY n_name) AS total
      FROM rev
    )
    SELECT n_name,
           count(*)::BIGINT AS n_customers,
           max(total)::BIGINT AS revenue_cents,
           count(*) FILTER (running - cents < total * 8 // 10)::BIGINT
             AS n_to_80pct,
           (count(*) FILTER (running - cents < total * 8 // 10)
            * 10000 // count(*))::BIGINT AS concentration_bp
    FROM ranked GROUP BY n_name
    """,
    tags=("analytics", "pareto", "window", "concentration"),
)
def pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / revenue-concentration analysis: per nation, how many of
    its customers (ranked by revenue) it takes to cover 80% of national
    revenue — the 80/20 concentration metric behind account-tiering and
    risk assessment. A customer counts while the revenue BEFORE them is
    under the 80% line (so the customer crossing the line is included).
    Integer cents end-to-end: the 80% threshold is total·8 div 10,
    cumulative sums are window aggregates PARTITIONED by nation, and the
    final rollup reuses the same key — one shuffle on (nation), one on
    (customer, nation) for the revenue agg. Dimension joins broadcast."""
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    orders = table(spark, sf_dir, "orders")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "n_name")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    wrun = (
        W.partitionBy("n_name")
        .orderBy(F.col("cents").desc(), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy("n_name")
    ranked = rev.select(
        "n_name",
        "cents",
        F.sum("cents").over(wrun).alias("running"),
        F.sum("cents").over(wtot).alias("total"),
    )
    in80 = F.col("running") - F.col("cents") < F.expr("total * 8 div 10")
    return ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.max("total").cast("long").alias("revenue_cents"),
        F.count(F.when(in80, 1)).alias("n_to_80pct"),
        F.expr(
            "count(CASE WHEN running - cents < total * 8 div 10 THEN 1 END)"
            " * 10000 div count(1)"
        )
        .cast("long")
        .alias("concentration_bp"),
    )


# ---- q508: order/lineitem financial reconciliation ---------------------------


@query(
    "q508_financial_reconciliation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            * 100) AS BIGINT))::BIGINT AS charged_c,
             count(*)::BIGINT AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    recon AS (
      SELECT o.o_orderpriority,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_c,
             coalesce(li.charged_c, 0) AS charged_c,
             coalesce(li.n_lines, 0) AS n_lines,
             CAST(round(o.o_totalprice * 100) AS BIGINT)
               - coalesce(li.charged_c, 0) AS diff_c
      FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_orders,
           sum(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END)::BIGINT AS n_lineless,
           sum(CASE WHEN diff_c = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exact,
           sum(CASE WHEN abs(diff_c) <= n_lines THEN 1 ELSE 0 END)::BIGINT
             AS n_within_rounding,
           max(abs(diff_c))::BIGINT AS max_abs_diff_c,
           sum(abs(diff_c))::BIGINT AS total_abs_diff_c,
           sum(diff_c)::BIGINT AS net_diff_c
    FROM recon GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("reconciliation", "finance", "contract", "cross-table"),
)
def financial_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation — the closing-the-books audit
    every billing pipeline runs: does each order's HEADER total equal
    the sum of its LINE charges (extended price net of discount, plus
    tax)? Emits, per priority class, the exact-match count, the
    within-per-line-rounding count (|diff| <= n_lines cents — the
    honest tolerance when each line was rounded independently), the
    worst and total absolute drift, and the NET drift (systematic bias
    vs random rounding). Complements q182's referential integrity
    (keys) and q198's contracts (types/ranges) with the VALUE-level
    consistency dimension; q125's table diff compares snapshots of the
    same table — this reconciles two tables claiming the same money.

    Determinism: both sides quantize to exact integer cents per
    row/line before any arithmetic; every statistic is an exact int64
    aggregate.

    Scale posture (100 TB): one map-side-combined hash-agg per table on
    the SAME join key (orderkey — co-partitioned by construction in a
    bucketed layout), one join at order grain, one rollup to the
    priority grid."""
    li = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("charged_c"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
    recon = (
        table(spark, sf_dir, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            "o_orderpriority",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("header_c"),
            F.coalesce("charged_c", F.lit(0)).alias("charged_c"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            (
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
                - F.coalesce("charged_c", F.lit(0))
            ).alias("diff_c"),
        )
    )
    return (
        recon.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.expr("CASE WHEN n_lines = 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_lineless"),
            F.sum(F.expr("CASE WHEN diff_c = 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(F.expr("CASE WHEN abs(diff_c) <= n_lines THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_within_rounding"),
            F.max(F.abs("diff_c")).cast("bigint").alias("max_abs_diff_c"),
            F.sum(F.abs("diff_c")).cast("bigint").alias("total_abs_diff_c"),
            F.sum("diff_c").cast("bigint").alias("net_diff_c"),
        )
        .orderBy("o_orderpriority")
    )


# ---- q510: duplicate-payment detection ----------------------------------------
_DP_WINDOW_DAYS = 3
_DP_SIMILAR_BP = 100  # amounts within 1% flag as duplicate suspects


@query(
    "q510_duplicate_payment_scan",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    ),
    pairs AS (
      SELECT a.o_custkey,
             a.o_orderkey AS order_a, b.o_orderkey AS order_b,
             a.cents AS cents_a, b.cents AS cents_b,
             abs(date_diff('day', a.d, b.d))::BIGINT AS gap_days,
             (abs(a.cents - b.cents) * 10000
               // greatest(a.cents, b.cents))::BIGINT AS amount_delta_bp
      FROM o a JOIN o b
        ON b.o_custkey = a.o_custkey
       AND b.o_orderkey > a.o_orderkey
       AND b.d >= a.d - INTERVAL {_DP_WINDOW_DAYS} DAY
       AND b.d <= a.d + INTERVAL {_DP_WINDOW_DAYS} DAY
    )
    SELECT o_custkey, order_a, order_b, cents_a, cents_b, gap_days,
           amount_delta_bp,
           CASE WHEN amount_delta_bp <= {_DP_SIMILAR_BP} THEN 1 ELSE 0 END
             AS duplicate_suspect
    FROM pairs
    ORDER BY o_custkey, order_a, order_b
    """,
    tags=("audit", "duplicate-payment", "fraud", "blocked-join"),
)
def duplicate_payment_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment scan — the accounts-payable audit classic: two
    orders from the SAME customer within +-3 days are candidate
    double-submissions; the pair is a duplicate SUSPECT when the
    amounts agree within 1% (retry-with-adjustment, double-billing,
    fraud). Exact dedup (q67) only catches byte-identical records; this
    surfaces the near-miss auditors actually chase — identical payer,
    near-identical time, near-identical money, different identifiers —
    with the full evidence row (both amounts, the gap, the delta) for
    the review queue, not just a verdict.

    Determinism: amounts are exact integer cents; the amount delta is
    an exact integer cross-division in basis points; pair order is
    normalized (order_a < order_b).

    Scale posture (100 TB): candidates are BLOCKED on the customer key
    (the q119/q232 blocking discipline) — per-customer order counts are
    naturally bounded, so the self-join is an equi-join over tiny
    blocks with the day-window and amount predicates applied inside.
    Never amount-unblocked, never cartesian."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("order_a"),
        F.col("cents").alias("cents_a"),
        F.col("d").alias("da"),
    )
    b = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("order_b"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("db"),
    )
    return (
        a.join(b, "o_custkey")
        .filter(
            (F.col("order_b") > F.col("order_a"))
            & (F.col("db") >= F.expr(f"da - INTERVAL {_DP_WINDOW_DAYS} DAY"))
            & (F.col("db") <= F.expr(f"da + INTERVAL {_DP_WINDOW_DAYS} DAY"))
        )
        .select(
            "o_custkey",
            "order_a",
            "order_b",
            "cents_a",
            "cents_b",
            F.abs(F.datediff("db", "da")).cast("bigint").alias("gap_days"),
            F.expr(
                "abs(cents_a - cents_b) * 10000 div greatest(cents_a, cents_b)"
            )
            .cast("bigint")
            .alias("amount_delta_bp"),
        )
        .select(
            "*",
            F.expr(
                f"CASE WHEN amount_delta_bp <= {_DP_SIMILAR_BP} THEN 1 ELSE 0 END"
            ).alias("duplicate_suspect"),
        )
        .orderBy("o_custkey", "order_a", "order_b")
    )
