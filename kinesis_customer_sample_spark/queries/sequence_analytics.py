"""Sequence compression & period-over-period analytics — round-3 wave
(SURVEY.md §2B): run-length encoding of per-user event streams, the
most-common-session-path report, and week-over-week growth — three shapes
product/metrics teams run daily that compose the engine's
gaps-and-islands, ordered-string, and lag-window machinery into new
outputs.

Scale posture (100 TB):
- q239: RLE is gaps-and-islands (q108's shape) with the island reduced
  to (start, length, symbol) — one user_id shuffle, windows ride the
  same partitioning, output is |runs| ≤ |events| rows (the compression).
- q240: session path strings are q212's bounded ordered-code
  construction; the report is a hash-agg over path prefixes + global
  top-10 via TakeOrderedAndProject.
- q241: weekly cells from one hash-agg; lag + growth over the tiny
  (type × week) table. Growth is integer basis points by
  cross-multiplied floor division — no float ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.queries.composites3 import _SESSION_GAP_US
from kinesis_customer_sample_spark.registry import query


@query(
    "q239_event_runs_rle",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_id, event_type,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_idx
      FROM flagged
    )
    SELECT user_id, run_idx::BIGINT AS run_idx, event_type,
           count(*)::BIGINT AS run_len,
           min(ts) AS run_start
    FROM runs
    GROUP BY 1, 2, 3
    """,
    tags=("sequence", "rle", "compression"),
)
def event_runs_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encode each user's event stream: consecutive events of
    the same type (in deterministic (ts, event_id) order) collapse to one
    (run_idx, type, length, start) row — the sequence-compression
    primitive behind dwell-detection and bot-streak analysis, and the
    gaps-and-islands shape with the island itself as the output. One
    user_id shuffle; both windows and the final agg ride it."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    runs = ev.withColumn("brk", brk).withColumn(
        "run_idx", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return runs.groupBy(
        "user_id", F.col("run_idx").cast("bigint").alias("run_idx"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min("ts").alias("run_start"),
    )


@query(
    "q240_common_session_paths",
    oracle="""
    WITH paths AS (
      SELECT user_id, ts::DATE AS day,
             substr(string_agg(substr(event_type, 1, 1), ''
                    ORDER BY ts, event_id), 1, 5) AS path5
      FROM events GROUP BY 1, 2
    )
    SELECT path5, count(*)::BIGINT AS n_sessions
    FROM paths
    GROUP BY path5
    ORDER BY n_sessions DESC, path5
    LIMIT 10
    """,
    tags=("sequence", "pattern", "topk"),
)
def common_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 most common session openings: each (user, day)'s first five
    event codes (q212's ordered one-char encoding, truncated) counted
    across all sessions — the "how do sessions start" report. Path
    construction is one grouped sort-free agg per session; the report is
    a hash-agg over ≤ 5-char strings and a global top-10 via
    TakeOrderedAndProject with a deterministic (count, path) tiebreak."""
    ev = table(spark, sf_dir, "events")
    seq = F.substring(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
                    )
                ),
                lambda x: x["c"],
            ),
            "",
        ),
        1,
        5,
    )
    paths = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        seq.alias("path5")
    )
    return (
        paths.groupBy("path5")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path5")
        .limit(10)
    )


@query(
    "q241_wow_growth",
    oracle="""
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS week,
             count(*)::BIGINT AS n,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, n, cents,
           lag(n)     OVER w AS prev_n,
           lag(cents) OVER w AS prev_cents,
           ((n - lag(n) OVER w) * 10000 // lag(n) OVER w)::BIGINT AS n_growth_bp,
           ((cents - lag(cents) OVER w) * 10000 // lag(cents) OVER w)::BIGINT
             AS cents_growth_bp
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
    tags=("analytics", "period-over-period", "window"),
)
def wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: weekly volume and revenue
    cells (one hash-agg), lagged within the type, growth in integer basis
    points by cross-multiplied floor division — the period-over-period
    report with no float ratio anywhere (first weeks report NULL growth).
    Post-agg state is the tiny (type × week) table."""
    ev = table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
    )
    w = W.partitionBy("event_type").orderBy("week")
    prev_n, prev_c = F.lag("n").over(w), F.lag("cents").over(w)
    return weekly.select(
        "event_type",
        F.col("week").cast("timestamp_ntz").alias("week"),
        "n",
        "cents",
        prev_n.alias("prev_n"),
        prev_c.alias("prev_cents"),
        F.expr(
            "CAST((n - lag(n) OVER (PARTITION BY event_type ORDER BY week)) * 10000 "
            "div lag(n) OVER (PARTITION BY event_type ORDER BY week) AS BIGINT)"
        ).alias("n_growth_bp"),
        F.expr(
            "CAST((cents - lag(cents) OVER (PARTITION BY event_type ORDER BY week)) * 10000 "
            "div lag(cents) OVER (PARTITION BY event_type ORDER BY week) AS BIGINT)"
        ).alias("cents_growth_bp"),
    )


@query(
    "q347_dwell_bounce_rollup",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_type
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    per_sess AS (
      SELECT user_id, sid,
             count(*)::BIGINT AS n_events,
             (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dur_s,
             min_by(event_type, lpad(epoch_us(ts)::VARCHAR, 20, '0') || event_type)
               AS entry_type
      FROM sess GROUP BY user_id, sid
    )
    SELECT entry_type,
           count(*)::BIGINT AS n_sessions,
           sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounces,
           (sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000
              // count(*))::BIGINT AS bounce_bp,
           (sum(dur_s) // count(*))::BIGINT AS avg_dwell_s
    FROM per_sess GROUP BY entry_type
    """,
    tags=("analytics", "sessionization", "bounce-rate", "dwell-time"),
)
def dwell_bounce_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time and bounce-rate report, keyed by session ENTRY event
    type — the canonical web-analytics rollup: sessionize per user with
    the 12 h gap rule (q108's gaps-and-islands machinery; events'
    synthetic inter-arrival median is ≈ 7.3 h), then classify each
    session by its first event, count single-event sessions as bounces,
    and report integer basis-point bounce rate and integer-seconds mean
    dwell. (ts, event_type) is the total order inside a user — ts alone
    can tie in the fixture.

    Scale posture (100 TB): both windows are USER-partitioned (the q108
    argument: user timelines are small and independent); per-session and
    per-entry-type rollups are hash aggs; the final table is
    entry-type-sized. min_by picks the entry event without a second
    window pass."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_type")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    marked = ev.withColumn(
        "is_new",
        F.when(
            prev_us.isNull() | ((us - prev_us) > _SESSION_GAP_US), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr(
            "(unix_micros(CAST(max(ts) AS TIMESTAMP))"
            " - unix_micros(CAST(min(ts) AS TIMESTAMP))) div 1000000"
        )
        .cast("bigint")
        .alias("dur_s"),
        # min_by key: zero-padded micros ++ type — a portable total order
        # (DuckDB min_by has no composite-key overload)
        F.expr(
            "min_by(event_type, lpad(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS STRING), 20, '0') || event_type)"
        ).alias("entry_type"),
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per_sess.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        bounces.cast("bigint").alias("n_bounces"),
        F.expr(
            "CAST(sum(IF(n_events = 1, 1, 0)) * 10000 div count(1) AS BIGINT)"
        ).alias("bounce_bp"),
        F.expr("CAST(sum(dur_s) div count(1) AS BIGINT)").alias("avg_dwell_s"),
    )


# ---- q497: session-gap sensitivity advisor ----------------------------------
_GAPS_S = (600, 1800, 3600)  # candidate inactivity gaps, seconds


@query(
    "q497_session_gap_sensitivity",
    oracle=f"""
    WITH deltas AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
      FROM events
    ),
    stats AS (
      SELECT count(DISTINCT user_id)::BIGINT AS n_users,
             count(*)::BIGINT AS n_events,
             count(delta_us)::BIGINT AS n_deltas,
             {", ".join(f"sum(CASE WHEN delta_us > {g}::BIGINT * 1000000 THEN 1 ELSE 0 END)::BIGINT AS brk_{g}" for g in _GAPS_S)}
      FROM deltas
    )
    {" UNION ALL ".join(f'''
    SELECT {g}::BIGINT AS gap_s, n_users, n_events,
           (n_users + brk_{g})::BIGINT AS n_sessions,
           (n_events * 1000 // (n_users + brk_{g}))::BIGINT
             AS events_per_session_milli,
           (brk_{g} * 10000 // n_deltas)::BIGINT AS break_rate_bp
    FROM stats''' for g in _GAPS_S)}
    ORDER BY gap_s
    """,
    tags=("sessionization", "advisor", "sensitivity", "parameter"),
)
def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-gap sensitivity advisor — before anyone trusts q108's
    30-minute sessionization, this answers 'how sensitive are my session
    counts to the gap parameter?': for each candidate inactivity gap,
    the number of sessions (users + boundary-crossing deltas), mean
    events per session, and the fraction of inter-event deltas that
    break a session. A flat region between two gaps means the choice is
    robust; a cliff means real bimodal behavior the single parameter is
    papering over. The q493/q407 parameter-advisor discipline applied to
    sessionization.

    Determinism: inter-event deltas are exact integer microseconds from
    one partitioned lag window (total order by ts, event_id); every
    statistic per gap is pure integer arithmetic on shared-text
    conditional sums.

    Scale posture (100 TB): ONE per-user lag window over the event
    stream (the q108 sessionization primitive — same cost class), then
    ONE global aggregate computing all gaps' break counts in a single
    pass; the per-gap expansion is a 3-row projection. Adding candidate
    gaps costs one conditional sum each, never another scan."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    deltas = ev.select(
        "user_id",
        (
            us
            - F.lag(us).over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        ).alias("delta_us"),
    )
    stats = deltas.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count("delta_us").cast("bigint").alias("n_deltas"),
        *[
            F.sum(
                F.expr(f"CASE WHEN delta_us > CAST({g} AS BIGINT) * 1000000 THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias(f"brk_{g}")
            for g in _GAPS_S
        ],
    )
    # stack() expands the single stats row to one row per gap WITHOUT
    # re-executing the aggregate per leg (a union of selects re-runs the
    # whole window+agg chain once per gap — 6 scans vs 2)
    stack_args = ", ".join(
        f"CAST({g} AS BIGINT), brk_{g}" for g in _GAPS_S
    )
    return (
        stats.select(
            "n_users",
            "n_events",
            "n_deltas",
            F.expr(f"stack({len(_GAPS_S)}, {stack_args}) AS (gap_s, brk)"),
        )
        .select(
            "gap_s",
            "n_users",
            "n_events",
            F.expr("n_users + brk").cast("bigint").alias("n_sessions"),
            F.expr("n_events * 1000 div (n_users + brk)")
            .cast("bigint")
            .alias("events_per_session_milli"),
            F.expr("brk * 10000 div n_deltas").cast("bigint").alias("break_rate_bp"),
        )
        .orderBy("gap_s")
    )


# ---- q499: day-over-day audience overlap ------------------------------------


@query(
    "q499_audience_overlap",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    sizes AS (SELECT day, count(*)::BIGINT AS n FROM du GROUP BY day),
    inter AS (
      SELECT a.day AS day_a, count(*)::BIGINT AS n_common
      FROM du a JOIN du b ON b.user_id = a.user_id
                        AND b.day = a.day + INTERVAL 1 DAY
      GROUP BY a.day
    )
    SELECT i.day_a, sa.n AS n_day_a, sb.n AS n_day_b, i.n_common,
           (i.n_common * 10000 // (sa.n + sb.n - i.n_common))::BIGINT
             AS jaccard_bp,
           (i.n_common * 10000 // sa.n)::BIGINT AS retained_bp
    FROM inter i
    JOIN sizes sa ON sa.day = i.day_a
    JOIN sizes sb ON sb.day = i.day_a + INTERVAL 1 DAY
    ORDER BY i.day_a
    """,
    tags=("audience", "overlap", "retention", "jaccard"),
)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience overlap — the EXACT set-level view of user
    stickiness: for each consecutive day pair, the Jaccard of the two
    active-user sets and the share of day-A users retained into day B.
    q131's cohort matrix tracks sign-up cohorts and q136's WAU counts
    unique users; this measures set CHURN between adjacent periods,
    the metric that distinguishes a stable audience from a revolving
    door at constant DAU (exact companion to what q271's KMV theta
    sketches estimate at sketch scale).

    Determinism: the (day, user) grid is exact-distinct; the
    intersection is an equi-join on (user, day+1); Jaccard and retention
    are integer basis points.

    Scale posture (100 TB): one distinct to the (day, user) grid (the
    per-day fan-in already bounded by DAU), then ONE self-equi-join on
    user keyed with the adjacent-day predicate, and grid-sized size
    joins. At sketch scale the same report reads q271's KMV unions
    instead — this is the exact path."""
    du = (
        table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    sizes = du.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    b = du.select(
        F.col("user_id"),
        F.expr("day - INTERVAL 1 DAY").cast("date").alias("day"),
    )
    inter = (
        du.join(b, ["user_id", "day"])
        .groupBy(F.col("day").alias("day_a"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("day", "day_a").withColumnRenamed("n", "n_day_a"), "day_a")
        .join(
            sizes.select(
                F.expr("day - INTERVAL 1 DAY").cast("date").alias("day_a"),
                F.col("n").alias("n_day_b"),
            ),
            "day_a",
        )
        .select(
            "day_a",
            "n_day_a",
            "n_day_b",
            "n_common",
            F.expr("n_common * 10000 div (n_day_a + n_day_b - n_common)")
            .cast("bigint")
            .alias("jaccard_bp"),
            F.expr("n_common * 10000 div n_day_a").cast("bigint").alias("retained_bp"),
        )
        .orderBy("day_a")
    )
