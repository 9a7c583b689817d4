"""Operational alerting & time-weighted rollups — round-3 wave
(SURVEY.md §2B): a hysteresis (two-threshold) alert state machine over
hourly metric rollups, and time-weighted average price (TWAP) — the
monitoring primitives that sit downstream of every metrics pipeline.
Complements q201 (seasonal z-score anomaly) and q224 (CUSUM changepoint):
those *detect*, these *manage alert state* and *weight by exposure time*.

Key design move (q262): a hysteresis state machine looks inherently
sequential — state(t) depends on state(t−1) — but because the ON
condition (mean > hi) and OFF condition (mean < lo) are disjoint and
state only changes at a crossing, the state at any hour equals the TYPE
OF THE MOST RECENT CROSSING: `last_value(crossing IGNORE NULLS)` over the
per-key hourly frame. That turns an iterative fold into one partitioned
analytic window — embarrassingly parallel across keys at 100 TB, no
recursion, no applyInPandas.

Cross-engine determinism: threshold comparisons never touch FP — the
hourly mean is compared as `sum_cents > HI_CENTS · n` (integer cross-
multiplication; value is 2-dp so cents are exact in int64). TWAP is
Σ(v_cents · Δt_µs)/ΣΔt_µs — all-integer sums (products ≤ 1.3e17 < 2^63),
one final division both engines perform identically.

Scale posture (100 TB):
- q262: hash-agg to (key, hour) grain — map-side combined, |keys|·8760
  rows/year out — then windows PARTITIONED BY key over that tiny rollup.
  No unpartitioned window; per-key hourly state is trivially bounded.
- q263: one window (user, ts-ordered) computing lead(), one hash-agg.
  Interval durations are consumed as they stream past — no per-user
  materialization beyond the window frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

_HI_CENTS = 5300  # alert sets ON when hourly mean > $53.00 ...
_LO_CENTS = 4800  # ... and clears only when it drops below $48.00


@query(
    "q262_hysteresis_alert_state",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             date_trunc('hour', ts) AS hour,
             sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
             count(*) AS n
      FROM events
      GROUP BY 1, 2
    ),
    crossed AS (
      SELECT event_type, hour, sum_cents, n,
             CASE WHEN sum_cents > {_HI_CENTS} * n THEN 'on'
                  WHEN sum_cents < {_LO_CENTS} * n THEN 'off'
             END AS crossing
      FROM hourly
    ),
    stated AS (
      SELECT event_type, hour, sum_cents, n,
             coalesce(last_value(crossing IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ), 'off') AS state
      FROM crossed
    )
    SELECT event_type, hour,
           round(sum_cents::DOUBLE / n / 100, 6) AS mean_value,
           (state = 'on') AS alert_on,
           (state <> coalesce(lag(state) OVER (
              PARTITION BY event_type ORDER BY hour), 'off')) AS is_transition
    FROM stated
    """,
    tags=("monitoring", "alerting", "state-machine", "window"),
)
def hysteresis_alert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-threshold (hysteresis) alerting over hourly mean order value
    per event type: the alert turns ON when the hourly mean exceeds $53
    and clears only below $48 — the dead band that stops threshold
    flapping. Sequential-looking state resolved declaratively: state(h) =
    most recent crossing type (`last_value IGNORE NULLS`), because ON/OFF
    conditions are disjoint and nothing else mutates state. Emits the
    full hourly alert timeline plus transition flags (the rows a pager
    would fire on). All threshold math in integer cents."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    crossed = hourly.withColumn(
        "crossing",
        F.when(F.col("sum_cents") > _HI_CENTS * F.col("n"), F.lit("on")).when(
            F.col("sum_cents") < _LO_CENTS * F.col("n"), F.lit("off")
        ),
    )
    w_state = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_lag = W.partitionBy("event_type").orderBy("hour")
    stated = crossed.withColumn(
        "state",
        F.coalesce(F.last("crossing", ignorenulls=True).over(w_state), F.lit("off")),
    )
    return stated.select(
        "event_type",
        "hour",
        F.round(F.col("sum_cents").cast("double") / F.col("n") / 100, 6).alias(
            "mean_value"
        ),
        (F.col("state") == "on").alias("alert_on"),
        (
            F.col("state")
            != F.coalesce(F.lag("state").over(w_lag), F.lit("off"))
        ).alias("is_transition"),
    )


@query(
    "q263_twap_interval_weighted",
    oracle="""
    WITH stepped AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT user_id,
           count(*)::BIGINT AS n_intervals,
           sum(dur_us)::BIGINT AS span_us,
           round(sum(v_cents * dur_us)::DOUBLE / sum(dur_us) / 100, 6) AS twap
    FROM stepped
    WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id
    """,
    tags=("timeseries", "twap", "interval-weighted"),
)
def twap_interval_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each observation is weighted
    by how long it remained the latest one (step-function integration —
    TWAP), so bursts of events no longer dominate the mean the way they
    do in a plain avg. One lead() window per user for interval durations,
    then a single hash-agg; weights and weighted sums stay integer
    (cents × microseconds) until the one final division. Complements
    q205's OHLC (which keeps order statistics per bucket) with the
    exposure-time-weighted level."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = "unix_micros(CAST(ts AS TIMESTAMP))"
    stepped = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
        (
            F.expr(f"lead({us}) OVER (PARTITION BY user_id ORDER BY ts, event_id)")
            - F.expr(us)
        ).alias("dur_us"),
    )
    return (
        stepped.filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("span_us"),
            F.round(
                F.sum(F.col("v_cents") * F.col("dur_us")).cast("double")
                / F.sum("dur_us")
                / 100,
                6,
            ).alias("twap"),
        )
    )


_HHD_CUT = "2024-01-16"  # window A = first half of the fixture month
_HHD_K = 20


@query(
    "q333_heavy_hitter_churn",
    oracle=f"""
    WITH a AS (
      SELECT user_id, count(*)::BIGINT AS n,
             row_number() OVER (ORDER BY count(*) DESC, user_id) AS rk
      FROM events WHERE ts < TIMESTAMP '{_HHD_CUT} 00:00:00'
      GROUP BY user_id
    ),
    b AS (
      SELECT user_id, count(*)::BIGINT AS n,
             row_number() OVER (ORDER BY count(*) DESC, user_id) AS rk
      FROM events WHERE ts >= TIMESTAMP '{_HHD_CUT} 00:00:00'
      GROUP BY user_id
    ),
    ta AS (SELECT * FROM a WHERE rk <= {_HHD_K}),
    tb AS (SELECT * FROM b WHERE rk <= {_HHD_K})
    SELECT coalesce(ta.user_id, tb.user_id) AS user_id,
           ta.rk AS rank_a, tb.rk AS rank_b,
           ta.n AS n_a, tb.n AS n_b,
           CASE WHEN ta.user_id IS NULL THEN 'entered'
                WHEN tb.user_id IS NULL THEN 'dropped'
                WHEN ta.rk = tb.rk THEN 'held'
                ELSE 'moved' END AS status
    FROM ta FULL OUTER JOIN tb ON ta.user_id = tb.user_id
    """,
    tags=("monitoring", "heavy-hitters", "churn", "topk"),
)
def heavy_hitter_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter churn between adjacent windows — the change-detection
    report layered on top of a top-k (q267 finds the hitters in-stream;
    this says WHO entered, dropped, held, or moved between two periods —
    the on-call question behind every 'top talkers' dashboard). Each
    window's top-20 comes from one count agg + TakeOrderedAndProject;
    the delta is a full outer join of two k-row tables (broadcastable by
    construction). Ranks tie-break on user id for cross-engine
    determinism.

    Scale posture: the per-window aggregation is the only data-scaled
    stage (map-side partial, keyed on the natural user key — one scan
    covers both windows via conditional aggregation at cluster scale);
    everything after operates on 2k rows."""
    ev = table(spark, sf_dir, "events")

    def topk(pred, side: str):
        counts = (
            ev.filter(pred)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        # top-k FIRST via TakeOrderedAndProject (parallel partial top-k per
        # task — never a single-partition rank over all users, the q264
        # pattern); the rank window then runs on the k-row result only
        top = counts.orderBy(F.col("n").desc(), "user_id").limit(_HHD_K)
        w = W.orderBy(F.col("n").desc(), "user_id")
        return top.withColumn("rk", F.row_number().over(w)).select(
            F.col("user_id").alias(f"u_{side}"),
            F.col("rk").alias(f"rank_{side}"),
            F.col("n").alias(f"n_{side}"),
        )

    ta = topk(F.col("ts") < _HHD_CUT, "a")
    tb = topk(F.col("ts") >= _HHD_CUT, "b")
    return (
        ta.join(tb, ta["u_a"] == tb["u_b"], "full_outer")
        .select(
            F.coalesce("u_a", "u_b").alias("user_id"),
            "rank_a",
            "rank_b",
            "n_a",
            "n_b",
            F.when(F.col("u_a").isNull(), "entered")
            .when(F.col("u_b").isNull(), "dropped")
            .when(F.col("rank_a") == F.col("rank_b"), "held")
            .otherwise("moved")
            .alias("status"),
        )
    )


# UCB1 dials: a "win" is an event whose value clears this bar; total plays
# N and per-arm n are integer counts, so ln/sqrt run on identical integers
_UCB_WIN_MIN = 150.0


@query(
    "q367_ucb1_arm_ranking",
    oracle=f"""
    WITH arms AS (
      SELECT event_type AS arm,
             count(*)::BIGINT AS n,
             count(*) FILTER (value >= {_UCB_WIN_MIN})::BIGINT AS wins
      FROM events GROUP BY 1
    ),
    tot AS (SELECT sum(n)::BIGINT AS big_n FROM arms)
    SELECT arm, n, wins,
           (wins * 10000 // n)::BIGINT AS mean_bp,
           CAST(floor((wins::DOUBLE / n
                       + sqrt(2.0 * ln(big_n::DOUBLE) / n)) * 1e6) AS BIGINT)
             AS ucb_score_mu,
           rank() OVER (
             ORDER BY CAST(floor((wins::DOUBLE / n
                            + sqrt(2.0 * ln(big_n::DOUBLE) / n)) * 1e6) AS BIGINT)
                        DESC,
                      arm)::BIGINT AS ucb_rank
    FROM arms CROSS JOIN tot
    """,
    tags=("alerting", "bandit", "ucb", "exploration"),
)
def ucb1_arm_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 multi-armed-bandit arm ranking — the exploration/exploitation
    score an adaptive experimentation platform computes each refresh:
    score(arm) = mean reward + √(2·ln N / n). Means and counts are exact
    integers from one hash agg; the ln/sqrt run ONCE per arm on those
    identical integers and the score is floor-quantized to µ-units
    in-projection (identical sequence of IEEE ops on identical inputs,
    never a float accumulation, never round-on-quotient).

    Scale posture (100 TB): one map-side-combined agg to the arm grid
    (arms are a bounded set), the 1-row total broadcasts, ranking runs on
    grid rows. The reward definition (value ≥ bar) folds into the same
    scan — no second pass."""
    arms = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("arm"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("value") >= _UCB_WIN_MIN, 1)).alias("wins"),
        )
    )
    tot = F.broadcast(arms.agg(F.sum("n").alias("big_n")))
    # floor-µ output (SCALE.md round-on-quotient ban): one shared double
    # expression over exact integers, quantized by floor — never round()
    score = F.expr(
        "CAST(floor((CAST(wins AS DOUBLE) / n"
        " + sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / n)) * 1e6) AS BIGINT)"
    )
    return (
        arms.crossJoin(tot)
        .select(
            "arm",
            "n",
            "wins",
            F.expr("wins * 10000 div n").cast("bigint").alias("mean_bp"),
            score.alias("ucb_score_mu"),
        )
        .withColumn(
            "ucb_rank",
            F.rank().over(W.orderBy(F.desc("ucb_score_mu"), "arm")).cast("bigint"),
        )
    )


# SLA dials: the 99th percentile (disc) per (type × day) must stay under
# this latency bar; a window "burns" when it breaches
_SLA_P99_MAX_CENTS = 47_500  # value*100 as integer latency units


@query(
    "q368_sla_burn_rate",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS lat
      FROM events
    ),
    ranked AS (
      SELECT event_type, day, lat,
             row_number() OVER (PARTITION BY event_type, day ORDER BY lat) AS rn,
             count(*) OVER (PARTITION BY event_type, day) AS n
      FROM obs
    ),
    p99 AS (
      SELECT event_type, day, n::BIGINT AS n, lat::BIGINT AS p99_lat
      FROM ranked
      WHERE rn = CAST(ceil(0.99 * n) AS BIGINT)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n, p99_lat,
           (p99_lat > {_SLA_P99_MAX_CENTS}) AS breached,
           sum(CASE WHEN p99_lat > {_SLA_P99_MAX_CENTS} THEN 1 ELSE 0 END)
             OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT
             AS burn_3d,
           (sum(CASE WHEN p99_lat > {_SLA_P99_MAX_CENTS} THEN 1 ELSE 0 END)
             OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2) AS page_now
    FROM p99
    """,
    tags=("alerting", "sla", "percentile", "burn-rate"),
)
def sla_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA burn-rate monitor — the SRE error-budget mechanic: per
    (service × day) compute the EXACT discrete p99 latency (the value at
    rank ⌈0.99·n⌉ — disc, not interpolated, so it is pure integer rank
    selection), flag breaches against the SLO bar, and page when ≥2 of
    the trailing 3 days breached. Exact-percentile-by-rank keeps both
    engines bit-identical where interpolated percentiles would drift.

    Scale posture (100 TB): the rank window partitions by (type × day) —
    bounded state per partition, never global; the burn window then runs
    on the (type × day) GRID (tens of rows per type), the q354 trailing
    pattern. At 100 TB the per-day rank sort is the only row-scale work
    and shards perfectly."""
    obs = table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("lat"),
    )
    wd = W.partitionBy("event_type", "day")
    ranked = obs.select(
        "event_type",
        "day",
        "lat",
        F.row_number().over(wd.orderBy("lat")).alias("rn"),
        F.count(F.lit(1)).over(wd).alias("n"),
    )
    p99 = ranked.filter(
        F.col("rn") == F.ceil(F.lit(0.99) * F.col("n")).cast("bigint")
    ).select(
        "event_type",
        "day",
        F.col("n").cast("bigint"),
        F.col("lat").alias("p99_lat"),
    )
    burn_w = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(-2, W.currentRow)
    )
    burn = F.sum(
        F.when(F.col("p99_lat") > _SLA_P99_MAX_CENTS, 1).otherwise(0)
    ).over(burn_w)
    return p99.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "p99_lat",
        (F.col("p99_lat") > _SLA_P99_MAX_CENTS).alias("breached"),
        burn.cast("bigint").alias("burn_3d"),
        (burn >= 2).alias("page_now"),
    )


# rate-limit audit dials: max events per user per trailing window
_RL_WINDOW_S = 3_600
_RL_LIMIT = 5


@query(
    "q402_rate_limit_audit",
    oracle=f"""
    WITH obs AS (
      SELECT user_id, event_id, epoch_us(ts)::BIGINT // 1000000 AS sec
      FROM events
    ),
    counted AS (
      SELECT user_id, event_id, sec,
             count(*) OVER (PARTITION BY user_id ORDER BY sec
                            RANGE BETWEEN {_RL_WINDOW_S} PRECEDING
                                      AND CURRENT ROW) AS n_in_window
      FROM obs
    )
    SELECT user_id,
           count(*)::BIGINT                                       AS n_events,
           count(*) FILTER (n_in_window > {_RL_LIMIT})::BIGINT    AS n_throttled,
           max(n_in_window)::BIGINT                               AS peak_in_window,
           (count(*) FILTER (n_in_window > {_RL_LIMIT}) * 10000
              // count(*))::BIGINT                                AS throttle_bp
    FROM counted GROUP BY 1
    """,
    tags=("alerting", "rate-limit", "range-frame", "window"),
)
def rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rate-limit audit — "would this traffic have been
    throttled at N per hour?": for every event, count the same user's
    events in the trailing {_RL_WINDOW_S}-second window with a RANGE
    frame (value-based, so burst events at the same second all see each
    other — a ROWS frame undercounts exactly when it matters), then
    roll up per-user throttle exposure. This is the offline audit run
    before changing a production limiter's threshold.

    Scale posture (100 TB): one user-partitioned range window over
    integer seconds (bounded per-user state, shard-parallel — the q108
    key discipline), rollup reuses the same shuffle. The RANGE frame is
    the one window-frame surface the rest of the repo's ROWS frames
    don't exercise."""
    obs = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").alias("sec"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-_RL_WINDOW_S, W.currentRow)
    )
    counted = obs.select(
        "user_id", F.count(F.lit(1)).over(w).alias("n_in_window")
    )
    return counted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("n_in_window") > _RL_LIMIT, 1)).alias("n_throttled"),
        F.max("n_in_window").alias("peak_in_window"),
        F.expr(
            f"count_if(n_in_window > {_RL_LIMIT}) * 10000 div count(1)"
        ).cast("bigint").alias("throttle_bp"),
    )


# ---- q480: Western Electric control-chart rules ---------------------------


@query(
    "q480_western_electric_rules",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             count(*)::BIGINT AS n,
             sum(x)::BIGINT AS s1,
             sum(x * x)::BIGINT AS s2
      FROM daily GROUP BY event_type
    ),
    lim AS (
      SELECT event_type, n,
             (s1 * 1000000 // n)::BIGINT AS mu_mu,
             CAST(floor(1000000.0 *
                    sqrt(CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) / n)
                  AS BIGINT) AS sigma_mu
      FROM stats
    ),
    dev AS (
      SELECT d.event_type, d.day,
             d.x * 1000000 - l.mu_mu AS dev_mu,
             l.sigma_mu
      FROM daily d JOIN lim l ON l.event_type = d.event_type
    ),
    flags AS (
      SELECT event_type, day,
             CASE WHEN abs(dev_mu) > 3 * sigma_mu THEN 1 ELSE 0 END AS r1,
             CASE WHEN count(*) OVER w3 = 3 AND
                  (sum(CASE WHEN dev_mu > 2 * sigma_mu THEN 1 ELSE 0 END) OVER w3 >= 2
                   OR sum(CASE WHEN dev_mu < -2 * sigma_mu THEN 1 ELSE 0 END) OVER w3 >= 2)
                  THEN 1 ELSE 0 END AS r2,
             CASE WHEN count(*) OVER w5 = 5 AND
                  (sum(CASE WHEN dev_mu > sigma_mu THEN 1 ELSE 0 END) OVER w5 >= 4
                   OR sum(CASE WHEN dev_mu < -sigma_mu THEN 1 ELSE 0 END) OVER w5 >= 4)
                  THEN 1 ELSE 0 END AS r3,
             CASE WHEN count(*) OVER w8 = 8 AND
                  (sum(CASE WHEN dev_mu > 0 THEN 1 ELSE 0 END) OVER w8 = 8
                   OR sum(CASE WHEN dev_mu < 0 THEN 1 ELSE 0 END) OVER w8 = 8)
                  THEN 1 ELSE 0 END AS r4
      FROM dev
      WINDOW w3 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             w5 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             w8 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT f.event_type, l.n AS n_days, l.mu_mu, l.sigma_mu,
           sum(f.r1)::BIGINT AS rule1_days,
           sum(f.r2)::BIGINT AS rule2_days,
           sum(f.r3)::BIGINT AS rule3_days,
           sum(f.r4)::BIGINT AS rule4_days,
           sum(CASE WHEN f.r1 + f.r2 + f.r3 + f.r4 > 0 THEN 1 ELSE 0 END)::BIGINT
             AS any_rule_days
    FROM flags f JOIN lim l ON l.event_type = f.event_type
    GROUP BY f.event_type, l.n, l.mu_mu, l.sigma_mu
    ORDER BY f.event_type
    """,
    tags=("alerting", "control-chart", "western-electric", "spc"),
)
def western_electric_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric control-chart rules — the four classic SPC
    pattern tests over each series' daily volume: (1) one point beyond
    3-sigma, (2) 2 of 3 consecutive beyond 2-sigma on the same side,
    (3) 4 of 5 consecutive beyond 1-sigma on the same side, (4) 8
    consecutive on the same side of the mean. Rules 2-4 catch the
    sustained small shifts a plain 3-sigma monitor (q164) misses and a
    CUSUM (q224) reports only as one changepoint; this emits per-series
    counts of days each rule fires — the control-chart summary an SRE
    dashboard shows.

    Determinism: the center line and sigma come from exact integer
    moments (mu as the truncating s1*1e6 div n; sigma via one IEEE sqrt
    of an exact integer then floor to mu-units); every band test is a
    pure int64 comparison dev_mu vs k*sigma_mu; the run rules are
    integer window sums with an exact full-window count guard. No float
    survives past sigma's single sqrt.

    Scale posture (100 TB): one map-side-combined hash-agg to the
    (series, day) grid; limits are a |series|-row broadcast join; the
    three run windows are PARTITIONED BY series over the bounded grid
    (constant frames, single sort reused); final rollup is series-sized."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.expr("x * x")).cast("bigint").alias("s2"),
    )
    lim = stats.select(
        "event_type",
        "n",
        F.expr("s1 * 1000000 div n").cast("bigint").alias("mu_mu"),
        F.expr(
            "CAST(floor(1000000.0 * sqrt(CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) / n) AS BIGINT)"
        ).alias("sigma_mu"),
    )
    dev = daily.join(F.broadcast(lim), "event_type").select(
        "event_type",
        "day",
        F.expr("x * 1000000 - mu_mu").alias("dev_mu"),
        "sigma_mu",
        "n",
        "mu_mu",
    )
    w3 = W.partitionBy("event_type").orderBy("day").rowsBetween(-2, 0)
    w5 = W.partitionBy("event_type").orderBy("day").rowsBetween(-4, 0)
    w8 = W.partitionBy("event_type").orderBy("day").rowsBetween(-7, 0)
    flags = dev.select(
        "event_type",
        "n",
        "mu_mu",
        "sigma_mu",
        F.expr("CASE WHEN abs(dev_mu) > 3 * sigma_mu THEN 1 ELSE 0 END").alias("r1"),
        F.when(
            (F.count(F.lit(1)).over(w3) == 3)
            & (
                (F.sum(F.expr("CASE WHEN dev_mu > 2 * sigma_mu THEN 1 ELSE 0 END")).over(w3) >= 2)
                | (F.sum(F.expr("CASE WHEN dev_mu < -2 * sigma_mu THEN 1 ELSE 0 END")).over(w3) >= 2)
            ),
            1,
        )
        .otherwise(0)
        .alias("r2"),
        F.when(
            (F.count(F.lit(1)).over(w5) == 5)
            & (
                (F.sum(F.expr("CASE WHEN dev_mu > sigma_mu THEN 1 ELSE 0 END")).over(w5) >= 4)
                | (F.sum(F.expr("CASE WHEN dev_mu < -sigma_mu THEN 1 ELSE 0 END")).over(w5) >= 4)
            ),
            1,
        )
        .otherwise(0)
        .alias("r3"),
        F.when(
            (F.count(F.lit(1)).over(w8) == 8)
            & (
                (F.sum(F.expr("CASE WHEN dev_mu > 0 THEN 1 ELSE 0 END")).over(w8) == 8)
                | (F.sum(F.expr("CASE WHEN dev_mu < 0 THEN 1 ELSE 0 END")).over(w8) == 8)
            ),
            1,
        )
        .otherwise(0)
        .alias("r4"),
    )
    return (
        flags.groupBy("event_type", F.col("n").alias("n_days"), "mu_mu", "sigma_mu")
        .agg(
            F.sum("r1").cast("bigint").alias("rule1_days"),
            F.sum("r2").cast("bigint").alias("rule2_days"),
            F.sum("r3").cast("bigint").alias("rule3_days"),
            F.sum("r4").cast("bigint").alias("rule4_days"),
            F.sum(F.expr("CASE WHEN r1 + r2 + r3 + r4 > 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("any_rule_days"),
        )
        .orderBy("event_type")
    )
