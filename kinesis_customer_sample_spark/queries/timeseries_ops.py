"""Time-series resampling operators — the round-3 wave (SURVEY.md §2B):
OHLC downsampling (candlestick bars) and exponentially-weighted moving
averages, the two reductions a metrics/market-data pipeline runs constantly
that nothing in q126/q136/q164/q201 covers (those interpolate, count, or
z-score; neither preserves first/last-in-bucket nor applies geometric
decay).

Scale posture (100 TB):
- q205 is one hash aggregation on (event_type, bucket): min_by/max_by carry
  ONE (order-key, value) pair per group through the partial/final agg —
  first/last never materialize the bucket's rows, so map-side combine does
  almost all the work and the shuffle is |buckets| rows. The bucket key is
  derived (`window(ts, ...)`), so partition pruning on a date-partitioned
  layout still applies to the underlying scan.
- q206 folds each user's ordered series inside one `aggregate()` lambda —
  JVM codegen, no Python. State per key is the user's (ts, value) series:
  the same bounded-series assumption q76's profiles make, valid while any
  one key's history fits an executor (≈ millions of points). For unbounded
  keys the incremental form is a `flatMapGroupsWithState` running
  `acc = a*acc + (1-a)*v` with O(1) state — the fold here IS that
  recurrence, so switching is a re-plumb, not a re-derivation.

Cross-engine exactness: the EWMA fold performs the identical IEEE-754
double sequence (same order, same `acc*0.9 + v*0.1` ops) in Spark's
`aggregate` and DuckDB's `list_reduce`, so results match bit-for-bit before
the defensive round(4). OHLC does no float arithmetic at all — max/min and
order-statistic selection only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query


@query(
    "q205_ohlc_downsample",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL 15 MINUTE, ts) AS bucket_start,
           first(value ORDER BY ts, event_id) AS open,
           max(value)                         AS high,
           min(value)                         AS low,
           last(value ORDER BY ts, event_id)  AS close,
           count(*)::BIGINT                   AS n_obs
    FROM events
    GROUP BY 1, 2
    """,
    tags=("timeseries", "resample", "aggregation"),
)
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream into 15-minute OHLC (open/high/low/close)
    bars per event_type — the canonical lossy time-series compaction.
    Spark side: `min_by`/`max_by` keyed on struct(ts, event_id) select the
    bucket's first/last observation with a deterministic tiebreak (struct
    comparison is lexicographic), while high/low are plain max/min — all
    four travel as single values through partial aggregation, so a bucket
    with a billion ticks still contributes four numbers to the shuffle.
    The oracle uses DuckDB's ordered-aggregate `first/last (ORDER BY)`
    form of the same selection."""
    ev = table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return (
        ev.groupBy(
            "event_type",
            F.window("ts", "15 minutes")["start"].alias("bucket_start"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            "event_type",
            F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "n_obs",
        )
    )


@query(
    "q206_ewma_smoothing",
    oracle="""
    SELECT user_id,
           count(*)::BIGINT AS n_obs,
           CAST(floor(list_reduce(
             list_prepend(0.0::DOUBLE, list(value::DOUBLE ORDER BY ts, event_id)),
             (acc, v) -> acc * 0.9 + v * 0.1) * 1000000.0) AS BIGINT) AS ewma_mu,
           (sum(CAST(round(value * 100) AS BIGINT)) * 10000
             // count(*))::BIGINT AS plain_avg_mu
    FROM events
    GROUP BY user_id
    """,
    tags=("timeseries", "smoothing", "higher-order"),
)
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.1) of each user's
    value series, seeded at 0 — the standard streaming smoother, computed
    batch-side as an ordered fold: sort the collected (ts, event_id, value)
    series once, then `aggregate(..., acc*0.9 + v*0.1)` inside whole-stage
    codegen. Emitted next to the plain mean so downstream can see the decay
    effect. The oracle runs the identical fold via `list_reduce` over
    DuckDB's ordered `list()` aggregate — same FP sequence, exact match.

    Determinism (r7 fix): the fold's double is bit-identical both engines,
    but round(x, 4) is NOT a shared algorithm — Spark rounds the exact
    decimal expansion (BigDecimal HALF_UP) while DuckDB rounds via float
    multiply, and a boundary-straddling value diverges in the last digit
    (one user in 1500 at sf0.1). Both outputs are therefore quantized by
    the shared floor(x*1e6) text (ewma_mu), and the plain mean is the
    exact integer-cents rational sum_cents*10^4 div n (plain_avg_mu) —
    float summation order never matters."""
    ev = table(spark, sf_dir, "events")
    series = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda x: x["value"],
    )
    fold = F.aggregate(
        series,
        F.lit(0.0).cast("double"),
        lambda acc, v: acc * F.lit(0.9) + v * F.lit(0.1),
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.floor(fold * F.lit(1000000.0)).cast("bigint").alias("ewma_mu"),
        F.expr("sum(CAST(round(value * 100) AS BIGINT)) * 10000 div count(1)")
        .cast("bigint")
        .alias("plain_avg_mu"),
    )


@query(
    "q223_linear_interpolation",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS ts
      FROM bounds
    ),
    u AS (
      SELECT user_id, ts, value, event_id, 0 AS is_grid FROM events
      UNION ALL
      SELECT user_id, ts, NULL, NULL, 1 FROM grid
    ),
    w AS (
      SELECT user_id, ts, is_grid,
             last_value(CASE WHEN is_grid = 0
                             THEN struct_pack(ts := ts, v := value) END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, is_grid, coalesce(event_id, 0)
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
             first_value(CASE WHEN is_grid = 0
                              THEN struct_pack(ts := ts, v := value) END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, is_grid, coalesce(event_id, 0)
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM u
    )
    SELECT user_id, ts AS grid_ts,
           round(prev.v + (nxt.v - prev.v)
                 * (CAST(epoch_us(ts) - epoch_us(prev.ts) AS DOUBLE)
                    / CAST(epoch_us(nxt.ts) - epoch_us(prev.ts) AS DOUBLE)), 6)
             AS interp_value
    FROM w
    WHERE is_grid = 1 AND prev IS NOT NULL AND nxt IS NOT NULL
    """,
    tags=("timeseries", "interpolation", "upsample"),
)
def linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsample each user's series to a 6-hour grid by LINEAR INTERPOLATION
    between the surrounding observations — the interpolating twin of
    q126's LOCF gap fill, and the q13/q189 union+window as-of shape run in
    BOTH directions at once: actuals and grid points interleave in one
    partitioned window (actuals sort before grid at equal ts, so an exact-
    hit grid point interpolates to the observation itself via zero
    weight), each grid row carries ONE (ts, value) struct per direction,
    and the fraction is integer-µs arithmetic before a single double
    division — identical FP sequence in both engines. One shuffle on
    user_id; grid points outside a user's observed range drop out (no
    extrapolation)."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"), F.max("ts").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(t0, t1, interval 6 hours)")).alias("ts"),
    )
    actual = ev.select(
        "user_id", "ts", "value", "event_id", F.lit(0).alias("is_grid")
    )
    gridded = grid.select(
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(1).alias("is_grid"),
    )
    u = actual.unionByName(gridded)
    obs = F.when(F.col("is_grid") == 0, F.struct("ts", F.col("value").alias("v")))
    order = [F.col("ts"), F.col("is_grid"), F.coalesce("event_id", F.lit(0))]
    wp = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = u.select(
        "user_id",
        "ts",
        "is_grid",
        F.last(obs, ignorenulls=True).over(wp).alias("prev"),
        F.first(obs, ignorenulls=True).over(wn).alias("nxt"),
    )
    frac = F.expr(
        "CAST(unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(prev.ts AS TIMESTAMP)) AS DOUBLE) "
        "/ CAST(unix_micros(CAST(nxt.ts AS TIMESTAMP)) - unix_micros(CAST(prev.ts AS TIMESTAMP)) AS DOUBLE)"
    )
    return (
        carried.filter(
            (F.col("is_grid") == 1)
            & F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
        )
        .select(
            "user_id",
            F.col("ts").alias("grid_ts"),
            F.round(F.col("prev.v") + (F.col("nxt.v") - F.col("prev.v")) * frac, 6).alias(
                "interp_value"
            ),
        )
    )


_BT_SEASON = 7  # seasonal-naive lag (days)


@query(
    "q283_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, ts::DATE AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    paired AS (
      SELECT event_type, day, cents,
             lag(cents, {_BT_SEASON}) OVER (
               PARTITION BY event_type ORDER BY day) AS fc
      FROM daily
    )
    SELECT event_type,
           count(*)::BIGINT AS n_days,
           (sum(abs(cents - fc)) // count(*))::BIGINT AS mae_cents,
           (sum(1000 * abs(cents - fc) // cents) // count(*))::BIGINT
             AS mape_milli
    FROM paired WHERE fc IS NOT NULL
    GROUP BY event_type
    """,
    tags=("timeseries", "forecast", "backtest"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting: score the SEASONAL-NAIVE forecast (each
    day's prediction = the value 7 days earlier — the baseline every
    real forecasting model must beat, and the denominator of MASE)
    against daily revenue per event type, reporting MAE and MAPE. One
    key-partitioned lag window over the daily rollup, one hash-agg; all
    error arithmetic is integer (cents, milli-APE via integer division
    per day before averaging) so engines agree exactly. At 100 TB the
    rollup is |keys|·|days| rows and the backtest adds nothing beyond
    the window pass — the pattern extends to any stored forecast table
    by replacing the lag with a join on (key, day)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    from pyspark.sql import Window as W

    paired = daily.withColumn(
        "fc",
        F.lag("cents", _BT_SEASON).over(
            W.partitionBy("event_type").orderBy("day")
        ),
    ).filter(F.col("fc").isNotNull())
    return paired.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("sum(abs(cents - fc)) div count(1)").cast("bigint").alias(
            "mae_cents"
        ),
        F.expr("sum(1000 * abs(cents - fc) div cents) div count(1)")
        .cast("bigint")
        .alias("mape_milli"),
    )


_CONC_HOLD_US = 30 * 60 * 1_000_000  # each event holds a presence slot 30 min


@query(
    "q320_sweepline_concurrency",
    oracle=f"""
    WITH b AS (
      SELECT epoch_us(ts)::BIGINT AS t, 1 AS delta FROM events
      UNION ALL
      SELECT epoch_us(ts)::BIGINT + {_CONC_HOLD_US}, -1 FROM events
    ),
    per_t AS (
      SELECT t, sum(delta)::BIGINT AS net, count(*)::BIGINT AS n_b
      FROM b GROUP BY t
    ),
    run AS (
      SELECT t, n_b,
             sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)::BIGINT AS v
      FROM per_t
    )
    SELECT CAST(make_timestamp(t) AS DATE) AS day,
           max(v)::BIGINT AS max_concurrent,
           (array_agg(v ORDER BY t DESC))[1]::BIGINT AS eod_concurrent,
           sum(n_b)::BIGINT AS n_boundaries
    FROM run
    GROUP BY 1
    """,
    tags=("timeseries", "sweep-line", "interval", "concurrency"),
)
def sweepline_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: how many presence intervals (event time +
    30 min hold) overlap at once, per day — the capacity-planning /
    license-peak / max-connections metric that interval overlap cannot
    express as a plain group-by. Each event emits +1/−1 boundary rows;
    boundaries collapse per timestamp (so same-instant orderings are
    moot — the post-instant value is order-free), and the running sum
    over boundary time is the live concurrency, rolled up to per-day
    peak and end-of-day level.

    Scale posture (100 TB): the textbook sweep line is a GLOBAL ordered
    scan — the un-parallelizable formulation. This one is two-phase:
    per-day partitioned cumulative sums (one shuffle on day), then each
    day's carry-in is the prefix of per-day NET totals — a window over
    the day-level table, whose row count is the calendar (bounded — 36k
    rows for a century), not the data. The same decomposition tiles down
    to hour/minute keys if days are still too hot."""
    ev = table(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    b = ev.select("t", F.lit(1).alias("delta")).unionAll(
        ev.select((F.col("t") + _CONC_HOLD_US).alias("t"), F.lit(-1).alias("delta"))
    )
    per_t = b.groupBy("t").agg(
        F.sum("delta").cast("long").alias("net"),
        F.count(F.lit(1)).cast("long").alias("n_b"),
    ).withColumn("day", F.to_date(F.timestamp_micros(F.col("t"))))
    w_day = W.partitionBy("day").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    within = per_t.withColumn("v_in_day", F.sum("net").over(w_day))
    day_tot = per_t.groupBy("day").agg(F.sum("net").cast("long").alias("day_net"))
    # carry-in: prefix sum over the bounded day-level table (rows = calendar
    # days, not data) — exclusive prefix so each day starts at the previous
    # days' closing level
    w_cal = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    carry = day_tot.withColumn(
        "carry", F.coalesce(F.sum("day_net").over(w_cal), F.lit(0))
    ).select("day", "carry")
    run = within.join(F.broadcast(carry), "day").withColumn(
        "v", (F.col("v_in_day") + F.col("carry")).cast("long")
    )
    return run.groupBy("day").agg(
        F.max("v").cast("bigint").alias("max_concurrent"),
        F.max_by("v", "t").cast("bigint").alias("eod_concurrent"),
        F.sum("n_b").cast("bigint").alias("n_boundaries"),
    )


@query(
    "q323_lag1_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT event_type, x,
             lead(x) OVER (PARTITION BY event_type ORDER BY day) AS y
      FROM daily
    ),
    m AS (
      SELECT event_type,
             count(*)::BIGINT   AS n_pairs,
             sum(x)::BIGINT     AS sx,
             sum(y)::BIGINT     AS sy,
             sum(x * y)::BIGINT AS sxy,
             sum(x * x)::BIGINT AS sxx,
             sum(y * y)::BIGINT AS syy
      FROM pairs WHERE y IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_pairs,
           CASE WHEN (n_pairs * sxx - sx * sx) > 0
                 AND (n_pairs * syy - sy * sy) > 0
                THEN CAST(round(
                  1000000.0 * (n_pairs * sxy - sx * sy)
                  / sqrt((n_pairs * sxx - sx * sx)::DOUBLE
                         * (n_pairs * syy - sy * sy)::DOUBLE)) AS BIGINT)
                ELSE NULL END AS r1_mu
    FROM m
    """,
    tags=("timeseries", "autocorrelation", "stats"),
)
def lag1_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series lag-1 autocorrelation of daily event volumes — the
    seasonality/persistence screen run before fitting any forecasting
    model (q283's seasonal-naive backtest assumes exactly this structure;
    this measures it). Pairs are consecutive OBSERVED days (one lead over
    a per-series ordered window); the Pearson r over (x_d, x_{d+1}) is
    assembled from pure integer moments — n·Σxy − ΣxΣy over the exact
    integer variance products — with doubles entering only in the final
    sqrt/divide, whose operands are exact int64 (< 2⁵³, so the one
    double expression is IEEE-identical across engines; the q323/q311
    exactness recipe). Degenerate (zero-variance) series emit NULL.

    Scale posture: one day-level pre-aggregation (map-side partial), one
    per-series window over the bounded calendar, one 5-key moment agg —
    nothing row-scaled shuffles twice."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    pairs = daily.withColumn("y", F.lead("x").over(w)).filter(F.col("y").isNotNull())
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "event_type",
        "n_pairs",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                1000000.0 * cov / F.sqrt(vx.cast("double") * vy.cast("double"))
            ).cast("bigint"),
        ).alias("r1_mu"),
    )


@query(
    "q334_interevent_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) // 1000000
               - lag(epoch_us(ts) // 1000000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM events
    ),
    m AS (
      SELECT user_id,
             count(*)::BIGINT   AS n_gaps,
             sum(g)::BIGINT     AS sum_s,
             sum(g * g)::BIGINT AS sum_s2
      FROM gaps WHERE g IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           (sum_s // n_gaps)::BIGINT AS mean_gap_s,
           CASE WHEN sum_s >= 100
                THEN ((n_gaps * sum_s2 - sum_s * sum_s)
                        // ((sum_s * sum_s) // 10000))::BIGINT
                ELSE NULL END AS cv2_bp
    FROM m
    WHERE n_gaps >= 2
    """,
    tags=("timeseries", "point-process", "burstiness"),
)
def interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event burstiness per user — the point-process screen that
    separates steady heartbeats from bursty humans from retry storms:
    the squared coefficient of variation of inter-event gaps,
    CV² = σ²/μ² (CV²≈0 periodic, ≈1 Poisson, ≫1 bursty). Entirely
    integer: gaps in whole seconds (epoch-µs integer division — NOT a
    rounded float), moments (n, Σg, Σg²), and
    CV²_bp = (n·Σg² − (Σg)²) ÷ ((Σg)² ÷ 10⁴) — a nested truncating
    division identical on both engines, avoiding the >2⁶³ overflow that
    scaling the numerator by 10⁴ first would risk. int64 bound: Σg² per
    user < 2⁶³ up to ~month-long horizons at second granularity
    (documented q321-class bound). Users with fewer than 2 gaps or
    sub-100 s span emit no/NULL score.

    Scale posture: one lag window partitioned by the natural user key,
    one moment agg on the same key — single data-scaled shuffle."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000")
    gaps = ev.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    m = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("sum_s"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("sum_s2"),
    )
    cv2 = F.expr(
        "(n_gaps * sum_s2 - sum_s * sum_s) div ((sum_s * sum_s) div 10000)"
    )
    return m.filter(F.col("n_gaps") >= 2).select(
        "user_id",
        "n_gaps",
        F.expr("sum_s div n_gaps").cast("long").alias("mean_gap_s"),
        F.when(F.col("sum_s") >= 100, cv2).cast("long").alias("cv2_bp"),
    )


@query(
    "q372_time_weighted_average",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(ts AS DATE) AS day, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    seg AS (
      SELECT event_type, day, cents,
             epoch_us(lead(ts) OVER (PARTITION BY event_type, day ORDER BY ts, cents)
                      - ts)::BIGINT AS dur_us
      FROM obs
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           count(*)::BIGINT                       AS n_segments,
           sum(dur_us)::BIGINT                    AS held_us,
           (sum(cents * dur_us) // sum(dur_us))::BIGINT AS twap_cents
    FROM seg WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY 1, 2
    """,
    tags=("timeseries", "twap", "interval-weighted", "window"),
)
def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) — the irregular-sampling mean every
    metrics/market system needs (TimescaleDB's `time_weight`, kdb's
    wavg): each observation's value is HELD until the next observation,
    so the day's average weights each value by its holding duration, not
    by sample count — a sensor that reports 1000× while flat no longer
    drowns the one spike. Last-observation-carried-forward segments come
    from one lead() per (series × day); the weighted mean is exact
    integer cents·µs div µs — durations are MICROSECONDS end to end
    because the fixture's timestamps are sub-second and second-grain
    truncation (Spark) vs rounding (DuckDB epoch()) drifts by ±1 s.

    Scale posture (100 TB): the window partitions by (series × day) —
    the q368 bounded-partition discipline, shardable to any width; the
    rollup reuses the same shuffle keys (no second exchange). Zero-length
    segments (duplicate timestamps) drop out by the dur > 0 guard on
    both sides identically."""
    obs = table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("event_type", "day").orderBy("ts", "cents")
    seg = obs.select(
        "event_type",
        "day",
        "cents",
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dur_us"),  # ntz→timestamp under the pinned-UTC session
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    return seg.groupBy(
        "event_type", F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dur_us").alias("held_us"),
        F.expr("sum(cents * dur_us) div sum(dur_us)").cast("bigint").alias("twap_cents"),
    )


# interval-union dials: each event claims ±30 min of user attention
_IU_PAD_MIN = 30


@query(
    "q392_interval_union_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id,
             ts - INTERVAL {_IU_PAD_MIN} MINUTE AS lo,
             ts + INTERVAL {_IU_PAD_MIN} MINUTE AS hi
      FROM events
    ),
    marked AS (
      SELECT user_id, lo, hi,
             CASE WHEN lo <= max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS is_new
      FROM iv
    ),
    grouped AS (
      SELECT user_id, lo, hi,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY lo, hi
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    islands AS (
      SELECT user_id, island, min(lo) AS start_ts, max(hi) AS end_ts,
             count(*)::BIGINT AS n_intervals
      FROM grouped GROUP BY 1, 2
    )
    SELECT user_id,
           count(*)::BIGINT AS n_islands,
           sum(n_intervals)::BIGINT AS n_intervals,
           (sum(epoch_us(end_ts - start_ts)) // 60000000)::BIGINT
             AS covered_minutes
    FROM islands GROUP BY 1
    """,
    tags=("timeseries", "intervals", "union", "coverage"),
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key interval UNION (merge overlapping intervals) — the set-
    algebra primitive under attention/uptime/coverage metrics: each
    event claims ±{_IU_PAD_MIN} min, overlapping claims merge into
    islands, and covered time is the sum of island lengths — counting
    overlap once, which a naive Σ(hi−lo) double-counts. The merge is
    the RUNNING-MAX variant of gaps-and-islands (an interval is new only
    if it starts after the max end seen so far — plain lag() fails on
    nested intervals, the classic bug).

    Scale posture (100 TB): one user-partitioned window chain (q108
    discipline), aggs reuse the same key. Durations are exact integer
    µs (the q372 lesson) floored to minutes once at the end."""
    iv = table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("ts") - F.expr(f"INTERVAL {_IU_PAD_MIN} MINUTES")).alias("lo"),
        (F.col("ts") + F.expr(f"INTERVAL {_IU_PAD_MIN} MINUTES")).alias("hi"),
    )
    w = W.partitionBy("user_id").orderBy("lo", "hi")
    marked = iv.select(
        "user_id",
        "lo",
        "hi",
        F.when(
            F.col("lo")
            <= F.max("hi").over(w.rowsBetween(W.unboundedPreceding, -1)),
            0,
        )
        .otherwise(1)
        .alias("is_new"),
    )
    grouped = marked.select(
        "user_id",
        "lo",
        "hi",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("island"),
    )
    islands = grouped.groupBy("user_id", "island").agg(
        F.min("lo").alias("start_ts"),
        F.max("hi").alias("end_ts"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_intervals").alias("n_intervals"),
        F.expr(
            "sum(unix_micros(CAST(end_ts AS TIMESTAMP)) "
            "- unix_micros(CAST(start_ts AS TIMESTAMP))) div 60000000"
        ).cast("bigint").alias("covered_minutes"),
    )


@query(
    "q405_clamped_running_balance",
    oracle="""
    WITH flows AS (
      SELECT event_type, ts, event_id,
             CASE WHEN user_id % 3 = 0
                  THEN -CAST(round(value * 100) AS BIGINT)
                  ELSE CAST(round(value * 100) AS BIGINT) END AS flow_c
      FROM events
    ),
    pref1 AS (
      SELECT event_type, ts, event_id,
             sum(flow_c) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS p
      FROM flows
    ),
    pref AS (
      SELECT event_type, p,
             least(0, min(p) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)) AS floor_p
      FROM pref1
    )
    SELECT event_type,
           count(*)::BIGINT                              AS n_flows,
           count(*) FILTER (p - floor_p = 0)::BIGINT     AS n_stockout_points,
           max(p - floor_p)::BIGINT                      AS peak_balance_c,
           (sum(p - floor_p) // count(*))::BIGINT        AS mean_balance_c,
           (-min(floor_p))::BIGINT                       AS total_lost_demand_c
    FROM pref GROUP BY 1
    """,
    tags=("timeseries", "running-balance", "clamp", "closed-form"),
)
def clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-clamped running balance (stock-outs / cash-register / water-
    tank) — the nonlinear recurrence S_t = max(0, S_{t−1} + x_t) that
    looks like it needs per-row iteration, solved in CLOSED WINDOW FORM
    by the folding identity S_t = P_t − min(0, min_{j≤t} P_j) (prefix
    sum minus its running floor). One pass, two stacked windows, exact
    integers — the technique that keeps "iterative" business recurrences
    out of applyInPandas. The audit reports stock-out points, the peak
    and mean balance, and total lost demand (the clamp's absorbed
    deficit).

    Scale posture (100 TB): both windows partition by series with the
    same ordering (one shuffle, one sort — Spark plans them in a single
    Window node chain); the rollup reuses the key. No Python, no
    recursion, no state."""
    flows = table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.col("user_id") % 3 == 0,
            -F.round(F.col("value") * 100).cast("bigint"),
        )
        .otherwise(F.round(F.col("value") * 100).cast("bigint"))
        .alias("flow_c"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pref = flows.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("flow_c").over(w).alias("p"),
    ).select(
        "event_type",
        "p",
        F.least(F.lit(0), F.min("p").over(w)).alias("floor_p"),
    )
    bal = F.col("p") - F.col("floor_p")
    return pref.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_flows"),
        F.count(F.when(bal == 0, 1)).alias("n_stockout_points"),
        F.max(bal).alias("peak_balance_c"),
        F.expr("sum(p - floor_p) div count(1)").cast("bigint").alias("mean_balance_c"),
        (-F.min("floor_p")).cast("bigint").alias("total_lost_demand_c"),
    )



def _stream_twap_oracle() -> str:
    """q408's oracle IS q372's, spliced from the registry (the q400
    composition pattern): stream/batch equivalence demands the batch
    definition verbatim, so drift is impossible."""
    from kinesis_customer_sample_spark.registry import REGISTRY

    return REGISTRY["q372_time_weighted_average"].oracle


@query(
    "q408_stream_twap_stateful",
    oracle=_stream_twap_oracle(),
    tags=("streaming", "stateful", "timeseries", "twap"),
)
def stream_twap_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming TWAP via `applyInPandasWithState` — q372's holding-
    segment fold as live keyed state, the q206/q213 batch/stream pairing
    applied to time-weighted averages: state per (series × day) is five
    integers (last observation + accumulated cents·µs / µs / segments);
    each arriving observation CLOSES the previous one's segment, so the
    running TWAP is exact at every batch boundary. Oracle is q372's SQL
    spliced verbatim from the registry — bit-exact stream/batch
    equivalence for LOCF-integrated state, with the same (ts, cents)
    tie order and the same zero-duration skip. Final value per key via
    max_by(n_segments) (monotone per batch, q213 discipline).

    State posture (100 TB): O(1) integers per open (series × day) key;
    at production a day-grain key count is bounded and old days stop
    receiving events (an EventTimeTimeout would GC them, the q245
    surface)."""
    from kinesis_customer_sample_spark.streaming.replay import (
        events_stream,
        run_to_completion,
    )
    from kinesis_customer_sample_spark.streaming.stateful import twap_stream

    obs = events_stream(spark, sf_dir).select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    updates = run_to_completion(twap_stream(obs), output_mode="update")
    return updates.groupBy("event_type", "day").agg(
        F.max("n_segments").alias("n_segments"),
        F.max_by("held_us", "n_segments").alias("held_us"),
        F.max_by("twap_cents", "n_segments").alias("twap_cents"),
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_segments",
        "held_us",
        "twap_cents",
    )


# q426/q427 (round 7): rolling cross-series correlation and SAX motif
# mining over the calendar-bounded hourly/daily grids.
_RC_A, _RC_B = "click", "purchase"
_RC_WIN = 24  # trailing window, hours
_SAX_WORD = 3  # motif word length, days


@query(
    "q426_rolling_correlation",
    oracle=f"""
    WITH spine AS (
      SELECT unnest(generate_series(
               date_trunc('hour', (SELECT min(ts) FROM events)),
               date_trunc('hour', (SELECT max(ts) FROM events)),
               INTERVAL 1 HOUR)) AS h
    ),
    hx AS (
      SELECT date_trunc('hour', ts) AS h,
             sum(CASE WHEN event_type = '{_RC_A}'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
             sum(CASE WHEN event_type = '{_RC_B}'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
      FROM events WHERE event_type IN ('{_RC_A}', '{_RC_B}')
      GROUP BY 1
    ),
    g AS (
      SELECT spine.h, coalesce(hx.x, 0) AS x, coalesce(hx.y, 0) AS y
      FROM spine LEFT JOIN hx ON hx.h = spine.h
    ),
    roll AS (
      SELECT h,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
             sum(x * y) OVER w AS sxy
      FROM g
      WINDOW w AS (ORDER BY h ROWS BETWEEN {_RC_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(h AS TIMESTAMP) AS hour_ts, sx::BIGINT AS sum_x_c, sy::BIGINT AS sum_y_c,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(floor((n::DOUBLE * sxy - sx::DOUBLE * sy)
                           / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                                  * (n::DOUBLE * syy - sy::DOUBLE * sy))
                           * 1e6) AS BIGINT)
                END AS corr24_mu
    FROM roll WHERE n = {_RC_WIN}
    ORDER BY hour_ts
    """,
    tags=("timeseries", "rolling", "correlation"),
)
def rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-hour rolling Pearson correlation between the hourly
    {a} and {b} spend series — the co-movement monitor that catches a
    decoupling (e.g. clicks keep flowing but purchases stop) hours
    before daily rollups would. The hour spine is generated from the
    data's own bounds so gaps become honest zero-spend hours (both
    engines see the identical dense grid); all six rolling sufficient
    statistics are INTEGER window sums over cents, and the correlation
    is the one guarded double expression (degenerate zero-variance
    windows emit NULL on both sides, never NaN), floor-µ-quantized on
    output (round-on-quotient outputs banned per SCALE.md).

    Scale posture: the heavy input collapses to the calendar-bounded
    hourly grid first (one map-side-combined agg; ≤ 24·days rows by
    construction — the q262/q282 bounded-grid argument), so the single
    ordered window runs over a provably tiny input, with all six sums
    sharing ONE window frame.""".format(a=_RC_A, b=_RC_B)
    ev = table(spark, sf_dir, "events")
    bounds = F.broadcast(
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h")
    )
    hx = (
        ev.filter(F.col("event_type").isin(_RC_A, _RC_B))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == _RC_A,
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("event_type") == _RC_B,
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            ).alias("y"),
        )
    )
    g = spine.join(hx, "h", "left").select(
        "h",
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    )
    w = W.orderBy("h").rowsBetween(-(_RC_WIN - 1), W.currentRow)
    roll = g.select(
        "h",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        roll.filter(F.col("n") == _RC_WIN)
        .select(
            F.col("h").alias("hour_ts"),
            F.col("sx").alias("sum_x_c"),
            F.col("sy").alias("sum_y_c"),
            # floor-µ, not round(x, 6): the correlation is a signed float
            # quotient (round-on-quotient outputs banned, SCALE.md q288
            # post-mortem); the zero-variance guard still emits NULL
            F.when(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
                & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0),
                F.floor(
                    (d("n") * d("sxy") - d("sx") * d("sy"))
                    / F.sqrt(
                        (d("n") * d("sxx") - d("sx") * d("sx"))
                        * (d("n") * d("syy") - d("sy") * d("sy"))
                    )
                    * F.lit(1e6)
                ).cast("bigint"),
            ).alias("corr24_mu"),
        )
        .orderBy("hour_ts")
    )


@query(
    "q427_sax_motifs",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ),
    sym AS (
      SELECT event_type, day,
             ntile(4) OVER (PARTITION BY event_type ORDER BY v, day) AS q
      FROM daily
    ),
    words AS (
      SELECT event_type, day,
             chr((96 + q)::INTEGER)
             || chr((96 + lead(q, 1) OVER (PARTITION BY event_type ORDER BY day))::INTEGER)
             || chr((96 + lead(q, 2) OVER (PARTITION BY event_type ORDER BY day))::INTEGER)
               AS word,
             lead(q, {_SAX_WORD - 1}) OVER (PARTITION BY event_type ORDER BY day)
               AS complete
      FROM sym
    ),
    freq AS (
      SELECT event_type, word, count(*)::BIGINT AS n
      FROM words WHERE complete IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, word AS top_motif, n AS n_occurrences
    FROM (
      SELECT event_type, word, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, word) AS r
      FROM freq) WHERE r = 1
    ORDER BY event_type
    """,
    tags=("timeseries", "sax", "motif", "symbolic"),
)
def sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style motif mining: each series' daily totals are symbolized
    into empirical quartiles (a/b/c/d — rank-based breakpoints, so no
    mean/σ floats and the alphabet adapts per series), consecutive
    {w}-day symbols concatenate into words, and the modal word per
    series is its dominant local shape ('aab' = two quiet days then a
    surge). ntile's deterministic (value, day) total order makes the
    symbolization bit-identical across engines.

    Scale posture: rows → calendar-bounded daily grid (one hash agg);
    every window (ntile, lead, top-1) is partitioned by series and runs
    over ≤ days-in-window rows; word frequencies are one grid agg. At
    100 TB the alphabet/breakpoint step would read per-series t-digest
    cutpoints instead of ntile — the symbolize/word/count pipeline is
    unchanged.""".format(w=_SAX_WORD)
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v"))
    )
    sym = daily.select(
        "event_type",
        "day",
        F.ntile(4)
        .over(W.partitionBy("event_type").orderBy("v", "day"))
        .alias("q"),
    )
    wd = W.partitionBy("event_type").orderBy("day")
    words = sym.select(
        "event_type",
        F.concat(
            F.chr(F.col("q") + 96),
            F.chr(F.lead("q", 1).over(wd) + 96),
            F.chr(F.lead("q", 2).over(wd) + 96),
        ).alias("word"),
        F.lead("q", _SAX_WORD - 1).over(wd).alias("complete"),
    )
    freq = (
        words.filter(F.col("complete").isNotNull())
        .groupBy("event_type", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    top = (
        freq.withColumn(
            "r",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(F.desc("n"), "word")
            ),
        )
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("word").alias("top_motif"),
            F.col("n").alias("n_occurrences"),
        )
        .orderBy("event_type")
    )
    return top


# ---- q468: single-bin DFT at the weekly frequency ------------------------
# cos/sin(2πk/7) as SHARED literal constants (full-precision reprs parse to
# the identical double in both engines); the projection is an explicit
# 7-term sum in FIXED textual order, so no engine-ordered float aggregate
# ever exists.
_DFT_COS = (
    "1.0", "0.6234898018587336", "-0.22252093395631434", "-0.900968867902419",
    "-0.9009688679024191", "-0.2225209339563146", "0.6234898018587334",
)
_DFT_SIN = (
    "0.0", "0.7818314824680298", "0.9749279121818236", "0.43388373911755823",
    "-0.433883739117558", "-0.9749279121818236", "-0.7818314824680299",
)
_DFT_S = " + ".join(
    f"p{k} * CAST({_DFT_COS[k]} AS DOUBLE)" for k in range(7)
)
_DFT_C = " + ".join(
    f"p{k} * CAST({_DFT_SIN[k]} AS DOUBLE)" for k in range(7)
)


@query(
    "q468_weekly_spectral_power",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', date_trunc('day', ts))::BIGINT
               AS d,
             count(*)::BIGINT AS y
      FROM events GROUP BY 1, 2
    ),
    phased AS (
      SELECT event_type,
             {", ".join(f"sum(CASE WHEN d % 7 = {k} THEN y ELSE 0 END)::BIGINT AS p{k}"
                        for k in range(7))},
             count(*)::BIGINT AS n,
             sum(y)::BIGINT AS sy, sum(y * y)::BIGINT AS syy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CAST(floor(({_DFT_S}) * 1e6) AS BIGINT) AS s_proj_mu,
           CAST(floor(({_DFT_C}) * 1e6) AS BIGINT) AS c_proj_mu,
           CAST(floor(2.0 * (({_DFT_S}) * ({_DFT_S}) + ({_DFT_C}) * ({_DFT_C})) * n
                 / CAST(n * syy - sy * sy AS DOUBLE) * 1e6) AS BIGINT)
             AS weekly_share_mu
    FROM phased ORDER BY event_type
    """,
    tags=("timeseries", "spectral", "dft", "seasonality"),
)
def weekly_spectral_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin DFT at the weekly frequency (Goertzel-style): project
    each event type's daily-count series onto cos/sin(2πt/7) and report
    the projections plus the weekly bin's share of series variance
    (Parseval ratio) — the spectral seasonality-strength detector that
    complements q329's seasonal means and q442's ACF ('is there a
    7-day rhythm, and how much of the variance does it own?').

    Determinism: the 7 phase sums are exact integer aggregates (t mod 7
    buckets); cos/sin are SHARED full-precision literals and the
    projection is an explicit 7-term sum in fixed textual order —
    no engine-ordered float aggregation exists anywhere; the variance
    denominator is the n·Σy² − (Σy)² integer expansion.

    Scale: one codegen hash-agg straight from the fact scan to 10
    integers per type (the phase/moment vector IS the whole state) —
    the cheapest possible spectral probe, map-side combinable, and the
    same shape streams as a q213-style stateful fold."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01")).alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    phased = daily.groupBy("event_type").agg(
        *[
            F.sum(F.expr(f"CASE WHEN d % 7 = {k} THEN y ELSE 0 END")).alias(f"p{k}")
            for k in range(7)
        ],
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    return phased.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.expr(f"CAST(floor(({_DFT_S}) * 1e6) AS BIGINT)").alias("s_proj_mu"),
        F.expr(f"CAST(floor(({_DFT_C}) * 1e6) AS BIGINT)").alias("c_proj_mu"),
        F.expr(
            f"CAST(floor(2.0 * (({_DFT_S}) * ({_DFT_S}) + ({_DFT_C}) * ({_DFT_C})) * n"
            " / CAST(n * syy - sy * sy AS DOUBLE) * 1e6) AS BIGINT)"
        ).alias("weekly_share_mu"),
    ).orderBy("event_type")


# ---- q507: Little's law audit (L = lambda * W) --------------------------------
from kinesis_customer_sample_spark.queries.composites3 import (  # noqa: E402
    _SESSION_GAP_US as _LL_GAP_US,
)


@query(
    "q507_littles_law_audit",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, epoch_us(ts) AS t,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_LL_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS sid, t
      FROM marked
    ),
    spans AS (
      SELECT user_id, sid, min(t) AS s, max(t) AS e
      FROM sess GROUP BY user_id, sid
    ),
    win AS (SELECT min(s) AS t0, max(e) AS t1 FROM spans),
    agg AS (
      SELECT count(*)::BIGINT AS n_sessions,
             sum(e - s)::BIGINT AS total_dur_us,
             -- boundary-formulation integral: sum net_i * (t1 - t_i)
             sum((w.t1 - s) - (w.t1 - e))::BIGINT AS integral_us,
             any_value(w.t1 - w.t0)::BIGINT AS window_us
      FROM spans CROSS JOIN win w
    )
    SELECT n_sessions, total_dur_us, integral_us, window_us,
           CASE WHEN integral_us = total_dur_us THEN 1 ELSE 0 END AS identity_ok,
           (total_dur_us * 1000 // window_us)::BIGINT AS mean_concurrency_milli,
           (n_sessions * 86400000000 // window_us)::BIGINT AS arrivals_per_day,
           (total_dur_us // n_sessions)::BIGINT AS mean_session_us
    FROM agg
    """,
    tags=("timeseries", "littles-law", "queueing", "audit"),
)
def littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit — L = lambda * W tied together with exact
    integers: sessionize the event stream (q108's 30-minute gap), then
    compute the time-average session concurrency L TWO ways — the
    session-side sum of durations over the window, and the
    boundary-side integral sum net_i * (t_end - t_i) (the q320
    sweep-line's bookkeeping reduced to a pure aggregate, since
    integral of depth = sum over boundaries of net * remaining time).
    identity_ok = 1 certifies the two bookkeepings agree to the
    microsecond; the emitted (L, lambda, W) triple is the queueing
    summary a capacity planner actually consumes (the q488/q495
    self-certifying-audit discipline applied to q320's metric family).

    Determinism: session spans, both integrals, the window and every
    emitted rate are exact int64 microsecond arithmetic with truncating
    division. No float exists anywhere.

    Scale posture (100 TB): one user-partitioned sessionization window
    (the q108 primitive), one hash-agg to session spans, one global
    aggregate — the boundary integral needs NO ordered global scan at
    all (that is the point of the closed form)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = ev.select(
        "user_id",
        us.alias("t"),
        F.when(
            F.lag(us).over(w).isNull()
            | ((us - F.lag(us).over(w)) > _LL_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("is_new").over(
            W.partitionBy("user_id").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.min("t").alias("s"), F.max("t").alias("e")
    )
    win = F.broadcast(spans.agg(F.min("s").alias("t0"), F.max("e").alias("t1")))
    agg = spans.crossJoin(win).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.expr("e - s")).cast("bigint").alias("total_dur_us"),
        F.sum(F.expr("(t1 - s) - (t1 - e)")).cast("bigint").alias("integral_us"),
        F.first(F.expr("t1 - t0")).cast("bigint").alias("window_us"),
    )
    return agg.select(
        "n_sessions",
        "total_dur_us",
        "integral_us",
        "window_us",
        F.expr("CASE WHEN integral_us = total_dur_us THEN 1 ELSE 0 END").alias(
            "identity_ok"
        ),
        F.expr("total_dur_us * 1000 div window_us")
        .cast("bigint")
        .alias("mean_concurrency_milli"),
        F.expr("n_sessions * 86400000000 div window_us")
        .cast("bigint")
        .alias("arrivals_per_day"),
        F.expr("total_dur_us div n_sessions").cast("bigint").alias("mean_session_us"),
    )
