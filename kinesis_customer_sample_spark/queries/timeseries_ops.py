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

from pyspark.sql import DataFrame, SparkSession
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
           round(list_reduce(
             list_prepend(0.0::DOUBLE, list(value::DOUBLE ORDER BY ts, event_id)),
             (acc, v) -> acc * 0.9 + v * 0.1), 4) AS ewma,
           round(avg(value), 4) AS plain_avg
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
    DuckDB's ordered `list()` aggregate — same FP sequence, exact match."""
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
        F.round(fold, 4).alias("ewma"),
        F.round(F.avg("value"), 4).alias("plain_avg"),
    )
