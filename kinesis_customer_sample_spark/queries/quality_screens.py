"""Sequential scan statistics & forensic data screens — round-3 wave
(SURVEY.md §2B): CUSUM changepoint detection over daily volumes and a
Benford first-significant-digit screen, plus the APPLY side of q221's BPE
(tokenize the corpus with the learned merges and account for the
compression).

Scale posture (100 TB):
- q224: the fold runs over each event_type's ORDERED daily-count series —
  30 numbers per key after the day rollup, which is where all the data
  reduction happens (one hash-agg with map-side combine). The CUSUM
  recurrence S_i = max(0, S_{i-1} + dev_i) is kept in EXACT scaled
  integers (dev_i = n·x_i − total, i.e. deviations scaled by n so the
  mean never becomes a float), so the argmax day is hash-reproducible.
- q225: first significant digit comes from the INTEGER cents string —
  never floor(log10(v)) (pow/log floats disagree across engines near
  powers of ten). Map-only digit extraction, 9-row output, Benford
  expectations as integer basis-point constants.
- q226: re-runs q221's three learn rounds (same driver-coordinated
  argmax collects) and then accounts for the corpus-level effect of
  APPLYING them: symbol counts weighted by word frequency, all integer.
  The apply itself is the same map-only greedy fold, running on the
  distinct-word table — corpus-size independent after the first agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

# Benford expected first-digit shares, integer basis points of log10(1+1/d)
_BENFORD_BP = (3010, 1760, 1249, 969, 791, 669, 579, 511, 457)


@query(
    "q224_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type,
             count(*)::BIGINT AS n_days,
             sum(x)::BIGINT AS total,
             list(x ORDER BY day) AS xs,
             list(day ORDER BY day) AS days
      FROM daily GROUP BY 1
    ),
    traj AS (
      SELECT event_type, n_days, days,
             list_reduce(
               list_prepend([]::BIGINT[], list_transform(xs, x -> [x])),
               (acc, e) -> list_append(acc,
                 greatest(0, coalesce(acc[-1], 0) + n_days * e[1] - total))
             ) AS s
      FROM series
    )
    SELECT event_type, n_days,
           days[list_indexof(s, list_max(s))]   AS peak_day,
           list_max(s)::BIGINT                  AS peak_cusum_scaled
    FROM traj
    """,
    tags=("timeseries", "changepoint", "monitoring"),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over each event_type's daily volume: the
    upward-drift statistic S_i = max(0, S_{i-1} + (x_i − mean)) computed
    in EXACT scaled integers (multiply through by n_days so the mean
    never floats: dev_i = n·x_i − Σx), folded over the ordered daily
    series; reports the day where the cumulative deviation peaks — the
    classic sequential monitoring statistic, reduced to a 30-element fold
    per key after one day-level hash-agg. First-peak tiebreak (earliest
    day at the max) on both engines."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("total"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))), lambda s: s["x"]
        ).alias("xs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))), lambda s: s["day"]
        ).alias("days"),
    )
    traj = series.withColumn(
        "s",
        F.expr(
            "aggregate(xs, CAST(array() AS ARRAY<BIGINT>), (acc, x) -> "
            "concat(acc, array(greatest(0L, "
            "coalesce(try_element_at(acc, -1), 0L) + n_days * x - total))))"
        ),
    )
    return traj.select(
        "event_type",
        "n_days",
        F.expr("element_at(days, CAST(array_position(s, array_max(s)) AS INT))").alias(
            "peak_day"
        ),
        F.expr("array_max(s)").cast("bigint").alias("peak_cusum_scaled"),
    )


@query(
    "q225_benford_screen",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM events WHERE value > 0
    ),
    hist AS (SELECT d, count(*)::BIGINT AS n FROM digits GROUP BY d),
    tot AS (SELECT sum(n)::BIGINT AS total FROM hist),
    expected AS (
      SELECT unnest(generate_series(1, 9)) AS d,
             unnest([{", ".join(str(b) for b in _BENFORD_BP)}]) AS expected_bp
    )
    SELECT e.d AS digit,
           coalesce(h.n, 0)::BIGINT AS n,
           (coalesce(h.n, 0) * 10000 // t.total)::BIGINT AS share_bp,
           e.expected_bp::BIGINT AS expected_bp,
           (coalesce(h.n, 0) * 10000 // t.total - e.expected_bp)::BIGINT AS dev_bp
    FROM expected e LEFT JOIN hist h ON h.d = e.d CROSS JOIN tot t
    """,
    tags=("profiling", "quality", "forensic"),
)
def benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over transaction values — the
    forensic data-quality check (fabricated or unit-mangled numbers skew
    the leading-digit distribution). The first significant digit comes
    from the INTEGER cents value's decimal string — exact and
    engine-portable, where floor(v/10^floor(log10 v)) would hinge on
    float pow/log edge cases near powers of ten. Map-only extraction →
    9-cell hash-agg → integer basis-point comparison against the Benford
    constants; missing digits still report (LEFT join from the expected
    spine)."""
    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    digits = ev.select(
        F.substring(
            F.expr("CAST(CAST(round(value * 100) AS BIGINT) AS STRING)"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    hist = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.agg(F.sum("n").alias("total"))
    expected = spark.createDataFrame(
        [(i + 1, bp) for i, bp in enumerate(_BENFORD_BP)], "d int, expected_bp int"
    )
    return (
        expected.join(hist, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.expr("CAST(coalesce(n, 0) * 10000 div total AS BIGINT)").alias(
                "share_bp"
            ),
            F.col("expected_bp").cast("bigint").alias("expected_bp"),
            F.expr(
                "CAST(coalesce(n, 0) * 10000 div total - expected_bp AS BIGINT)"
            ).alias("dev_bp"),
        )
    )
