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

from pyspark.sql import DataFrame, SparkSession, Window as W
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


@query(
    "q330_binseg_changepoints",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, x,
             row_number() OVER w AS k,
             sum(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS s,
             count(*) OVER (PARTITION BY event_type)::BIGINT AS n,
             sum(x) OVER (PARTITION BY event_type)::BIGINT AS t
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    cand AS (SELECT * FROM idx WHERE k < n),
    g1 AS (
      SELECT *,
             CAST(s * s AS DOUBLE) / k
               + CAST((t - s) * (t - s) AS DOUBLE) / (n - k)
               - CAST(t * t AS DOUBLE) / n AS gain,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(s * s AS DOUBLE) / k
                        + CAST((t - s) * (t - s) AS DOUBLE) / (n - k) DESC,
                        k) AS rk
      FROM cand
    ),
    root AS (SELECT event_type, k AS k1, s AS s1, day, gain FROM g1 WHERE rk = 1),
    lvl2 AS (
      SELECT c.event_type, c.k, c.day,
             CASE WHEN c.k < r.k1 THEN 'left' ELSE 'right' END AS side,
             CASE WHEN c.k < r.k1 THEN
               CAST(c.s * c.s AS DOUBLE) / c.k
                 + CAST((r.s1 - c.s) * (r.s1 - c.s) AS DOUBLE) / (r.k1 - c.k)
                 - CAST(r.s1 * r.s1 AS DOUBLE) / r.k1
             ELSE
               CAST((c.s - r.s1) * (c.s - r.s1) AS DOUBLE) / (c.k - r.k1)
                 + CAST((c.t - c.s) * (c.t - c.s) AS DOUBLE) / (c.n - c.k)
                 - CAST((c.t - r.s1) * (c.t - r.s1) AS DOUBLE) / (c.n - r.k1)
             END AS gain
      FROM cand c JOIN root r USING (event_type)
      WHERE c.k != r.k1
    ),
    best2 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type, side
                                   ORDER BY gain DESC, k) AS rk
      FROM lvl2
    )
    SELECT event_type, 'root' AS segment, day AS split_day,
           round(gain, 6) AS gain_r6
    FROM root
    UNION ALL
    SELECT event_type, side, day, round(gain, 6)
    FROM best2 WHERE rk = 1
    """,
    tags=("changepoint", "binary-segmentation", "timeseries"),
)
def binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint detection, two levels deep, run
    ENTIRELY as windowed SQL — no driver loop: for each series the best
    split maximizes the between-segment cost reduction S₁²/n₁ + S₂²/n₂
    (the L2 binseg objective; q224's CUSUM flags that a change exists —
    this localizes the top-3 via recursive splitting). Every candidate's
    gain is computable from PREFIX SUMS alone, so level 1 is one
    partitioned window + argmax, and level 2 re-scores the same
    candidates against the level-1 winner's prefix (one broadcast-scale
    join) — O(n) total work per series where the textbook recursion
    re-scans segments. Gains are IEEE doubles over exact int64 prefix
    products (< 2⁵³ at fixture scale — DECIMAL partials past ~10⁹ daily
    events), identical cross-engine; ties break on the earlier split.

    Scale posture: both levels are windows partitioned by series over
    the bounded calendar plus one join against the 1-row-per-series
    winners — the data-scaled shuffle is only the daily pre-agg."""
    from pyspark.sql import Window as W

    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    w_ord = W.partitionBy("event_type").orderBy("day")
    w_all = W.partitionBy("event_type")
    idx = (
        daily.withColumn("k", F.row_number().over(w_ord))
        .withColumn(
            "s", F.sum("x").over(w_ord.rowsBetween(W.unboundedPreceding, 0)).cast("long")
        )
        .withColumn("n", F.count(F.lit(1)).over(w_all).cast("long"))
        .withColumn("t", F.sum("x").over(w_all).cast("long"))
    )
    cand = idx.filter(F.col("k") < F.col("n"))
    gain1 = (
        (F.col("s") * F.col("s")).cast("double") / F.col("k")
        + ((F.col("t") - F.col("s")) * (F.col("t") - F.col("s"))).cast("double")
        / (F.col("n") - F.col("k"))
        - (F.col("t") * F.col("t")).cast("double") / F.col("n")
    )
    g1 = cand.withColumn("gain", gain1).withColumn(
        "rk",
        F.row_number().over(W.partitionBy("event_type").orderBy(F.col("gain").desc(), "k")),
    )
    root = g1.filter(F.col("rk") == 1).select(
        "event_type",
        F.col("k").alias("k1"),
        F.col("s").alias("s1"),
        F.col("day").alias("r_day"),
        F.col("gain").alias("r_gain"),
    )
    c = cand.join(F.broadcast(root), "event_type").filter(F.col("k") != F.col("k1"))
    left_gain = (
        (F.col("s") * F.col("s")).cast("double") / F.col("k")
        + ((F.col("s1") - F.col("s")) * (F.col("s1") - F.col("s"))).cast("double")
        / (F.col("k1") - F.col("k"))
        - (F.col("s1") * F.col("s1")).cast("double") / F.col("k1")
    )
    right_gain = (
        ((F.col("s") - F.col("s1")) * (F.col("s") - F.col("s1"))).cast("double")
        / (F.col("k") - F.col("k1"))
        + ((F.col("t") - F.col("s")) * (F.col("t") - F.col("s"))).cast("double")
        / (F.col("n") - F.col("k"))
        - ((F.col("t") - F.col("s1")) * (F.col("t") - F.col("s1"))).cast("double")
        / (F.col("n") - F.col("k1"))
    )
    lvl2 = c.select(
        "event_type",
        "k",
        "day",
        F.when(F.col("k") < F.col("k1"), "left").otherwise("right").alias("side"),
        F.when(F.col("k") < F.col("k1"), left_gain).otherwise(right_gain).alias("gain"),
    )
    best2 = lvl2.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type", "side").orderBy(F.col("gain").desc(), "k")
        ),
    ).filter(F.col("rk") == 1)
    return root.select(
        "event_type",
        F.lit("root").alias("segment"),
        F.col("r_day").alias("split_day"),
        F.round("r_gain", 6).alias("gain_r6"),
    ).unionByName(
        best2.select(
            "event_type",
            F.col("side").alias("segment"),
            F.col("day").alias("split_day"),
            F.round("gain", 6).alias("gain_r6"),
        )
    )


# winsorization dials: clamp at the exact disc p01 / p99 per event type
_WINSOR_LO_BP = 100
_WINSOR_HI_BP = 9_900


@query(
    "q399_winsorization",
    oracle=f"""
    WITH obs AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM obs
    ),
    fences AS (
      SELECT event_type,
             max(CASE WHEN rn = greatest(1, (n * {_WINSOR_LO_BP}) // 10000)
                      THEN cents END) AS lo,
             max(CASE WHEN rn = least(n, (n * {_WINSOR_HI_BP} + 9999) // 10000)
                      THEN cents END) AS hi
      FROM ranked GROUP BY 1
    )
    SELECT o.event_type,
           count(*)::BIGINT                                        AS n,
           min(f.lo)::BIGINT                                       AS lo_cents,
           min(f.hi)::BIGINT                                       AS hi_cents,
           count(*) FILTER (o.cents < f.lo)::BIGINT                AS n_clamped_lo,
           count(*) FILTER (o.cents > f.hi)::BIGINT                AS n_clamped_hi,
           (sum(least(greatest(o.cents, f.lo), f.hi)) // count(*))::BIGINT
                                                                   AS winsor_mean_c,
           (sum(o.cents) // count(*))::BIGINT                      AS raw_mean_c
    FROM obs o JOIN fences f USING (event_type)
    GROUP BY 1
    """,
    tags=("quality", "winsorize", "robust", "outliers"),
)
def winsorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at exact disc p01/p99 — the robust-mean companion
    to the REMOVAL fences (Tukey q128, MAD q231): extreme values are
    CLAMPED to the percentile fences instead of dropped, preserving row
    count (the property aggregation pipelines need — a sum over a
    winsorized column still covers every row). Fences are exact rank
    selections (the q368 discipline); the audit reports how many rows
    each side clamped and the raw-vs-winsorized mean shift — the number
    that tells you whether the tail was driving the metric.

    Scale posture (100 TB): rank windows partition by series; fences
    (series-grid-sized) broadcast back; the clamp is a stateless
    projection folded into the final agg."""
    obs = table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    wp = W.partitionBy("event_type")
    ranked = obs.select(
        "event_type",
        "cents",
        F.row_number().over(wp.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    fences = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn")
                == F.greatest(F.lit(1), F.expr(f"(n * {_WINSOR_LO_BP}) div 10000")),
                F.col("cents"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn")
                == F.least(
                    F.col("n"), F.expr(f"(n * {_WINSOR_HI_BP} + 9999) div 10000")
                ),
                F.col("cents"),
            )
        ).alias("hi"),
    )
    return (
        obs.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lo").alias("lo_cents"),
            F.min("hi").alias("hi_cents"),
            F.count(F.when(F.col("cents") < F.col("lo"), 1)).alias("n_clamped_lo"),
            F.count(F.when(F.col("cents") > F.col("hi"), 1)).alias("n_clamped_hi"),
            F.expr("sum(least(greatest(cents, lo), hi)) div count(1)")
            .cast("bigint")
            .alias("winsor_mean_c"),
            F.expr("sum(cents) div count(1)").cast("bigint").alias("raw_mean_c"),
        )
    )


# ---- q495: Luhn checksum contract audit -------------------------------------
# Synthesized 16-digit account ids: 15 payload digits from (custkey,
# acctbal-cents), a computed Luhn check digit — corrupted (+5 mod 10) for
# every custkey % 10 == 0, so the audit has exact ground truth.


def _luhn_digit_term(sub: str, double_when: str) -> str:
    """Contribution of digit at position i (1 = rightmost) of {sub}:
    doubled-with-digit-sum when {double_when} holds. Shared text."""
    d = f"CAST({sub} AS BIGINT)"
    return (
        f"CASE WHEN {double_when} THEN "
        f"CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END "
        f"ELSE {d} END"
    )


def _q495_sql(dialect: str) -> str:
    if dialect == "spark":
        base = (
            "concat(lpad(CAST(c_custkey % 1000000000 AS STRING), 9, '0'), "
            "lpad(CAST((CAST(round(c_acctbal * 100) AS BIGINT) % 1000000 + 1000000) % 1000000 AS STRING), 6, '0'))"
        )
        sub15 = "substring(b15, 16 - i, 1)"
        sub16 = "substring(full_id, 17 - i, 1)"
        fold15 = (
            f"aggregate(sequence(1, 15), CAST(0 AS BIGINT), (acc, i) -> acc + "
            f"{_luhn_digit_term(sub15, 'i % 2 = 1')})"
        )
        fold16 = (
            f"aggregate(sequence(1, 16), CAST(0 AS BIGINT), (acc, i) -> acc + "
            f"{_luhn_digit_term(sub16, 'i % 2 = 0')})"
        )
    else:
        base = (
            "lpad(CAST(c_custkey % 1000000000 AS VARCHAR), 9, '0') || "
            "lpad(CAST((CAST(round(c_acctbal * 100) AS BIGINT) % 1000000 + 1000000) % 1000000 AS VARCHAR), 6, '0')"
        )
        sub15 = "substr(b15, 16 - i, 1)"
        sub16 = "substr(full_id, 17 - i, 1)"
        fold15 = (
            f"list_sum(list_transform(range(1, 16), i -> "
            f"{_luhn_digit_term(sub15, 'i % 2 = 1')}))"
        )
        fold16 = (
            f"list_sum(list_transform(range(1, 17), i -> "
            f"{_luhn_digit_term(sub16, 'i % 2 = 0')}))"
        )
    vt = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH ids AS (
      SELECT c_custkey, c_mktsegment, {base} AS b15 FROM customer
    ),
    withcheck AS (
      SELECT c_custkey, c_mktsegment, b15,
             ((10 - ({fold15}) % 10) % 10
              + CASE WHEN c_custkey % 10 = 0 THEN 5 ELSE 0 END) % 10 AS cd
      FROM ids
    ),
    full_ids AS (
      SELECT c_custkey, c_mktsegment,
             b15 || CAST(cd AS {vt}) AS full_id
      FROM withcheck
    ),
    audit AS (
      SELECT c_mktsegment,
             CASE WHEN ({fold16}) % 10 = 0 THEN 1 ELSE 0 END AS valid,
             CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END AS corrupted
      FROM full_ids
    )
    SELECT c_mktsegment,
           count(*) AS n_ids,
           sum(valid) AS n_valid,
           sum(1 - valid) AS n_invalid,
           sum(corrupted) AS n_corrupted,
           CASE WHEN sum(1 - valid) = sum(corrupted) THEN 1 ELSE 0 END
             AS audit_exact
    FROM audit GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "q495_luhn_checksum_audit",
    oracle=f"""
    WITH q AS ({_q495_sql("duckdb")})
    SELECT c_mktsegment, n_ids::BIGINT AS n_ids, n_valid::BIGINT AS n_valid,
           n_invalid::BIGINT AS n_invalid, n_corrupted::BIGINT AS n_corrupted,
           audit_exact::BIGINT AS audit_exact
    FROM q
    """,
    tags=("quality", "checksum", "luhn", "contract"),
)
def luhn_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum contract audit — the classic ingestion
    screen for identifier columns (card/account/IMEI-class ids): for a
    synthesized 16-digit account id (15 payload digits + a computed Luhn
    check digit, deliberately corrupted for every custkey % 10 == 0),
    validate the checksum and report per-segment validity. Because the
    corruption set is known, the audit is SELF-CERTIFYING: audit_exact
    proves the validator catches exactly the corrupted ids and nothing
    else — the q488/q492 estimator-audit discipline applied to a
    data-contract rule (complements q198's typed contract checks and
    q225's Benford screen).

    Determinism: the id, the check digit, the corruption and both Luhn
    folds are pure integer/string codegen (shared fold text; digit
    positions count from the right, doubling every second digit).

    Scale posture (100 TB): one map-only expression chain over the scan
    + one map-side-combined hash-agg to the segment grid. No join, no
    window, no Python."""
    tbl = table(spark, sf_dir, "customer")
    tbl.createOrReplaceTempView("customer")
    out = spark.sql(_q495_sql("spark"))
    return out.select(
        "c_mktsegment",
        F.col("n_ids").cast("bigint").alias("n_ids"),
        F.col("n_valid").cast("bigint").alias("n_valid"),
        F.col("n_invalid").cast("bigint").alias("n_invalid"),
        F.col("n_corrupted").cast("bigint").alias("n_corrupted"),
        F.col("audit_exact").cast("bigint").alias("audit_exact"),
    )
