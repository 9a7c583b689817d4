"""Risk & trainable-model wave (round 7, SURVEY.md §2B): empirical
Value-at-Risk / Expected Shortfall (CVaR) over the daily revenue-change
distribution, and a logistic-regression fit as PURE relational algebra —
two fixed Newton–Raphson (IRLS) steps over integer-quantized sufficient
statistics with a Cramer 3×3 solve, continuing the house 'trainable
models as relational algebra' line (q377 Naive Bayes, q384 decision
stump, q446 Huber IRLS). No counterpart in the reference snapshot
(docs/user-guide.md:58-145); mandated by the expanded §2B surface.

Cross-engine determinism:
- VaR is a DISCRETE order statistic (k = ⌈αn⌉-th largest integer loss,
  integer ranks, integer cents) and ES an integer tail mean — no
  interpolation, no floats at all until the final division;
- the logistic fit quantizes every per-row probability to ⌊10⁶σ⌋ and
  every IRLS weight to (pµ·(10⁶−pµ)) div 10³ BEFORE aggregation, so
  the gradient and Hessian are EXACT integer sums (the q151 discipline
  applied to σ instead of ln); the 3×3 Cramer determinants are spelled
  with the IDENTICAL textual expression in both dialects, so both
  engines evaluate the same IEEE op sequence;
- σ itself (the one transcendental) follows the house floor-quantize
  precedent (q151's ln, q377's µ-nat scoring): both engines' libm
  agree on these arguments, and the floor collapses sub-µ noise.

Scale posture (100 TB):
- CVaR works on the (segment, day) grid; ranked windows partition per
  segment over the bounded day grid;
- the logistic fit is TWO full map-side passes over the fact scan,
  each reducing to a 10-integer sufficient-statistics row (partial
  agg → broadcastable 1-row state); the Newton solve is driver-free
  scalar algebra in the plan — iteration depth is a compile-time
  constant, exactly like q446.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

# q455: tail level α as an exact rational (95%)
_VAR_NUM, _VAR_DEN = 95, 100
# q456: label + feature definitions over lineitem
_LR_Y = "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END"
_LR_X1 = "CAST(round(l_quantity) AS BIGINT)"
_LR_X2 = "CAST(round(l_discount * 100) AS BIGINT)"


@query(
    "q455_expected_shortfall",
    oracle=f"""
    WITH daily AS (
      SELECT c.c_mktsegment AS seg, date_trunc('day', o.o_orderdate) AS day,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    chg AS (
      SELECT seg, day,
             (lag(cents) OVER (PARTITION BY seg ORDER BY day) - cents)::BIGINT
               AS loss
      FROM daily
    ),
    ranked AS (
      SELECT seg, loss,
             row_number() OVER (PARTITION BY seg ORDER BY loss DESC, day) AS rn,
             count(*) OVER (PARTITION BY seg) AS n
      FROM chg WHERE loss IS NOT NULL
    ),
    var AS (
      SELECT seg, n, loss AS var_cents,
             (n - (({_VAR_NUM} * n) // {_VAR_DEN})) AS k
      FROM ranked
      WHERE rn = n - (({_VAR_NUM} * n) // {_VAR_DEN})
    ),
    es AS (
      SELECT r.seg,
             sum(r.loss)::BIGINT AS tail_sum, count(*)::BIGINT AS tail_n
      FROM ranked r JOIN var v ON v.seg = r.seg AND r.rn <= v.k
      GROUP BY 1
    )
    SELECT v.seg AS segment, v.n::BIGINT AS n_days, v.k::BIGINT AS tail_k,
           v.var_cents,
           CAST(floor(CAST(e.tail_sum AS DOUBLE) / e.tail_n * 1e6) AS BIGINT)
             AS es_cents_mu
    FROM var v JOIN es e ON e.seg = v.seg
    ORDER BY segment
    """,
    tags=("risk", "value-at-risk", "expected-shortfall", "window"),
)
def expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical VaR{a} and Expected Shortfall (CVaR) of day-over-day
    revenue DROPS per market segment: loss = yesterday − today in
    cents; VaR is the k-th largest loss with k = n − ⌊αn⌋ (the
    discrete upper-α quantile) and ES the mean of the k worst losses —
    'when a bad day comes, how bad is the average bad day?'.

    Determinism: losses are integer cents; the quantile is a pure
    ORDER STATISTIC (integer ranks, day tie-break) — no interpolation;
    ES is one integer-sum / count division at the end.

    Scale: one codegen hash-agg to the (segment, day) grid; lag, rank
    and the tail filter are windows partitioned per segment over the
    bounded day grid; the 5-row VaR table joins back hash-side.""".format(
        a=f"{_VAR_NUM}/{_VAR_DEN}"
    )
    daily = (
        table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.date_trunc("day", "o_orderdate").alias("day"),
        )
        .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents"))
    )
    w = W.partitionBy("seg").orderBy("day")
    chg = daily.withColumn(
        "loss", F.lag("cents").over(w) - F.col("cents")
    ).filter(F.col("loss").isNotNull())
    wr = W.partitionBy("seg").orderBy(F.desc("loss"), "day")
    ranked = chg.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("seg"))
    )
    ranked = ranked.withColumn(
        "k", F.expr(f"n - (({_VAR_NUM} * n) div {_VAR_DEN})")
    )
    var = ranked.filter(F.col("rn") == F.col("k")).select(
        "seg", "n", "k", F.col("loss").alias("var_cents")
    )
    es = (
        ranked.join(var.select("seg", F.col("k").alias("vk")), "seg")
        .filter(F.col("rn") <= F.col("vk"))
        .groupBy("seg")
        .agg(F.sum("loss").alias("tail_sum"), F.count(F.lit(1)).alias("tail_n"))
    )
    return (
        var.join(es, "seg")
        .select(
            F.col("seg").alias("segment"),
            F.col("n").alias("n_days"),
            F.col("k").alias("tail_k"),
            "var_cents",
            # floor-µ-cents (SCALE.md round-on-quotient ban); double floor
            # keeps negative-mean semantics engine-identical
            F.floor(F.col("tail_sum").cast("double") / F.col("tail_n") * 1e6)
            .cast("bigint")
            .alias("es_cents_mu"),
        )
        .orderBy("segment")
    )


# ---- q456: shared textual algebra (identical in both dialects) -----------

# sufficient statistics of one IRLS pass, given per-row integer weight
# column `w` (micro-milli scale) and residual column `r` (micro scale)
_LR_H = (
    "sum(w)::BIGINT AS h00, sum(w * x1)::BIGINT AS h01, sum(w * x2)::BIGINT AS h02,"
    " sum(w * x1 * x1)::BIGINT AS h11, sum(w * x1 * x2)::BIGINT AS h12,"
    " sum(w * x2 * x2)::BIGINT AS h22,"
    " sum(r)::BIGINT AS g0, sum(r * x1)::BIGINT AS g1, sum(r * x2)::BIGINT AS g2"
)

# Cramer 3×3 solve of H·δ = g (symmetric H), scale 1e3 (w is µ·m, g is µ):
# spelled ONCE and used verbatim in both engines so the IEEE op sequence
# is identical.
_LR_DET = (
    "(CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)"
    " - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))"
    " - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE) * CAST(h22 AS DOUBLE)"
    " - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))"
    " + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE) * CAST(h12 AS DOUBLE)"
    " - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)))"
)
_LR_D0 = (
    "(CAST(g0 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)"
    " - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))"
    " - CAST(h01 AS DOUBLE) * (CAST(g1 AS DOUBLE) * CAST(h22 AS DOUBLE)"
    " - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))"
    " + CAST(h02 AS DOUBLE) * (CAST(g1 AS DOUBLE) * CAST(h12 AS DOUBLE)"
    " - CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)))"
)
_LR_D1 = (
    "(CAST(h00 AS DOUBLE) * (CAST(g1 AS DOUBLE) * CAST(h22 AS DOUBLE)"
    " - CAST(g2 AS DOUBLE) * CAST(h12 AS DOUBLE))"
    " - CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE) * CAST(h22 AS DOUBLE)"
    " - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))"
    " + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE) * CAST(g2 AS DOUBLE)"
    " - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE)))"
)
_LR_D2 = (
    "(CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)"
    " - CAST(h12 AS DOUBLE) * CAST(g1 AS DOUBLE))"
    " - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE) * CAST(g2 AS DOUBLE)"
    " - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE))"
    " + CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE) * CAST(h12 AS DOUBLE)"
    " - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)))"
)
# δ_j = 1000 · det_j / det  (w carries µ·10⁻³, g carries µ)
_LR_STEP = (
    f"1000.0 * {_LR_D0} / {_LR_DET} AS d0,"
    f" 1000.0 * {_LR_D1} / {_LR_DET} AS d1,"
    f" 1000.0 * {_LR_D2} / {_LR_DET} AS d2"
)
# per-row quantized sigmoid at (b0, b1, b2)
_LR_PMU = (
    "CAST(floor(1000000.0 /"
    " (1.0 + exp(-(b0 + b1 * x1 + b2 * x2)))) AS BIGINT)"
)


@query(
    "q456_logistic_newton",
    oracle=f"""
    WITH r AS (
      SELECT {_LR_Y} AS y, {_LR_X1} AS x1, {_LR_X2} AS x2 FROM lineitem
    ),
    -- step 1 from β = 0: σ = 1/2 exactly, so pµ = 500000 and
    -- wq = (500000·500000) div 1000 = 250000000 are CONSTANTS
    s1 AS (
      SELECT {_LR_H}
      FROM (SELECT x1, x2, 250000000 AS w,
                   (y * 1000000 - 500000)::BIGINT AS r
            FROM r)
    ),
    b1 AS (SELECT {_LR_STEP} FROM s1),
    p2 AS (
      SELECT r.y, r.x1, r.x2,
             {_LR_PMU.replace('b0', 'b.d0').replace('b1 * x1', 'b.d1 * x1')
                     .replace('b2 * x2', 'b.d2 * x2')} AS pmu
      FROM r CROSS JOIN b1 b
    ),
    s2 AS (
      SELECT {_LR_H}
      FROM (SELECT x1, x2, (pmu * (1000000 - pmu)) // 1000 AS w,
                   (y * 1000000 - pmu)::BIGINT AS r
            FROM p2)
    ),
    b2 AS (SELECT {_LR_STEP} FROM s2),
    fit AS (
      SELECT a.d0 + b.d0 AS b0, a.d1 + b.d1 AS b1, a.d2 + b.d2 AS b2
      FROM b1 a CROSS JOIN b2 b
    ),
    pred AS (
      SELECT count(*)::BIGINT AS n,
             sum(CASE WHEN {_LR_PMU.replace('b0', 'f.b0')
                              .replace('b1 * x1', 'f.b1 * x1')
                              .replace('b2 * x2', 'f.b2 * x2')} >= 500000
                      THEN 1 ELSE 0 END)::BIGINT AS n_pred_pos,
             sum(y)::BIGINT AS n_pos
      FROM r CROSS JOIN fit f
    )
    SELECT p.n, p.n_pos, p.n_pred_pos,
           CAST(floor(f.b0 * 1e6) AS BIGINT) AS beta0_mu,
           CAST(floor(f.b1 * 1e6) AS BIGINT) AS beta1_mu,
           CAST(floor(f.b2 * 1e6) AS BIGINT) AS beta2_mu
    FROM fit f CROSS JOIN pred p
    """,
    tags=("model-training", "logistic-regression", "newton", "irls"),
)
def logistic_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression P(returnflag='R' | quantity, discount) fit
    with TWO fixed Newton–Raphson steps from β=0, entirely as
    relational algebra: each step is one map-side pass reducing to a
    10-integer sufficient-statistics row (Hessian + gradient), then a
    Cramer 3×3 solve in the projection — the q446 fixed-unroll
    discipline applied to a real GLM.

    Determinism: per-row σ quantizes to ⌊10⁶σ⌋ and IRLS weights to
    (pµ·(10⁶−pµ)) div 10³ BEFORE aggregation (exact integer sums,
    overflow-safe by construction: |H| ≤ 2.5·10⁸·50²·n); the Cramer
    determinants are the IDENTICAL textual double expression in both
    dialects; step 1 is closed-form (σ(0)=½ exactly). Only exp's libm
    agreement is assumed — same class as the house ln precedent.

    Scale: two fact-scan passes (β=0 pass folds into the moments agg),
    each a partial map-side agg to ONE row; the β state travels by
    broadcast nested-loop (1-row cross join); no driver loop, no
    collect — the whole fit is a single static plan."""
    r = table(spark, sf_dir, "lineitem").select(
        F.expr(_LR_Y).alias("y"),
        F.expr(_LR_X1).alias("x1"),
        F.expr(_LR_X2).alias("x2"),
    )
    h_cols = _LR_H.replace("::BIGINT", "")  # Spark sums of BIGINT stay BIGINT
    s1 = r.selectExpr(
        "x1", "x2", "CAST(250000000 AS BIGINT) AS w",
        "CAST(y * 1000000 - 500000 AS BIGINT) AS r",
    ).selectExpr(*[c.strip() for c in h_cols.split(",")])
    b1 = s1.selectExpr(*[c.strip() for c in _LR_STEP.split(",")])
    pmu1 = (
        _LR_PMU.replace("b0", "d0")
        .replace("b1 * x1", "d1 * x1")
        .replace("b2 * x2", "d2 * x2")
    )
    p2 = r.crossJoin(F.broadcast(b1)).selectExpr(
        "y", "x1", "x2", f"{pmu1} AS pmu"
    )
    s2 = p2.selectExpr(
        "x1", "x2", "(pmu * (1000000 - pmu)) div 1000 AS w",
        "CAST(y * 1000000 - pmu AS BIGINT) AS r",
    ).selectExpr(*[c.strip() for c in h_cols.split(",")])
    b2 = s2.selectExpr(*[c.strip() for c in _LR_STEP.split(",")])
    fit = (
        b1.selectExpr("d0 AS a0", "d1 AS a1", "d2 AS a2")
        .crossJoin(F.broadcast(b2))
        .selectExpr("a0 + d0 AS b0", "a1 + d1 AS b1", "a2 + d2 AS b2")
    )
    pmu_fit = _LR_PMU  # uses b0/b1/b2 as produced by fit
    pred = (
        r.crossJoin(F.broadcast(fit))
        .selectExpr("y", f"{pmu_fit} AS pmu")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CASE WHEN pmu >= 500000 THEN 1 ELSE 0 END")).alias(
                "n_pred_pos"
            ),
            F.sum("y").alias("n_pos"),
        )
    )
    return pred.crossJoin(F.broadcast(fit)).select(
        "n",
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_pred_pos").cast("long").alias("n_pred_pos"),
        F.floor(F.col("b0") * 1e6).cast("bigint").alias("beta0_mu"),
        F.floor(F.col("b1") * 1e6).cast("bigint").alias("beta1_mu"),
        F.floor(F.col("b2") * 1e6).cast("bigint").alias("beta2_mu"),
    )


def _model_eval_capstone_oracle() -> str:
    """q458's oracle COMPOSES the already-registered q420/q421/q437/q440
    oracles verbatim (registry lookup, no text duplication — the q400
    capstone discipline): each becomes a CTE rolled up to one report
    row."""
    from kinesis_customer_sample_spark.registry import REGISTRY

    ap = REGISTRY["q420_average_precision"].oracle
    ece = REGISTRY["q421_expected_calibration_error"].oracle
    mk = REGISTRY["q437_markov_next_event_accuracy"].oracle
    ms = REGISTRY["q440_mase_smape_scorecard"].oracle
    return f"""
    WITH ap AS ({ap}), ece AS ({ece}), mk AS ({mk}), ms AS ({ms})
    SELECT 'retrieval' AS domain, n_scored::BIGINT AS n_units,
           (ap_mu // 100)::BIGINT AS headline_bp
    FROM ap
    UNION ALL
    SELECT 'calibration', n_scored::BIGINT, ece_bp::BIGINT
    FROM ece
    UNION ALL
    SELECT 'sequence', n::BIGINT, accuracy_bp::BIGINT
    FROM mk WHERE src = 'ALL'
    UNION ALL
    SELECT 'forecast', sum(n_eval)::BIGINT,
           (max(mase_mu) // 100)::BIGINT
    FROM ms
    """


@query(
    "q458_model_eval_scorecard",
    oracle=_model_eval_capstone_oracle(),
    tags=("ml-eval", "capstone", "report"),
)
def model_eval_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation scorecard — the round-7 capstone that unifies
    four evaluation families into the one-page summary an ML platform
    dashboard reads: retrieval quality (q420 average precision, bp),
    probability calibration (q421 ECE, bp), sequence-model skill (q437
    Markov next-event accuracy on the 'ALL' row, bp), and forecast
    health (q440 worst-series MASE, bp). Both sides COMPOSE the
    registered definitions verbatim — the Spark side calls the query
    functions, the oracle splices their registered SQL (the q400
    capstone discipline) — so the scorecard can never drift from the
    metrics it summarizes.

    Determinism: every headline is already integer bp/micro in its
    source query (q440's mase_mu converts µ → bp by integer div).

    Scale posture: four grid-sized inputs (see the composed queries'
    own postures), each reduced to one row — the nightly model-health
    query a scheduler alerts on."""
    from kinesis_customer_sample_spark.registry import REGISTRY

    ap = REGISTRY["q420_average_precision"].fn(spark, sf_dir)
    ece = REGISTRY["q421_expected_calibration_error"].fn(spark, sf_dir)
    mk = REGISTRY["q437_markov_next_event_accuracy"].fn(spark, sf_dir)
    ms = REGISTRY["q440_mase_smape_scorecard"].fn(spark, sf_dir)
    r1 = ap.select(
        F.lit("retrieval").alias("domain"),
        F.col("n_scored").cast("long").alias("n_units"),
        F.expr("ap_mu div 100").cast("long").alias("headline_bp"),
    )
    r2 = ece.select(
        F.lit("calibration").alias("domain"),
        F.col("n_scored").cast("long").alias("n_units"),
        F.col("ece_bp").cast("long").alias("headline_bp"),
    )
    r3 = mk.filter(F.col("src") == "ALL").select(
        F.lit("sequence").alias("domain"),
        F.col("n").cast("long").alias("n_units"),
        F.col("accuracy_bp").cast("long").alias("headline_bp"),
    )
    r4 = ms.agg(
        F.sum("n_eval").cast("long").alias("n_units"),
        F.expr("CAST(max(mase_mu) div 100 AS BIGINT)").alias("headline_bp"),
    ).select(F.lit("forecast").alias("domain"), "n_units", "headline_bp")
    return r1.unionByName(r2).unionByName(r3).unionByName(r4)


# ---- q476: Sharpe / Sortino over daily revenue returns ------------------


@query(
    "q476_sharpe_sortino",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day,
             sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS cents
      FROM orders GROUP BY 1, 2
    ),
    ret AS (
      SELECT o_orderpriority,
             CAST(floor(1000000.0 * (cents - prev) / prev) AS BIGINT) AS r
      FROM (
        SELECT o_orderpriority, cents,
               lag(cents) OVER (PARTITION BY o_orderpriority ORDER BY day)
                 AS prev
        FROM daily
      ) WHERE prev IS NOT NULL AND prev > 0
    ),
    mom AS (
      SELECT o_orderpriority,
             count(*)::BIGINT AS n,
             sum(r)::BIGINT AS s1,
             sum(r * r)::BIGINT AS s2,
             sum(CASE WHEN r < 0 THEN r * r ELSE 0 END)::BIGINT AS sneg2
      FROM ret GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           (s1 // n)::BIGINT AS mean_ret_ppm,
           CAST(floor(CAST(s1 AS DOUBLE)
                 / sqrt(CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                 * 1e6) AS BIGINT) AS sharpe_mu,
           CAST(floor(CAST(s1 AS DOUBLE) / sqrt(CAST(n AS DOUBLE) * sneg2)
                 * 1e6) AS BIGINT) AS sortino_mu,
           CAST(floor(sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1))
                      / n) AS BIGINT) AS vol_ppm
    FROM mom ORDER BY o_orderpriority
    """,
    tags=("risk", "sharpe", "sortino", "returns"),
)
def sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of the daily revenue-return series per
    order priority — the risk-adjusted-performance pair that extends
    q435's VaR/ES tail view with the mean-per-unit-risk view: Sharpe
    divides mean return by total volatility, Sortino by DOWNSIDE
    deviation only (upside swings shouldn't count as risk). Zero
    risk-free rate; population denominators.

    Determinism: daily revenue is exact integer cents; each day-over-day
    return is floor-quantized to integer ppm BEFORE aggregation (the
    q419 discipline), so n/Σr/Σr²/Σr₋² are exact int64 sums; both
    ratios reduce to single rationals over those sums — Sharpe =
    S₁/√(n·S₂−S₁²), Sortino = S₁/√(n·S₋₂) — with one IEEE sqrt each,
    rounded in-query.

    Scale posture: one codegen hash-agg to the (priority, day) grid; the
    lag window partitions per priority over the bounded day grid; the
    moment reduction is map-side combinable to a 4-integer row per
    segment. Nothing fact-sized ever reaches a window."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100.0) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    ret = (
        daily.select(
            "o_orderpriority",
            "cents",
            F.lag("cents")
            .over(W.partitionBy("o_orderpriority").orderBy("day"))
            .alias("prev"),
        )
        .filter(F.col("prev").isNotNull() & (F.col("prev") > 0))
        .select(
            "o_orderpriority",
            F.expr("CAST(floor(1000000.0 * (cents - prev) / prev) AS BIGINT)").alias(
                "r"
            ),
        )
    )
    mom = ret.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("s1"),
        F.sum(F.expr("r * r")).cast("bigint").alias("s2"),
        F.sum(F.expr("CASE WHEN r < 0 THEN r * r ELSE 0 END"))
        .cast("bigint")
        .alias("sneg2"),
    )
    return mom.select(
        "o_orderpriority",
        "n",
        F.expr("s1 div n").cast("bigint").alias("mean_ret_ppm"),
        F.expr(
            "CAST(floor(CAST(s1 AS DOUBLE)"
            " / sqrt(CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)"
            " * 1e6) AS BIGINT)"
        ).alias("sharpe_mu"),
        F.expr(
            "CAST(floor(CAST(s1 AS DOUBLE) / sqrt(CAST(n AS DOUBLE) * sneg2)"
            " * 1e6) AS BIGINT)"
        ).alias("sortino_mu"),
        F.expr(
            "CAST(floor(sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)) / n) AS BIGINT)"
        ).alias("vol_ppm"),
    ).orderBy("o_orderpriority")


# ---- q517: engine self-certification scorecard ---------------------------------


def _selfcert_oracle() -> str:
    """q517's oracle splices the four REGISTERED self-certifying audits
    (q483 MV rewrite, q495 Luhn, q507 Little's law, q485 clustering-depth
    dominance) and reduces each to (audit, n_rows, n_pass) — the
    q400/q458/q513 registry-splice discipline. q508 financial
    reconciliation was deliberately swapped out for q485 (commit 35a29b3):
    q508's pass criterion is a per-line-rounding TOLERANCE, not an exact
    identity, so it doesn't belong in an exact-invariant scorecard."""
    from kinesis_customer_sample_spark.registry import REGISTRY

    mv = REGISTRY["q483_mv_rewrite_audit"].oracle
    luhn = REGISTRY["q495_luhn_checksum_audit"].oracle
    little = REGISTRY["q507_littles_law_audit"].oracle
    depth = REGISTRY["q485_clustering_depth_audit"].oracle
    return f"""
    WITH mv AS ({mv}), luhn AS ({luhn}), little AS ({little}),
    depth AS ({depth}),
    legs AS (
      SELECT 'mv_rewrite' AS audit, count(*)::BIGINT AS n_rows,
             sum(rewrite_ok)::BIGINT AS n_pass FROM mv
      UNION ALL
      SELECT 'luhn_contract', count(*)::BIGINT,
             sum(audit_exact)::BIGINT FROM luhn
      UNION ALL
      SELECT 'littles_law', count(*)::BIGINT,
             sum(identity_ok)::BIGINT FROM little
      UNION ALL
      SELECT 'clustering_depth_dominance', 1::BIGINT,
             CASE WHEN (SELECT max_overlap_depth FROM depth WHERE layout = 'range')
                       <= (SELECT max_overlap_depth FROM depth WHERE layout = 'hash')
                  THEN 1 ELSE 0 END::BIGINT
    )
    SELECT audit, n_rows, n_pass,
           CASE WHEN n_pass = n_rows THEN 1 ELSE 0 END AS all_green
    FROM legs ORDER BY audit
    """


@query(
    "q517_selfcert_scorecard",
    oracle=_selfcert_oracle(),
    tags=("capstone", "self-certification", "audit", "governance"),
)
def selfcert_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine self-certification scorecard — the closing artifact of the
    audit family: every operator that proves an internal identity (the
    MV rollup-rewrite equivalence q483, the Luhn catch-exactly-the-
    corrupted contract q495, the Little's-law bookkeeping identity
    q507, and the clustering-depth dominance invariant q485 — range
    layout's max overlap depth never exceeds hash layout's) reduced to
    one (audit, rows, passes, all_green) table. q508 financial
    reconciliation is deliberately excluded: its pass criterion is a
    rounding tolerance, not an exact identity (swap in commit 35a29b3). A platform publishes this per release: if any
    all_green drops to 0, an internal invariant — not merely a data
    expectation — broke. Composed THROUGH the registry (functions on
    the Spark side, spliced SQL on the oracle side, the q400/q458
    discipline), so the scorecard can never drift from the audits it
    summarizes.

    Scale posture: cost = the composed audits' own postures (each is
    one-to-two hash-aggs); the scorecard itself is a 4-row union."""
    from kinesis_customer_sample_spark.registry import REGISTRY

    mv = REGISTRY["q483_mv_rewrite_audit"].fn(spark, sf_dir)
    luhn = REGISTRY["q495_luhn_checksum_audit"].fn(spark, sf_dir)
    little = REGISTRY["q507_littles_law_audit"].fn(spark, sf_dir)
    depth = REGISTRY["q485_clustering_depth_audit"].fn(spark, sf_dir)
    legs = (
        mv.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("rewrite_ok").cast("bigint").alias("n_pass"),
        ).select(F.lit("mv_rewrite").alias("audit"), "n_rows", "n_pass")
        .unionByName(
            luhn.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("audit_exact").cast("bigint").alias("n_pass"),
            ).select(F.lit("luhn_contract").alias("audit"), "n_rows", "n_pass")
        )
        .unionByName(
            little.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("identity_ok").cast("bigint").alias("n_pass"),
            ).select(F.lit("littles_law").alias("audit"), "n_rows", "n_pass")
        )
        .unionByName(
            depth.groupBy()
            .pivot("layout", ["hash", "range"])
            .max("max_overlap_depth")
            .select(
                F.lit("clustering_depth_dominance").alias("audit"),
                F.lit(1).cast("bigint").alias("n_rows"),
                F.expr("CASE WHEN range <= hash THEN 1 ELSE 0 END")
                .cast("bigint")
                .alias("n_pass"),
            )
        )
    )
    return legs.select(
        "audit",
        "n_rows",
        "n_pass",
        F.expr("CASE WHEN n_pass = n_rows THEN 1 ELSE 0 END").alias("all_green"),
    ).orderBy("audit")
