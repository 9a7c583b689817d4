"""Grid-blocked proximity join — round-3 wave (SURVEY.md §2B): the spatial
join pattern (radius search between two point sets) as grid-cell blocking +
exact in-cell verification, the same candidates-then-verify architecture as
the LSH/banding family but over 2-D coordinates.

The fixtures carry no geo columns, so both point sets are synthesized
DETERMINISTICALLY from the keys (multiplicative-hash coordinates on a
1M×1M integer plane — q193's messy-URL-synthesis precedent): the point
GEOMETRY is synthetic, the join MACHINERY is the real operator.

Scale posture (100 TB): with cell size == radius R, any pair within R
differs by at most one cell index per axis — so exploding ONE side into
its 3×3 cell neighborhood and equi-joining on the cell key finds every
qualifying pair (recall 1.0 by construction, no all-pairs anywhere).
Shuffle volume is 9×|A| + |B| rows on the cell key; cells are dense ⇒
bucketed equi-join, skew bounded by points-per-cell (AQE splits hot
cells). Verification is exact integer arithmetic (dx² + dy² ≤ R² in
int64), so the result is hash-reproducible — no trig, no floats, unlike
haversine whose libm last-ulp differences would make the boundary
engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.registry import query

_R = 50_000  # radius == grid cell size, on the 1M×1M integer plane
_MX, _MY = 48_271, 69_621  # coordinate-synthesis multipliers (set A)
_NX, _NY = 16_807, 40_503  # set B


@query(
    "q232_grid_proximity_join",
    oracle=f"""
    WITH a AS (
      SELECT c_custkey AS a_id,
             (c_custkey * {_MX}) % 1000000 AS ax,
             (c_custkey * {_MY}) % 1000000 AS ay
      FROM customer
    ),
    b AS (
      SELECT s_suppkey AS b_id,
             (s_suppkey * {_NX}) % 1000000 AS bx,
             (s_suppkey * {_NY}) % 1000000 AS by
      FROM supplier
    )
    SELECT a_id, b_id,
           ((ax - bx) * (ax - bx) + (ay - by) * (ay - by))::BIGINT AS dist2
    FROM a JOIN b
      ON (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= {_R}::BIGINT * {_R}
    """,
    tags=("spatial", "proximity", "blocking"),
)
def grid_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-R proximity join between two synthesized point sets
    (customers × suppliers on a 1M×1M integer plane): side A explodes
    into its 3×3 grid-cell neighborhood (cell = R), side B keys on its
    home cell, candidates meet in a plain equi-join on the cell id, and
    the exact integer distance check keeps true pairs — recall 1.0
    because a pair within R can differ by at most one cell per axis.
    The oracle is the quadratic theta join (the semantics); the grid is
    the plan."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("a_id"),
        ((F.col("c_custkey") * _MX) % 1_000_000).alias("ax"),
        ((F.col("c_custkey") * _MY) % 1_000_000).alias("ay"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("b_id"),
        ((F.col("s_suppkey") * _NX) % 1_000_000).alias("bx"),
        ((F.col("s_suppkey") * _NY) % 1_000_000).alias("by"),
    )
    # side A: home cell ± 1 in each axis (9 cells)
    a_cells = cust.select(
        "a_id",
        "ax",
        "ay",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dx -> "
                f"transform(sequence(-1, 1), dy -> "
                f"struct(ax div {_R} + dx AS cx, ay div {_R} + dy AS cy))))"
            )
        ).alias("cell"),
    ).select("a_id", "ax", "ay", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
    b_cells = supp.select(
        "b_id",
        "bx",
        "by",
        F.expr(f"bx div {_R}").alias("cx"),
        F.expr(f"by div {_R}").alias("cy"),
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a_cells.join(b_cells, ["cx", "cy"])
        .filter(dist2 <= _R * _R)
        .select("a_id", "b_id", dist2.cast("bigint").alias("dist2"))
    )


# --- q307: point-in-polygon (ray casting), portable unrolled form --------
import math as _math

# 10-vertex star (alternating outer/inner radius) — deliberately
# NON-convex so the even-odd rule is genuinely exercised (a convex
# polygon cannot distinguish crossing-number from winding bugs).
_STAR = [
    (
        (0.9 if i % 2 == 0 else 0.35) * _math.cos(_math.pi / 2 + i * _math.pi / 5),
        (0.9 if i % 2 == 0 else 0.35) * _math.sin(_math.pi / 2 + i * _math.pi / 5),
    )
    for i in range(10)
]

_PX = "(CAST(event_id % 199 AS DOUBLE) / 100.0 - 1.0)"
_PY = "(CAST(user_id % 211 AS DOUBLE) / 105.0 - 1.0)"


def _crossings(px: str, py: str) -> str:
    """Even-odd ray-cast crossing count, fully unrolled over the star's
    10 edges with vertex literals shared verbatim by both dialects —
    pure comparisons and arithmetic on doubles, no lambdas, no UDF."""
    terms = []
    n = len(_STAR)
    for i in range(n):
        x1, y1 = _STAR[i]
        x2, y2 = _STAR[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1!r} > {py}) != ({y2!r} > {py})) AND "
            f"({px} < ({x2!r} - {x1!r}) * ({py} - {y1!r}) / ({y2!r} - {y1!r}) + {x1!r}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "q307_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             ({_crossings(_PX, _PY)} % 2 = 1) AS inside
      FROM events
    )
    SELECT event_type,
           count(*)::BIGINT AS n_points,
           sum(CASE WHEN inside THEN 1 ELSE 0 END)::BIGINT AS n_inside,
           round(sum(CASE WHEN inside THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
             AS inside_share
    FROM pts GROUP BY event_type
    """,
    tags=("spatial", "point-in-polygon", "ray-casting", "geo"),
)
def point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment (even-odd ray casting) against a
    non-convex 10-vertex star: each event maps to a deterministic point
    in [-1, 1]² and is classified by counting ray/edge crossings — the
    geo primitive behind geofencing and region rollups, here as a fully
    unrolled codegen expression (10 edge terms, no UDF, no join). The
    polygon is a broadcast-free LITERAL: at 100 TB the classification
    stays map-side; many-polygon workloads graduate to q232's grid
    blocking with this expression as the exact per-cell test. Vertex
    literals are repr-exact doubles shared with the oracle, and every
    crossing term is the same comparison/arithmetic sequence in both
    engines."""
    ev = table(spark, sf_dir, "events")
    inside = F.expr(f"({_crossings(_PX, _PY)} % 2) = 1")
    return (
        ev.select("event_type", inside.alias("inside"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum(F.when(F.col("inside"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_inside"),
            F.round(
                F.sum(F.when(F.col("inside"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("inside_share"),
        )
    )


# trajectory dials: synthetic planar positions from the event hash, stop
# = consecutive fixes within this L∞ radius, reported if ≥ this many fixes
_TRAJ_CELL = 1_000_000
_STOP_RADIUS = 120_000
_STOP_MIN_FIXES = 3


@query(
    "q387_trajectory_stops",
    oracle=f"""
    WITH fixes AS (
      SELECT user_id, ts, event_id,
             ((event_id * 2654435761) % {_TRAJ_CELL})::BIGINT AS x,
             ((event_id * 40503) % {_TRAJ_CELL})::BIGINT      AS y
      FROM events
    ),
    steps AS (
      SELECT user_id, ts, event_id, x, y,
             CASE WHEN greatest(
                    abs(x - lag(x) OVER w), abs(y - lag(y) OVER w))
                  <= {_STOP_RADIUS}
                  AND lag(x) OVER w IS NOT NULL
             THEN 0 ELSE 1 END AS is_break
      FROM fixes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    segs AS (
      SELECT user_id, ts, event_id,
             sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS seg_id
      FROM steps
    ),
    stops AS (
      SELECT user_id, seg_id, count(*)::BIGINT AS n_fixes
      FROM segs GROUP BY 1, 2
      HAVING count(*) >= {_STOP_MIN_FIXES}
    )
    SELECT user_id,
           count(*)::BIGINT       AS n_stops,
           sum(n_fixes)::BIGINT   AS n_stop_fixes,
           max(n_fixes)::BIGINT   AS longest_stop_fixes
    FROM stops GROUP BY 1
    """,
    tags=("spatial", "trajectory", "stop-detection", "mobility"),
)
def trajectory_stops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory stop detection — the mobility-analytics primitive
    (stay-point extraction): consecutive position fixes within an L∞
    radius belong to one candidate stop; runs of ≥{_STOP_MIN_FIXES}
    fixes are stops. Positions are deterministic hash-planar coordinates
    (the q232 integer plane) so the operator contract — lag-based
    break detection, gaps-and-islands segment ids, run-length filter —
    is exercised end-to-end with an exact oracle; with real GPS columns
    only the projection changes.

    Scale posture (100 TB): one (user)-partitioned window chain (the
    q108 sessionize discipline — per-user state, shard-parallel), one
    hash agg to segments, one to users. The L∞ metric keeps the
    comparison pure integer (no sqrt)."""
    fixes = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 2654435761) % _TRAJ_CELL).alias("x"),
        ((F.col("event_id") * 40503) % _TRAJ_CELL).alias("y"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = fixes.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (
                F.greatest(
                    F.abs(F.col("x") - F.lag("x").over(w)),
                    F.abs(F.col("y") - F.lag("y").over(w)),
                )
                <= _STOP_RADIUS
            )
            & F.lag("x").over(w).isNotNull(),
            0,
        )
        .otherwise(1)
        .alias("is_break"),
    )
    segs = steps.select(
        "user_id",
        F.sum("is_break")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("seg_id"),
    )
    stops = (
        segs.groupBy("user_id", "seg_id")
        .agg(F.count(F.lit(1)).alias("n_fixes"))
        .filter(F.col("n_fixes") >= _STOP_MIN_FIXES)
    )
    return stops.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_stops"),
        F.sum("n_fixes").alias("n_stop_fixes"),
        F.max("n_fixes").alias("longest_stop_fixes"),
    )
