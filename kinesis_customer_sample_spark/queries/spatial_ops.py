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

from pyspark.sql import DataFrame, SparkSession
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
