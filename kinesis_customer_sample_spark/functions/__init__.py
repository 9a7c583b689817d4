"""Engine-agnostic function builders shared by queries and their oracles."""

from kinesis_customer_sample_spark.functions.porthash import (  # noqa: F401
    MOD_P,
    band_hash_expr,
    cosine_expr,
    minhash_perm_expr,
    tok_hash_expr,
)


def fixed_units(col, scale: int = 2):
    """Quantize a decimal-valued double Column to BIGINT fixed-point units
    (cents for scale=2): CAST(round(col * 10^scale) AS BIGINT).

    Summing these units is associative integer arithmetic, so a grouped sum
    is bit-identical under any partitioning/combine order — the repo-wide
    fix for the `round(sum(<double>), 2)` class, where summation-order FP
    drift can flip a half-cent rounding between Spark and the oracle engine
    (VERDICT r4 "Residual FP-drift class"; reference implementation q288).
    Valid while |sum| < 2^63 units — at 10^2 units that is ~9·10^16
    currency units, comfortably past 100 TB fact tables; callers using
    scale=6 on large-magnitude measures should note the tighter bound.
    """
    from pyspark.sql import functions as F

    return F.round(col * (10 ** scale)).cast("bigint")


def fixed_sum(col, scale: int = 2, out_scale: int = 2):
    """round(sum(fixed_units(col, scale)) / 10^scale, out_scale) — the
    order-independent replacement for F.round(F.sum(col), out_scale)."""
    from pyspark.sql import functions as F

    return F.round(F.sum(fixed_units(col, scale)) / float(10 ** scale), out_scale)


def broadcast_if_bounded(df, n_rows: int, row_cap: int | None = None):
    """Broadcast-hint `df` only when its MEASURED row count is under the
    cap; otherwise return it unhinted so AQE picks the join strategy from
    runtime sizes.

    An unconditional `F.broadcast()` on a table whose cardinality grows
    with the fact tables (node-grain label tables, request-queue cohorts)
    overrides AQE's size checks and becomes a driver-OOM at 100 TB — the
    hint does NOT fall back to a shuffle join past broadcast reach
    (VERDICT r15 item 3). Callers pass the count they already have (or can
    take cheaply from a persisted intermediate); the cap is rows, not
    bytes, sized for narrow two-column keys (~16 B data, ~50 B built):
    the default 2M rows is ~100 MB of hash relation, comfortably inside
    executor memory here and parameterised for production via
    SPARK_GRAFT_BROADCAST_ROW_CAP.
    """
    import os

    from pyspark.sql import functions as F

    if row_cap is None:
        row_cap = int(os.environ.get("SPARK_GRAFT_BROADCAST_ROW_CAP", "2000000"))
    return F.broadcast(df) if n_rows <= row_cap else df


def duck_fixed_sum(expr: str, scale: int = 2, out_scale: int = 2) -> str:
    """DuckDB SQL twin of fixed_sum — textually the same arithmetic, so
    engine and oracle agree bit-for-bit."""
    unit = 10 ** scale
    return (
        f"round(sum(CAST(round(({expr}) * {unit}) AS BIGINT)) / {unit}.0, {out_scale})"
    )
