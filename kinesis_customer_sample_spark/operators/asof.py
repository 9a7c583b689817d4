"""As-of join: for each left row, the latest right row with ts <= left.ts.

Spark has no native as-of join (SURVEY.md §2B). The naive encoding —
non-equi join + row_number — materializes every (left, right-before-it) pair
before pruning, which is O(n·m) per key and dies at scale. This
implementation uses the union+window trick instead:

    tag left/right → unionByName → per-key window ordered by (ts, side) →
    last(right_payload, ignorenulls=True) over rows UNBOUNDED..CURRENT →
    keep left rows

One shuffle on the join key, O(n+m) state, AQE-skew-splittable — the plan a
purpose-built as-of operator would produce. `pd.merge_asof` via
applyInPandas would be per-group single-threaded Python; composition wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Left as-of join.

    Args:
        on: equi keys present in both frames.
        left_ts / right_ts: event-time columns.
        right_payload: right columns carried to matching left rows
            (emitted as ``asof_<name>``).
        strict: if True match right.ts < left.ts, else <=.

    Right rows sort before left rows at equal ts unless strict, so `<=`
    semantics hold; with strict=True the window ends 1 row before current
    only relative to ordering where left sorts first.
    """
    on = list(on)
    # side marker: right rows must be visible to left rows at the same ts
    # for <= semantics (right sorts first), and invisible for < (left first).
    right_side, left_side = (1, 0) if strict else (0, 1)

    lt = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in right_payload],
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.lit(None).cast(lt.schema["_left"].dataType).alias("_left"),
        *[F.col(c).alias(f"_p_{c}") for c in right_payload],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    for c in right_payload:
        unioned = unioned.withColumn(
            f"asof_{c}", F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w)
        )
    return (
        unioned.filter(F.col("_left").isNotNull())
        .select("_left.*", *[f"asof_{c}" for c in right_payload])
    )
