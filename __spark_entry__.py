"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `kinesis_customer_sample_spark` — the engine package. Every
implemented operator from SURVEY.md §2 is a named query in the package
registry; this module re-exports the registry in the driver's shape:
`entry` (smoke), `queries` (Spark side), `oracle_sql` (DuckDB side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kinesis_customer_sample_spark.registry import load_registry  # noqa: E402

FLAGSHIP = "q01_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return load_registry()[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query.

    Queries without an entry here (hash-based, approximate, streaming-shaped)
    get the driver's weaker rows-only check, as documented per-query.
    """
    return {name: q.oracle for name, q in load_registry().items() if q.oracle is not None}
