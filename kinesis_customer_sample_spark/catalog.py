"""Table catalog over the driver-generated parquet fixtures (TESTDATA.md).

Ten tables per scale-factor directory: TPC-H-ish `region nation customer
supplier part orders lineitem` plus `events documents embeddings`
(FIXTURES.md §A). All reads are plain parquet scans so Catalyst gets predicate
pushdown + column pruning for free (SURVEY.md §4.2).

One normalization lives here: `events.ts` is normalized to `timestamp_ntz`
whatever the fixture's physical encoding. Older fixture generations wrote
nanosecond precision (which Spark's parquet reader can only surface as a
long under `spark.sql.legacy.parquet.nanosAsLong`); current generations
write native `timestamp[us]`. We branch on the *read* dtype: long →
integer `div` to micros (`div`, not double division — ns-since-epoch
exceeds 2^53 so float division would corrupt microseconds); timestamp →
plain cast. Either way the result matches DuckDB's read of the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.session import ensure_engine_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    ensure_engine_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # legacy ns-as-long fixture
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        else:  # native timestamp / timestamp_ntz fixture
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> None:
    """Register fixture tables as temp views (for spark.sql queries).

    `only` restricts registration to the named tables: each registration
    re-reads a parquet footer (~60 ms), so a query touching one table
    should not pay for ten (measured 0.65 s of pure view setup per call
    at sf0.1 — the dominant cost of the SQL front-end queries)."""
    for name in only if only is not None else TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
