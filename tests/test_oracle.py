"""Oracle-diff: every registered query with oracle SQL must exactly match
DuckDB on the same parquet (mirrors the driver's correctness gate)."""

from __future__ import annotations

import pytest

from kinesis_customer_sample_spark.compare import compare_query, duckdb_connection
from kinesis_customer_sample_spark.registry import load_registry

REGISTRY = load_registry()
CHECKED = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", CHECKED)
def test_oracle_match(spark, sf_dir, duck, name):
    res = compare_query(spark, REGISTRY[name], sf_dir, con=duck)
    assert res.ok, res.report()
    assert res.spark_rows > 0, f"{name}: empty result — vacuous match"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() > 0
