"""Local oracle-diff harness mirroring the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet directory, canonicalizes both results (columns sorted by name, rows
order-insensitive, values normalized), and reports an exact comparison —
the same row-count + schema + value-level strictness the driver applies.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from kinesis_customer_sample_spark.catalog import TABLES
from kinesis_customer_sample_spark.registry import Query


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the fixture tables registered as views."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_value(v):
    """Normalize one cell to an engine-neutral comparable value."""
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:  # collapse -0.0 vs 0.0
            return 0.0
        return f
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    return v


def canonicalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # mask pandas NaN-for-null in object/float columns back to None
    rows = [
        tuple(_norm_value(v) if not (isinstance(v, float) and pd.isna(v)) else None for v in tup)
        for tup in pdf.itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple(repr(x) for x in r))
    return cols, rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def report(self) -> str:
        status = "OK" if self.ok else "FAIL"
        lines = [f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} rows"]
        lines += [f"    {m}" for m in self.mismatches[:10]]
        return "\n".join(lines)


def compare_query(spark, q: Query, sf_dir: str, con=None) -> CompareResult:
    """Run q.fn on Spark and q.oracle on DuckDB; exact-compare canonical rows."""
    if q.oracle is None:
        raise ValueError(f"{q.name} has no oracle SQL (rows-only query)")
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        spark_pdf = q.fn(spark, sf_dir).toPandas()
        duck_pdf = con.execute(q.oracle).df()
    finally:
        if own_con:
            con.close()

    s_cols, s_rows = canonicalize(spark_pdf)
    d_cols, d_rows = canonicalize(duck_pdf)
    res = CompareResult(q.name, True, len(s_rows), len(d_rows))

    if s_cols != d_cols:
        res.ok = False
        res.mismatches.append(f"schema: spark={s_cols} oracle={d_cols}")
        return res
    if len(s_rows) != len(d_rows):
        res.ok = False
        res.mismatches.append("row count differs")
    n_diff = 0
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            n_diff += 1
            if n_diff <= 5:
                res.mismatches.append(f"row {i}: spark={a!r} oracle={b!r}")
    if n_diff:
        res.ok = False
        res.mismatches.append(f"{n_diff} differing rows (of {min(len(s_rows), len(d_rows))})")
    return res
