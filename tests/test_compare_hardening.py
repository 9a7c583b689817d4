"""Comparator-strictness guards for the r14/q35 Decimal class.

The round-14 driver walk red-rowed q35_sql_shipping_priority: its Spark-side
SQL divided by the literal ``10000.0``, which Spark SQL parses as DECIMAL, so
the output column became decimal(24,2) while the DuckDB oracle's ``/`` yields
DOUBLE. All 20 rows were cent-identical — the driver hash failed purely on
rendering (``381126.20`` vs ``381126.2``). The local comparator was blind to
the class for eleven rounds because it collapsed Decimal through ``float()``.

These tests pin the two fixes so the class can never hide again:

1. ``_norm_value`` renders Decimal scale-preserving — a Decimal only equals a
   float whose canonical rendering is identical (exactly the driver's rule).
2. ``compare_query`` reports any Spark output column containing a decimal
   type as a mismatch, so every parity sweep (local and pytest) enforces the
   no-DecimalType output policy across the whole registry; the rows-only
   queries (which bypass compare_query) get a direct schema walk here.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from kinesis_customer_sample_spark.compare import _decimal_columns, _norm_value
from kinesis_customer_sample_spark.registry import load_registry

REGISTRY = load_registry()
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


# ---------------------------------------------------------------- _norm_value

def test_decimal_scale_mismatch_vs_float_detected():
    # the q35 failure verbatim: decimal(24,2) renders the trailing zero,
    # double does not — the driver hash diverged, so must we
    assert _norm_value(Decimal("381126.20")) != _norm_value(381126.2)


def test_decimal_same_rendering_as_float_matches():
    # driver-faithful: Decimal('381126.2') and float 381126.2 both render
    # '381126.2' and hash equal on the driver — stay equal locally
    assert _norm_value(Decimal("381126.2")) == _norm_value(381126.2)
    assert _norm_value(Decimal("0.25")) == _norm_value(0.25)


def test_decimal_never_equals_int():
    # stricter than the driver here (kind-tag), which is the safe direction
    assert _norm_value(Decimal("5")) != _norm_value(5)


def test_decimal_exponent_form_is_non_exponent_rendered():
    kind, rendered = _norm_value(Decimal("1E+2"))
    assert kind == "f"
    assert rendered == "100"


def test_decimal_nan_normalizes_like_float_nan():
    assert _norm_value(Decimal("NaN")) == _norm_value(float("nan"))


def test_decimal_zero_scale_preserved():
    # Decimal('0.00') renders '0.00' on the driver, float 0.0 renders '0.0'
    # — the comparator must keep them distinct (no zero-collapse for Decimal)
    assert _norm_value(Decimal("0.00")) != _norm_value(0.0)


# ----------------------------------------------------------- schema flagging

def test_decimal_columns_flags_top_level_and_nested():
    pa = pytest.importorskip("pyarrow")
    schema = pa.schema(
        [
            pa.field("ok_double", pa.float64()),
            pa.field("bad_dec", pa.decimal128(24, 2)),
            pa.field("bad_nested", pa.list_(pa.decimal128(10, 4))),
            pa.field(
                "bad_struct",
                pa.struct([pa.field("inner", pa.decimal128(9, 2))]),
            ),
            pa.field("ok_int", pa.int64()),
        ]
    )
    assert _decimal_columns(schema) == ["bad_dec", "bad_nested", "bad_struct"]


def test_decimal_columns_clean_schema_empty():
    pa = pytest.importorskip("pyarrow")
    schema = pa.schema([pa.field("a", pa.float64()), pa.field("b", pa.int64())])
    assert _decimal_columns(schema) == []


# ------------------------------------------------- rows-only registry closure

@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_emits_no_decimal(spark, sf_dir, name):
    """Oracle-backed queries are policed by compare_query inside every parity
    sweep; the rows-only queries bypass it, so walk their Spark schemas here
    to close the registry-wide no-DecimalType guarantee."""
    df = REGISTRY[name].fn(spark, sf_dir)
    offenders = [f.name for f in df.schema.fields if "decimal" in f.dataType.simpleString()]
    assert offenders == [], (
        f"{name} emits DecimalType column(s) {offenders} — banned (r14/q35 "
        "class): cast to DOUBLE or emit floor-µ BIGINT"
    )
