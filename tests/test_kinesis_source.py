"""R1 source contract: the wire-format fixture replayed through the
file-backed Kinesis double, full decode pipeline running INSIDE micro-
batches, must equal the batch decode — and feed the stateful operators
unchanged."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from kinesis_customer_sample_spark.fixtures import kinesis_records_df
from kinesis_customer_sample_spark.sources.decode import decode_records
from kinesis_customer_sample_spark.sources.kinesis import (
    content_operation_stream,
    file_record_stream,
    kinesis_stream,
    write_record_batches,
)
from kinesis_customer_sample_spark.streaming.replay import run_to_completion


def test_stream_decode_equals_batch_decode(spark):
    records, s3_store = kinesis_records_df(spark)
    fetch = s3_store.__getitem__
    with tempfile.TemporaryDirectory() as td:
        write_record_batches(records, td, n_batches=3)
        stream = file_record_stream(spark, td)
        decoded = content_operation_stream(stream, fetch=fetch)
        got = run_to_completion(decoded, output_mode="append")
        want = decode_records(records, fetch=fetch)
        key = ["shard_id", "sequence_number"]
        g = {tuple(r[k] for k in key): (r.operation, r.id, r.body) for r in got.collect()}
        w = {tuple(r[k] for k in key): (r.operation, r.id, r.body) for r in want.collect()}
        assert g == w and len(w) > 0


def test_stream_decode_drops_invalid_and_expired(spark):
    """The corrupt record, wrong-envelope record, and expired-URL record
    are dropped (guide:36-39, 62-64), everything else survives."""
    records, s3_store = kinesis_records_df(spark)
    fetch = s3_store.__getitem__
    n_records = records.count()
    decoded = decode_records(records, fetch=fetch)
    # fixture: 16 ops + 2 malformed; one spilled URL is expired
    n_expired = 1
    assert decoded.count() == n_records - 2 - n_expired
    # every surviving row carries its shard provenance
    assert decoded.filter(F.col("shard_id").isNull()).count() == 0


def test_kinesis_production_source_degrades_clearly(spark):
    """Without the connector jar, kinesis_stream raises the documented
    error (not an opaque ClassNotFound), keeping the production path
    importable and its option mapping testable."""
    import pytest

    with pytest.raises(RuntimeError, match="Kinesis connector not on the classpath"):
        kinesis_stream(spark, "content-stream", "us-east-1")
