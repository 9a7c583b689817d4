"""Catalog dtype normalization: `events.ts` has shipped as BOTH
ns-as-long and native timestamp[us] across driver fixture generations
(the flip broke 7 queries + the whole bench in round 2). The catalog and
the streaming replay source must normalize either encoding to the same
wall-clock timestamps — these tests pin both branches so a future flip
in either direction is caught locally, not by the driver."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table

_US = [1_704_067_200_000_000, 1_704_070_800_123_456]  # 2024-01-01T00/01 UTC


def _write_events(dirpath: str, ts_array: pa.Array) -> None:
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
        }
    )
    pq.write_table(t, os.path.join(dirpath, "events.parquet"))


@pytest.mark.parametrize(
    "encoding",
    ["timestamp_us", "ns_as_long"],
    ids=["native-timestamp", "legacy-ns-long"],
)
def test_catalog_normalizes_both_ts_encodings(spark, tmp_path, encoding):
    d = tmp_path / encoding
    d.mkdir()
    if encoding == "timestamp_us":
        ts = pa.array(_US, pa.timestamp("us"))
    else:
        ts = pa.array([us * 1000 for us in _US], pa.int64())
    _write_events(str(d), ts)
    df = table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = [
        r["us"]
        for r in df.select(
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us")
        )
        .orderBy("event_id")
        .collect()
    ]
    assert got == _US


def test_scan_memo_is_per_session_and_hit_on_repeat(spark, sf_dir):
    """The scan-relation memo lives ON the SparkSession instance: the
    same (session, sf_dir, table) returns the identical DataFrame object
    (no second footer read), while a spark.newSession() clone — same
    applicationId, separate catalog — builds its OWN relation, so its
    temp-view registrations can never land in the parent session's
    catalog (r8 review finding)."""
    a1 = table(spark, sf_dir, "nation")
    a2 = table(spark, sf_dir, "nation")
    assert a1 is a2  # memo hit within the session
    clone = spark.newSession()
    try:
        b = table(clone, sf_dir, "nation")
        assert b is not a1  # clone gets its own session-bound relation
        assert b.sparkSession is clone
        # the clone's registration must resolve in the clone's catalog
        b.createOrReplaceTempView("kcss_memo_probe")
        assert clone.sql("SELECT count(*) AS c FROM kcss_memo_probe").collect()[0][
            "c"
        ] == b.count()
    finally:
        clone.catalog.dropTempView("kcss_memo_probe")
