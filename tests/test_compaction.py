"""Compaction: many small sink files → few sorted files, values intact,
file-level key ranges disjoint (so min/max stats prune whole files)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.operators.compaction import compact_table


def test_compaction_preserves_values_and_sorts(spark, sf_dir, tmp_path):
    target = str(tmp_path / "sink_table")
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # simulate 16 micro-batch writes → 16+ small files
    for i in range(16):
        ev.filter(F.col("event_id") % 16 == i).coalesce(1).write.mode("append").parquet(target)

    before = {r.event_id for r in spark.read.parquet(target).collect()}
    stats = compact_table(spark, target, ["event_id"], target_files=4)
    after_df = spark.read.parquet(target)
    after = {r.event_id for r in after_df.collect()}

    assert after == before and stats["rows"] == len(before)
    assert stats["files_before"] >= 16
    assert stats["files_after"] <= 4

    # disjoint file-level key ranges: parquet footer min/max must not overlap
    files = sorted(
        os.path.join(target, f) for f in os.listdir(target) if f.endswith(".parquet")
    )
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns) if md.row_group(0).column(i).path_in_schema == "event_id"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # no overlap between consecutive files
