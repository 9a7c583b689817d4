"""Stream→table compaction (SURVEY.md §4.2 physical layout): the
maintenance job that keeps a streaming sink's output readable at scale.

A foreachBatch upsert sink (streaming/sinks.py) necessarily writes one
small file set per micro-batch; after a day that is thousands of tiny
files — the classic small-files problem that destroys 100 TB scan
performance (per-file open cost, no row-group skipping). Compaction
rewrites a table directory into few large, key-sorted, ZSTD files:

- `repartitionByRange(key)` → files cover disjoint key ranges, so
  point/range reads prune whole files via parquet min/max row-group stats
  (the poor man's clustering — same read-side effect as Z-order on one key
  axis);
- `sortWithinPartitions(key)` → runs inside each file give parquet page
  stats their selectivity;
- atomic swap via rename, so readers never see a half-compacted table.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def compact_table(
    spark: SparkSession,
    table_dir: str,
    sort_keys: list[str],
    *,
    target_files: int = 4,
    codec: str = "zstd",
) -> dict:
    """Rewrite `table_dir` into `target_files` key-range-partitioned,
    key-sorted parquet files. Returns {files_before, files_after, rows}.

    At 100 TB this runs per date-partition (the write unit of the
    streaming sink), not per table — each partition compacts independently
    and in parallel, and the swap stays atomic per partition."""

    def _parquet_files(d: str) -> list[str]:
        return [
            os.path.join(root, f)
            for root, _, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        ]

    before = _parquet_files(table_dir)
    df = spark.read.parquet(table_dir)
    rows = df.count()
    staging = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(table_dir.rstrip("/")))
    (
        df.repartitionByRange(target_files, *sort_keys)
        .sortWithinPartitions(*sort_keys)
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(staging)
    )
    old = table_dir.rstrip("/") + ".old"
    os.rename(table_dir, old)
    os.rename(staging, table_dir)
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(_parquet_files(table_dir)),
        "rows": rows,
    }
