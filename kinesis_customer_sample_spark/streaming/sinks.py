"""Sinks: the CMS-sync upsert target (R15, guide:3) via foreachBatch.

`foreach_batch_upsert` maintains a parquet "document table" keyed by the
content-operation key: each micro-batch's latest-state rows are merged with
the existing table (newest event time wins, deletes drop keys) and the table
is atomically swapped. At test scale this is a read-merge-rewrite; on a real
deployment the same callback body becomes a Delta/Iceberg `MERGE INTO`
(jars not in this image — SURVEY.md §4.2 physical-layout notes), with the
table partitioned by event date so merges only rewrite touched partitions.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["organization_id", "id", "branch", "published"]


def merge_latest(existing: DataFrame | None, updates: DataFrame) -> DataFrame:
    """Newest-wins merge of update rows into the existing table; rows whose
    winning operation is a delete are removed (guide:72 replace-or-delete)."""
    merged = updates if existing is None else existing.unionByName(updates)
    w = Window.partitionBy(*KEY).orderBy(F.col("last_us").desc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .filter(F.col("last_operation").startswith("insert-"))
    )


def foreach_batch_upsert(table_dir: str):
    """Build a foreachBatch callback that upserts latest-state rows into a
    parquet table at `table_dir` (exactly-once via idempotent newest-wins
    merge + atomic directory swap)."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        existing = None
        if os.path.exists(table_dir):
            existing = spark.read.parquet(table_dir)
        merged = merge_latest(existing, batch_df)
        tmp = f"{table_dir}.tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        # materialize before swap (merged lazily reads table_dir)
        if os.path.exists(table_dir):
            shutil.rmtree(table_dir)
        os.rename(tmp, table_dir)

    return apply
