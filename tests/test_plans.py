"""Physical-plan audits (SURVEY.md §4.2 "rely; verify with explain()"):
the optimizations we depend on for 100 TB must actually appear in the
plans, and a regression (lost pushdown, a join degrading to cartesian)
should fail CI, not surface in a cluster bill."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.registry import load_registry

REGISTRY = load_registry()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    # the shipdate predicate must reach the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read unused lineitem columns
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    # partial + final aggregation (map-side combine before the shuffle)
    assert "partial_sum" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q06_join_broadcast_dims")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_no_global_sort_exchange(spark, sf_dir):
    # top-k must use TakeOrderedAndProject, not sort-the-world
    plan = plan_of(spark, sf_dir, "q30_topk_global")
    assert "TakeOrderedAndProject" in plan


def test_minhash_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q69_minhash_lsh_pairs")
    assert "CartesianProduct" not in plan
    # the distinct-shingle hash table must broadcast back to postings
    assert "BroadcastHashJoin" in plan


def test_feature_extract_map_only(spark, sf_dir):
    # the only Exchange allowed is the deliberate round-robin spread of the
    # single-file scan BEFORE featurize; extracted features must not
    # shuffle afterwards, and the spread must not hash on blob contents
    plan = plan_of(spark, sf_dir, "q78_media_feature_extract")
    n_exchanges = plan.count("(") and len(
        [l for l in plan.splitlines() if l.strip().startswith("Exchange") or ") Exchange" in l]
    )
    assert n_exchanges <= 1
    assert "RoundRobinPartitioning" in plan  # the explicit spread
    assert "hashpartitioning" not in plan.lower()


def test_brute_topk_broadcasts_query_vector(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q72_cosine_topk_brute")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["q05_join_inner", "q07_join_left_outer", "q12_join_range", "q13_join_asof"],
)
def test_join_family_no_cartesian(spark, sf_dir, name):
    assert "CartesianProduct" not in plan_of(spark, sf_dir, name)


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key pre-distributes the data so the
    join needs NO Exchange — the co-located-join layout for repeated 100 TB
    fact⋈fact joins (SURVEY.md §4.2). Written once, joined shuffle-free
    forever after."""
    from kinesis_customer_sample_spark.catalog import table

    # tables land in the default spark-warehouse/ (gitignored) and are
    # dropped below — warehouse.dir is a static conf, not settable per-test
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("b_orders")
    table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("b_lineitem")
    # disable broadcast so the join strategy is the bucketed sort-merge path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert joined.count() == table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style date partitioning (the 100 TB layout, SURVEY.md §4.2):
    a filter on the partition column must prune at planning time —
    PartitionFilters in the scan, not a post-scan Filter."""
    from kinesis_customer_sample_spark.catalog import table

    path = str(tmp_path / "events_by_day")
    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    want = ev.filter(F.col("day") == "2024-01-05").count()
    assert back.count() == want and want > 0
