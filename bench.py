#!/usr/bin/env python
"""Headline benchmark: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is fully executed via the noop sink (computes everything,
transfers nothing to the driver) so timings measure the plan, not toPandas.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from kinesis_customer_sample_spark.registry import load_registry
from kinesis_customer_sample_spark.session import get_spark

# Headline set: one representative per operator family (kept in sync with
# SURVEY.md §2B as coverage widens).
HEADLINE = [
    "q01_pricing_summary",
    "q06_join_broadcast_dims",
    "q07_join_left_outer",
    "q12_join_range",
    "q13_join_asof",
    "q19_agg_cube",
    "q22_agg_stats",
    "q26_win_frames",
    "q30_topk_global",
    "q35_sql_shipping_priority",
    # LLM-pipeline operators (first-class bench components)
    "q62_tfidf_top_terms",
    "q67_exact_dedup",
    "q69_minhash_lsh_pairs",
    "q72_cosine_topk_brute",
    "q74_knn_vote",
    "q78_media_feature_extract",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    registry = load_registry()
    names = [n for n in HEADLINE if n in registry]

    spark = get_spark(app_name="kcss-bench")
    # warm the JVM + parquet footer caches with a trivial action
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
