#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a warm-up pass of the session (first
query pays JVM/codegen warm-up; a trivial priming job absorbs that).
Results are fully materialized via count() on a cached-nothing plan —
representative of a write-or-collect consumer without driver-collect
overhead dominating.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from turbine_maintenance_etl_spark import get_spark
from turbine_maintenance_etl_spark.queries import REGISTRY
import turbine_maintenance_etl_spark.queries_llm  # noqa: F401

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "cmapss_feature_engine",
    "w_sessionization",
    "a9_two_level_agg",
    "a12_median_quantile",
    "agg_rollup",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "text_quality_signals",
    "sim_brute_force_topk",
    "sim_lsh_topk",
    "events_tumbling_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    # prime JVM / parquet footer caches with a trivial job
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
