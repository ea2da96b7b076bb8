#!/usr/bin/env python
"""r15 probe: per-repeat wall time + Spark job count for selected headline
keys — separates per-job scheduling floor from real compute drift.

Usage: python tools/probe_q15_r15.py [key ...]   (default: the two CC keys)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_data_ingestion_spark.caching import release_all  # noqa: E402
from blockchain_data_ingestion_spark.queries import load_all  # noqa: E402
from blockchain_data_ingestion_spark.session import get_spark  # noqa: E402


def main() -> None:
    keys = sys.argv[1:] or ["dedup_clusters", "op_pipeline_e2e"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-q15-r15")
    sc = spark.sparkContext
    registry = load_all()
    spark.range(1_000_000).selectExpr("sum(id) AS s").groupBy("s").count() \
         .write.mode("overwrite").format("noop").save()
    tracker = sc.statusTracker()
    for key in keys:
        spec = registry[key]
        # warm run
        spec.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        release_all()
        for rep in range(5):
            jobs0 = len(tracker.getJobIdsForGroup(None) or [])
            # job ids are global; count via jobIds() snapshot instead
            ids0 = set(sc._jsc.sc().statusTracker().getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            t = time.perf_counter() - t0
            ids1 = set(sc._jsc.sc().statusTracker().getJobIdsForGroup(None) or [])
            release_all()
            print(f"{key} rep{rep}: {t:.3f}s jobs={len(ids1 - ids0)}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
