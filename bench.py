#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the ``noop`` sink — full plan execution,
no driver-side row transfer — so the number measures engine work, not
collect overhead.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blockchain_data_ingestion_spark.caching import release_all  # noqa: E402
from blockchain_data_ingestion_spark.queries import load_all  # noqa: E402
from blockchain_data_ingestion_spark.session import get_spark  # noqa: E402

#: representative heavy operators across the inventory (scan+filter, FK
#: join, wide agg, window, top-k, dedup, similarity). Keys absent from the
#: registry (earlier build stages) are skipped silently.
HEADLINE = [
    "agg_sum_min_max_avg",   # q1: TPC-H-Q1-shaped wide aggregate
    "join_inner_equi",       # q2: FK join fact-to-fact
    "join_broadcast",        # q3: dim joins + agg
    "topk",                  # q4: ranked window top-k per group
    "win_running_agg",       # q5: cumulative window
    "agg_count_distinct",    # q6: exact distinct
    "join_asof",             # q7: custom as-of composition
    "agg_percentile",        # q8: exact percentiles
    "op_minhash_dedup",      # q9: MinHash-LSH near-dup (llm stage)
    "op_similarity",         # q10: brute-force ANN cosine top-k (llm stage)
    "tpch_q1",               # q11: wide single-table aggregate (showcase)
    "tpch_q5",               # q12: 6-way snowflake join (showcase)
    "op_seq_pack",           # q13: two-level distributed prefix sum (llm)
    "dedup_clusters",        # q14: iterative connected components (llm)
    "op_pipeline_e2e",       # q15: full training-data pipeline (llm)
    "tpch_q9",               # q16: 5-way fact-fact star + derived catalog
    "tpch_q21",              # q17: EXISTS/NOT-EXISTS 3-pass fact
    "op_graph_degree",       # q18: trade-graph degree (edge agg + top-k)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1
    spark = get_spark("bdi-spark-bench")
    registry = load_all()

    # Warm the JVM paths so q1 doesn't pay one-time init: codegen, the
    # Hadoop/parquet reader stack, a shuffle, and the noop sink (~2-3s of
    # first-use setup that is session cost, not query cost).
    spark.range(1_000_000).selectExpr("sum(id) AS s").groupBy("s").count() \
         .write.mode("overwrite").format("noop").save()
    (spark.read.parquet(f"{sf_dir}/region.parquet")
          .write.mode("overwrite").format("noop").save())

    # Steady-state methodology (r10, per the r9 verdict's noise
    # protocol): one untimed warm run per query (pays per-query JIT /
    # whole-stage-codegen compilation — a per-session constant real
    # deployments amortize over thousands of queries), then 5 timed
    # runs with the MEDIAN recorded. The earlier adaptive-min form
    # still swung ±18 % round-to-round on untouched queries (r9 q16/
    # q17) because a single lucky quiet-window run set the number; the
    # median is insensitive to both the lucky tail and co-tenant
    # bursts. If the box is visibly storming (max/min > 3× across the
    # 5), four more runs are added and the median of all 9 is taken.
    # Every run executes the full plan through the noop sink.
    timings: dict[str, float] = {}
    for i, key in enumerate(HEADLINE, start=1):
        spec = registry.get(key)
        if spec is None:
            continue
        spec.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        # release the warm run's scoped eager checkpoints BEFORE the
        # first timed repeat — otherwise repeat #1 executes under the
        # warm run's stacked block-manager state while repeats 2..5 run
        # clean (r10 ADVICE; matches scale_probe.spark_times)
        release_all()

        def timed() -> float:
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            t = time.perf_counter() - t0
            # outside the timer: keys whose build registers eager
            # checkpoints must not stack N copies across the repeats —
            # later runs would be timed under growing block pressure
            release_all()
            return t

        times = [timed() for _ in range(5)]
        if max(times) > 3 * min(times):
            times += [timed() for _ in range(4)]
        timings[f"q{i}_{key}"] = round(statistics.median(times), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
