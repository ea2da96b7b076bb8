#!/usr/bin/env python
"""Measure the r13 shared graph edge-builder amortization (VERDICT r12
item 2) at a replicated tier.

Two protocols over the four-family (`op_trade_components`,
`op_label_propagation`, `op_kcore`, `op_triangle_count`):

- COLD: clearCache + release_shared before EVERY key — each key pays
  its full builder, the per-key-isolation number the parity sweeps
  report.
- FAMILY SESSION: one release_shared at the start only — the first
  consumer of each shared base builds it, later consumers read the
  cache; release_all (scoped per-op state) still runs between keys.
  This is the multi-key analytics-session shape the builders exist
  for (bench, driver rotation, a user running the graph family).

Also times the two shared builders in isolation so SCALE.md can state
the amortized cost explicitly.

Usage::

    python tools/graph_family_r13.py [sf_dir]   # default .scale_cache/sf10
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

FAMILY = ["op_trade_components", "op_label_propagation", "op_kcore",
          "op_triangle_count"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / ".scale_cache" / "sf10")
    from blockchain_data_ingestion_spark.caching import (release_all,
                                                         release_shared)
    from blockchain_data_ingestion_spark.queries import analytics, load_all
    from blockchain_data_ingestion_spark.session import get_spark

    spark = get_spark("graph-family-r13")
    reg = load_all()

    def run(key: str) -> float:
        t0 = time.perf_counter()
        (reg[key].spark(spark, sf_dir)
         .write.mode("overwrite").format("noop").save())
        t = time.perf_counter() - t0
        release_all()
        return t

    # warm the JVM/scan stack once so neither protocol pays first-use
    run(FAMILY[0])
    release_shared()
    spark.catalog.clearCache()

    # shared builders in isolation
    t0 = time.perf_counter()
    analytics._shared_pairs_hi(spark, sf_dir)
    t_pairs = time.perf_counter() - t0
    t0 = time.perf_counter()
    analytics._shared_osup(spark, sf_dir)
    t_osup = time.perf_counter() - t0
    print(f"builders at {sf_dir}: pairs_hi {t_pairs:.2f}s, "
          f"osup {t_osup:.2f}s", flush=True)
    release_shared()
    spark.catalog.clearCache()

    cold = {}
    for k in FAMILY:
        release_shared()
        spark.catalog.clearCache()
        cold[k] = run(k)
        print(f"cold  {k}: {cold[k]:.2f}s", flush=True)

    release_shared()
    spark.catalog.clearCache()
    warm = {}
    for k in FAMILY:
        warm[k] = run(k)
        print(f"fam   {k}: {warm[k]:.2f}s", flush=True)
    release_shared()

    tc, tw = sum(cold.values()), sum(warm.values())
    print(f"family total: cold {tc:.2f}s -> session {tw:.2f}s "
          f"({100 * (tc - tw) / tc:.0f}% saved; builders paid once: "
          f"pairs_hi by {FAMILY[0]}, osup by {FAMILY[2]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
