#!/usr/bin/env python
"""Full-registry execution sweep: run EVERY batch key end-to-end at
sf0.1 (``$SPARK_GRAFT_SF_DIR`` to override) through the noop sink and
record wall time / failures. This is the scale-fragility check the
sf0.01 correctness gate can't provide — row explosions, cap violations,
and degenerate plans surface here first. Results print as one JSON line
(key → seconds, plus failures) for pasting into SCALE.md.

Usage: python tools/sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from blockchain_data_ingestion_spark.caching import release_all
from blockchain_data_ingestion_spark.queries import load_all  # noqa: E402
from blockchain_data_ingestion_spark.session import get_spark  # noqa: E402


def main() -> int:
    from blockchain_data_ingestion_spark.scratch import \
        drop_stale_duck_spill
    drop_stale_duck_spill()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bdi-spark-sweep")
    registry = load_all()
    keys = sorted(k for k in registry if not k.startswith("stream_"))
    times: dict[str, float] = {}
    fails: dict[str, str] = {}
    for key in keys:
        t0 = time.perf_counter()
        try:
            (registry[key].spark(spark, sf_dir)
             .write.mode("overwrite").format("noop").save())
            times[key] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            fails[key] = f"{type(exc).__name__}: {exc}"[:200]
        release_all()  # keep the 300-key session's block manager flat
        print(f"{key}: {times.get(key, 'FAIL')}", file=sys.stderr)
    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print(json.dumps({"sf_dir": sf_dir, "n_keys": len(keys),
                      "n_ok": len(times), "failures": fails,
                      "slowest": slowest,
                      "total_sec": round(sum(times.values()), 1)}))
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
