#!/usr/bin/env python
"""r15 scale ladder: one more measured tier for the four heaviest
families (VERDICT r14 item 4 — "the 100 TB design claims rest on
asserted slopes; one more point makes them measured").

Families → keys → tiers (engine side only; this is a slope probe, not
a parity run — every tier here is already hash-verified by the sweeps):

- triangle/graph   op_triangle_count   sf1 sf3 sf10 sf30  (lineitem⋈orders)
- stream join      stream_stream_join  sf1 sf3 sf10 sf30  (events)
- dedup chain      op_minhash_dedup,
                   dedup_clusters      sf1 sf3 sf30       (documents)
- image ahash      op_image_ahash      sf1 sf3 sf30       (documents)

The dedup/ahash families skip sf10 because that tier symlinks documents
to sf1 (scale_probe.build_sf10 replicates only events/orders/lineitem)
— their ladder is 10× → 30× → 300×, still three measured points above
sf0.1. Each (key, tier) is ONE timed noop-sink execution from a cold
scoped-cache state (release_all between runs): tier-over-tier slope
cares about like-for-like execution, and min-of-3 at sf30 would triple
a multi-minute probe for a number that is already unambiguous.

Usage: python tools/scale_ladder_r15.py [--skip-build] > LADDER_r15.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tools import scale_probe as sp  # noqa: E402

PLAN = [
    ("op_triangle_count", ["sf1", "sf3", "sf10", "sf30"]),
    ("stream_stream_join", ["sf1", "sf3", "sf10", "sf30"]),
    ("op_minhash_dedup", ["sf1", "sf3", "sf30"]),
    ("dedup_clusters", ["sf1", "sf3", "sf30"]),
    ("op_image_ahash", ["sf1", "sf3", "sf30"]),
]

TIER_DIRS = {
    "sf0.1": sp.SRC,
    "sf1": str(sp.DST),
    "sf3": str(sp.DST3),
    "sf10": str(sp.DST10),
    "sf30": str(sp.DST30),
}


def main() -> None:
    from blockchain_data_ingestion_spark.caching import release_all
    from blockchain_data_ingestion_spark.queries import load_all
    from blockchain_data_ingestion_spark.scratch import \
        drop_stale_duck_spill
    from blockchain_data_ingestion_spark.session import get_spark

    drop_stale_duck_spill()
    if "--skip-build" not in sys.argv:
        sp.build()
        sp.build_sf3()
        sp.build_sf10()
        sp.build_sf30()
    spark = get_spark("scale-ladder-r15")
    reg = load_all()
    # one throwaway job so JVM/codegen warmup is not charged to the
    # first (key, tier) cell
    spark.range(1_000_000).selectExpr("sum(id) s").groupBy("s").count() \
         .write.mode("overwrite").format("noop").save()
    rows = []
    for key, tiers in PLAN:
        spec = reg[key]
        for tier in tiers:
            d = TIER_DIRS[tier]
            t0 = time.perf_counter()
            spec.spark(spark, d).write.mode("overwrite") \
                .format("noop").save()
            dt = round(time.perf_counter() - t0, 1)
            release_all()
            spark.catalog.clearCache()
            rows.append({"key": key, "tier": tier, "sec": dt})
            print(f"  {key} {tier} {dt}s", file=sys.stderr, flush=True)
    print(json.dumps({"probe": "scale_ladder_r15", "rows": rows}))


if __name__ == "__main__":
    main()
