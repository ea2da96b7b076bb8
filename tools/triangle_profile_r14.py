"""Phase-split of op_triangle_count at a replicated tier (VERDICT r14
task 3): 226 s cold at sf10 with no evidence of WHERE the time goes.
Times each pipeline stage cumulatively (osup build, co-purchase edge
aggregate, orientation, wedge generation, closure+count) so the fix —
or the "irreducible wedge count" writeup — is measured, not guessed.

Usage: python tools/triangle_profile_r14.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / ".scale_cache" / "sf10")
    from pyspark.sql import functions as F

    from blockchain_data_ingestion_spark.caching import release_all
    from blockchain_data_ingestion_spark.queries import load_all
    from blockchain_data_ingestion_spark.queries.analytics import (
        _shared_osup)
    from blockchain_data_ingestion_spark.session import get_spark

    spark = get_spark("triangle-profile-r14")

    def t(label, thunk):
        t0 = time.perf_counter()
        n = thunk()
        print(f"  {label}: {time.perf_counter() - t0:.1f}s (n={n:,})",
              flush=True)

    print(f"phase splits @ {sf_dir} (each phase re-runs its upstream "
          "EXCEPT the persisted osup — deltas between lines isolate "
          "stages):", flush=True)
    t("osup build+count (persisted after)",
      lambda: _shared_osup(spark, sf_dir).count())
    osup = _shared_osup(spark, sf_dir)
    a, b = osup.alias("a"), osup.alias("b")
    e = (a.join(b, (F.col("a.ok") == F.col("b.ok"))
                & (F.col("a.s") < F.col("b.s")))
         .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
         .agg(F.count("*").alias("c")).filter("c >= 5").drop("c"))
    t("edges e (co-purchase agg, support>=5)", e.count)
    deg = (e.select(F.col("u").alias("node"))
           .unionByName(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | \
              ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oe = (e.join(du, "u").join(dv, "v")
          .select(F.when(u_first, F.col("u"))
                  .otherwise(F.col("v")).alias("src"),
                  F.when(u_first, F.col("v"))
                  .otherwise(F.col("u")).alias("dst"),
                  F.when(u_first, F.col("dv"))
                  .otherwise(F.col("du")).alias("dstd")))
    t("oriented edges oe", oe.count)
    p1 = oe.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                   F.col("dstd").alias("bd"))
    p2 = oe.select(F.col("src").alias("a"), F.col("dst").alias("c"),
                   F.col("dstd").alias("cd"))
    w = (p1.join(p2, "a")
         .filter((F.col("bd") < F.col("cd"))
                 | ((F.col("bd") == F.col("cd"))
                    & (F.col("b") < F.col("c"))))
         .select("a", "b", "c"))
    t("wedges w", w.count)
    closing = oe.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = w.join(closing, ["b", "c"])
    t("triangles tri", tri.count)
    release_all()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = load_all()["op_triangle_count"].spark(spark, sf_dir).count()
    print(f"  full registry key, cold after clear: "
          f"{time.perf_counter() - t0:.1f}s (rows={n})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
