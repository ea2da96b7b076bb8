#!/usr/bin/env python
"""Per-side wall-clock split for dedup_embedding_cosine (VERDICT r14
item 1): the sf3 sweep flags the key's PAIR at 677-814 s but a pair
time cannot say whether the exact O(n²·d) all-pairs path is an ENGINE
plan problem or an ORACLE (DuckDB unrolled 64-column dot) cost. This
probe times each side alone — same quiet-box discipline as
tools/stream_profile_r14.py — and prints the measured engine pair-work
throughput, which is what the r15 cost-based gate constant
(_COSINE_MAX_PAIR_WORK) is derived from.

Usage::

    python tools/cosine_split_r15.py [--side engine|oracle|both] [sf_dir ...]

Defaults to .scale_cache/sf3 (60k vectors — the heaviest exact-path
tier) and sf0.1 testdata (6k — the sweep's base tier). --side lets the
two measurements run as separate invocations (the sf3 oracle side alone
runs >10 min; a killed combined run loses the finished engine number).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    from blockchain_data_ingestion_spark.catalog import table_row_count
    from blockchain_data_ingestion_spark.queries import load_all
    from blockchain_data_ingestion_spark.session import get_spark
    from tests.oracle import oracle_connection

    argv = sys.argv[1:]
    side = "both"
    if "--side" in argv:
        i = argv.index("--side")
        side = argv[i + 1]
        if side not in ("engine", "oracle", "both"):
            raise SystemExit(f"--side {side!r}: expected engine|oracle|both")
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    dirs = args or [str(ROOT / ".scale_cache" / "sf3"),
                    "/root/testdata/sf0.1"]
    key = "dedup_embedding_cosine"
    ent = load_all()[key]
    spark = get_spark("cosine-split-r15") if side in ("engine", "both") \
        else None
    out = []
    for sf_dir in dirs:
        n = table_row_count(sf_dir, "embeddings") or 0
        dim = 64
        pair_work = n * (n - 1) // 2 * dim
        rec = {"sf_dir": sf_dir, "n_vectors": n, "dim": dim,
               "pair_work": pair_work}
        if side in ("engine", "both"):
            # engine side: plan + execute + full result pull (collect
            # is 50 rows — the compare lane's own shape)
            t0 = time.perf_counter()
            rows = ent.spark(spark, sf_dir).collect()
            rec["engine_sec"] = round(time.perf_counter() - t0, 1)
            rec["engine_rows"] = len(rows)
            rec["engine_work_per_sec"] = round(
                pair_work / rec["engine_sec"])
            spark.catalog.clearCache()
        if side in ("oracle", "both"):
            # oracle side: same connection shape as tests.oracle.check_key
            con = oracle_connection(sf_dir)
            t0 = time.perf_counter()
            orc = con.execute(ent.oracle).fetchdf()
            rec["oracle_sec"] = round(time.perf_counter() - t0, 1)
            rec["oracle_rows"] = len(orc)
            con.close()
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"probe": "cosine_split_r15", "side": side,
                      "runs": out}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
