#!/usr/bin/env python
"""Time the DuckDB oracle twins of bench.py's headline queries.

Produces the denominator for the "engine vs single-node baseline" ratio
the round verdicts quote — previously an unsourced "~2.4 s warm" figure
(ADVICE r2). Same scale factor, same queries, same min-of-N steady-state
methodology as bench.py; prints ONE JSON line, mirroring bench.py's
shape, so the two artifacts can be divided directly::

    python tools/bench_oracle.py > ORACLE_BENCH_rNN.json

Keys without an oracle (none of the headline set today) are skipped.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from blockchain_data_ingestion_spark.catalog import TABLES  # noqa: E402
from blockchain_data_ingestion_spark.queries import load_all  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    registry = load_all()

    timings: dict[str, float] = {}
    for i, key in enumerate(HEADLINE, start=1):
        spec = registry.get(key)
        if spec is None or spec.oracle is None:
            continue
        con.execute(spec.oracle).fetchall()          # warm (IO cache, JIT)
        best, worst, stale, runs = float("inf"), 0.0, 0, 0
        while runs < (15 if worst > best * 2 else 9) \
                and (runs < 4 or stale < (5 if worst > best * 2 else 3)):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            t = time.perf_counter() - t0
            worst = max(worst, t)
            if t < best * 0.98:
                best, stale = t, 0
            else:
                stale += 1
                best = min(best, t)
            runs += 1
        timings[f"q{i}_{key}"] = round(best, 3)

    print(json.dumps({
        "metric": "oracle_headline_queries_total_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
