#!/usr/bin/env python
"""Time the DuckDB oracle twins of bench.py's headline queries.

Produces the denominator for the "engine vs single-node baseline" ratio
the round verdicts quote — previously an unsourced "~2.4 s warm" figure
(ADVICE r2). Same scale factor, same queries, same warm-then-median-of-5
steady-state methodology as bench.py (r10 noise protocol — medians,
and run this back-to-back with bench.py in the same session so the
denominator is co-tenant-matched); prints ONE JSON line, mirroring
bench.py's shape, so the two artifacts can be divided directly::

    python tools/bench_oracle.py > ORACLE_BENCH_rNN.json

Keys without an oracle (none of the headline set today) are skipped.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _spill_cfg() -> dict:
    from blockchain_data_ingestion_spark.scratch import (
        duckdb_spill_config)
    return duckdb_spill_config()

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from blockchain_data_ingestion_spark.catalog import TABLES  # noqa: E402
from blockchain_data_ingestion_spark.queries import load_all  # noqa: E402


def main() -> None:
    from blockchain_data_ingestion_spark.scratch import \
        drop_stale_duck_spill
    drop_stale_duck_spill()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1
    con = duckdb.connect(config=_spill_cfg())
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

        def timed() -> float:
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            return time.perf_counter() - t0

        times = [timed() for _ in range(5)]
        if max(times) > 3 * min(times):
            times += [timed() for _ in range(4)]
        timings[f"q{i}_{key}"] = round(statistics.median(times), 3)

    print(json.dumps({
        "metric": "oracle_headline_queries_total_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
