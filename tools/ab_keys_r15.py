#!/usr/bin/env python
"""Generic interleaved A/B timer for r15 optimization work.

Times the named registry keys in a pinned worktree ("base") and the
main working tree ("head"), alternating base/head/base/head in one
quiet window so co-tenant bursts land on both sides — the r14
`ab_q9_q15_r14.py` protocol generalized to arbitrary keys. Each side
uses bench.py's exact methodology: fresh process, JVM warm-up job, one
untimed warm run, 5 timed noop-sink runs (9 if max/min > 3x), median.

Usage: python tools/ab_keys_r15.py <base_worktree_path> key [key ...]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, statistics, sys, time
sys.path.insert(0, sys.argv[1])
from blockchain_data_ingestion_spark.caching import release_all
from blockchain_data_ingestion_spark.queries import load_all
from blockchain_data_ingestion_spark.session import get_spark

KEYS = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-keys-r15")
spark.range(1_000_000).selectExpr("sum(id) AS s").groupBy("s").count() \
     .write.mode("overwrite").format("noop").save()
reg = load_all()
out = {}
for key in KEYS:
    spec = reg[key]
    spec.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
    release_all()

    def timed():
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).write.mode("overwrite") \
            .format("noop").save()
        t = time.perf_counter() - t0
        release_all()
        return t

    times = [timed() for _ in range(5)]
    if max(times) > 3 * min(times):
        times += [timed() for _ in range(4)]
    out[key] = {"median": round(statistics.median(times), 3),
                "times": [round(t, 3) for t in times]}
print("ABJSON " + json.dumps(out))
"""


def run_tree(tree: Path, keys: list[str]) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(tree), *keys],
        capture_output=True, text=True, timeout=3600, cwd=str(tree))
    for line in r.stdout.splitlines():
        if line.startswith("ABJSON "):
            return json.loads(line[len("ABJSON "):])
    raise SystemExit(
        f"no ABJSON from {tree}:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    base = Path(sys.argv[1]).resolve()
    keys = sys.argv[2:]
    if not (base / "blockchain_data_ingestion_spark").is_dir():
        raise SystemExit(f"{base} is not a repo tree")
    results: dict[str, list[dict]] = {"base": [], "head": []}
    for label, tree in (("base", base), ("head", ROOT),
                        ("base", base), ("head", ROOT)):
        res = run_tree(tree, keys)
        results[label].append(res)
        print(f"{label}: " + ", ".join(
            f"{k}={v['median']}s {v['times']}" for k, v in res.items()),
            flush=True)
    for key in keys:
        a = [r[key]["median"] for r in results["base"]]
        b = [r[key]["median"] for r in results["head"]]
        print(f"{key}: base medians {a} vs head medians {b}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
