"""A/B of the r13 quiet-box q9/q15 regression against the r12 commit
(VERDICT r14 task 4): BENCH_NOTES r13 attributed the +23% on
q9_op_minhash_dedup / q15_op_pipeline_e2e to wobble on the (false)
claim that no r13 commit touched llm_pipeline.py — this measures it
instead, with the r11-precedent protocol: a git worktree pinned to the
r12 close commit, the HEAD tree, and bench.py's exact median-of-5
timing (warm run, release_all between repeats, noop sink), run as
separate processes in the same quiet window, alternating A/B so
co-tenancy hits both sides.

Usage: python tools/ab_q9_q15_r14.py <r12_worktree_path>
(the caller creates the worktree: git worktree add <path> f74d42a)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, sys.argv[1])
from blockchain_data_ingestion_spark.caching import release_all
from blockchain_data_ingestion_spark.queries import load_all
from blockchain_data_ingestion_spark.session import get_spark

KEYS = ["op_minhash_dedup", "op_pipeline_e2e"]
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("ab-q9q15")
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


def run_tree(tree: Path) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(tree)],
        capture_output=True, text=True, timeout=1800, cwd=str(tree))
    for line in r.stdout.splitlines():
        if line.startswith("ABJSON "):
            return json.loads(line[len("ABJSON "):])
    raise SystemExit(
        f"no ABJSON from {tree}:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    r12 = Path(sys.argv[1]).resolve()
    if not (r12 / "blockchain_data_ingestion_spark").is_dir():
        raise SystemExit(f"{r12} is not a repo tree")
    results: dict[str, list[dict]] = {"r12": [], "head": []}
    # alternate A/B/A/B so a co-tenant burst lands on both sides
    for label, tree in (("r12", r12), ("head", ROOT),
                        ("r12", r12), ("head", ROOT)):
        res = run_tree(tree)
        results[label].append(res)
        print(f"{label}: " + ", ".join(
            f"{k}={v['median']}s {v['times']}" for k, v in res.items()),
            flush=True)
    for key in ("op_minhash_dedup", "op_pipeline_e2e"):
        a = [r[key]["median"] for r in results["r12"]]
        b = [r[key]["median"] for r in results["head"]]
        print(f"{key}: r12 medians {a} vs HEAD medians {b}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
