#!/usr/bin/env python
"""Capture `.explain("formatted")` for headline (or named) queries into
plans/r16/<key>_<tag>.txt — the judge-facing before/after plan evidence.

Usage::

    python tools/capture_plans_r16.py TAG [key ...]

TAG is `before` or `after`; default keys = bench.py's HEADLINE list.
Run from the repo whose code should be captured (a worktree pinned at
the inherited commit for `before`, the working tree for `after`); the
output directory is always the MAIN repo's plans/r16.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

OUT = Path("/root/repo/plans/r16")


def main() -> None:
    tag = sys.argv[1]
    from blockchain_data_ingestion_spark.queries import load_all
    from blockchain_data_ingestion_spark.session import get_spark
    from blockchain_data_ingestion_spark.caching import release_all

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    if len(sys.argv) > 2:
        keys = sys.argv[2:]
    else:
        import bench
        keys = [k for k in bench.HEADLINE if k in registry]
    spark = get_spark("plan-capture-r16")
    OUT.mkdir(parents=True, exist_ok=True)
    for key in keys:
        df = registry[key].spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (OUT / f"{key}_{tag}.txt").write_text(buf.getvalue())
        release_all()
        print(f"captured {key}_{tag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
