#!/usr/bin/env python
"""Hash-verify `dedup_embedding_cosine`'s PRODUCTION path at volume
(r13, VERDICT r12 item 7).

Every prior tier ran the key BELOW `_COSINE_MAX_ROWS` (131,072; sf3
carries 60k vectors), so only the exact all-pairs branch was ever
hash-verified — the LSH candidates+rerank branch that a 100 TB corpus
would actually take was covered by the fixture-scale equivalence test
only. This probe lowers the cap for one lane (the verdict's sanctioned
alternative to generating a >131k-row parquet), fires the auto-switch
on the sf3 corpus, ASSERTS the plan that ran is the LSH one (bucket
equi-self-join, no mapInPandas block stage), and hash-compares the
result against the `dedup_embedding_lsh` DuckDB oracle at sf3 — the
twin the switch contract promises bit-equality with.

Usage::

    python tools/lsh_switch_probe_r13.py [sf_dir]   # default .scale_cache/sf3
"""

from __future__ import annotations

import sys
import time
import warnings
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / ".scale_cache" / "sf3")
    from blockchain_data_ingestion_spark.queries import llm_vec, load_all
    from blockchain_data_ingestion_spark.scratch import drop_stale_duck_spill
    from blockchain_data_ingestion_spark.session import get_spark
    from tests.oracle import compare_frames, run_oracle

    drop_stale_duck_spill()
    spark = get_spark("lsh-switch-probe")
    reg = load_all()

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    cap = 1000
    assert n > cap, f"corpus {n} rows must exceed the probe cap {cap}"
    print(f"corpus: {n} vectors at {sf_dir}; lowering "
          f"_COSINE_MAX_ROWS {llm_vec._COSINE_MAX_ROWS} -> {cap}")
    old = llm_vec._COSINE_MAX_ROWS
    llm_vec._COSINE_MAX_ROWS = cap
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            df = reg["dedup_embedding_cosine"].spark(spark, sf_dir)
        switched = [w for w in caught
                    if issubclass(w.category, RuntimeWarning)
                    and "auto-switching" in str(w.message)]
        assert len(switched) == 1, "auto-switch warning did not fire"

        # plan assertion: the LSH branch ran — bucket equi-self-join,
        # top-50 via TakeOrderedAndProject, and NO mapInPandas (the
        # exact path's chunk-block stage)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple"))
        assert "MapInPandas" not in plan, "exact block path ran!"
        assert "bucket" in plan and "TakeOrderedAndProject" in plan, plan
        print("plan: LSH branch confirmed (bucket equi-join, "
              "TakeOrderedAndProject, no MapInPandas)")

        t0 = time.perf_counter()
        got = df.toPandas()
        t_engine = time.perf_counter() - t0
        t0 = time.perf_counter()
        want = run_oracle(sf_dir, reg["dedup_embedding_lsh"].oracle)
        t_oracle = time.perf_counter() - t0
        msg = compare_frames(got, want)
        status = "ok" if msg is None else f"FAIL {msg}"
        print(f"{status}  dedup_embedding_cosine[LSH-switched] vs "
              f"dedup_embedding_lsh oracle at {sf_dir}: "
              f"engine {t_engine:.1f}s oracle {t_oracle:.1f}s "
              f"({len(got)} rows)")
        return 0 if msg is None else 1
    finally:
        llm_vec._COSINE_MAX_ROWS = old


if __name__ == "__main__":
    raise SystemExit(main())
