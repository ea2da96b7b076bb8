"""sf10 engine-vs-oracle split for the heavy streaming-family keys
(VERDICT r14 task 1): `stream_stream_join`'s 536 s sf10 pair time had
no per-side breakdown — and stream-stream join state is the classic
100× failure mode. For each key this times the four phases separately
(engine run/drain, engine result toPandas, DuckDB oracle, compare) and
records the PEAK state-store rows/bytes seen across the run's progress
snapshots (`streaming.jobs.LAST_STATE_METRICS`), so SCALE.md can make
a measured watermark-bound argument instead of a plausible one.

Usage: python tools/stream_profile_r14.py [sf_dir] [key,key,...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

KEYS = ["stream_stream_join", "stream_ingest_append",
        "udf_cogroup_reconcile"]


def bounded_arrival_probe(spark, sf_dir: str, n_files: int = 20) -> None:
    """Drive the IDENTICAL stream_stream_join plan (`ss_join_plan`)
    from a production-shaped arrival: events split into `n_files`
    time-contiguous files (mtime-ordered, so the file source dequeues
    them chronologically), one file per trigger. Between triggers the
    watermark advances and the symmetric hash join EVICTS state older
    than watermark − range — this measures the eviction the registry
    key's single-batch harness arrival can never show, and asserts the
    result set is IDENTICAL either way (eviction only drops rows whose
    matches were all emitted)."""
    import os

    from pyspark.sql import functions as F

    from blockchain_data_ingestion_spark.catalog import table
    from blockchain_data_ingestion_spark.queries.streaming_q import (
        run_to_memory, ss_join_plan)
    from blockchain_data_ingestion_spark.scratch import fresh_scratch_dir
    from blockchain_data_ingestion_spark.streaming import jobs

    ev = table(spark, sf_dir, "events")
    total = ev.count()
    # bucket by ts so each file is a contiguous event-time slice
    tcuts = [r[0] for r in ev.selectExpr(
        f"percentile(unix_micros(ts), array({', '.join(str(i / n_files) for i in range(1, n_files))})) AS p"
    ).selectExpr("explode(p) AS c").collect()]
    path = fresh_scratch_dir("stream_bounded", "ssjoin")
    feed = os.path.join(path, "feed")
    os.makedirs(feed, exist_ok=True)
    lo = None
    idx = 0
    for i in range(n_files):
        hi = tcuts[i] if i < n_files - 1 else None
        part = ev
        if lo is not None:
            part = part.filter(F.expr(f"unix_micros(ts) >= {lo}"))
        if hi is not None:
            part = part.filter(F.expr(f"unix_micros(ts) < {hi}"))
        src = os.path.join(path, f"b{i}")
        part.repartition(1).write.mode("overwrite").parquet(src)
        for f in sorted(os.listdir(src)):
            if f.endswith(".parquet"):
                dst = os.path.join(feed, f"t{idx:03d}.parquet")
                os.replace(os.path.join(src, f), dst)
                os.utime(dst, (1_000_000_000 + idx, 1_000_000_000 + idx))
                idx += 1
        lo = hi
    batch = spark.read.parquet(feed)
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", "1").parquet(feed))
    jobs.LAST_STATE_METRICS[:] = []
    t0 = time.perf_counter()
    out = run_to_memory(ss_join_plan(stream, stream),
                        "t_ss_join_bounded", "append")
    t_run = time.perf_counter() - t0
    n_out = out.count()
    print(f"bounded-arrival ss_join @ {sf_dir}: {n_files} time-ordered "
          f"files, 1/trigger; {total:,} events -> {n_out:,} join rows "
          f"in {t_run:.1f}s", flush=True)
    for m in jobs.LAST_STATE_METRICS:
        frac = m["peakNumRowsTotal"] / max(total, 1)
        print(f"  state[{m['operatorName']}]: "
              f"peak_rows={m['peakNumRowsTotal']:,} "
              f"({100 * frac:.1f}% of stream) "
              f"peak_bytes={m['peakMemoryUsedBytes']:,}", flush=True)
    # eviction must not change the answer: same rows as the batch twin
    from blockchain_data_ingestion_spark.queries import load_all
    from tests.oracle import compare_frames, run_oracle
    msg = compare_frames(out.toPandas(),
                         run_oracle(sf_dir, load_all()[
                             "stream_stream_join"].oracle))
    print(f"  bounded-arrival result vs batch oracle: "
          f"{'HASH-GREEN' if msg is None else 'MISMATCH: ' + msg}",
          flush=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / ".scale_cache" / "sf10")
    keys = sys.argv[2].split(",") if len(sys.argv) > 2 else KEYS
    bounded_only = "--bounded-only" in sys.argv
    from blockchain_data_ingestion_spark.caching import release_all
    from blockchain_data_ingestion_spark.queries import load_all
    from blockchain_data_ingestion_spark.session import get_spark
    from blockchain_data_ingestion_spark.streaming import jobs
    from tests.oracle import compare_frames, run_oracle

    spark = get_spark("stream-profile-r14")
    reg = load_all()
    if bounded_only:
        bounded_arrival_probe(spark, sf_dir)
        return 0
    unknown = [k for k in keys if k not in reg and not k.startswith("--")]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    keys = [k for k in keys if not k.startswith("--")]
    for k in keys:
        spec = reg[k]
        jobs.LAST_STATE_METRICS[:] = []
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)       # streaming keys drain here
        t_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        spark_pdf = df.toPandas()
        t_collect = time.perf_counter() - t0
        t0 = time.perf_counter()
        oracle_pdf = run_oracle(sf_dir, spec.oracle)
        t_oracle = time.perf_counter() - t0
        t0 = time.perf_counter()
        msg = compare_frames(spark_pdf, oracle_pdf)
        t_cmp = time.perf_counter() - t0
        verdict = "HASH-GREEN" if msg is None else f"MISMATCH: {msg}"
        print(f"{k} @ {sf_dir}: {verdict}", flush=True)
        print(f"  rows={len(spark_pdf)}  engine_run={t_run:.1f}s  "
              f"engine_collect={t_collect:.1f}s  oracle={t_oracle:.1f}s  "
              f"compare={t_cmp:.1f}s  "
              f"pair_total={t_run + t_collect + t_oracle + t_cmp:.1f}s",
              flush=True)
        for m in jobs.LAST_STATE_METRICS:
            print(f"  state[{m['operatorName']}]: "
                  f"peak_rows={m['peakNumRowsTotal']:,} "
                  f"peak_bytes={m['peakMemoryUsedBytes']:,}", flush=True)
        del spark_pdf, oracle_pdf
        release_all()
        spark.catalog.clearCache()
    if "stream_stream_join" in keys:
        bounded_arrival_probe(spark, sf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
