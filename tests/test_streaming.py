"""Arrival-order semantics for the streaming keys the SQL oracle cannot
see. `stream_watermark_late` is rows-only by design (its output depends
on WHICH rows arrive after the watermark advanced) — so the test feeds
the SAME fixture in two arrival orders and pins the exact drop set.

Measured Spark semantics (pinned by a synthetic probe while building
this): a late row is dropped iff its window was already EVICTED —
emitted at the end of a PRIOR batch, i.e. window_end <= the watermark
in effect when that prior batch closed. A late row whose window state
is still live merges and emits with the window. The op's three-file
feed (bulk -> keepalive -> late; `split_events_files`) makes the
eviction batch exist; the expectation below reproduces the timeline:

- wm_evict = max(ts in file 0) - 5 min   (watermark during batch 1,
  which evicts windows ending <= wm_evict before the late file lands);
- order A (the op) vs order B (same rows, one batch, nothing late):
  per window, B - A == late-row count if window_end <= wm_evict else 0.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_watermark_drops_exactly_the_late_set(spark, sf_dir):
    from blockchain_data_ingestion_spark.catalog import table
    from blockchain_data_ingestion_spark.queries import load_all
    from blockchain_data_ingestion_spark.streaming import (
        run_to_memory, split_events_files)

    # --- order A: dribbled feed, late rows last (the registry op) ----
    a = {r["wstart"]: r["n_events"]
         for r in load_all()["stream_watermark_late"]
         .spark(spark, sf_dir).collect()}

    # --- order B: same rows, single batch — nothing is late ---------
    feed = split_events_files(spark, sf_dir, "wm_order_b")
    batch = spark.read.parquet(feed)
    s = (spark.readStream.schema(batch.schema).parquet(feed)
              .withWatermark("ts", "5 minutes"))
    agg = (s.groupBy(F.window("ts", "1 hour"))
             .agg(F.count("*").alias("n_events"))
             .select(F.col("window.start").alias("wstart"), "n_events"))
    b = {r["wstart"]: r["n_events"]
         for r in run_to_memory(agg, "t_wm_order_b", "append").collect()}

    # --- expected drop set, from first principles --------------------
    ev = table(spark, sf_dir, "events")
    on_time = ev.filter(F.col("event_id") % 7 != 0)  # late_mod=7
    cut = (on_time.agg(F.max("ts")).collect()[0][0]
           - datetime.timedelta(hours=2))
    wm_evict = (on_time.filter(F.col("ts") < cut)
                .agg(F.max("ts")).collect()[0][0]
                - datetime.timedelta(minutes=5))
    late_per_window = {
        r["wstart"]: r["n"]
        for r in (ev.filter(F.col("event_id") % 7 == 0)
                    .groupBy(F.date_trunc("hour", "ts").alias("wstart"))
                    .agg(F.count(F.lit(1)).alias("n")).collect())}

    assert b, "order-B run emitted no closed windows"
    dropped_total = 0
    for wstart, n_b in b.items():
        wend = wstart + datetime.timedelta(hours=1)
        expect_drop = (late_per_window.get(wstart, 0)
                       if wend <= wm_evict else 0)
        assert n_b - a.get(wstart, 0) == expect_drop, \
            (wstart, n_b, a.get(wstart, 0), expect_drop)
        dropped_total += expect_drop
    # the fixture must actually exercise the drop path
    assert dropped_total > 0
    # order A must not invent windows order B lacks
    assert set(a) <= set(b)


def test_stream_stream_join_state_is_watermark_bounded(spark):
    """Pin the r14 stream-state fix as a regression gate (VERDICT r14
    item 2): under the bounded 20-file landing the symmetric hash
    join's state must stay WATERMARK-bounded — the probe artifacts
    proved it once (peak 5.4% of the stream at sf10 vs 100% under
    single-batch arrival), but nothing in tests/ guarded against a
    silent revert to the 100%-buffering landing shape.

    The bound is derived from the DATA, not a magic fraction: while
    batch i is in flight, state may hold batch i's own rows plus every
    earlier row with ts ≥ watermark_{i−1} − 10 min, where
    watermark_{i−1} = maxts(batch i−1) − 30 min — i.e. rows inside a
    (40 min + one batch's time-span) trailing window. The assert uses
    twice the max rows of a (40 min + 2·slice-span) window for
    reporting/metric slop, and separately asserts that bound is < 60%
    of the stream so the test can never pass vacuously on a fixture
    whose whole span fits the horizon.

    Also pins the ADVICE r14 scoping fix: the key sizes state-store
    partitions inside a CLONED session, so the shared session's
    shuffle width must be bit-identical before and after the run."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from blockchain_data_ingestion_spark.queries import load_all
    from blockchain_data_ingestion_spark.streaming import jobs

    sf = "/root/testdata/sf0.01"
    parts_before = spark.conf.get("spark.sql.shuffle.partitions")
    res = load_all()["stream_stream_join"].spark(spark, sf)
    n_res = res.count()
    assert n_res > 0
    # scoped-clone contract: the shared session was never mutated
    assert spark.conf.get("spark.sql.shuffle.partitions") == parts_before

    peaks = jobs.STATE_METRICS["t_stream_stream_join"]
    assert peaks, "drain recorded no state telemetry"
    peak_rows = max(p["peakNumRowsTotal"] for p in peaks)
    assert peak_rows > 0, "join reported zero buffered rows — telemetry dead"

    t = np.sort(pq.read_table(
        sf + "/events.parquet", columns=["ts"]
    ).column("ts").to_numpy().astype("datetime64[s]").astype("int64"))
    n = len(t)
    n_files = jobs._BOUNDED_FILES
    # max time-span of one range-partitioned slice (boundaries at the
    # row-count quantiles repartitionByRange targets)
    cuts = [t[min(n - 1, math.ceil(i * n / n_files))]
            for i in range(n_files + 1)]
    slice_span = max(b - a for a, b in zip(cuts, cuts[1:]))
    horizon = 40 * 60 + 2 * slice_span
    j = np.searchsorted(t, t - horizon, side="left")
    max_window_rows = int((np.arange(n) - j + 1).max())
    bound = 2 * max_window_rows
    assert bound < 0.6 * n, (
        f"fixture span too short for a meaningful bound "
        f"(bound={bound}, n={n}) — the horizon covers the whole stream")
    assert peak_rows <= bound, (
        f"stream-stream join state peaked at {peak_rows} rows "
        f"(> watermark-horizon bound {bound} of {n} stream rows) — "
        "the landing is buffering instead of evicting")
