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
