"""Catalog-boundary layout hardening (VERDICT r2 item 2).

The driver's fixture writer has changed ``events.ts``'s physical parquet
layout once per round so far (r1: TIMESTAMP(NANOS); r2: tz-naive
``timestamp[us]`` → Spark TIMESTAMP_NTZ). ``catalog.table`` owns the
normalization; these tests feed it every layout observed — plus the
plain tz-aware one — and pin that each surfaces as one canonical
TimestampType with identical values, so the NEXT writer drift fails
here, loudly, instead of deep inside ``unix_micros``/``withWatermark``.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blockchain_data_ingestion_spark.catalog import table
from blockchain_data_ingestion_spark.scratch import fresh_scratch_dir

#: µs-grained instants (what the fixture generator emits) as naive UTC.
_TS = [dt.datetime(2024, 1, 1, 0, 0, 0, 0),
       dt.datetime(2024, 1, 1, 12, 30, 15, 250_000),
       dt.datetime(2024, 6, 30, 23, 59, 59, 999_999)]


def _write_events(layout: str) -> str:
    """Write a minimal events table with ``ts`` in the given layout and
    return its sf_dir."""
    sf_dir = fresh_scratch_dir("catalog_layout", layout)
    ts_type = {"nanos": pa.timestamp("ns"),
               "ntz": pa.timestamp("us"),
               "tz": pa.timestamp("us", tz="UTC")}[layout]
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(_TS, ts_type),
        "user_id": pa.array([10, 20, 30], pa.int64()),
    })
    pq.write_table(t, f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.mark.parametrize("layout", ["nanos", "ntz", "tz"])
def test_events_ts_layouts_all_surface_as_timestamp(spark, layout):
    df = table(spark, _write_events(layout), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"layout {layout!r} must normalize to canonical TimestampType")
    # Values identical across layouts: session tz is pinned UTC, so the
    # collected naive datetimes equal the written naive-UTC instants.
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == _TS

    # The normalized column feeds both function families that rejected
    # the round-2 NTZ layout — pin they analyze cleanly.
    from pyspark.sql import functions as F
    df.select(F.unix_micros("ts")).collect()
    df.withWatermark("ts", "1 minute")


def test_real_fixture_events_ts_is_canonical(spark, sf_dir):
    """Whatever layout the CURRENT fixture ships, the catalog contract
    holds — this is the one that breaks first on the next writer drift."""
    df = table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_calendar_ntz_columns_stay_ntz(spark, sf_dir):
    """o_orderdate / l_shipdate are tz-naive calendar values: NTZ is the
    faithful type, hash-matches the oracle, and keeps parquet predicate
    pushdown (an extra cast over the scan would defeat it). Pin that the
    event-time normalization does NOT leak onto them."""
    assert dict(table(spark, sf_dir, "orders").dtypes)[
        "o_orderdate"] == "timestamp_ntz"
    assert dict(table(spark, sf_dir, "lineitem").dtypes)[
        "l_shipdate"] == "timestamp_ntz"


def test_calendar_nanos_column_becomes_ntz(spark):
    """Writer drift can ship a CALENDAR column as TIMESTAMP(NANOS) too
    (surfaced as bigint under nanosAsLong). Both nanos branches must
    honor the same policy as the NTZ rule: event-time cols (`ts`) get
    tz-aware TIMESTAMP, everything else becomes TIMESTAMP_NTZ — never
    tz-aware — matching the calendar-columns-stay-NTZ contract."""
    sf_dir = fresh_scratch_dir("catalog_layout", "nanos_calendar")
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(_TS, pa.timestamp("ns")),
        "snapshot_date": pa.array(_TS, pa.timestamp("ns")),
    })
    pq.write_table(t, f"{sf_dir}/events.parquet")
    df = table(spark, sf_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["snapshot_date"] == "timestamp_ntz"
    got = [(r.ts, r.snapshot_date)
           for r in df.orderBy("event_id").collect()]
    assert got == list(zip(_TS, _TS))


def test_lakehouse_layout_is_only_a_path_change(spark, sf_dir):
    """The catalog docstring's 100 TB claim, executed (VERDICT r13
    item 6): write orders as the promised hive-partitioned lakehouse
    layout (``orders/chain_name=*/date=*/...``), then

    - `table()` resolves it with the SAME call (path resolution only),
    - `src_batch_range` runs UNCHANGED over it, value-identical to the
      flat fixture,
    - a literal partition predicate PRUNES: ``PartitionFilters`` lands
      in the scan and the files actually opened (`input_file_name`)
      are exactly the matching partition directories' part files —
      I/O scales with the selected fraction, not the table."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from blockchain_data_ingestion_spark.queries import load_all

    lake_root = fresh_scratch_dir("catalog_layout", "lakehouse")
    flat = table(spark, sf_dir, "orders")
    (flat.withColumn(
            "chain_name",
            F.when(F.col("o_orderkey") % 2 == 0, "ETH").otherwise("ARB"))
         .withColumn("date", F.date_format("o_orderdate", "yyyy-MM"))
         .write.partitionBy("chain_name", "date")
         .parquet(f"{lake_root}/orders"))

    # same API, same query code — only sf_dir changed
    lo = table(spark, lake_root, "orders")
    assert set(flat.columns) < set(lo.columns)  # data cols + partition cols
    q = load_all()["src_batch_range"].spark
    flat_rows = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    lake_rows = sorted(tuple(r) for r in q(spark, lake_root).collect())
    assert flat_rows == lake_rows and len(flat_rows) > 0

    # pruning: plan carries PartitionFilters, and the scan opens ONLY
    # the matching partition dirs' files
    month = lo.agg(F.min("date")).collect()[0][0]
    pruned = lo.filter((F.col("chain_name") == "ETH")
                       & (F.col("date") == month))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "chain_name" in plan.split(
        "PartitionFilters", 1)[1][:400]
    from urllib.parse import unquote
    opened = {unquote(r[0]) for r in
              pruned.select(F.input_file_name()).distinct().collect()}
    on_disk = {unquote(p.as_uri()) for p in Path(
        f"{lake_root}/orders/chain_name=ETH/date={month}").glob("*.parquet")}
    all_files = {unquote(p.as_uri())
                 for p in Path(f"{lake_root}/orders").rglob("*.parquet")}
    assert opened == on_disk
    assert len(opened) < len(all_files)

    # footer probes honor the lakehouse layout too
    from blockchain_data_ingestion_spark.catalog import table_row_count
    assert table_row_count(lake_root, "orders") == flat.count()
