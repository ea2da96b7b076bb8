"""Table catalog over a parquet scale-factor directory.

The driver's fixture layout is ``{sf_dir}/{table}.parquet`` for the TPC-H-ish
star schema plus ``events`` / ``documents`` / ``embeddings``. Reads are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column pruning
and (on partitioned prod layouts) partition pruning for free.

At 100 TB the same API points at a partitioned lakehouse layout
(``.../table/chain_name=ETH/date=2024-01-01/*.parquet``); nothing in the
query layer changes — only this module's path resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "table", "register_views"]

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy parquet scan).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). The engine
    reads it as raw nanos (``nanosAsLong``) and converts to a microsecond
    TimestampType — lossless for the fixtures (all values are µs-grained)
    and semantically identical to the oracle's ns→pandas view.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Defensive: queries() callables may run under a session the driver
    # built without the engine's confs (UTC tz, AQE, Arrow). Runtime confs
    # are idempotent and cost microseconds to (re)apply.
    from .session import tune_session
    tune_session(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register temp views named exactly like the oracle's DuckDB views so
    ``spark.sql`` text can mirror oracle SQL where dialects agree."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
