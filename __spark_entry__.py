"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``blockchain_data_ingestion_spark.queries`` — the
operator registry holds one (PySpark callable, DuckDB oracle SQL) pair per
SURVEY.md §2 key; this module just re-shapes it for the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blockchain_data_ingestion_spark.queries import load_all  # noqa: E402
from blockchain_data_ingestion_spark.session import tune_session  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue-by-(returnflag, linestatus) over filtered lineitem ⋈ orders:
    exercises scan → pushed filter → FK join → partial+final aggregate →
    sort in one plan.
    """
    from pyspark.sql import functions as F

    tune_session(spark)
    li = spark.read.parquet(f"{_SMOKE_SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{_SMOKE_SF_DIR}/orders.parquet")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
          .join(o.filter(F.col("o_orderstatus") != "P"),
                li.l_orderkey == o.o_orderkey)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
              F.round(F.sum(
                  (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .cast("decimal(18,4)")).cast("double"), 2).alias("revenue"),
              F.count("*").alias("n_lines"),
              F.countDistinct("o_custkey").alias("n_customers"))
          .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    With SPARK_GRAFT_AUTORELEASE=1, each callable releases the
    PREVIOUS key's scoped block-manager state (eager fan checkpoints,
    fixpoint labels, collected-aggregate persists — see
    blockchain_data_ingestion_spark/caching.py) before building, so a
    long sequential session's footprint is bounded by one key's
    working set instead of accumulating the whole registry's. OPT-IN
    deliberately (r10 review): releasing key N's checkpoints at key
    N+1's build is only safe when keys are materialized one at a time
    — a caller that builds every plan first and collects later would
    hit unrecoverable missing-block failures (truncated lineage), and
    the external driver's execution order is not this repo's to
    assume. The repo's own tools (preflight, sweep, bench, probe) all
    release explicitly; a driver session that never releases leaks
    only the sf0.01-scale working sets, bounded and documented."""
    from blockchain_data_ingestion_spark.caching import release_all

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]
              ) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            if os.environ.get("SPARK_GRAFT_AUTORELEASE"):
                release_all()
            return fn(spark, sf_dir)
        return run

    return {key: _wrap(spec.spark) for key, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin per key (omitted ⇒ rows-only check)."""
    return {key: spec.oracle for key, spec in load_all().items()
            if spec.oracle is not None}
