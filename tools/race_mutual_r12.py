#!/usr/bin/env python
"""Race three formulations of op_mutual_top_partners at sf3/sf10
(VERDICT r11 item 3: chase the key below ~2x at its top tier).

Variants, all over the same checkpointed-or-inline pair-grain revenue
aggregate r(c, s, cents):

  A  shipped r11 form: checkpoint r; two WindowGroupLimit rank-1 scans
     (partition s / partition c) + a reciprocity join on (c, s).
  B  chained windows, no join: rn_s and rn_c as two window passes in
     ONE linear plan over r (no checkpoint — single reference), filter
     rn_s = 1 AND rn_c = 1 at the top.
  C  two-phase argmax aggregates: groupBy(s).max(struct(cents, -c))
     and groupBy(c).max(struct(cents, -s)) over checkpointed r (map-
     side partials mean only |entities|-sized partials cross the
     exchanges), then a broadcast reciprocity join of the two
     entity-sized best tables.

All three share the deterministic tie-break (cents DESC, key ASC) and
must return identical rows; the script asserts that at sf3 before
timing. DuckDB oracle timed alongside for the ratio.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import duckdb  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from blockchain_data_ingestion_spark.caching import (  # noqa: E402
    release_all, scoped_checkpoint)
from blockchain_data_ingestion_spark.queries.analytics import (  # noqa: E402
    _MUTUAL_PAIR_SQL, _MUTUAL_SQL)
from blockchain_data_ingestion_spark.queries import load_all  # noqa: E402
from blockchain_data_ingestion_spark.catalog import query_sql  # noqa: E402
from blockchain_data_ingestion_spark.scratch import (  # noqa: E402
    drop_stale_duck_spill, duckdb_spill_config)


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return query_sql(spark, sf_dir, _MUTUAL_PAIR_SQL)


def variant_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_all()["op_mutual_top_partners"].spark(spark, sf_dir)


def variant_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _pairs(spark, sf_dir)
    w_s = Window.partitionBy("s").orderBy(F.desc("cents"), F.asc("c"))
    w_c = Window.partitionBy("c").orderBy(F.desc("cents"), F.asc("s"))
    return (r.withColumn("rn_s", F.row_number().over(w_s))
            .withColumn("rn_c", F.row_number().over(w_c))
            .filter("rn_s = 1 AND rn_c = 1")
            .select(F.col("s").alias("suppkey"),
                    F.col("c").alias("custkey"),
                    F.col("cents").alias("pair_cents"))
            .orderBy("suppkey"))


def variant_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = scoped_checkpoint(_pairs(spark, sf_dir))
    bs = (r.groupBy("s")
          .agg(F.max(F.struct("cents", (-F.col("c")).alias("nc")))
               .alias("m"))
          .select("s", (-F.col("m.nc")).alias("c"),
                  F.col("m.cents").alias("cents")))
    bc = (r.groupBy("c")
          .agg(F.max(F.struct("cents", (-F.col("s")).alias("ns")))
               .alias("m"))
          .select("c", (-F.col("m.ns")).alias("s")))
    return (bs.join(F.broadcast(bc), ["c", "s"])
            .select(F.col("s").alias("suppkey"),
                    F.col("c").alias("custkey"),
                    F.col("cents").alias("pair_cents"))
            .orderBy("suppkey"))


# ONE timing harness for every race/probe tool (reviewer: a local
# _min3 copy would drift from the probe numbers it's compared against)
from tools.scale_probe import _KEY_BUDGET_S, _min_of_n  # noqa: E402


def _min3(run):
    return _min_of_n(run, cleanup=release_all)


def main() -> None:
    drop_stale_duck_spill()
    from blockchain_data_ingestion_spark.session import get_spark
    spark = get_spark("race-mutual")
    spark.range(1_000_000).selectExpr("sum(id) s").groupBy("s").count() \
         .write.mode("overwrite").format("noop").save()

    sf3 = str(ROOT / ".scale_cache" / "sf3")
    sf10 = str(ROOT / ".scale_cache" / "sf10")

    # equivalence gate at sf3
    ref = [tuple(r) for r in variant_a(spark, sf3).collect()]
    release_all()
    for name, fn in [("B", variant_b), ("C", variant_c)]:
        got = [tuple(r) for r in fn(spark, sf3).collect()]
        release_all()
        assert got == ref, f"variant {name} diverges: {len(got)} vs {len(ref)}"
    print(f"equivalence ok at sf3 ({len(ref)} rows)", flush=True)

    for tier, d in [("sf3", sf3), ("sf10", sf10)]:
        for name, fn in [("A", variant_a), ("B", variant_b),
                         ("C", variant_c)]:
            fn(spark, d).write.mode("overwrite").format("noop").save()
            release_all()  # warm
            t = _min3(lambda: fn(spark, d).write.mode("overwrite")
                      .format("noop").save())
            print(f"{tier} {name} {t}", flush=True)
        con = duckdb.connect(config=duckdb_spill_config())
        con.execute("SET threads TO 32")
        for t_ in ["orders", "lineitem"]:
            con.execute(f"CREATE VIEW {t_} AS SELECT * FROM "
                        f"read_parquet('{d}/{t_}.parquet')")
        t0 = time.perf_counter()
        con.execute(_MUTUAL_SQL).fetchall()
        warm = time.perf_counter() - t0
        dt = warm if warm > _KEY_BUDGET_S else _min3(
            lambda: con.execute(_MUTUAL_SQL).fetchall())
        print(f"{tier} duck {dt}", flush=True)
        con.close()


if __name__ == "__main__":
    main()
