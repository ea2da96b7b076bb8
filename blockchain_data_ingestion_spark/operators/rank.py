"""Rank-based operators: exact two-phase top-k and tail quantiles.

Both share one idea: a coarse **bucket histogram** (``floor(value /
width)``, a cheap integer groupBy whose partial maps stay ~100 entries)
locates the exact rank boundary per group, and only the rows at-or-above
the boundary bucket — the *tail* — are ever sorted. The full column is
never collected into a per-group value map (the failure mode of
``percentile``/``percentile_approx`` on high-cardinality columns: every
row concentrates on one reducer per group) and nothing is approximate —
the histogram gives exact counts, so the threshold provably bounds the
requested ranks for any input.

At 100 TB: the histogram is a partial-agg groupBy over ints, the
threshold table (one row per group) broadcasts, and the sort touches only
the tail. If the tail itself outgrows a reducer (e.g. p50 over a huge
group), recurse with a finer width on the boundary bucket instead of
sorting it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .bounded import bounded_window


def _bucket(col: str, width: float) -> Column:
    return F.expr(f"cast(floor({col} / {width!r}) as bigint)")


def topk_per_group(df: DataFrame, group_cols: Sequence[str], order_col: str,
                   k: int, *, tie_cols: Sequence[str] = (),
                   bucket_width: float = 1000.0) -> DataFrame:
    """Exact top-``k`` rows per group by ``order_col`` descending.

    Rows where ``order_col`` is NULL are excluded (they cannot rank).
    ``tie_cols`` break equal ``order_col`` values deterministically.
    Returns ``df``'s columns plus ``rn`` (1-based rank within group).

    Plan shape: histogram groupBy (partial-combine) → tiny from-the-top
    running sum → broadcast join of the per-group boundary bucket →
    ≥-bucket prefilter → ranking window over the surviving ~k+bucket rows.
    Groups with fewer than ``k`` rows keep every row (boundary falls back
    to the group's minimum bucket).
    """
    df = df.filter(F.col(order_col).isNotNull())
    gc = list(group_cols)
    b = _bucket(order_col, bucket_width)
    hist = df.groupBy(*gc, b.alias("__b")).agg(F.count("*").alias("__cnt"))
    wo = (W.partitionBy(*gc).orderBy(F.col("__b").desc())
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    thr = (hist.withColumn("__cum", F.sum("__cnt").over(wo))
               .groupBy(*gc)
               .agg(F.coalesce(
                   F.expr(f"max(CASE WHEN __cum >= {k} THEN __b END)"),
                   F.min("__b")).alias("__thr_b")))
    cand = (df.join(F.broadcast(thr), gc)
              .filter(b >= F.col("__thr_b")))
    w = (W.partitionBy(*gc)
          .orderBy(F.col(order_col).desc(),
                   *[F.col(c) for c in tie_cols]))
    return (cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .drop("__thr_b"))


def group_quantile_tail(df: DataFrame, group_cols: Sequence[str],
                        value_col: str, q: float, *,
                        out_col: str = "quantile",
                        bucket_width: float = 1000.0) -> DataFrame:
    """Exact linear-interpolated quantile ``q`` of ``value_col`` per group
    (``quantile_cont`` semantics: index ``i = q·(n-1)`` over the sorted
    non-NULL values, lerp between the bracketing values).

    Designed for *high* quantiles (p9x): the sorted tail is ``(1-q)`` of
    each group plus one bucket. Low quantiles work but sort ``(1-q)`` of
    the group — use the value-map ``percentile`` for low-cardinality
    columns, or recurse on the boundary bucket.

    Interpolation uses Spark ``percentile``'s exact double formula
    ``lo·(ceil(i)−i) + hi·(i−floor(i))`` (with the integral-``i`` guard),
    so results are bit-identical to the built-in aggregate; DuckDB's
    ``quantile_cont`` lerp can differ in the final ulp — round before
    comparing cross-engine.
    """
    df = df.filter(F.col(value_col).isNotNull())
    gc = list(group_cols)
    b = _bucket(value_col, bucket_width)
    hist = df.groupBy(*gc, b.alias("__b")).agg(F.count("*").alias("__cnt"))
    wf = W.partitionBy(*gc)
    wo = (W.partitionBy(*gc).orderBy("__b")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    thr = (hist.withColumn("__n", F.sum("__cnt").over(wf))
               .withColumn("__cum", F.sum("__cnt").over(wo))
               .withColumn("__i", F.expr(f"cast({q!r} as double) * (__n - 1)"))
               .withColumn("__lo_rank", F.expr("cast(floor(__i) as bigint)"))
               .filter(F.expr("__cum - __cnt <= __lo_rank AND __cum > __lo_rank"))
               .select(*gc, F.col("__b").alias("__thr_b"),
                       F.expr("__cum - __cnt").alias("__offset"),
                       "__i", "__lo_rank"))
    tail = (df.select(*gc, value_col)
              .join(F.broadcast(thr), gc)
              .filter(b >= F.col("__thr_b")))
    ws = W.partitionBy(*gc).orderBy(value_col)
    return (tail.withColumn("__rn0",
                            F.row_number().over(ws) - 1 + F.col("__offset"))
                .filter(F.expr(
                    "__rn0 = __lo_rank OR __rn0 = cast(ceil(__i) as bigint)"))
                .groupBy(*gc, "__i")
                .agg(F.min(value_col).alias("__lo"),
                     F.max(value_col).alias("__hi"))
                .select(*gc,
                        F.expr("CASE WHEN floor(__i) = ceil(__i) THEN __lo "
                               "ELSE __lo * (ceil(__i) - __i) "
                               "+ __hi * (__i - floor(__i)) END")
                         .alias(out_col)))


def distributed_ntile(df: DataFrame, order_cols: Sequence[str], n: int,
                      out_col: str) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` without the
    single-task stage Spark plans for unpartitioned windows.

    Global rank decomposes into a range-partitioned sort plus a
    two-level offset (the op_seq_pack prefix-sum idea applied to rank):
    per-partition ``row_number`` runs distributed, the per-partition
    row counts (metadata-sized, one row per partition) turn into
    cumulative start offsets, and each row's global rank is
    ``offset + local row_number``. The tile id then follows SQL
    ntile's remainder rule exactly — with N = q·n + r, the first r
    tiles hold q+1 rows — in pure integer ``div``/``%`` arithmetic
    (no doubles anywhere near a tile boundary), so the result is
    bit-identical to the built-in on any input whose ``order_cols``
    form a strict total order (pass a unique tie-break column; equal
    keys would make both formulations order-dependent).

    With q = 0 (N < n) the remainder rule degenerates to tile = rank
    by itself — r·(q+1) = N covers every rank — so no special case
    exists; ``greatest(q, 1)`` keeps the dead branch's divisor
    nonzero under ANSI evaluation.

    At 100 TB: one range exchange (sampled boundaries), one local
    sort, one partition-count aggregate whose |partitions|-row output
    broadcasts back — no stage ever holds more than its partition.

    Trade-offs of the eager localCheckpoint: (1) it runs a Spark job at
    DataFrame-CONSTRUCTION time, so merely building or explaining a
    plan that embeds this op materializes the input subplan; (2) the
    checkpointed blocks live in executor-local storage without
    replication, so an executor loss after the checkpoint fails the
    query instead of recomputing lineage. On a long-lived production
    cluster where executor churn is expected, swap the localCheckpoint
    for reliable `checkpoint()` (HDFS/object-store-backed) or
    `persist(DISK_ONLY_2) + count()` — same layout-freezing effect,
    recoverable blocks, at the cost of a remote write.
    """
    oc = [F.col(c) for c in order_cols]
    parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    d = (df.repartitionByRange(parts, *oc)
           .sortWithinPartitions(*oc)
           .withColumn("__pid", F.spark_partition_id()))
    wp = W.partitionBy("__pid").orderBy(*oc)
    d = d.withColumn("__rn", F.row_number().over(wp))
    # Materialize ONCE before deriving counts: the count aggregate and
    # the row stream below both traverse this subplan, and
    # repartitionByRange samples its boundaries per *execution* — two
    # independent executions can pick different boundaries, pairing
    # partition counts from one layout with row numbers from another
    # (observed as rank > N → a fifth quartile). The eager local
    # checkpoint freezes one layout for both consumers.
    from ..caching import scoped_checkpoint
    d = scoped_checkpoint(d, eager=True)
    counts = d.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    wo = bounded_window(
        "__pid", bound="|shuffle partitions| offset rows, never fact"
    ).rowsBetween(W.unboundedPreceding, -1)
    wall = bounded_window(
        F.lit(1), bound="|shuffle partitions| offset rows, never fact"
    ).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    offs = (counts
            .withColumn("__off",
                        F.coalesce(F.sum("__cnt").over(wo), F.lit(0)))
            .withColumn("__n", F.sum("__cnt").over(wall)))
    d = (d.join(F.broadcast(offs.select("__pid", "__off", "__n")), "__pid")
          .withColumn("__rank", F.col("__off") + F.col("__rn")))
    tile = F.expr(f"""
        CASE WHEN __rank <= (__n % {n}) * ((__n div {n}) + 1)
             THEN (__rank + (__n div {n})) div ((__n div {n}) + 1)
             ELSE (__n % {n})
                  + ((__rank - (__n % {n}) * ((__n div {n}) + 1)
                      + greatest(__n div {n}, 1) - 1)
                     div greatest(__n div {n}, 1))
        END""")
    return d.withColumn(out_col, tile.cast("int")) \
            .drop("__pid", "__rn", "__off", "__n", "__rank")
