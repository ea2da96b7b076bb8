"""Batch relational core — SURVEY.md §2.2 (filters/projections), §2.3
(joins), §2.6 (sorts/limits/top-k), §2.7 (set ops).

The reference's relational surface is implicit in its schema (FK
``transactions.block_number → blocks.block_number``,
migrations/0001_initial.sql:39) and its "further analysis" mandate
(README.md:5,30,204). Fixture role mapping (FIXTURES.md §B): ``orders`` ~
blocks, ``lineitem`` ~ transactions, ``nation``/``region`` ~ broadcast dims,
``events`` ~ the stream table.

Scale notes (100 TB design point) are in each docstring; the general rules:
- equi-joins on the FK shuffle both sides on the key → pre-bucket or
  pre-partition production tables by the join key so the shuffle is a no-op;
- dimension joins are explicitly ``broadcast()`` — never shuffle 100 TB of
  facts to meet a 25-row dim;
- AQE handles skew (a hot block with 10^5 txs) by splitting skewed
  partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import query_sql as Q
from ..catalog import table as T
from . import register

# ---------------------------------------------------------------------------
# §2.2 filters / predicates / expression projection
# ---------------------------------------------------------------------------


@register(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 5000 AND 150000
      AND o_orderstatus IN ('O', 'F')
      AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
      AND NOT (o_custkey IS NULL)
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row filters: conjunction/disjunction/NOT, IN, BETWEEN, LIKE, IS NULL.

    All predicates are Catalyst-pushable: at scale they reach the parquet
    reader as ``PushedFilters`` and prune row groups via min/max stats.
    """
    o = T(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(5000, 150000)
        & F.col("o_orderstatus").isin("O", "F")
        & (F.col("o_orderpriority").like("1%")
           | F.col("o_orderpriority").like("2%"))
        & ~F.col("o_custkey").isNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@register(
    "proj_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_band,
           CAST(l_quantity >= 25 AS BOOLEAN) AS above_median
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def proj_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + conditional projection (CASE WHEN / IF).

    Pure per-row expressions: whole-stage-codegen'd JVM arithmetic, no
    Python boundary, trivially scalable.
    """
    li = T(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
        F.when(F.col("l_quantity") >= 40, "bulk")
         .when(F.col("l_quantity") >= 10, "mid")
         .otherwise("small").alias("qty_band"),
        (F.col("l_quantity") >= 25).alias("above_median"),
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_inner_equi",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
           l.l_extendedprice * (1 - l.l_discount) AS net_price,
           o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1999-06-01'
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK equi-join (transactions ⋈ blocks analog;
    reference FK: migrations/0001_initial.sql:39).

    At 100 TB both sides are bucketed/partitioned by the FK so the
    sort-merge join runs shuffle-free; AQE splits skewed keys.
    """
    return Q(spark, sf_dir, """
        SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
               l.l_extendedprice * (1 - l.l_discount) AS net_price,
               o.o_orderpriority
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= cast('1999-06-01' as timestamp)
    """)


@register(
    "join_broadcast",
    oracle="""
    SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension join with explicit broadcast hints.

    nation/region are the chain-config-dim analog (blockchains.toml): tiny
    tables that must NEVER shuffle the fact side — ``broadcast()`` pins
    BroadcastHashJoin regardless of stats availability.
    """
    return Q(spark, sf_dir, """
        SELECT /*+ BROADCAST(n), BROADCAST(r) */ r.r_name,
               count(*) AS n_customers,
               cast(sum(cast(c.c_acctbal as decimal(18,4))) as double)
                 AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """)


@register(
    "join_left_outer",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, l.l_linenumber, l.l_quantity
    FROM orders o
    LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 48) l
      ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey < 2000
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: blocks with possibly-missing tx detail (empty blocks
    are legal — reference tx_count can be 0, evm_consumer.rs:72)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
         .select(o.o_orderkey, o.o_orderstatus, li.l_linenumber,
                 li.l_quantity)
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, l.l_orderkey, l.l_linenumber
    FROM (SELECT * FROM orders WHERE o_totalprice > 100000) o
    RIGHT JOIN (SELECT * FROM lineitem WHERE l_orderkey < 2000) l
      ON o.o_orderkey = l.l_orderkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — orphan-transaction audit direction (the reference
    can create orphan txs: consumer inserts txs before the parent block,
    evm_consumer.rs:124-128)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "right")
         .select(o.o_orderkey, o.o_orderstatus, li.l_orderkey,
                 li.l_linenumber)
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT a.o_orderkey AS early_key, b.o_orderkey AS late_key, a.o_custkey
    FROM (SELECT * FROM orders WHERE o_orderdate <  TIMESTAMP '1998-01-01'
            AND o_custkey < 60) a
    FULL JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
            AND o_custkey < 60) b
      ON a.o_orderkey = b.o_orderkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — two-snapshot completeness audit."""
    cut = F.lit("1998-01-01").cast("timestamp")
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 60)
    a = o.filter(F.col("o_orderdate") < cut).alias("a")
    b = o.filter(F.col("o_orderdate") >= cut).alias("b")
    return (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full")
         .select(F.col("a.o_orderkey").alias("early_key"),
                 F.col("b.o_orderkey").alias("late_key"),
                 F.col("a.o_custkey").alias("o_custkey"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): blocks having ≥1 high-value tx analog."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
         .select("o_orderkey", "o_totalprice")
    )


@register(
    "join_anti",
    oracle="""
    SELECT expected_key FROM (
      SELECT CAST(unnest(generate_series(
               0, (SELECT max(o_orderkey) FROM orders))) AS BIGINT)
             AS expected_key) gs
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = gs.expected_key
                        AND o.o_orderkey % 97 <> 0)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap detection via left-anti join: expected block range minus ingested
    blocks (drives re-ingestion; range source analog evm_producer.rs:59).

    The scalar max() lookup is a metadata-sized action (one row to the
    driver), then ``spark.range`` generates the expected keyspace
    distributed — at 100 TB this is the standard missing-block audit.
    """
    # fixture orderkeys are dense; drop every 97th to simulate gaps
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 != 0)
    max_key = T(spark, sf_dir, "orders").agg(
        F.max("o_orderkey")).collect()[0][0]  # driver-ok: scalar bound
    # empty slice → max() is NULL → audit an empty keyspace (matches
    # the oracle's generate_series over NULL, which yields no rows)
    hi = int(max_key) + 1 if max_key is not None else 0
    expected = spark.range(0, hi).withColumnRenamed("id", "expected_key")
    return expected.join(
        o, expected.expected_key == o.o_orderkey, "left_anti")


@register(
    "subq_correlated",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey) AS n_lines,
           (SELECT max(l_extendedprice) FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey) AS max_line
    FROM orders o WHERE o_orderkey < 20000
    """,
)
def subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (per-order lineitem count and max
    price inline in the SELECT list) — the declared-but-unexercised
    SURVEY §4 rewrite: Catalyst decorrelates each subquery into an
    aggregate over the FK joined back to the outer query, so execution
    is two-phase agg + join, never a per-row re-scan of lineitem. NULL
    semantics are observable: an order with no lineitems gets a NULL
    max_line but n_lines = 0 via count's decorrelated coalesce.

    Scale: after decorrelation this is exactly `join_inner_equi`'s
    shuffle shape (agg on the FK, join on the FK — one exchange each);
    a naive engine would run one subquery per outer row."""
    return Q(spark, sf_dir, """
        SELECT o_orderkey, o_totalprice,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_lines,
               (SELECT max(l_extendedprice) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS max_line
        FROM orders o WHERE o_orderkey < 20000
    """)


@register(
    "join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey, s.s_acctbal, c.c_acctbal
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    WHERE c.c_custkey < 200
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi prefix + non-equi residual predicate.

    Catalyst keeps the equi part as the join key (hashable) and applies the
    inequality as a post-join filter — never a full cross product.
    """
    s = T(spark, sf_dir, "supplier")
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey)
                  & (s.s_acctbal > c.c_acctbal))
         .select(s.s_suppkey, c.c_custkey, s.s_acctbal, c.c_acctbal)
    )


@register(
    "join_range",
    oracle="""
    SELECT w.event_id AS window_id, CAST(count(e.event_id) AS BIGINT) AS n_events
    FROM (SELECT event_id, ts FROM events WHERE event_id % 100 = 0) w
    JOIN events e ON e.ts >= w.ts AND e.ts < w.ts + INTERVAL 1 HOUR
    GROUP BY w.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: events falling inside sampled 1-hour windows
    (block [ts, next_ts) containment analog).

    100 TB strategy: a bare range predicate is a BroadcastNestedLoopJoin —
    O(n·m). The engine explodes each interval into the coarse hour buckets
    it covers and equi-joins on bucket with the range as a residual: a hash
    join + filter, linear in matches. Each event lands in exactly one
    bucket so no post-join dedup is needed.
    """
    e = T(spark, sf_dir, "events")
    w = (e.filter(F.col("event_id") % 100 == 0)
          .select(F.col("event_id").alias("window_id"),
                  F.col("ts").alias("w_start"))
          .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 1 HOUR"))
          .withColumn("bucket", F.explode(F.sequence(
              F.date_trunc("hour", "w_start"),
              F.date_trunc("hour", "w_end"),
              F.expr("INTERVAL 1 HOUR")))))
    probe = e.select("event_id", "ts").withColumn(
        "bucket", F.date_trunc("hour", "ts"))
    joined = w.join(
        probe,
        (w.bucket == probe.bucket)
        & (probe.ts >= w.w_start) & (probe.ts < w.w_end))
    return joined.groupBy("window_id").agg(
        F.count("event_id").alias("n_events"))


@register(
    "join_self",
    oracle="""
    SELECT cur.event_id,
           CAST(date_diff('microsecond', prev.ts, cur.ts) AS BIGINT)
             AS micros_since_prev
    FROM events cur JOIN events prev ON prev.event_id = cur.event_id - 1
    WHERE cur.event_id < 5000
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join on adjacent keys — parent-hash chain-continuity analog
    (blocks.parent_hash = prev.hash; cols migrations/0001_initial.sql:10-11).
    """
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    cur = e.alias("cur")
    prev = T(spark, sf_dir, "events").alias("prev")
    return (
        cur.join(prev, F.col("prev.event_id") == F.col("cur.event_id") - 1)
           .select(
               F.col("cur.event_id").alias("event_id"),
               (F.unix_micros(F.col("cur.ts"))
                - F.unix_micros(F.col("prev.ts")))
               .alias("micros_since_prev"))
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "sort_order",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey
    """,
)
def sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total sort with NULLS LAST (range-partitioned exchange →
    per-partition sort at scale)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    return o.select("o_orderkey", "o_totalprice", "o_orderstatus").orderBy(
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    )


@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT — Catalyst compiles to TakeOrderedAndProject (per-
    partition top-k then driver merge; never a full sort at scale).
    Tie-broken by the unique key for determinism."""
    o = T(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_totalprice")
             .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
             .limit(100))


@register(
    "topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey, l_linenumber) AS rn
      FROM lineitem) t
    WHERE rn <= 5
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via a rank-filtered window, which Spark ≥3.5
    compiles to ``WindowGroupLimit``: a *Partial* group-limit on the map
    side keeps only k rows per group per input partition BEFORE the
    exchange, so the single shuffle moves ≤ k × groups × mappers rows and
    the *Final* limit + Window rank the survivors. One shuffle, no
    full-group sort anywhere — the engine's preferred top-k plan for
    small k at any scale (plan asserted in tests/test_plans.py).

    For large k (where k rows per group per mapper is itself too much
    traffic) use ``operators.topk_per_group``: an exact bucket-histogram
    threshold broadcasts and prefilters the corpus to the boundary
    bucket before any sort."""
    return Q(spark, sf_dir, """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                                        ORDER BY l_extendedprice DESC,
                                                 l_orderkey, l_linenumber)
                       AS rn
              FROM lineitem) t
        WHERE rn <= 5
    """)


@register(
    "sort_within_partitions",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey < 3000
    """,
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort (write-optimization ordering: clusters parquet
    row groups by key for later min/max pruning). No global exchange; row
    content is unchanged, which is what the order-insensitive oracle
    verifies."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return (o.select("o_orderkey", "o_custkey", "o_totalprice")
             .repartition(8, "o_custkey")
             .sortWithinPartitions("o_custkey", "o_orderkey"))


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus, 'chain_a' AS chain_name
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, 'chain_b' AS chain_name
    FROM orders WHERE o_orderkey % 3 = 1
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chain UNION ALL by name — the engine-side analog of the
    reference's per-chain topic fan-out (lib.rs:68-130): each chain's table
    carries a ``chain_name`` discriminator and unions into one DataFrame."""
    o = T(spark, sf_dir, "orders")
    a = (o.filter(F.col("o_orderkey") % 3 == 0)
          .select("o_orderkey", "o_orderstatus")
          .withColumn("chain_name", F.lit("chain_a")))
    b = (o.filter(F.col("o_orderkey") % 3 == 1)
          .select("o_orderkey", "o_orderstatus")
          .withColumn("chain_name", F.lit("chain_b")))
    return a.unionByName(b)


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup."""
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers active in both halves of the year —
    the two-snapshot overlap audit."""
    o = T(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    a = o.filter(F.col("o_orderdate") < cut).select("o_custkey")
    b = o.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset ingestion diff (expected − actual)."""
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@register(
    "join_skew_salted",
    oracle="""
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join via salting: events.user_id spans ~50 hot keys
    (thousands of rows each) against the customer dim — a shuffled join
    would put every hot key in one task. The fact side gets a salt
    ``pmod(event_id, 8)``; the dim side is replicated 8× with an exploded
    salt column; the join key becomes (key, salt), splitting each hot key
    across 8 tasks. Result is provably identical to the unsalted join
    (the oracle computes the plain form).

    100 TB discipline (SURVEY.md §4): broadcast is the FIRST fix for a
    small dim (forced off here with a merge hint so the salt is
    exercised); salting is for large⋈large with hot keys; AQE skew-join
    splitting handles moderate skew automatically — salting remains the
    explicit tool when one key alone exceeds an executor."""
    salt_n = 8
    e = (T(spark, sf_dir, "events")
         .select("user_id", "value",
                 F.pmod("event_id", F.lit(salt_n)).alias("salt")))
    c = (T(spark, sf_dir, "customer")
         .select("c_custkey", "c_mktsegment")
         .withColumn("salt",
                     F.explode(F.expr(f"sequence(0, {salt_n - 1})"))))
    j = e.hint("merge").join(
        c, (e.user_id == c.c_custkey) & (e.salt == c.salt), "inner")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
         .alias("total_value"))


@register(
    "join_bucketed",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey < 30000
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join: both sides written ``bucketBy(8,
    join_key)`` into managed tables, then joined — Spark reads the
    matching buckets pairwise and the SortMergeJoin runs with NO shuffle
    exchange on either side (bucket metadata satisfies the join's
    distribution requirement).

    100 TB discipline: bucketing is how repeated big⋈big joins on a
    stable FK amortize their shuffle once at write time (SURVEY.md §2.3
    join table); one-off joins rely on AQE instead. The write cost here
    is part of the op — it IS the technique."""
    from ..scratch import fresh_scratch_dir

    # external-table locations under scratch: idempotent across sessions
    # (a stale managed-table dir would fail LOCATION_ALREADY_EXISTS)
    out = fresh_scratch_dir("bucketed_join")
    spark.sql("DROP TABLE IF EXISTS bdi_bucketed_lineitem")
    spark.sql("DROP TABLE IF EXISTS bdi_bucketed_orders")
    fact = (T(spark, sf_dir, "lineitem")
            .filter(F.col("l_orderkey") < 30000)
            .select("l_orderkey", "l_extendedprice"))
    dim = (T(spark, sf_dir, "orders")
           .filter(F.col("o_orderkey") < 30000)
           .select("o_orderkey", "o_orderpriority"))
    (fact.write.mode("overwrite").format("parquet")
         .option("path", f"{out}/lineitem")
         .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .saveAsTable("bdi_bucketed_lineitem"))
    (dim.write.mode("overwrite").format("parquet")
        .option("path", f"{out}/orders")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bdi_bucketed_orders"))
    lb = spark.table("bdi_bucketed_lineitem")
    ob = spark.table("bdi_bucketed_orders")
    # merge hint: at fixture scale Catalyst would broadcast the dim and
    # never touch the bucket layout; at 100 TB (both sides large) SMJ is
    # what it picks anyway — the hint pins the scale plan
    j = lb.hint("merge").join(ob, lb.l_orderkey == ob.o_orderkey, "inner")
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
         .alias("total_price"))


@register(
    "sample_hash",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 < 5
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5 % hash-sample on the key: the scalable TABLESAMPLE
    idiom. Unlike seeded random sampling (engine-specific PRNG ⇒ not
    reproducible across engines/runs/partitionings), a hash-mod predicate
    is stable under re-partitioning, re-runs and engine swaps, samples
    *entities* (all rows of a key stay together), and pushes down as an
    ordinary filter. At 100 TB this is how you carve a dev slice that
    every engine agrees on."""
    return Q(spark, sf_dir, """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE cast(conv(substring(md5(cast(o_orderkey as string)), 1, 8),
                        16, 10) as bigint) % 100 < 5
    """)


# ---------------------------------------------------------------------------
# join_lateral — correlated LATERAL subquery (per-row dependent subquery)
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT c_custkey, o.o_orderkey,
           CAST(o.tp AS DOUBLE) AS o_totalprice
    FROM customer,
    LATERAL (SELECT o_orderkey,
                    CAST(o_totalprice AS DECIMAL(18,4)) AS tp
             FROM orders WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""


@register("join_lateral", oracle=_LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: each customer's top-2 orders by price,
    written as the per-row dependent subquery users actually write
    (SQL:1999 LATERAL). Catalyst decorrelates the ORDER BY/LIMIT
    subquery into a ranked-window-over-join — exactly the distributed
    `topk` plan — instead of executing it per outer row the way the
    naive reading (and a row-store) would.

    Scale: after decorrelation the orders side ranks within
    o_custkey partitions (one uniform shuffle) and joins back; no
    per-customer re-execution exists anywhere in the physical plan.
    Identical SQL text on both engines; exact-decimal price keeps the
    tie order aligned.
    """
    return Q(spark, sf_dir, _LATERAL_SQL)


# ---------------------------------------------------------------------------
# subq_recursive — recursive CTE (bounded-depth hierarchy walk)
# ---------------------------------------------------------------------------

_RECURSIVE_SQL = """
    WITH RECURSIVE chain (orderkey, anc, depth) AS (
      SELECT o_orderkey, o_orderkey, 0
      FROM orders WHERE o_orderkey < 5000
      UNION ALL
      SELECT orderkey, CAST(floor(anc / 10) AS BIGINT), depth + 1
      FROM chain WHERE anc >= 10
    )
    SELECT depth, CAST(count(*) AS BIGINT) AS n,
           CAST(min(anc) AS BIGINT) AS min_anc,
           CAST(max(anc) AS BIGINT) AS max_anc
    FROM chain
    GROUP BY depth
    ORDER BY depth
"""


@register("subq_recursive", oracle=_RECURSIVE_SQL)
def subq_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (SQL:1999 WITH RECURSIVE, Spark 4.x): walk each
    order key up its decimal-digit ancestor chain — a bounded-depth
    hierarchy traversal, the query shape behind org charts, BOM
    explosions and ledger parent-chains — and roll up per depth.

    Scale: Spark executes the recursion as iterated unions, one
    distributed step per level with the aggregate over the unioned
    result — correct for the bounded, shallow hierarchies this shape
    is for (depth ≤ log10(maxkey) = 4 here). For UNBOUNDED-depth
    reachability (near-dup connected components at 10^10 nodes) the
    engine's answer is `dedup_clusters`' O(log d) shortcutted fixpoint
    instead — the measured 10× probe shows the oracle's recursive
    closure growing 37× where the fixpoint stays flat (SCALE.md);
    these two keys are the two sides of that trade, each used where it
    wins.
    """
    return Q(spark, sf_dir, _RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# join_null_safe — IS NOT DISTINCT FROM equality (NULL matches NULL)
# ---------------------------------------------------------------------------

_NULL_SAFE_SQL = """
    WITH a AS (
      SELECT nullif(o_orderkey % 5, 0) AS k,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY nullif(o_orderkey % 5, 0)
    ),
    b AS (
      SELECT nullif(l_orderkey % 5, 0) AS k,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY nullif(l_orderkey % 5, 0)
    )
    SELECT a.k AS k, n_orders, n_lines
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY k NULLS FIRST
"""


@register("join_null_safe", oracle=_NULL_SAFE_SQL)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (IS NOT DISTINCT FROM / Spark's <=>): the
    NULL bucket on each side matches the other's — where a plain
    equi-join silently drops every NULL-keyed row from both sides (the
    classic missing-dimension-member reconciliation bug). The nullif
    derivation plants a real NULL key group on both sides so the test
    exercises the semantic, not just the syntax.

    Scale: null-safe equality is still HASH-JOINABLE (NULL is one more
    key value) — Catalyst plans the same BroadcastHashJoin/SMJ it would
    for =, no nested-loop fallback. Identical SQL text on both
    engines.
    """
    return Q(spark, sf_dir, _NULL_SAFE_SQL)


# ---------------------------------------------------------------------------
# set_except_all — multiset difference (bag semantics)
# ---------------------------------------------------------------------------

_EXCEPT_ALL_SQL = """
    SELECT o_orderstatus, o_orderpriority FROM orders
    EXCEPT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders
    WHERE o_orderkey % 2 = 0
"""


@register("set_except_all", oracle=_EXCEPT_ALL_SQL)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: each duplicate row survives
    (count_left - count_right) times. `set_except` uses the same bag
    semantics (exceptAll); the two keys differ in shape, not operator —
    that one diffs a single key column between disjoint status slices,
    this one diffs multi-column rows of overlapping inputs, where the
    per-duplicate survival count is actually visible ("three more
    'F, 1-URGENT' rows on the left than the right" is the finding; a
    single-column membership diff hides it).

    Scale: Catalyst rewrites EXCEPT ALL to a per-row-count aggregate +
    generate (counts, never a row-by-row anti join) — one shuffle on
    the row value, like any groupBy. Identical SQL text on both
    engines.
    """
    return Q(spark, sf_dir, _EXCEPT_ALL_SQL)


# ---------------------------------------------------------------------------
# set_intersect_all — multiset intersection (bag semantics)
# ---------------------------------------------------------------------------

_INTERSECT_ALL_SQL = """
    SELECT o_orderstatus, o_orderpriority FROM orders
    WHERE o_orderkey % 2 = 0
    INTERSECT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders
    WHERE o_custkey % 3 = 0
"""


@register("set_intersect_all", oracle=_INTERSECT_ALL_SQL)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection: each row survives
    min(count_left, count_right) times, completing the bag-semantics
    set family (`set_union_all` / `set_except_all` / this). The bag
    form is the reconciliation primitive ("how many of each (status,
    priority) row do BOTH snapshots carry") that DISTINCT intersection
    collapses to membership.

    Scale: Catalyst rewrites INTERSECT ALL to per-side row counts +
    a min() + generate — two two-phase aggregates and one shuffle on
    the row value, never a pairwise join. Identical SQL text on both
    engines.
    """
    return Q(spark, sf_dir, _INTERSECT_ALL_SQL)


# ---------------------------------------------------------------------------
# join_existence — IN-subquery as a projected boolean (ExistenceJoin)
# ---------------------------------------------------------------------------

_EXISTENCE_SQL = """
    SELECT c_custkey, c_mktsegment,
           c_custkey IN (SELECT o_custkey FROM orders
                         WHERE o_totalprice > 200000) AS has_big_order
    FROM customer
"""


@register("join_existence", oracle=_EXISTENCE_SQL)
def join_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery in the PROJECTION (not the WHERE): every customer
    row survives, annotated with a boolean — the "flag, don't filter"
    audit shape (`join_semi`/`join_anti` split rows; this keeps them
    and labels them). Catalyst plans the distinct join type
    ExistenceJoin (a semi join that emits the match bit instead of
    dropping non-matches), the one join variant the registry didn't
    yet exercise.

    Scale: the subquery side aggregates to distinct custkeys before
    the join (a 200k-threshold slice of a fact collapses to dim-sized
    keys), so the existence probe is hash-lookup-sized; same plan at
    100 TB. Identical SQL text on both engines.
    """
    return Q(spark, sf_dir, _EXISTENCE_SQL)


# ---------------------------------------------------------------------------
# subq_scalar — uncorrelated scalar subquery (global-stat normalization)
# ---------------------------------------------------------------------------

_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey,
           round(o_totalprice /
                 (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                              AS DOUBLE) / count(*)
                  FROM orders), 6) AS price_rel
    FROM orders
    WHERE o_orderkey < 1000
"""


@register("subq_scalar", oracle=_SCALAR_SUBQ_SQL)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: normalize each order by the GLOBAL
    mean price — the "relative to corpus average" shape every quality
    dashboard uses. Complements `subq_correlated` (per-key subquery →
    join) with the other rewrite: Catalyst executes the scalar subquery
    ONCE as its own tiny job and injects the result as a literal into
    the main scan's projection — zero joins, zero extra shuffles on
    the fact.

    Determinism: the mean is computed as exact-decimal sum CAST to
    double, then ONE double division (sum/count) and one per-row
    division — every float op is a single IEEE-exact step, identical
    text on both engines, so round(,6) hashes match bit-for-bit.

    Scale: the subquery is a two-phase aggregate over one column; its
    scalar result broadcasts by construction. Same plan at 100 TB.
    """
    return Q(spark, sf_dir, _SCALAR_SUBQ_SQL)
