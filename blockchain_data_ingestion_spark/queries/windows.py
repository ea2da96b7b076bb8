"""Window functions — SURVEY.md §2.5.

None exist in the reference; they're the natural analytic layer over its
time-series data model (monotone ``block_number``, ``timestamp`` column —
migrations/0001_initial.sql:8,12).

Determinism rule: every ORDER BY inside a window ends with a unique key so
ranks/frames are total orders — otherwise Spark and DuckDB may legally
disagree on ties. Running double sums go through the decimal contract
(exact prefix sums) because windowed float accumulation order is an
implementation detail.

Scale: a window partitioned by a high-cardinality key (user, chain) is one
shuffle then partition-local sort — the same plan at 100 TB. Avoid global
(unpartitioned) windows; the only one here is ntile over a filtered slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import query_sql as Q
from ..operators.bounded import bounded_window
from ..catalog import table as T
from . import register

_DEC = "decimal(18,4)"


@register(
    "win_row_number",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM orders
    WHERE o_custkey < 150
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over a per-group value ordering
    (top-N txs by value per block analog)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150)
    w = (W.partitionBy("o_orderstatus")
          .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
    return o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "win_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(rank() OVER (PARTITION BY l_orderkey
                ORDER BY l_quantity DESC, l_linenumber) AS BIGINT) AS qty_rank
    FROM lineitem
    WHERE l_orderkey < 4000
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() with gaps over a per-order quantity ordering (ranking miners
    by blocks-mined analog). Tie-break on linenumber makes the order total
    so both engines agree on equal quantities."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 4000)
    w = (W.partitionBy("l_orderkey")
          .orderBy(F.col("l_quantity").desc(), F.col("l_linenumber")))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.rank().over(w).cast("long").alias("qty_rank"),
    )


@register(
    "win_dense_rank",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           CAST(dense_rank() OVER (PARTITION BY s_nationkey
                ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS bal_drank
    FROM supplier
    """,
)
def win_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank() — no gaps after ties; per-nation supplier balance
    leaderboard."""
    s = T(spark, sf_dir, "supplier")
    w = (W.partitionBy("s_nationkey")
          .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey")))
    return s.select(
        "s_nationkey", "s_suppkey",
        F.dense_rank().over(w).cast("long").alias("bal_drank"),
    )


@register(
    "win_percent_rank",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey), 6) AS bal_pct_rank
    FROM customer
    """,
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank() = (rank-1)/(n-1) per market segment — relative
    standing of an account balance. Rounded to 6 dp before hashing (the
    division is float on both engines)."""
    c = T(spark, sf_dir, "customer")
    w = (W.partitionBy("c_mktsegment")
          .orderBy(F.col("c_acctbal"), F.col("c_custkey")))
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
    )


@register(
    "win_cume_dist",
    oracle="""
    SELECT o_orderkey,
           round(cume_dist() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey), 6) AS price_cdist
    FROM orders
    WHERE o_custkey < 300
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist() = rows ≤ current / partition rows — cumulative price
    distribution per order priority."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = (W.partitionBy("o_orderpriority")
          .orderBy(F.col("o_totalprice"), F.col("o_orderkey")))
    return o.select(
        "o_orderkey",
        F.round(F.cume_dist().over(w), 6).alias("price_cdist"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           CAST(date_diff('microsecond',
                lag(ts) OVER w, ts) AS BIGINT) AS micros_since_prev,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead — inter-block time delta analog (ts - lag(ts) per chain)."""
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        .alias("micros_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "win_running_agg",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_value
    FROM events
    """,
)
def win_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum (running gas total analog) — exact decimal prefix
    sums so both engines agree bit-for-bit."""
    return Q(spark, sf_dir, """
        SELECT event_id, user_id,
               cast(sum(cast(value as decimal(18,4))) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 as double) AS running_value
        FROM events
    """)


@register(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 / (count(value) OVER w) AS mov_avg_5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over the last 5 rows (moving gas price analog),
    decimal-exact numerator / exact count denominator."""
    e = T(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-4, W.currentRow))
    return e.select(
        "event_id", "user_id",
        (F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
         / F.count("value").over(w)).alias("mov_avg_5"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_last_hour
    FROM events
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: events per user in the trailing hour."""
    T(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
        SELECT event_id, user_id,
               CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_last_hour
        FROM events
    """)


@register(
    "win_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM orders
    WHERE o_custkey < 40
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist — value-quartile bucketing.
    Global window over a filtered slice (a deliberate small-data op; at
    scale quantiles come from agg_percentile sketches instead)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 40)
    w = bounded_window(F.col("o_totalprice"), F.col("o_orderkey"),
                       bound="custkey<40 slice — dimension-filtered demo; "
                             "distributed_ntile is the scale path")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "win_first_last_value",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full-partition frame
    (first/last tx hash per block analog)."""
    e = T(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


@register(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
    FROM (SELECT * FROM events WHERE event_id < 3000) e
    ASOF LEFT JOIN (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate) o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event's timestamp per key
    (stream-enrichment analog: latest block at-or-before an event ts).

    Vanilla Spark has no native ASOF; the engine uses the union+window
    form: tag both sides, union on (key, time), carry the last seen
    order forward with ``last(..., ignorenulls)`` over an unbounded-
    preceding frame, keep the event rows. ONE shuffle on the join key,
    no per-event candidate explosion (a join+rank formulation
    materializes every earlier order per event before pruning).

    Ordering within equal timestamps puts order rows first so an event
    AT an order's timestamp sees that order (`>=` semantics), matching
    DuckDB ASOF JOIN.

    100 TB strategy: identical plan — the shuffle is on the natural
    enrichment key; add a coarse time-bucket secondary key if single
    keys outgrow a partition.
    """
    # No pre-aggregation of orders: sorting order rows by `ord` ascending
    # within equal (k, t) makes last(ord, ignorenulls) land on the max
    # orderkey of the latest at-or-before date — the dedup the oracle's
    # GROUP BY computes, folded into the one window shuffle (a separate
    # groupBy shuffled ~every order row once more; measured 0.3 s at sf0.1).
    return Q(spark, sf_dir, """
        WITH u AS (
          SELECT user_id AS k, ts AS t, cast(NULL as long) AS ord,
                 0 AS is_order, event_id
          FROM events WHERE event_id < 3000
          UNION ALL
          SELECT o_custkey AS k, cast(o_orderdate as timestamp) AS t,
                 o_orderkey AS ord, 1 AS is_order,
                 cast(NULL as long) AS event_id
          FROM orders
        )
        SELECT event_id, k AS user_id, asof_orderkey
        FROM (SELECT event_id, k, is_order,
                     last(ord, true) OVER (
                       PARTITION BY k
                       ORDER BY t, is_order DESC, ord ASC NULLS LAST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS asof_orderkey
              FROM u)
        WHERE is_order = 0
    """)


@register(
    "join_asof_bucketed",
    oracle="""
    SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
    FROM (SELECT * FROM events WHERE event_id < 3000) e
    ASOF LEFT JOIN (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate) o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, hot-entity-safe variant: same semantics (and same
    DuckDB ASOF oracle) as `join_asof`, but NO window ever holds one
    entity's full history. `join_asof`'s union+window form partitions
    by the entity key alone, so at 100 TB one hot key (an exchange
    wallet with 10^9 events) lands its entire timeline in a single
    task. Here time is cut into fixed-width buckets (7 days) and the
    heavy row-level window partitions by (key, bucket) — the
    bin-then-verify move from `join_interval_overlap` applied to the
    carry-forward scan (SURVEY.md §7 watch list; reference ingest
    ordering evm_consumer.rs — SURVEY §2.3 `join_asof`):

      1. Union tagged events+orders, add bkt = floor(epoch/604800).
      2. Within-bucket as-of: last(order, ignorenulls) over a
         (key, bkt)-partitioned window — a hot key splits across its
         buckets; per-task rows are bounded by one bucket of one key.
      3. Bucket tails: per (key, bkt) aggregate of the winning order
         at bucket end — max(struct(t, ord)) so latest date, then max
         orderkey, wins (the oracle's GROUP-BY dedup folded in).
      4. Carry-in: per key, last non-null tail over STRICTLY earlier
         buckets. This window partitions by key alone, but its input
         is the bucket-level table — one row per (key, bucket), bounded
         by keys x calendar (~1.6k weekly buckets per 30 years), never
         by event volume. That's the whole point: the per-key
         sequential state shrinks from O(rows) to O(buckets).
      5. Join carry back on (key, bkt); coalesce(within-bucket, carry).

    Costs one extra shuffle + a bucket-level join vs the plain form —
    the premium buys hot-key immunity. Plan contract pinned by
    tests/test_plans.py::test_asof_bucketed_window_includes_time_bucket.
    """
    return Q(spark, sf_dir, """
        WITH u AS (
          SELECT user_id AS k, ts AS t, cast(NULL as long) AS ord,
                 0 AS is_order, event_id
          FROM events WHERE event_id < 3000
          UNION ALL
          SELECT o_custkey AS k, cast(o_orderdate as timestamp) AS t,
                 o_orderkey AS ord, 1 AS is_order,
                 cast(NULL as long) AS event_id
          FROM orders
        ),
        b AS (
          SELECT u.*, cast(floor(unix_timestamp(t) / 604800) AS long) AS bkt
          FROM u
        ),
        w AS (
          SELECT event_id, k, bkt, is_order,
                 last(ord, true) OVER (
                   PARTITION BY k, bkt
                   ORDER BY t, is_order DESC, ord ASC NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS in_bkt_ord
          FROM b
        ),
        tails AS (
          SELECT k, bkt,
                 max(CASE WHEN is_order = 1 THEN struct(t, ord) END) AS mx
          FROM b GROUP BY k, bkt
        ),
        carry AS (
          SELECT k, bkt,
                 last(mx.ord, true) OVER (
                   PARTITION BY k ORDER BY bkt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS carry_ord
          FROM tails
        )
        SELECT w.event_id, w.k AS user_id,
               coalesce(w.in_bkt_ord, carry.carry_ord) AS asof_orderkey
        FROM w JOIN carry ON w.k = carry.k AND w.bkt = carry.bkt
        WHERE w.is_order = 0
    """)


@register(
    "win_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_no
    FROM gaps
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a 30-minute inactivity
    gap opens a new session; session number = running count of gap
    markers. The batch twin of `stream_session_window`, and the standard
    burst-activity segmentation over the reference's timestamped model.

    Scale: both windows partition on user_id — ONE shuffle, two
    partition-local passes; session cardinality never materializes as
    state (contrast the streaming variant's state store)."""
    return Q(spark, sf_dir, """
        WITH gaps AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               sum(is_new) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_no
        FROM gaps
    """)


# ---------------------------------------------------------------------------
# op_funnel — ordered multi-stage funnel in ONE pass over the event log
# ---------------------------------------------------------------------------

#: the funnel: users must hit the stages IN ORDER (a purchase before the
#: first view does not count toward stage 3).
def _funnel_sql(tbl: str) -> str:
    """The funnel kernel over any (user_id, event_id, ts, event_type)
    relation — parameterized so unit tests can run it on planted rows
    (the fixture's hyperactive users saturate every stage)."""
    return _FUNNEL_TEMPLATE.format(tbl=tbl)


_FUNNEL_TEMPLATE = """
    WITH e AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM {tbl}
    ),
    w1 AS (
      SELECT *, coalesce(max(is_v) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS seen_v
      FROM e
    ),
    w2 AS (
      SELECT *, is_c * seen_v AS is_c_av,
             coalesce(max(is_c * seen_v) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS seen_c_av
      FROM w1
    ),
    per_user AS (
      SELECT user_id,
             max(is_v) AS r1,
             max(is_c_av) AS r2,
             max(is_p * seen_c_av) AS r3
      FROM w2 GROUP BY user_id
    )
    SELECT CAST(sum(r1) AS BIGINT) AS n_view,
           CAST(sum(r2) AS BIGINT) AS n_click_after_view,
           CAST(sum(r3) AS BIGINT) AS n_purchase_after_click
    FROM per_user
"""

_FUNNEL_SQL = _funnel_sql("events")


@register("op_funnel", oracle=_FUNNEL_SQL, tags=("events",))
def op_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user
    counts toward a stage only if the stages happened in event order —
    the product-analytics query every event pipeline ships. Computed in
    a single pass: running saw-a-view / saw-an-ordered-click flags via
    cumulative-max windows (frame excludes the current row, (ts,
    event_id) tie-break keeps simultaneous events deterministic), then
    one per-user aggregate.

    Scale: all three windows and the final aggregate share one
    user_id partitioning — ONE shuffle of the event log total, no
    self-joins (the naive per-stage formulation joins events k times
    for a k-stage funnel). Identical SQL text runs on both engines.
    """
    return Q(spark, sf_dir, _FUNNEL_SQL)


@register(
    "win_nth_value",
    oracle="""
    SELECT DISTINCT user_id,
           nth_value(event_type, 2) OVER w AS second_type,
           nth_value(event_type, 5) OVER w AS fifth_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value with the full-partition frame — the missing sibling of
    first/last_value (§2.5): the user's 2nd and 5th events by time, NULL
    when the partition is shorter. Same frame discipline as
    `win_first_last_value`: without UNBOUNDED FOLLOWING the default
    frame stops at the current row and nth_value silently degrades.

    Scale: one user_id shuffle shared by both expressions; DISTINCT
    collapses to one row per user before anything leaves the stage."""
    return Q(spark, sf_dir, """
        SELECT DISTINCT user_id,
               nth_value(event_type, 2) OVER w AS second_type,
               nth_value(event_type, 5) OVER w AS fifth_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """)


@register(
    "win_range_interval",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_24h,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS v_trailing_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: each event's trailing-24-hour count
    and exact-decimal value sum — the sliding-by-time window `ROWS`
    frames cannot express (rows-frames slide by position; a burst of
    events compresses wall-clock into few rows and the 'last 24h'
    answer silently changes meaning). `win_range_frame` is the numeric
    sibling; this is the time-typed one every rate-limit / rolling-
    exposure query needs.

    Note the frame ties: RANGE peers (same ts) share one frame on both
    engines, so no event_id tie-break belongs in the ORDER BY — adding
    one would switch peers to singletons and change the semantics.

    Scale: one user_id shuffle; the interval frame is evaluated by the
    running window buffer, no self-join against a time-shifted copy.
    Identical SQL text on both engines.
    """
    return Q(spark, sf_dir, """
        SELECT event_id, user_id,
               CAST(count(*) OVER w AS BIGINT) AS n_trailing_24h,
               CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 AS v_trailing_24h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 DAY PRECEDING
                               AND CURRENT ROW)
    """)


@register(
    "win_count_distinct",
    oracle="""
    SELECT DISTINCT o_orderpriority AS seg,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
           count(DISTINCT o_custkey) OVER (
             PARTITION BY o_orderpriority
             ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_users
    FROM orders
    """,
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over a window — "unique customers seen
    so far per priority class, by day" — which Spark's window functions
    cannot express directly (COUNT(DISTINCT) OVER is unsupported; the
    DuckDB oracle states the intended semantics natively). The engine
    uses the first-occurrence decomposition: a user contributes to the
    cumulative count exactly on their first active day, so
    (1) per (seg, user) min(day) — one two-phase aggregate;
    (2) new-user counts per (seg, first_day) — second tiny aggregate;
    (3) running sum over the DAY-level series per seg.

    Scale: both aggregates are uniform-key two-phase shuffles over the
    fact; the only window runs on the day-level table — |segs| ×
    |calendar days| rows, bounded by the calendar, never by fact
    volume (the same bucket-level-window discipline as
    `join_asof_bucketed`). A distinct-in-window engine would instead
    carry a per-partition hash set over every fact row.
    """
    o = (T(spark, sf_dir, "orders")
         .select(F.col("o_orderpriority").alias("seg"),
                 F.to_date("o_orderdate").alias("d"),
                 "o_custkey"))
    first = (o.groupBy("seg", "o_custkey")
              .agg(F.min("d").alias("first_d")))
    new_per_day = (first.groupBy("seg", F.col("first_d").alias("d"))
                        .agg(F.count("*").alias("n_new")))
    days = o.select("seg", "d").distinct()
    w = (W.partitionBy("seg").orderBy("d")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (days.join(new_per_day, ["seg", "d"], "left")
                .withColumn("cum_users",
                            F.sum(F.coalesce("n_new", F.lit(0))).over(w)
                             .cast("long"))
                .select("seg",
                        F.date_format("d", "yyyy-MM-dd").alias("day"),
                        "cum_users"))


# ---------------------------------------------------------------------------
# win_rolling_corr — rolling correlation from integer window moments
# ---------------------------------------------------------------------------

_ROLL_CORR_SQL = """
    WITH base AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events WHERE user_id < 20),
    lagged AS (
      SELECT user_id, event_id, x,
             lag(x) OVER (PARTITION BY user_id ORDER BY event_id) AS y
      FROM base),
    m AS (
      SELECT user_id, event_id,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
             CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
             CAST(sum(y * y) OVER w AS BIGINT) AS syy
      FROM lagged WHERE y IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id, n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(floor(1000000.0 * (n * sxy - sx * sy) /
                          sqrt((1.0 * n * sxx - 1.0 * sx * sx)
                               * (1.0 * n * syy - 1.0 * sy * sy)))
                          AS BIGINT)
                ELSE NULL END AS corr_ppm
    FROM m WHERE n >= 5
    ORDER BY user_id, event_id
"""


@register("win_rolling_corr", oracle=_ROLL_CORR_SQL)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling correlation of a series against its own lag over a
    10-row frame per user — the sliding autocorrelation a monitoring
    pipeline uses to spot regime changes per entity. Same moments
    contract as `agg_corr`, applied per FRAME: every window aggregate
    (n, Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT over the frame, the
    final corr is one fixed IEEE chain floored to ppm, and degenerate
    frames (zero variance on either side) surface as NULL rather than
    a division blowup.

    Scale: one shuffle on user_id serves the lag AND all six framed
    sums (same window spec → one WindowExec); frames are O(1) state
    per row (running add/subtract). Per-key history depth is the
    scaling axis — exactly the events-replicate-10× direction the sf1
    probe exercises for the other window keys."""
    return Q(spark, sf_dir, _ROLL_CORR_SQL)


# --- weighted moving average (recency-weighted frame) -----------------------

_WMA_SQL = """
    WITH c AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value * 100) AS BIGINT) AS v
      FROM events),
    lagged AS (
      SELECT event_id, user_id, v,
             lag(v, 1) OVER w AS v1, lag(v, 2) OVER w AS v2,
             lag(v, 3) OVER w AS v3, lag(v, 4) OVER w AS v4
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id,
           CAST(floor(1.0 *
                (5 * v + coalesce(4 * v1, 0) + coalesce(3 * v2, 0)
                 + coalesce(2 * v3, 0) + coalesce(1 * v4, 0))
                / (5 + CASE WHEN v1 IS NULL THEN 0 ELSE 4 END
                     + CASE WHEN v2 IS NULL THEN 0 ELSE 3 END
                     + CASE WHEN v3 IS NULL THEN 0 ELSE 2 END
                     + CASE WHEN v4 IS NULL THEN 0 ELSE 1 END))
                AS BIGINT) AS wma_centi
    FROM lagged ORDER BY event_id
"""


@register("win_weighted_moving_avg", oracle=_WMA_SQL)
def win_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted moving average per user: weights 5..1 over the
    current row and its 4 predecessors in (ts, event_id) order — the
    smoothing kernel between the flat moving average (win_moving_avg)
    and the infinite-tail EMA (op_ema): finite memory like the former,
    recency bias like the latter.

    Determinism: values go to cents FIRST (identical double→BIGINT
    floor on both engines), the weighted sum is pure BIGINT
    arithmetic, ramp-up rows renormalize by the weights actually
    present (CASE on each lag's nullness — never a partial-frame
    average silently weighted wrong), and ONE floor divide surfaces
    the result. The window order ends in the unique event_id.

    Scale: identical SQL text on both engines; one user-keyed shuffle
    serves all four lags (same window spec → one WindowExec), O(1)
    state per row. A learned/longer kernel only widens the lag list —
    the plan shape is fixed."""
    return Q(spark, sf_dir, _WMA_SQL)


# --- user lifespan histogram ------------------------------------------------

_LIFESPAN_SPARK_SQL = """
    WITH span AS (
      SELECT user_id,
             CAST((unix_micros(max(ts)) - unix_micros(min(ts)))
                  div 86400000000 AS BIGINT) AS days
      FROM events GROUP BY user_id),
    b AS (
      SELECT CASE WHEN days <= 0 THEN 0
                  ELSE CAST(length(bin(days)) - 1 AS BIGINT) END AS bin,
             days
      FROM span)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_users,
           min(days) AS min_days, max(days) AS max_days
    FROM b GROUP BY bin ORDER BY bin
"""

_LIFESPAN_DUCK_SQL = (_LIFESPAN_SPARK_SQL
                      .replace("(unix_micros(max(ts)) - unix_micros(min(ts)))\n"
                               "                  div 86400000000",
                               "(epoch_us(max(ts)) - epoch_us(min(ts)))\n"
                               "                  // 86400000000")
                      .replace("length(bin(days))",
                               "length(format('{:b}', days))"))


@register("win_user_lifespan", oracle=_LIFESPAN_DUCK_SQL)
def win_user_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifespan histogram: days between each user's first and
    last activity, in power-of-two bins — the engagement-depth
    distribution (a spike at bin 0 is drive-by users; mass in high
    bins is a retained base; the shape moves before the WAU number
    does).

    Determinism: exact-microsecond span with integer floor division
    to days (the epoch_us idiom — DuckDB's epoch() rounds), then the
    binary-string-length log2 bins; exact counts.

    Scale: one two-phase min/max aggregate to user grain, a map-side
    bin projection, a ≤63-cell rollup. Twins differ in the epoch and
    binary-format spellings."""
    return Q(spark, sf_dir, _LIFESPAN_SPARK_SQL)


# ---------------------------------------------------------------------------
# op_session_duration_histogram — session-length distribution
# ---------------------------------------------------------------------------

def _sess_hist_sql(us_expr: str, div_expr: str, bin_expr: str) -> str:
    return f"""
    WITH gaps AS (
      SELECT user_id, ts, event_id, {us_expr} AS us,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_no,
             us
      FROM gaps),
    per AS (
      SELECT user_id, session_no,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(us) - min(us) AS BIGINT) AS dur_us
      FROM sess GROUP BY user_id, session_no),
    b AS (
      SELECT n_events, CAST({div_expr} AS BIGINT) AS dur_s,
             CASE WHEN {div_expr} <= 0 THEN -1
                  ELSE CAST({bin_expr} AS BIGINT) END AS bin
      FROM per)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           min(dur_s) AS min_dur_s, max(dur_s) AS max_dur_s
    FROM b GROUP BY bin ORDER BY bin
"""


_SESS_HIST_SPARK_SQL = _sess_hist_sql(
    "unix_micros(ts)", "dur_us div 1000000",
    "length(bin(CAST(dur_us div 1000000 AS BIGINT))) - 1")
_SESS_HIST_DUCK_SQL = _sess_hist_sql(
    "epoch_us(ts)", "dur_us // 1000000",
    "length(format('{:b}', CAST(dur_us // 1000000 AS BIGINT))) - 1")


@register("op_session_duration_histogram", oracle=_SESS_HIST_DUCK_SQL,
          tags=("events",))
def op_session_duration_histogram(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Session-length distribution: `win_sessionize`'s gaps-and-islands
    sessions rolled to a power-of-two duration histogram (bin −1 =
    single-event / sub-second sessions) with event mass per bin — the
    engagement-shape read (a healthy product shows a log-normal body;
    a fat bin −1 is bounce traffic; an extreme right tail is bots or
    left-open tabs; `op_gap_histogram` reads the gaps WITHIN sessions,
    this reads the islands).

    Determinism: the same total-order session assignment as
    `win_sessionize` (identical SQL shape), integer microsecond
    durations, ⌊log2⌋ via binary-string length.

    Scale: ONE user-keyed shuffle serves the gap window AND the
    running session number (same spec), the per-session rollup
    rehashes key-grain (user, session) rows, and the histogram is a
    ≤64-bin two-phase aggregate. Twins differ in epoch / division /
    binary spellings."""
    return Q(spark, sf_dir, _SESS_HIST_SPARK_SQL)
