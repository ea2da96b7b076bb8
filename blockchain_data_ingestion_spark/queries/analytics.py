"""Cross-entity analytics operators — graph, time-series, entity
resolution, anomaly detection.

The reference ingests an interaction ledger (blocks/transactions,
``evm_producer.rs:58-69``) whose declared purpose is "further analysis"
(reference README.md:5,30); these are the four analysis families a
ledger-shaped dataset invariably gets asked for next: who-trades-with-whom
graph structure, per-entity activity over a regular time grid, fuzzy
entity matching, and statistical outlier flagging.

Scale discipline shared by all four:
- graph degree: the edge list is a two-phase aggregate over the fact
  (one shuffle on (src, dst)), degrees a second two-phase aggregate on
  dst — never an adjacency matrix, never a driver-side graph.
- resample: the time grid is generated *executor-side* per entity with
  ``sequence``/``explode`` — metadata-sized span rows fan out to grid
  rows inside the task, so the dense grid never crosses the network
  unaggregated.
- entity matching: classic blocking — candidates only within a block
  key, with a hard block-size cap enforced in *code* (the round-3
  lesson: a cap promised in prose is not a cap), so one degenerate
  block cannot go quadratic.
- anomaly z-score: group stats are an exact-decimal two-phase
  aggregate; the per-row z rides a broadcast of the (tiny) stats table
  back over one fact scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window

from ..caching import scoped_persist, scoped_register, shared_persist
from ..catalog import query_sql as Q
from ..operators import bounded_window, distributed_ntile
from ..catalog import table
from . import register

# --- 0. shared graph edge-builders (r13, VERDICT r12 item 2) ----------------
#
# Four graph keys (`op_label_propagation`, `op_trade_components`,
# `op_kcore`, `op_triangle_count`) each rebuilt their co-purchase base
# from the full lineitem scan — 81% of LPA's sf10 cost, paid FOUR times
# per session. The two bases below are built once per (session, sf_dir)
# via `caching.shared_persist` and read by every consumer:
#
# - `_shared_pairs_hi`: the high-value supplier pair table (qty ≥ 48,
#   ≥ 2 shared orders) — consumed IDENTICALLY by LPA and
#   trade-components (their edge predicates were already equal).
#   Supplier²-bounded (8,774 rows at sf10) — KBs of cache.
# - `_shared_osup`: distinct (orderkey, suppkey), hash-partitioned by
#   orderkey — the base both triangle (pair self-join on ok) and kcore
#   (orders join on ok) start from; the persisted partitioning makes
#   both consumers' ok-joins exchange-free on the cached side.
#
# At cluster scale the same move is a bucketed warehouse table
# (`join_bucketed` discipline: bucketBy(ok) at ingest, every family
# member joins bucket-local); MEMORY_AND_DISK persist is the
# single-node analog. Per-key-isolation tools (parity_sweep, fuzz)
# clearCache between keys, so their per-key timings stay honest — the
# amortization shows up in multi-key sessions (bench, driver rotation,
# real analysis sessions), measured in SCALE.md r13.


def _shared_pairs_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed high-value co-purchase pairs (u < v): suppliers sharing
    ≥ 2 distinct orders through lineitems with l_quantity ≥ 48."""
    def build() -> DataFrame:
        osup = (table(spark, sf_dir, "lineitem")
                .filter("l_quantity >= 48")
                .select(F.col("l_orderkey").alias("ok"),
                        F.col("l_suppkey").alias("s"))
                .distinct())
        return (osup.join(osup.select("ok", F.col("s").alias("s2")), "ok")
                .filter("s < s2")
                .groupBy(F.col("s").alias("u"), F.col("s2").alias("v"))
                .agg(F.count("*").alias("n"))
                .filter("n >= 2").select("u", "v"))
    return shared_persist(sf_dir, "pairs_hi_q48_n2", build)


def _shared_osup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (orderkey, suppkey) over the whole fact, partitioned by
    orderkey so downstream ok-joins reuse the cache's partitioning."""
    def build() -> DataFrame:
        return (table(spark, sf_dir, "lineitem")
                .select(F.col("l_orderkey").alias("ok"),
                        F.col("l_suppkey").alias("s"))
                .distinct()
                .repartition("ok"))
    return shared_persist(sf_dir, "osup_all_by_ok", build)


# --- 1. trade-graph degree -------------------------------------------------

_GRAPH_DEGREE_SQL = """
    WITH edges AS (
      SELECT o_custkey AS src, l_suppkey AS dst,
             sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey, l_suppkey
    )
    SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_degree,
           CAST(sum(w) AS DOUBLE) AS total_weight
    FROM edges GROUP BY dst
    ORDER BY in_degree DESC, total_weight DESC, node
    LIMIT 100
"""


@register("op_graph_degree", oracle=_GRAPH_DEGREE_SQL, tags=("graph",))
def op_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interaction-graph hubs: weighted in-degree of the customer →
    supplier trade graph (the address-interaction question every ledger
    analysis starts with — reference README.md:30 "further analysis").
    Edges are distinct (custkey, suppkey) pairs weighted by exact-decimal
    revenue; output is the top-100 hub nodes by distinct-counterparty
    degree.

    Scale: lineitem ⋈ orders is a sort-merge join on the uniform
    orderkey (hinted — stats-free Catalyst would broadcast the orders
    fact; r15 probed the SHUFFLE_HASH alternative per guide §3.1 and
    REVERTED it on measurement: flat-to-slightly-faster at sf0.1 but
    consistently ~25 % SLOWER at sf1 across two interleaved A/B
    windows — medians 1.46/1.64 s SMJ vs 1.87/2.12 s SHJ — so the
    data-dominated tier keeps the spill-safe sort-merge), the edge
    aggregate shuffles once on (src, dst), the degree aggregate once
    on dst, and the top-100 is TakeOrderedAndProject — no driver-side
    graph object at any point, so the plan is identical at 10^11
    edges.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").hint("merge")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("src"),
                 F.col("l_suppkey").alias("dst"))
        .agg(F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")).alias("w"))
    )
    return (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(F.count("*").cast("bigint").alias("in_degree"),
             F.sum("w").cast("double").alias("total_weight"))
        .orderBy(F.desc("in_degree"), F.desc("total_weight"), "node")
        .limit(100)
    )


# --- 1b. PageRank over the trade graph (fixed-iteration, integer-ppm) ------

_PAGERANK_ITERS = 5

_PAGERANK_SQL = f"""
    WITH RECURSIVE
    edges0 AS (
      SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (
      SELECT src, dst FROM edges0
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges0),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, d.d FROM edges e JOIN deg d USING (src)),
    pr(iter, node, r) AS (
      SELECT 0, src AS node, CAST(1000000 AS BIGINT) AS r FROM deg
      UNION ALL
      SELECT pr.iter + 1, ed.dst AS node,
             CAST(150000 + (85 * sum(pr.r // ed.d)) // 100 AS BIGINT) AS r
      FROM pr JOIN ed ON pr.node = ed.src
      WHERE pr.iter < {_PAGERANK_ITERS}
      GROUP BY pr.iter, ed.dst)
    SELECT node, r AS rank_ppm
    FROM pr WHERE iter = {_PAGERANK_ITERS}
    ORDER BY rank_ppm DESC, node LIMIT 100
"""


@register("op_pagerank", oracle=_PAGERANK_SQL, tags=("graph", "scale"))
def op_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the undirected customer↔supplier
    trade graph — the who-actually-matters centrality question a
    ledger graph gets after degree (reference README.md:30 "further
    analysis"): degree counts counterparties, PageRank weights them by
    THEIR importance. 5 synchronous iterations of
    ``r' = 0.15·10^6 + 0.85 · Σ_in (r_u div deg_u)``, top-100 nodes.

    Determinism: ranks are BIGINT ppm end-to-end — per-neighbor
    contributions use integer division (Spark ``div`` ≡ DuckDB ``//``
    on positives) and the damping factor is the integer form
    ``(85·Σ) div 100``, so every iteration is an order-independent
    integer sum and both engines produce bit-identical ranks (the
    oracle is a depth-5 recursive CTE). Overflow headroom: total rank
    mass ≤ |V|·10^6, one hub at 10^9 nodes worst-cases at
    85·10^15 ≪ 2^63.

    Scale: the classic BSP loop, expressed as 5 chained DataFrame
    stages Catalyst pipelines into one lazy plan. The edge+degree
    table is persisted (computed once, InMemoryRelation dedups the 5
    references; at cluster scale, pre-partition it by ``src`` so every
    iteration's rank join co-locates without re-shuffling the edges).
    Per iteration the only moving data is |V| rank rows into the edge
    partitions and the map-side-combined Σ back out on ``dst`` —
    never an adjacency matrix, never a driver-side graph. Undirected
    doubling means every node has in-edges, so no dangling-mass
    left-join is needed."""
    li = table(spark, sf_dir, "lineitem")
    # sort-merge (r15: the shuffled-hash variant measured ~25% slower
    # at sf1 on op_graph_degree's identical join shape and was reverted)
    orders = table(spark, sf_dir, "orders").hint("merge")
    e0 = (li.join(orders, li.l_orderkey == orders.o_orderkey)
          .select((2 * F.col("o_custkey")).cast("long").alias("src"),
                  (2 * F.col("l_suppkey") + 1).cast("long").alias("dst"))
          .distinct())
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ed = scoped_persist(edges.join(deg, "src"))
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(1000000).cast("long").alias("r"))
    for _ in range(_PAGERANK_ITERS):
        contrib = (ed.join(ranks, ed.src == ranks.node)
                   .select("dst", F.expr("r div d").alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("s")))
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(150000) + F.expr("(85 * s) div 100"))
            .cast("long").alias("r"))
    return (ranks.select("node", F.col("r").alias("rank_ppm"))
            .orderBy(F.desc("rank_ppm"), "node").limit(100))


# --- 1c. triangle counting (degree-oriented) --------------------------------

# Oracle-only text (the engine is the DataFrame plan below). r13,
# VERDICT r12 item 3: this twin was skipped above sf0.1 since r8 at
# ">590 s at sf1" — the cost was never the wedge algebra (it has been
# degree-oriented all along) but DuckDB RE-INLINING multiply-referenced
# CTEs (the kcore lesson): `e`/`oe`/`tri` are each referenced 3×, so
# the whole upstream pipeline re-executed per reference, compounding.
# MATERIALIZED pins each stage to one execution; measured at sf1 the
# oracle drops >590 s → 36.8 s (inside the sweep's 120 s budget) and
# the standing parity_sweep SKIP is gone.
_TRIANGLE_SQL = """
    WITH osup AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
    e AS MATERIALIZED (
      SELECT a.s AS u, b.s AS v
      FROM osup a JOIN osup b ON a.ok = b.ok AND a.s < b.s
      GROUP BY a.s, b.s HAVING count(*) >= 5),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e) t
      GROUP BY node),
    oe AS MATERIALIZED (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN dv.d ELSE du.d END AS dstd
      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
    w AS (
      SELECT p1.src AS a, p1.dst AS b, p2.dst AS c
      FROM oe p1 JOIN oe p2 ON p1.src = p2.src
       AND (p1.dstd < p2.dstd
            OR (p1.dstd = p2.dstd AND p1.dst < p2.dst))),
    tri AS MATERIALIZED (
      SELECT a, b, c FROM w JOIN oe ON w.b = oe.src AND w.c = oe.dst),
    cnt AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri) t
      GROUP BY node)
    SELECT node, n_triangles FROM cnt
    ORDER BY n_triangles DESC, node LIMIT 100
"""


@register("op_triangle_count", oracle=_TRIANGLE_SQL,
          tags=("graph", "scale"))
def op_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the supplier co-purchase graph
    (suppliers co-occurring in ≥5 distinct orders) — the clustering /
    community-density primitive (wash-trade rings and collusive
    clusters show up as triangle-dense subgraphs in a ledger graph).
    Top-100 suppliers by triangle participation.

    Algorithm: the classic degree-oriented enumeration. Every edge is
    oriented from its lower-(degree, id) endpoint to the higher one —
    the (d, node) order is compared LEXICOGRAPHICALLY as an explicit
    two-term predicate, never packed into one ``d·2^32 + node``
    BIGINT (the r8 packing silently aliased the total order once ids
    reach 2^32 or a degree exceeds 2^31 — exactly the regime the
    100 TB claim is about); wedges enumerate ordered out-neighbor
    pairs per node, and a wedge closes into a triangle iff the
    oriented edge (b, c) exists — each triangle found exactly once.

    Scale: orientation is THE triangle-counting scale lever — oriented
    out-degree is O(√m) on any graph, so wedge count is O(m^1.5)
    instead of Σ deg² (which a hub node makes quadratic). The
    fixed-support edge filter (≥5 co-orders) is the other: it's the
    same A-Priori-style projection prune as `op_market_basket`, and
    under growing data a FIXED support keeps the projection graph
    sparse (measured here: sf0.01 is the complete K₁₀₀, sf0.1 is 9.5%
    dense, sf1 sparser still). Shuffles: per-order pairs (baskets
    small ⇒ corpus-linear), edge aggregate on (u, v), wedge self-join
    on src, closure join on (b, c) — all uniform keys, no driver-side
    graph.

    r14 execution fixes (measured at sf10 — phase splits in SCALE.md;
    the fixture there is DENSE: 453k edges close into 124.5M
    triangles, so every redundant pass over the wedge/triangle stream
    was the dominant cost):
    - ``oe`` is eagerly persisted (|E| rows — tiny): it is referenced
      three times (both wedge sides + the closure probe), and without
      the pin each reference re-derived the co-purchase aggregate
      from the 60M-row fact;
    - the closure side is explicitly broadcast when |E| is
      broadcast-sized (the count from materialization gates it — at
      hub-free |E| ≫ 5M AQE's SMJ takes over), so the 135M-row wedge
      stream is probed map-side instead of shuffled on (b, c);
    - per-node counts come from ONE pass over the triangle stream
      (``explode(array(a, b, c))`` → map-side-combined count) instead
      of a 3-branch union that re-executed the closure join per
      branch. sf10 cold: 315.6 s → measured post-fix in SCALE.md."""
    osup = _shared_osup(spark, sf_dir)   # build-once (ok, s) base, r13
    a, b = osup.alias("a"), osup.alias("b")
    e = (a.join(b, (F.col("a.ok") == F.col("b.ok"))
                & (F.col("a.s") < F.col("b.s")))
         .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
         .agg(F.count("*").alias("c")).filter("c >= 5").drop("c"))
    deg = (e.select(F.col("u").alias("node"))
           .unionByName(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # lexicographic (degree, id) orientation — exact at any id/degree
    # width, unlike a packed d·2^32+node BIGINT (r8 ADVICE)
    u_first = (F.col("du") < F.col("dv")) | \
              ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oe = (e.join(du, "u").join(dv, "v")
          .select(F.when(u_first, F.col("u"))
                  .otherwise(F.col("v")).alias("src"),
                  F.when(u_first, F.col("v"))
                  .otherwise(F.col("u")).alias("dst"),
                  F.when(u_first, F.col("dv"))
                  .otherwise(F.col("du")).alias("dstd")))
    # |E| rows (453k at sf10) read three times below — pin it so the
    # fact-side derivation runs once; the count doubles as the
    # broadcast size gate for the closure probe
    oe = scoped_persist(oe)
    n_edges = oe.count()
    p1 = oe.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                   F.col("dstd").alias("bd"))
    p2 = oe.select(F.col("src").alias("a"), F.col("dst").alias("c"),
                   F.col("dstd").alias("cd"))
    w = (p1.join(p2, "a")
         .filter((F.col("bd") < F.col("cd"))
                 | ((F.col("bd") == F.col("cd"))
                    & (F.col("b") < F.col("c"))))
         .select("a", "b", "c"))
    closing = oe.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    # Map-side probe of the wedge stream — never shuffle 135M wedges on
    # (b, c) when the edge list fits an executor. Gated on ESTIMATED
    # BYTES, not a raw row ceiling (ADVICE r14: the old 5M-row cap was
    # ~10× past anything measured): 64 B/row budgets two BIGINTs plus
    # HashedRelation key+pointer overhead, so the 128 MB cap admits
    # ≤2M edges — the measured-safe bound is 453k rows ≈ 29 MB under
    # this estimate (sf10, 79 s cold, SCALE.md r14). Past the cap
    # AQE's sort-merge takes over on the (b, c) shuffle.
    if n_edges * 64 <= 128 * 1024 * 1024:
        closing = F.broadcast(closing)
    tri = w.join(closing, ["b", "c"])
    # one pass over the triangle stream; the 3-branch union form
    # re-executed the closure join once per branch
    return (tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
            .groupBy("node").agg(F.count("*").cast("long")
                                 .alias("n_triangles"))
            .orderBy(F.desc("n_triangles"), "node").limit(100))


# --- 2. time-series gap-fill / resample ------------------------------------

_RESAMPLE_ORACLE = """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS s
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily
      GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    )
    SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
           CAST(coalesce(n, 0) AS BIGINT) AS n_events,
           CAST(coalesce(s, CAST(0 AS DECIMAL(18,6))) AS DOUBLE)
             AS day_value,
           CAST(sum(coalesce(s, CAST(0 AS DECIMAL(18,6))))
                  OVER (PARTITION BY g.user_id ORDER BY g.day)
                AS DOUBLE) AS cum_value
    FROM grid g LEFT JOIN daily d
      ON g.user_id = d.user_id AND g.day = d.day
    ORDER BY g.user_id, g.day
"""


@register("op_timeseries_resample", oracle=_RESAMPLE_ORACLE,
          tags=("events",))
def op_timeseries_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an event stream onto a dense per-entity daily grid:
    days with no events appear with zero counts, and the running
    (cumulative) value carries forward across the gaps — the
    gap-fill + forward-fill resample every per-address balance or
    activity chart needs.

    Scale: the daily aggregate is one shuffle on (user_id, day) with
    map-side combine; the per-user span is an aggregate over that
    (already small) output; the dense grid is ``sequence``/``explode``
    executor-side — each metadata-sized span row fans out to its grid
    rows inside the task, so the grid itself never shuffles. The final
    left join and the cumulative window share the (user_id, day)
    clustering. Sums are exact DECIMAL(18,6) surfaced as doubles.
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id",
                   F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("n"),
             F.sum(F.col("value").cast("decimal(18,6)")).alias("s"))
    )
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"),
                                        F.max("day").alias("d1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day")))
        .alias("day"))
    zero = F.lit(0).cast("decimal(18,6)")
    filled = (
        grid.join(daily, ["user_id", "day"], "left")
        .select("user_id", "day",
                F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
                F.coalesce("s", zero).alias("s"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        filled.select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.col("s").cast("double").alias("day_value"),
            F.sum("s").over(w).cast("double").alias("cum_value"))
        .orderBy("user_id", "day")
    )


# --- 3. blocked fuzzy entity matching --------------------------------------

_ENTITY_MATCH_SQL = """
    WITH p AS (
      SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS blk
      FROM part
    ),
    ok_blk AS (
      SELECT blk FROM p GROUP BY blk HAVING count(*) <= 1000
    ),
    capped AS (
      SELECT p.* FROM p JOIN ok_blk ON p.blk = ok_blk.blk
    )
    SELECT a.p_partkey AS part_id,
           CAST(count(*) AS BIGINT) AS n_near,
           CAST(min(levenshtein(a.p_name, b.p_name)) AS BIGINT)
             AS min_dist
    FROM capped a JOIN capped b
      ON a.blk = b.blk AND a.p_partkey <> b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    GROUP BY a.p_partkey
    ORDER BY part_id
"""


@register("op_entity_block_match", oracle=_ENTITY_MATCH_SQL,
          tags=("dedup",))
def op_entity_block_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching: for each part, how many
    near-identical names exist (edit distance ≤ 3) and how close the
    nearest is — the classic entity-resolution shape (block on a cheap
    key, verify expensively only within the block) applied to the part
    catalog.

    Scale: candidate pairs exist only within a block (the name's noun
    token), and blocks with more than 1000 members are excluded by a
    pre-join frequency cap — enforced in the query text on BOTH
    engines, not promised in prose — so the self-join's worst bucket is
    bounded at 10^6 comparisons regardless of corpus size. The
    verify predicate (levenshtein) runs JVM-side in codegen, never in
    Python. Identical SQL text on both engines.
    """
    return Q(spark, sf_dir, _ENTITY_MATCH_SQL)


# --- 4. statistical anomaly flagging ---------------------------------------

_ZSCORE_SQL = """
    WITH stats AS (
      SELECT event_type,
             count(value) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT /*+ BROADCAST(stats) */ event_id, e.event_type, user_id,
           CAST(value AS DOUBLE) AS value,
           CAST(floor(1000000.0 * (value - s / n)
                      / sqrt((s2 - s * s / n) / (n - 1)))
                AS BIGINT) AS z_ppm
    FROM events e JOIN stats ON e.event_type = stats.event_type
    WHERE n > 1 AND s2 * n > s * s
      AND abs((value - s / n) / sqrt((s2 - s * s / n) / (n - 1))) > 2.5
    ORDER BY event_id
"""


# DuckDB twin: same algebra with the square's operands widened to
# DECIMAL(19,6) — (19,6)·(19,6) lands exactly at precision 38, hopping
# DuckDB onto its int128 path. DuckDB's DECIMAL(18) is int64-backed,
# so the SHARED (18,6) square overflowed PHYSICALLY at |value| = 1e5
# (scale-6 units 1e11, squared 1e22 > 2^63) while Spark's Decimal128
# (18,6)² → (37,12) was exact all along (r12 shape-fuzz, probed: both
# routes produce the identical exact decimal and identical double).
_ZSCORE_DUCK_SQL = _ZSCORE_SQL.replace(
    "CAST(value AS DECIMAL(18,6))\n                      "
    "* CAST(value AS DECIMAL(18,6))",
    "CAST(value AS DECIMAL(19,6))\n                      "
    "* CAST(value AS DECIMAL(19,6))")
assert "DECIMAL(19,6)" in _ZSCORE_DUCK_SQL  # replace() must have hit


@register("op_anomaly_zscore", oracle=_ZSCORE_DUCK_SQL, tags=("events",))
def op_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 2.5): the monitoring
    query that flags anomalous transaction values against their
    category's distribution.

    Scale: the per-type moments are ONE exact-decimal two-phase
    aggregate (count / Σx / Σx² — variance from exact sums, no
    two-pass mean-then-deviation scan); the handful of stat rows
    broadcast back over a single fact scan, so the whole operator is
    one shuffle of group-count size plus one scan. z is surfaced as
    integer ppm so both engines hash identically (floor of an
    IEEE-deterministic double). The n > 1 / positive-variance guard
    keeps the kernel total: a single-row or constant group otherwise
    yields 0/0 = NaN, which BOTH engines order greater than any
    number — the row would leak through the threshold with an
    unportable NaN cast.
    """
    return Q(spark, sf_dir, _ZSCORE_SQL)


# --- 5. slowly-changing-dimension (type 2) history --------------------------

_SCD2_ORACLE = """
    WITH marked AS (
      SELECT user_id, event_type AS state, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_change
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    opens AS (
      SELECT user_id, state, ts, event_id FROM marked WHERE is_change = 1
    )
    SELECT user_id, state,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(lead(ts) OVER w) AS BIGINT) AS valid_to_us,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END
             AS is_current
    FROM opens
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from_us
"""


@register("op_scd2_history", oracle=_SCD2_ORACLE, tags=("events",))
def op_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) state history: collapse the
    event stream into per-user validity intervals — one row per state
    *change*, with [valid_from, valid_to) bounds and an is_current
    flag. The reference mutates current state in Postgres
    (evm_consumer.rs UPSERT); this is the analytic twin that keeps the
    full history instead.

    Scale: the change detection (lag), interval close (lead) and final
    clustering all share ONE user_id shuffle; runs of unchanged state
    collapse before the second window, so the history table is
    |changes|, not |events|. Interval bounds surface as epoch
    microseconds (BIGINT) — engine- and timezone-stable.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id",
        F.when(~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
               1).otherwise(0).alias("is_change"))
    opens = marked.filter(F.col("is_change") == 1)
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        opens.select(
            "user_id", "state",
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(F.lead("ts").over(w2)).alias("valid_to_us"),
            F.when(F.lead("ts").over(w2).isNull(), 1).otherwise(0)
            .alias("is_current"))
        .orderBy("user_id", "valid_from_us")
    )


# --- 6. interval overlap join (bin, then verify) ----------------------------

_INTERVAL_OVERLAP_SQL = """
    WITH user_spans AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             min(ts) AS u_from, max(ts) AS u_to
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    type_spans AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             min(ts) AS t_from, max(ts) AS t_to
      FROM events WHERE event_type IN ('purchase', 'error')
      GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_overlap_days
    FROM user_spans u JOIN type_spans t
      ON u.day = t.day
     AND u.u_from <= t.t_to AND t.t_from <= u.u_to
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
"""


@register("join_interval_overlap", oracle=_INTERVAL_OVERLAP_SQL,
          tags=("events",))
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join — the operator Spark (and SQL) lacks
    natively: which user activity spans overlapped which event-type
    activity spans in time. Naively this is a θ-join (from_a <= to_b
    AND from_b <= to_a) that plans as a nested-loop over the cross
    product; the scale-correct shape implemented here is **bin, then
    verify**: both interval sets are bucketed to calendar days, the
    join is an equi-join on the day bucket, and the overlap predicate
    runs only inside each bucket as a residual condition.

    Scale: both span tables are two-phase aggregates of one fact scan
    each; the bucket equi-join hashes on the uniform day key (an
    interval crossing k buckets appears k times — replicate-by-bucket
    is the standard trade for hash-joinability); the final aggregate
    reuses the join's clustering. No nested loop anywhere — pinned by
    the global degenerate-shapes test.
    """
    return Q(spark, sf_dir, _INTERVAL_OVERLAP_SQL)


# --- 7. Markov transition matrix over the event stream ----------------------

_MARKOV_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           CAST(floor(1000000.0 * n
                      / sum(n) OVER (PARTITION BY prev_type))
                AS BIGINT) AS p_ppm
    FROM trans
    ORDER BY prev_type, next_type
"""


@register("op_markov_transitions", oracle=_MARKOV_SQL, tags=("events",))
def op_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each (prev_type → next_type) pair, the transition count and its
    row-normalized probability in integer ppm — the sequence-mining
    summary behind "what do users do after X" questions.

    Scale: consecutive pairs come from ONE lag window (one user_id
    shuffle of the fact); the transition aggregate reduces to
    |types|² rows before the tiny normalization window, so the
    per-prev_type sum runs on a k²-row table, not the fact. The ppm
    floor keeps the probability integer-stable across engines.
    Identical SQL text on both engines.
    """
    return Q(spark, sf_dir, _MARKOV_SQL)


# --- 8. RFM customer segmentation -------------------------------------------

_RFM_SQL = """
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS freq,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey,
             ntile(4) OVER (ORDER BY last_order, custkey) AS r_score,
             ntile(4) OVER (ORDER BY freq, custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary, custkey) AS m_score,
             monetary
      FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary) AS DOUBLE) AS total_monetary
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
"""


@register("op_rfm_segments", oracle=_RFM_SQL)
def op_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation:
    quartile scores on each dimension, aggregated to the 4×4×4 segment
    grid with customer counts and exact-decimal revenue totals — the
    canonical warehouse segmentation query.

    Scale: per-customer metrics are one two-phase aggregate over
    orders (the only fact-sized work). A naive SQL formulation (the
    oracle's) puts each unpartitioned ntile window on a single task —
    the Spark side instead scores every dimension with
    ``operators.distributed_ntile`` (range-partitioned sort +
    two-level partition-offset rank, bit-identical to the built-in on
    strict total orders — property-pinned), so no stage ever holds
    more than one range partition of customers. The (custkey)
    tie-break makes every quartile boundary deterministic on both
    engines. Segment rollup is a 64-group aggregate.
    """
    orders = table(spark, sf_dir, "orders")
    per_cust = (orders.groupBy(F.col("o_custkey").alias("custkey"))
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count("*").alias("freq"),
                     F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                     .alias("monetary")))
    scored = distributed_ntile(per_cust, ["last_order", "custkey"], 4,
                               "r_score")
    scored = distributed_ntile(scored, ["freq", "custkey"], 4, "f_score")
    scored = distributed_ntile(scored, ["monetary", "custkey"], 4,
                               "m_score")
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count("*").cast("bigint").alias("n_customers"),
                 F.sum("monetary").cast("double").alias("total_monetary"))
            .orderBy("r_score", "f_score", "m_score"))


# --- 7. forward fill over a per-entity daily grid --------------------------

@register(
    "op_forward_fill",
    oracle="""
    WITH daily AS (
      -- struct-wrapped arg_max: a day whose CLOSING event carries a
      -- NULL value must close NULL (no observation → the fill window
      -- carries the previous day), exactly like Spark's null-sensitive
      -- max_by. Bare arg_max(value, event_id) SKIPS null values and
      -- would close on an earlier same-day event instead (probed;
      -- r12 null-seed fuzz find).
      SELECT user_id, CAST(ts AS DATE) AS d,
             (arg_max({'v': value}, event_id)).v AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    span AS (SELECT user_id, min(d) AS d0, max(d) AS d1
             FROM daily GROUP BY user_id),
    grid AS (SELECT user_id,
                    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                         AS DATE) AS d
             FROM span),
    j AS (SELECT g.user_id, g.d, daily.v
          FROM grid g LEFT JOIN daily
            ON g.user_id = daily.user_id AND g.d = daily.d)
    SELECT user_id, CAST(d AS VARCHAR) AS day,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
    FROM j
    """,
)
def op_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward) over a dense
    per-user daily grid: days with no events inherit the previous
    day's closing value — the gap-free series every downstream
    time-series model expects. "Closing value" is defined as the value
    of the day's highest event_id, NULL-SENSITIVELY: a closing event
    with a NULL value closes the day NULL, which then inherits through
    the fill — Spark's max_by semantics, spelled in the oracle as a
    struct-wrapped arg_max because DuckDB's bare arg_max skips null
    values (event_id is unique, so no tie ambiguity either way). The
    carried double is MOVED, never recomputed, so bits match without
    rounding.

    Scale (same grid discipline as `op_timeseries_resample`): the
    daily closing table is a two-phase aggregate (one fact shuffle);
    the dense grid is generated EXECUTOR-side by exploding
    ``sequence(d0, d1)`` over metadata-sized per-user span rows; the
    fill window partitions by user over day-level rows — bounded by
    |users| × calendar, not event volume. No step touches the driver.
    """
    e = (table(spark, sf_dir, "events")
         .select("user_id", F.to_date("ts").alias("d"),
                 "event_id", "value"))
    daily = (e.groupBy("user_id", "d")
              .agg(F.max_by("value", "event_id").alias("v")))
    span = (daily.groupBy("user_id")
                 .agg(F.min("d").alias("d0"), F.max("d").alias("d1")))
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d"))
    w = (Window.partitionBy("user_id").orderBy("d")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(daily, ["user_id", "d"], "left")
                .withColumn("v_fill", F.last("v", ignorenulls=True).over(w))
                .select("user_id",
                        F.date_format("d", "yyyy-MM-dd").alias("day"),
                        "v_fill"))


# --- 8. Pareto frontier (2-D skyline) --------------------------------------

_SKYLINE_SQL = """
    WITH pts AS (
      SELECT l_orderkey, l_linenumber, l_returnflag AS grp,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(floor(l_quantity) AS BIGINT) AS qty
      FROM lineitem WHERE l_orderkey < 30000),
    w AS (
      SELECT *,
             max(qty) OVER (PARTITION BY grp ORDER BY price_c
                            RANGE BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS best_qty_cheaper,
             max(qty) OVER (PARTITION BY grp, price_c) AS best_qty_same
      FROM pts)
    SELECT grp, l_orderkey, l_linenumber, price_c, qty
    FROM w
    WHERE (best_qty_cheaper IS NULL OR best_qty_cheaper < qty)
      AND qty = best_qty_same
    ORDER BY grp, price_c, qty, l_orderkey, l_linenumber
"""


@register("op_skyline_2d", oracle=_SKYLINE_SQL)
def op_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): per return-flag class, the line
    items no other item beats on BOTH axes (strictly cheaper with at
    least equal quantity, or equal price with strictly more quantity).
    The naive formulation is a NOT EXISTS self-θ-join — O(n²) and a
    BroadcastNestedLoopJoin in Spark; the sort-based identity replaces
    it with two windows: a point survives iff its quantity beats the
    best quantity at any strictly lower price (integer RANGE frame to
    1 PRECEDING — exact cents, no float frame bounds) and ties the
    best at its own price (non-strict ties both survive: neither
    dominates). Equivalent by the classic sweep-line argument; all
    comparisons integer, identical SQL text on both engines.

    Scale: one shuffle on the group key, one partition-local sort
    shared by both window specs — the same O(n log n) a single-node
    skyline needs, distributed by group. A hot group degrades to one
    sorted task, the `join_asof_bucketed` bucketing move applies if a
    group alone outgrows a partition (frontier-merge across price
    buckets: each bucket's frontier is computable locally, then the
    carried max-qty from cheaper buckets filters it).
    """
    return Q(spark, sf_dir, _SKYLINE_SQL)


# --- 9. deterministic fixed-k per-group sample -----------------------------

@register(
    "op_group_sample_k",
    oracle="""
    WITH h AS (
      SELECT o_orderpriority AS grp, o_orderkey,
             CAST(((o_orderkey % 1000003) * 2654435761) % 4294967311 AS BIGINT) AS hk
      FROM orders),
    r AS (SELECT grp, o_orderkey,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY hk, o_orderkey) AS rn
          FROM h)
    SELECT grp, o_orderkey FROM r WHERE rn <= 20
    ORDER BY grp, o_orderkey
    """,
)
def op_group_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k-per-group sample: exactly 20 orders per
    priority class, chosen by ranking a keyed multiplicative hash —
    the reservoir-sampling contract (every element equally likely under
    the hash) with none of the nondeterminism (`rand()` re-rolls per
    retry/re-execution; a hash of the key is stable across runs, engines, and
    stragglers — the only sample you can re-derive for debugging).
    Balanced eval-set construction in one query.

    The hash is Knuth's multiplicative scheme over the key modulo the
    first prime above 2^32 — plain integer ops both engines evaluate
    identically (Spark's `hash()` and DuckDB's `hash()` are different
    algorithms, so neither appears in anything hashed cross-engine).

    Scale: one shuffle on the group key, per-group local sort, early
    rank cutoff (WindowGroupLimit pushes rn<=k below the sort at
    Spark 3.5+); for k·|groups| ≪ rows the winning alternative is
    `operators.topk_per_group`'s bucket-histogram prune, same contract.
    """
    return Q(spark, sf_dir, """
        WITH h AS (
          SELECT o_orderpriority AS grp, o_orderkey,
                 CAST(((o_orderkey % 1000003) * 2654435761) % 4294967311 AS BIGINT)
                   AS hk
          FROM orders),
        r AS (SELECT grp, o_orderkey,
                     row_number() OVER (PARTITION BY grp
                                        ORDER BY hk, o_orderkey) AS rn
              FROM h)
        SELECT grp, o_orderkey FROM r WHERE rn <= 20
        ORDER BY grp, o_orderkey
    """)


# --- 10. event-path trigram mining -----------------------------------------

_PATH_TRIGRAM_SQL = """
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (SELECT event_type AS t1, t2, t3 FROM s
            WHERE t2 IS NOT NULL AND t3 IS NOT NULL)
    SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_paths
    FROM tri GROUP BY t1, t2, t3
    ORDER BY n_paths DESC, t1, t2, t3
    LIMIT 25
"""


@register("op_path_trigrams", oracle=_PATH_TRIGRAM_SQL)
def op_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey trigrams: the 25 most common 3-step event-type
    paths across all user timelines — the sequence-mining rollup one
    step up from `op_markov_transitions`' pairwise matrix (a funnel
    hypothesis generator: the paths ARE the candidate funnels).

    Scale: one user_id shuffle shared by both lead() windows (same
    spec), then a two-phase aggregate on the trigram key (≤ |event
    types|³ groups — tiny) and TakeOrderedAndProject for the top 25.
    Identical SQL text on both engines; ordering is total via the
    trigram tie-break.
    """
    return Q(spark, sf_dir, _PATH_TRIGRAM_SQL)


# --- 11. Benford first-digit audit ------------------------------------------

@register(
    "op_benford",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(value) AS BIGINT) AS iv FROM events
      WHERE floor(value) >= 1),
    d AS (SELECT CAST(substr(CAST(iv AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit
          FROM v)
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           CAST(floor(1000000.0 * count(*) /
                (SELECT count(*) FROM d)) AS BIGINT) AS share_ppm
    FROM d GROUP BY digit ORDER BY digit
    """,
)
def op_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit: the leading-digit distribution of
    transaction values with ppm shares — the classic fraud/synthetic-
    data screen (organic multiplicative amounts follow log-uniform
    leading digits; fabricated ones don't). The digit is extracted by
    string head of the FLOORED integer — `floor(log10())` would be the
    arithmetic route, but log10 is a correctly-rounded-not-guaranteed
    libm call (the no-ln rule in the module header); string heads of
    integers are exact on every engine.

    Scale: map-only digit extraction, one 9-group two-phase aggregate,
    plus a scalar-subquery total that Catalyst runs once — no window,
    no second fact pass (the subquery reuses the tiny digit table).
    """
    return Q(spark, sf_dir, """
        WITH v AS (
          SELECT CAST(floor(value) AS BIGINT) AS iv FROM events
          WHERE floor(value) >= 1),
        d AS (SELECT CAST(substr(CAST(iv AS STRING), 1, 1) AS BIGINT)
                       AS digit
              FROM v)
        SELECT digit, CAST(count(*) AS BIGINT) AS n,
               CAST(floor(1000000.0 * count(*) /
                    (SELECT count(*) FROM d)) AS BIGINT) AS share_ppm
        FROM d GROUP BY digit ORDER BY digit
    """)


# --- 12. Bloom-filter prefilter with measured false-positive rate ----------

#: bloom geometry: 4 words x 63 usable bits (sign bit never set) and
#: two independent multiplicative hashes — small on purpose so the
#: fixture actually exercises false positives (the op REPORTS them).
_BLOOM_BITS = 4 * 63

_BLOOM_SQL = """
    WITH keys AS (SELECT DISTINCT c_custkey AS k FROM customer
                  WHERE c_acctbal > 5000),
    bits AS (
      SELECT (((k % 1000003) * 2654435761) % 4294967311) % {m} AS bit FROM keys
      UNION ALL
      SELECT (((k % 1000003) * 40503 + 2654435769) % 4294967291) % {m} AS bit
      FROM keys),
    bloom AS (SELECT bit {div} 63 AS word,
                     bit_or({shl1}) AS bm
              FROM bits GROUP BY bit {div} 63),
    probes AS (SELECT o_orderkey, o_custkey AS k,
                      (((o_custkey % 1000003) * 2654435761) % 4294967311) % {m} AS b1,
                      (((o_custkey % 1000003) * 40503 + 2654435769)
                        % 4294967291) % {m} AS b2
               FROM orders),
    checked AS (
      SELECT p.o_orderkey, p.k,
             CASE WHEN (coalesce(w1.bm, 0) & {shlb1}) != 0
                   AND (coalesce(w2.bm, 0) & {shlb2}) != 0
                  THEN 1 ELSE 0 END AS pass,
             CASE WHEN p.k IN (SELECT k FROM keys) THEN 1 ELSE 0 END
               AS member
      FROM probes p
      LEFT JOIN bloom w1 ON w1.word = p.b1 {div} 63
      LEFT JOIN bloom w2 ON w2.word = p.b2 {div} 63)
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(pass) AS BIGINT) AS n_pass,
           CAST(sum(member) AS BIGINT) AS n_member,
           CAST(sum(CASE WHEN pass = 1 AND member = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(floor(1000000.0 *
                sum(CASE WHEN pass = 1 AND member = 0 THEN 1 ELSE 0 END)
                / sum(CASE WHEN member = 0 THEN 1 ELSE 0 END))
             AS BIGINT) AS fp_ppm
    FROM checked
"""


def _bloom_sql(div: str, shl: str) -> str:
    def s(bitexpr: str) -> str:
        return shl.format(off=f"CAST(({bitexpr}) % 63 AS INTEGER)")
    return _BLOOM_SQL.format(
        m=_BLOOM_BITS, div=div,
        shl1=s("bit"), shlb1=s("p.b1"), shlb2=s("p.b2"))


@register(
    "op_bloom_prefilter",
    oracle=_bloom_sql("//", "(CAST(1 AS BIGINT) << {off})"),
)
def op_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join prefilter, built and audited in-engine: hash
    the rich-customer key set into a 252-bit filter (4 BIGINT words,
    sign bit unused, two independent multiplicative hashes — all plain
    integer ops, so the filter is bit-identical on any engine), probe
    every order through it, and report the measured pass/member/
    false-positive counts and the FP rate in ppm. This is the
    mechanism behind runtime row-group pruning (Spark's own
    InjectRuntimeFilter, Parquet bloom pages): the audit quantifies
    exactly what a prefilter would save — and the deliberately tiny
    filter guarantees observable false positives, so the verification
    is non-vacuous.

    Scale: the build side aggregates |keys|·2 bit rows into 64 words
    (two-phase bit_or); the probe LEFT-joins each fact row against a
    4-ROW word table (left: a probe landing in an all-zero absent
    word must count as pass=0, not vanish) — Catalyst broadcasts it (≤1 KB), so the fact never
    shuffles; membership truth is a broadcast IN-set against the same
    dim slice. At 10^9 keys you'd widen words ∝ keys (still KB-MB —
    bloom size is the point) and ship it as one broadcast variable.
    """
    return Q(spark, sf_dir,
             _bloom_sql("div", "shiftleft(CAST(1 AS BIGINT), {off})"))


# --- 13. exponential moving average (sequential fold semantics) ------------

@register(
    "op_ema",
    oracle="""
    WITH s AS (
      SELECT user_id,
             list_apply(
               list_sort(list(
                 {'t': ts, 'e': event_id, 'v': CAST(value AS DOUBLE)})),
               x -> x.v) AS vs
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
           round(list_reduce(vs, (acc, x) ->
                 CAST(0.125 AS DOUBLE) * x
                 + CAST(0.875 AS DOUBLE) * acc), 6) AS ema
    FROM s ORDER BY user_id
    """,
)
def op_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average per user (α = 1/8, seeded with the
    first observation) — the one classic time-series statistic SQL
    windows CANNOT express (the recursion ema_t = α·v_t + (1-α)·
    ema_{t-1} is nonlinear in frame terms). The Spark-first answer is
    a higher-order fold: collect the user's ordered values and
    ``aggregate()`` the affine update over them — all JVM, no Python,
    no UDAF class. α = 1/8 is an exact binary fraction and both
    engines fold left-to-right over the identically-sorted list, so
    the doubles match bit-for-bit (rounded to 6 dp for the hash).

    Scale: one groupBy shuffle; the fold is per-user-sequential by
    SEMANTICS (each step needs the previous), so a hot user's history
    folds in one task — for unbounded histories note that the affine
    maps x -> αv + (1-α)x COMPOSE associatively, so a two-level scan
    (compose per-bucket maps, then carry — `_bucket_bases`' shape)
    parallelizes it at the cost of float re-association; this op keeps
    the sequential-fold contract because the oracle-equal bits ARE the
    spec.
    """
    e = table(spark, sf_dir, "events")
    return (e.groupBy("user_id")
             .agg(F.expr(
                 "sort_array(collect_list(struct(ts AS t, event_id AS e,"
                 " CAST(value AS DOUBLE) AS v)))").alias("xs"))
             .selectExpr(
                 "user_id",
                 "CAST(size(xs) AS BIGINT) AS n_events",
                 "round(aggregate(transform(slice(xs, 2, size(xs) - 1),"
                 " s -> s.v), xs[0].v, (acc, x) ->"
                 " CAST(0.125 AS DOUBLE) * x"
                 " + CAST(0.875 AS DOUBLE) * acc), 6) AS ema")
             .orderBy("user_id"))


# --- 14. per-entity regression slope (integer moments) ----------------------

_SLOPE_SQL = """
    WITH p AS (
      SELECT user_id,
             CAST(event_id AS DOUBLE) AS x,
             CAST(floor(value * 100) AS DOUBLE) AS y
      FROM events),
    s AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM p GROUP BY user_id)
    SELECT user_id, n,
           CAST(floor(1000000.0 * (n * sxy - sx * sy)
                / (n * sxx - sx * sx)) AS BIGINT) AS slope_ppm
    FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
    ORDER BY user_id
"""


@register("op_regression_slope", oracle=_SLOPE_SQL)
def op_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend slope of transaction value over
    event sequence — `regr_slope` with the `agg_corr` determinism
    contract (built-in regr_* aggregates accumulate engine-
    specifically): exact integer-valued inputs (event ids, value
    cents), moment sums, then one fixed IEEE op sequence to a
    floor-ppm slope. Degenerate users (single event, zero x-variance)
    are excluded by predicate, not by NaN.

    Scale: single two-phase aggregate over the fact — the one-pass
    moments shape; no window, no second scan.

    Caveat the docstring owns: x·y products here stay ≲2^49 so the
    double sums are exact; for fact scales beyond that, sum in
    DECIMAL(38,0) (exact) and only the final three ops go through
    doubles — same plan, wider accumulator.
    """
    return Q(spark, sf_dir, _SLOPE_SQL)


# --- 15. GDPR deletion sweep audit -----------------------------------------

@register(
    "op_gdpr_delete_audit",
    oracle="""
    WITH del AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    SELECT 'orders' AS tbl,
           CAST((SELECT count(*) FROM orders
                 WHERE o_custkey IN (SELECT c_custkey FROM del))
                AS BIGINT) AS n_delete,
           CAST((SELECT count(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM del))
                AS BIGINT) AS n_retain
    UNION ALL
    SELECT 'events' AS tbl,
           CAST((SELECT count(*) FROM events
                 WHERE user_id IN (SELECT c_custkey FROM del))
                AS BIGINT) AS n_delete,
           CAST((SELECT count(*) FROM events
                 WHERE user_id NOT IN (SELECT c_custkey FROM del))
                AS BIGINT) AS n_retain
    ORDER BY tbl
    """,
)
def op_gdpr_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten sweep audit: given a deletion list (the
    negative-balance customers stand in for erasure requests), report
    per fact table how many rows the cascade would delete vs retain —
    the dry-run every GDPR/CCPA deletion pipeline emits before
    rewriting partitions. The semi/anti split is computed ONCE per
    table via a broadcast IN-set (the deletion list is always
    dim-sized), and the audit's retain+delete must equal the table
    count — an invariant a one-line check enforces downstream.

    Scale: each fact is scanned once with a broadcast hash semi probe
    (no shuffle of the fact); the actual rewrite is
    `sink_partition_overwrite_dynamic` filtered to affected
    partitions — this op is its planning/audit half.
    """
    del_keys = (table(spark, sf_dir, "customer")
                .filter(F.col("c_acctbal") < 0)
                .select(F.col("c_custkey").alias("k")))
    def audit(df: DataFrame, key: str, name: str) -> DataFrame:
        flagged = df.join(F.broadcast(del_keys),
                          df[key] == F.col("k"), "left")
        return flagged.agg(
            F.lit(name).alias("tbl"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
             .cast("long").alias("n_delete"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
             .cast("long").alias("n_retain"))
    return (audit(table(spark, sf_dir, "orders"), "o_custkey", "orders")
            .unionByName(
                audit(table(spark, sf_dir, "events"), "user_id", "events"))
            .orderBy("tbl"))


# --- 16. declarative data-contract check -----------------------------------

_CONTRACT_SQL = """
    SELECT 'orders.custkey_not_null' AS rule,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'orders.totalprice_positive' AS rule,
           CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem.discount_in_unit_range' AS rule,
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.quantity_bounds' AS rule,
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events.ts_not_null' AS rule,
           CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM events
    ORDER BY rule
"""


@register("op_contract_check", oracle=_CONTRACT_SQL)
def op_contract_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract audit (the great-expectations shape):
    each rule is a predicate over one table, reported as (rule,
    violations, rows checked) — the gate a production ingest runs
    before publishing a partition, with per-rule counts rather than a
    boolean so triage starts from the report. Rules here mirror the
    reference's implicit invariants (non-null FKs, positive money,
    unit-interval discounts — evm_consumer.rs's zero-defaults make
    exactly these the failure modes worth watching).

    Scale: one scan PER TABLE regardless of rule count — all of a
    table's rules fold into one conditional-aggregate pass (Catalyst
    shares the scan across the UNION branches per table at worst; a
    production variant pivots rules into one aggregate projection,
    guaranteeing the single pass). No shuffle beyond the final
    5-row union.
    """
    return Q(spark, sf_dir, _CONTRACT_SQL)


# --- 17. foreign-key integrity audit ---------------------------------------

_FK_SQL = """
    SELECT 'orders.o_custkey -> customer' AS fk_edge,
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND o.o_custkey NOT IN
                       (SELECT c_custkey FROM customer)) AS BIGINT)
             AS n_orphans,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_orderkey IS NOT NULL
                   AND l.l_orderkey NOT IN
                       (SELECT o_orderkey FROM orders)) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'events.user_id -> customer' AS fk_edge,
           CAST((SELECT count(*) FROM events e
                 WHERE e.user_id IS NOT NULL
                   AND e.user_id NOT IN
                       (SELECT c_custkey FROM customer)) AS BIGINT),
           CAST((SELECT count(*) FROM events) AS BIGINT)
    ORDER BY fk_edge
"""


@register("op_fk_integrity", oracle=_FK_SQL)
def op_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the schema's FK edges:
    orphan counts per edge (rows whose FK value has no parent). The
    reference can MANUFACTURE orphans — its consumer inserts
    transactions before the parent block (evm_consumer.rs:124-128,
    SURVEY §2.3 join_anti) — so this is the audit its operators would
    run at publication time; a lakehouse without enforced constraints
    runs it perpetually.

    Scale: each NOT IN rewrites to a null-aware anti join whose build
    side is the parent KEY COLUMN (dim-sized for customer; for the
    fact-sized orders-parent edge Catalyst plans the same SMJ
    anti-join `join_anti` pins) — one pass per edge, orphan counting
    happens in the aggregate, nothing is materialized.
    """
    return Q(spark, sf_dir, _FK_SQL)


# --- 18. time-bounded conversion funnel ------------------------------------

_FUNNEL_W_SQL = """
    WITH t1 AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.v_ts
        AND e.ts <= t1.v_ts + INTERVAL 6 HOUR
      GROUP BY e.user_id),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e
      JOIN t1 ON e.user_id = t1.user_id
      JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.c_ts
        AND e.ts <= t1.v_ts + INTERVAL 6 HOUR
      GROUP BY e.user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_viewed,
           CAST(count(t2.c_ts) AS BIGINT) AS n_clicked_in_window,
           CAST(count(t3.p_ts) AS BIGINT) AS n_purchased_in_window
    FROM t1
    LEFT JOIN t2 ON t1.user_id = t2.user_id
    LEFT JOIN t3 ON t1.user_id = t3.user_id
"""


@register("op_funnel_windowed", oracle=_FUNNEL_W_SQL)
def op_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-BOUNDED conversion funnel (the ClickHouse-windowFunnel
    shape): view → click → purchase counts only when the whole chain
    completes within 6 hours of the user's first view — `op_funnel`
    answers "ever converted, in order"; attribution and campaign
    analysis need "converted in order, within the window", a different
    (and stricter) number. Anchoring at the first view with min()
    stage times makes the chain deterministic with no per-path search.

    Scale: three two-phase aggregates and three joins, ALL keyed on
    user_id — one logical partitioning reused end to end (co-location
    makes the joins shuffle-free after the first exchange); no window
    function at all, so no per-user sort. Identical SQL text on both
    engines (INTERVAL literals included).
    """
    return Q(spark, sf_dir, _FUNNEL_W_SQL)


# --- 19. cohort lifetime value ---------------------------------------------

_LTV_SQL = """
    WITH firsts AS (
      SELECT o_custkey AS custkey,
             min(CAST(date_trunc('year', o_orderdate) AS DATE))
               AS cohort_year
      FROM orders GROUP BY o_custkey),
    rev AS (
      SELECT f.cohort_year,
             CAST(date_diff('month', CAST(f.cohort_year AS TIMESTAMP),
                            date_trunc('month', o.o_orderdate)) AS BIGINT)
               AS month_age,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.custkey
      GROUP BY f.cohort_year, month_age)
    SELECT CAST(cohort_year AS VARCHAR) AS cohort_year, month_age,
           cents AS rev_cents,
           CAST(sum(cents) OVER (PARTITION BY cohort_year
                                 ORDER BY month_age
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
             AS cum_ltv_cents
    FROM rev
    ORDER BY cohort_year, month_age
"""


@register("op_cohort_ltv", oracle=_LTV_SQL)
def op_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohorted by first-order
    year, revenue bucketed by months-since-cohort, and the running
    cumulative — the LTV table under every payback-period decision
    (`op_retention_cohort` counts heads; this follows the money).
    Revenue stays integer cents end to end.

    Scale: one fact aggregate for cohorts, one cohort⋈fact join and
    re-aggregate (both on custkey/cohort keys), then the cumulative
    window over the (cohorts × month-ages) table — calendar-bounded,
    the `win_count_distinct` day-table discipline again.

    Dialect note: Spark spells the month delta ``timestampdiff(MONTH)``
    (full months) vs DuckDB's ``date_diff('month')`` (boundary count) —
    they agree here because both operands are month STARTS by
    construction (year-truncated cohort, month-truncated order).
    """
    return Q(spark, sf_dir, _LTV_SQL
             .replace("AS VARCHAR", "AS STRING")
             .replace(
                 "date_diff('month', CAST(f.cohort_year AS TIMESTAMP),\n"
                 "                            date_trunc('month', o.o_orderdate))",
                 "timestampdiff(MONTH, CAST(f.cohort_year AS TIMESTAMP), "
                 "date_trunc('month', o.o_orderdate))"))


# --- 20. Welch two-sample t statistic (integer moments) --------------------

_WELCH_SQL = """
    WITH s AS (
      SELECT CASE WHEN event_type IN ('purchase', 'click')
                  THEN 'engaged' ELSE 'other' END AS grp,
             CAST(floor(value * 100) AS BIGINT) AS x
      FROM events),
    m AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS DECIMAL(38, 0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(x AS DECIMAL(18, 0))
                      * CAST(x AS DECIMAL(18, 0))) AS DOUBLE) AS sxx
      FROM s GROUP BY grp),
    w AS (
      SELECT
        (SELECT sx / n FROM m WHERE grp = 'engaged') AS m1,
        (SELECT sx / n FROM m WHERE grp = 'other') AS m2,
        (SELECT (sxx - sx * sx / n) / (n - 1) / n FROM m
          WHERE grp = 'engaged') AS se1,
        (SELECT (sxx - sx * sx / n) / (n - 1) / n FROM m
          WHERE grp = 'other') AS se2)
    SELECT CAST(floor(1000000.0 * (m1 - m2) / sqrt(se1 + se2))
                AS BIGINT) AS welch_t_ppm
    FROM w
"""


@register("op_ab_welch_t", oracle=_WELCH_SQL)
def op_ab_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic for an A/B-style comparison
    (engaged vs other event values), reported as floor-ppm. The
    experimentation primitive with the `agg_corr` determinism
    contract: exact integer-cents inputs, moment sums accumulated as
    DECIMAL(38,0) (r10 overflow audit — double accumulation loses
    exactness past 2^53, i.e. ~1e9 rows of 1e7-cent values, and its
    fold order is partitioning-dependent exactly then), then ONE
    fixed chain of IEEE
    ops — means, unbiased variance-of-mean terms, sqrt, divide —
    written identically for both engines. Degrees-of-freedom /
    p-value lookup is a driver-side scalar step (needs the t CDF —
    out of SQL by design).

    Scale: one two-phase aggregate over the fact; the statistic
    itself is computed on a 2-row table via run-once scalar
    subqueries. Same plan at any scale.
    """
    return Q(spark, sf_dir, _WELCH_SQL)


# --- 21. categorical diversity (Gini impurity, log-free) --------------------

_DIVERSITY_SQL = """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY user_id, event_type),
    t AS (
      SELECT user_id, CAST(sum(k) AS BIGINT) AS n,
             CAST(sum(k * k) AS BIGINT) AS ssq
      FROM c GROUP BY user_id)
    SELECT user_id, n,
           CAST(floor(1000000.0 * (n * n - ssq) / (n * n)) AS BIGINT)
             AS gini_impurity_ppm
    FROM t WHERE n > 0
    ORDER BY user_id
"""


@register("op_type_diversity", oracle=_DIVERSITY_SQL)
def op_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity as Gini impurity (1 − Σp²) in
    ppm — the log-free diversity index (Shannon entropy needs ln,
    which the engine bans from hashed outputs; Gini answers the same
    "how concentrated is this user's behavior" question with pure
    integer arithmetic: counts, squares, one exact division).
    Single-type users score 0, uniform-over-k users approach
    1 − 1/k.

    Scale: two stacked two-phase aggregates on (user, type) then
    user — uniform keys, map-side combines, no window, no Python.
    """
    return Q(spark, sf_dir, _DIVERSITY_SQL)


# --- 22. daily VWAP ---------------------------------------------------------

_VWAP_SQL = """
    WITH d AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
             CAST(floor(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      FROM lineitem),
    a AS (
      SELECT ship_day, CAST(sum(q) AS BIGINT) AS vol,
             CAST(sum(pc) AS BIGINT) AS notional_cents
      FROM d GROUP BY ship_day)
    SELECT ship_day, vol, notional_cents,
           CAST(floor(CAST(notional_cents AS DOUBLE) / vol) AS BIGINT)
             AS vwap_cents
    FROM a ORDER BY ship_day
"""


@register("op_vwap", oracle=_VWAP_SQL)
def op_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume-weighted average price: per ship day, Σ(price) /
    Σ(quantity) in exact cents — the market-data staple (and the
    honest aggregate for "what did a unit actually trade at", which a
    plain avg(price) misstates under varying lot sizes). Integer
    numerator and denominator, one floored division.

    Scale: one two-phase aggregate keyed by day (perfectly uniform),
    map-side partial sums; the division happens on the day-level
    table. Same plan at 100 TB with the day key widening to
    (instrument, day).
    """
    return Q(spark, sf_dir, _VWAP_SQL.replace("AS VARCHAR", "AS STRING"))


# --- 23. per-entity lag/rolling feature table ------------------------------

_LAG_FEATURES_SQL = """
    SELECT user_id, event_id,
           CAST(floor(value * 100) AS BIGINT) AS v_cents,
           CAST(floor(lag(value, 1) OVER w * 100) AS BIGINT) AS lag1_cents,
           CAST(floor(lag(value, 2) OVER w * 100) AS BIGINT) AS lag2_cents,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT)
             AS prev3_sum_cents,
           CAST(count(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT)
             AS prev3_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
"""


@register("op_lag_features", oracle=_LAG_FEATURES_SQL)
def op_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store lag table: per event, the entity's lag-1/lag-2
    values and trailing-3 sum/count — the point-in-time-correct
    feature rows a forecasting model trains on. Every frame ends at
    1 PRECEDING, so no feature ever sees its own row's value: the
    leakage rule is in the frame, not in reviewer discipline.
    Trailing mean = prev3_sum/prev3_n at the consumer, keeping the
    stored row integer-exact.

    Scale: all four windows share ONE (user_id) partitioning and one
    sort — a single shuffle of the event log produces the whole
    feature set; this is the shape feature platforms compile to, and
    adding features extends the projection, not the shuffle count.
    """
    return Q(spark, sf_dir, _LAG_FEATURES_SQL)


# --- 24. smoothed target encoding ------------------------------------------

_TARGET_ENC_SQL = """
    WITH g AS (
      SELECT c_mktsegment AS category,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS target_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment),
    t AS (
      SELECT CAST(sum(target_cents) AS DOUBLE)
               / CAST(sum(n) AS BIGINT) AS gmean
      FROM g)
    SELECT category, n,
           CAST(floor((CAST(target_cents AS DOUBLE)
                       + 50.0 * (SELECT gmean FROM t))
                      / (n + 50)) AS BIGINT) AS enc_cents
    FROM g
    ORDER BY category
"""


@register("op_target_encoding", oracle=_TARGET_ENC_SQL)
def op_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding: category → shrunk mean target
    (m = 50 pseudo-observations of the global mean), the categorical
    feature transform gradient-boosting pipelines lean on. Exact
    integer sums; the smoothing is one fixed double chain (global
    mean, one multiply, one divide, floor) — identical on both
    engines (the global mean rides a run-once scalar subquery — no
    join node at all). The encoding TABLE is the artifact
    (broadcast-join it onto serving rows). This is the SERVING-time
    form; the leakage-safe TRAINING form is the sibling key
    `op_target_encoding_oof` (out-of-fold via anti-self subtraction).

    Scale: one fact aggregate to category level + a scalar total;
    categories are dim-sized, the join back to rows is a broadcast.
    """
    return Q(spark, sf_dir, _TARGET_ENC_SQL)


# --- 24b. out-of-fold target encoding (leakage-safe training form) ----------

_TARGET_ENC_OOF_SQL = """
    WITH r AS (
      SELECT c_mktsegment AS category,
             (((o_orderkey % 1000003) * 2654435761) % 1000003) % 5 AS fold,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey),
    fc AS (
      SELECT fold, category, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM r GROUP BY fold, category),
    cat AS (SELECT category, CAST(sum(n) AS BIGINT) AS n_cat,
                   CAST(sum(s) AS BIGINT) AS s_cat
            FROM fc GROUP BY category),
    f AS (SELECT fold, CAST(sum(n) AS BIGINT) AS n_f,
                 CAST(sum(s) AS BIGINT) AS s_f
          FROM fc GROUP BY fold),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_t,
                   CAST(sum(s) AS BIGINT) AS s_t
            FROM fc)
    SELECT fc.fold, fc.category,
           CAST(cat.n_cat - fc.n AS BIGINT) AS n_oof,
           CAST(floor((CAST(cat.s_cat - fc.s AS DOUBLE)
                       + 50.0 * (CAST((SELECT s_t FROM tot) - f.s_f
                                      AS DOUBLE)
                                 / CAST((SELECT n_t FROM tot) - f.n_f
                                        AS BIGINT)))
                      / (cat.n_cat - fc.n + 50)) AS BIGINT) AS enc_cents
    FROM fc
    JOIN cat ON fc.category = cat.category
    JOIN f ON fc.fold = f.fold
    ORDER BY fc.fold, fc.category
"""


@register("op_target_encoding_oof", oracle=_TARGET_ENC_OOF_SQL)
def op_target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold smoothed target encoding — the leakage-SAFE form a
    training pipeline actually needs: rows are assigned to 5 folds by
    a Knuth-multiplicative hash of the order key, and the encoding a
    fold's rows SEE is computed from every OTHER fold only, by
    anti-self subtraction — fold f's view of category c is
    (Σcents_c − Σcents_{f,c} + m·gmean_{−f}) / (n_c − n_{f,c} + m),
    with even the global-mean prior recomputed excluding the fold.
    A row's own target can never leak into its own feature.

    Determinism: fold assignment is pure integer hashing; all moments
    are exact BIGINT sums; the smoothing chain is the same fixed
    double sequence as the serving-time key.

    Scale: the anti-self trick means NO per-fold re-aggregation of the
    fact — one (fold, category) aggregate (5×|categories| rows, still
    dim-sized) rolls up to category, fold, and grand totals, and every
    fold's encoding is derived by subtraction from those tiny tables.
    K folds cost the same single fact pass as one."""
    return Q(spark, sf_dir, _TARGET_ENC_OOF_SQL)


# --- 25. feature drift (L1 histogram distance, log-free) --------------------

_DRIFT_SQL = """
    WITH b AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 'ref' ELSE 'cur' END AS side,
             CAST(least(9, floor(o_totalprice / 50000)) AS BIGINT)
               AS bucket
      FROM orders),
    h AS (
      SELECT side, bucket, CAST(count(*) AS BIGINT) AS k
      FROM b GROUP BY side, bucket),
    t AS (SELECT side, CAST(sum(k) AS BIGINT) AS n FROM h GROUP BY side),
    p AS (
      SELECT h.bucket,
             CAST(floor(1000000.0 * sum(CASE WHEN h.side = 'ref'
                                             THEN h.k ELSE 0 END)
                  / (SELECT n FROM t WHERE side = 'ref'))
               AS BIGINT) AS ref_ppm,
             CAST(floor(1000000.0 * sum(CASE WHEN h.side = 'cur'
                                             THEN h.k ELSE 0 END)
                  / (SELECT n FROM t WHERE side = 'cur'))
               AS BIGINT) AS cur_ppm
      FROM h GROUP BY h.bucket)
    SELECT bucket, ref_ppm, cur_ppm,
           abs(ref_ppm - cur_ppm) AS l1_ppm
    FROM p ORDER BY bucket
"""


@register("op_feature_drift", oracle=_DRIFT_SQL)
def op_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/serving feature-drift report: bucket the feature on both
    sides of a cutoff (reference vs current), compare per-bucket
    population shares in ppm, and report the per-bucket L1 gap —
    Σ l1_ppm / 2 is total-variation distance, the log-free drift
    metric (PSI needs ln, banned from hashed outputs; TV answers the
    same "did the distribution move" question in exact integers).
    Fixed equi-width buckets with a top clamp keep binning
    deterministic.

    Scale: one conditional two-phase aggregate to (side, bucket) —
    ≤20 rows — then arithmetic on that tiny table; the fact is
    scanned once. At 100 TB per-feature drift over hundreds of
    features pivots into one pass with per-feature conditional
    aggregates, same shape.
    """
    return Q(spark, sf_dir, _DRIFT_SQL)


# --- 26. survivorship (golden record per duplicate group) -------------------

_SURVIVOR_SQL = """
    WITH p AS (
      SELECT doc_id, lang, source, n_chars,
             array_to_string(string_split(trim(text), ' ')[1:3], ' ')
               AS prefix
      FROM documents),
    grp AS (
      SELECT prefix, CAST(count(*) AS BIGINT) AS n_members
      FROM p GROUP BY prefix HAVING count(*) > 1),
    ranked AS (
      SELECT p.prefix, p.doc_id, p.lang, p.source, p.n_chars,
             grp.n_members,
             row_number() OVER (PARTITION BY p.prefix
                                ORDER BY p.n_chars DESC, p.doc_id)
               AS rn
      FROM p JOIN grp ON p.prefix = grp.prefix)
    SELECT prefix, n_members,
           doc_id AS survivor_doc_id,
           lang AS survivor_lang,
           source AS survivor_source,
           CAST(n_chars AS BIGINT) AS survivor_n_chars
    FROM ranked WHERE rn = 1
    ORDER BY prefix
"""


@register("op_survivorship", oracle=_SURVIVOR_SQL)
def op_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden record): within each duplicate group
    (`dedup_prefix`'s shared-prefix clusters), elect one surviving
    record by an explicit precedence rule — richest content first
    (max n_chars), doc_id as the deterministic tie-break — and carry
    its fields forward. The master-data-management step AFTER dedup
    finds the groups: someone must decide which copy wins, and the
    rule belongs in the query, not in whichever row a nondeterministic
    first() happened to keep.

    Scale: group detection is one aggregate; the election is a
    (prefix)-partitioned rank over members of multi-doc groups only —
    partition size = duplicate-cluster size, bounded by the dedup
    cap discipline upstream. Field-level survivorship (best value
    per column from different donors) is the sibling key
    `op_survivorship_fields` — same single shuffle, three shared
    election windows.
    """
    spark_sql = _SURVIVOR_SQL.replace(
        "array_to_string(string_split(trim(text), ' ')[1:3], ' ')",
        # CASE guard: Spark's concat_ws renders a NULL token array as
        # '' where the oracle's array_to_string propagates NULL — a
        # NULL-text doc must keep a NULL prefix (its own group), not
        # merge into the empty-text group (r12 null-seed fuzz)
        "CASE WHEN text IS NULL THEN NULL ELSE"
        " concat_ws(' ', slice(split(trim(text), ' '), 1, 3)) END")
    return Q(spark, sf_dir, spark_sql)


# --- 28. CDC snapshot diff ---------------------------------------------------

_CDC_SQL = """
    WITH a AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price
      FROM orders WHERE o_orderkey % 10 <> 0),
    b AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 17 = 0 THEN 'U'
                  ELSE o_orderstatus END AS st,
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 13 = 0 THEN 100 ELSE 0 END AS price
      FROM orders WHERE o_orderkey % 11 <> 0),
    d AS (
      SELECT coalesce(a.k, b.k) AS k,
             CASE WHEN a.k IS NULL THEN 'added'
                  WHEN b.k IS NULL THEN 'removed'
                  WHEN a.price <> b.price OR a.st <> b.st THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM a FULL JOIN b ON a.k = b.k)
    SELECT change_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k % 1000003) AS BIGINT) AS key_checksum
    FROM d GROUP BY change_type ORDER BY change_type
"""


@register("op_cdc_snapshot_diff", oracle=_CDC_SQL)
def op_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff of two table snapshots: full outer join
    on the key, classify every key as added / removed / changed /
    unchanged by comparing the tracked columns, and report per-class
    counts plus a key checksum (so the oracle pins WHICH keys, not just
    how many). The fixture synthesizes the snapshots from one table
    with deterministic key filters and BOTH mutation kinds planted — a
    price restatement (every 13th key) and a status flip (every 17th
    key) — so each arm of the changed-classification is exercised; the
    operator itself is the generic snapshot-reconciliation every
    warehouse ingest runs nightly.

    Scale: ONE co-partitioned full outer join on the snapshot key
    (both sides shuffle once on the same uniform key — no broadcast,
    snapshots are both facts) and a tiny classify+aggregate on top.
    At 100 TB this is the canonical merge pattern; bucketed storage on
    the key would remove even that single shuffle.
    """
    return Q(spark, sf_dir, _CDC_SQL)


# --- 29. schema / data-quality profile ---------------------------------------

_PROFILE_SQL = """
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nn_cust,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
             CAST(min(o_custkey) AS BIGINT) AS mn_cust,
             CAST(max(o_custkey) AS BIGINT) AS mx_cust,
             CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nn_price,
             CAST(count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS nd_price,
             CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS mn_price,
             CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS mx_price,
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nn_st,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_st,
             CAST(min(length(o_orderstatus)) AS BIGINT) AS mn_st,
             CAST(max(length(o_orderstatus)) AS BIGINT) AS mx_st,
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nn_pri,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_pri,
             CAST(min(length(o_orderpriority)) AS BIGINT) AS mn_pri,
             CAST(max(length(o_orderpriority)) AS BIGINT) AS mx_pri
      FROM orders)
    SELECT col, n_rows, n_null, n_distinct, min_v, max_v
    FROM (
      SELECT 'o_custkey' AS col, n_rows, nn_cust AS n_null,
             nd_cust AS n_distinct, mn_cust AS min_v, mx_cust AS max_v
      FROM s
      UNION ALL
      SELECT 'o_totalprice_cents', n_rows, nn_price, nd_price,
             mn_price, mx_price FROM s
      UNION ALL
      SELECT 'o_orderstatus_len', n_rows, nn_st, nd_st, mn_st, mx_st
      FROM s
      UNION ALL
      SELECT 'o_orderpriority_len', n_rows, nn_pri, nd_pri, mn_pri, mx_pri
      FROM s)
    ORDER BY col
"""


@register("op_schema_profile", oracle=_PROFILE_SQL)
def op_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (the ANALYZE/data-quality report): one narrow
    stats row per tracked column — null count, distinct count, min/max
    (numeric columns in exact cents/ids, string columns by length so
    every stat is a BIGINT and the report schema is uniform). The
    first thing a training pipeline runs on a new snapshot: null-rate
    or cardinality jumps are the cheapest drift alarm there is.

    Scale: ONE pass over the fact computes every per-column stat in a
    single wide aggregate (map-side partials; the distinct counts are
    the only shuffled state, one hash set per column), then a 4-row
    unpivot. Hundreds of columns widen the aggregate, not the number
    of passes; swap exact distinct for HLL (`agg_approx_distinct`'s
    sketch) when the column count × cardinality outgrows the reducer.
    """
    return Q(spark, sf_dir, _PROFILE_SQL)


# --- 30. winsorized aggregate (discrete p05/p95 clip, integer-exact) --------

_WINSOR_SQL = """
    WITH vc AS (
      SELECT l_returnflag AS g, CAST(floor(l_quantity) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM vc GROUP BY g),
    cum AS (
      SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM vc),
    edges AS (
      SELECT c.g,
             min(CASE WHEN cum > CAST(floor(0.05 * (n - 1)) AS BIGINT)
                      THEN v END) AS lo,
             min(CASE WHEN cum > CAST(floor(0.95 * (n - 1)) AS BIGINT)
                      THEN v END) AS hi
      FROM cum c JOIN tot t ON c.g = t.g GROUP BY c.g)
    SELECT l.l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(least(greatest(CAST(floor(l_quantity) AS BIGINT), e.lo),
                          e.hi)) AS BIGINT) AS sum_winsorized,
           CAST(sum(CASE WHEN CAST(floor(l_quantity) AS BIGINT) < e.lo
                           OR CAST(floor(l_quantity) AS BIGINT) > e.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           e.lo AS p05_v, e.hi AS p95_v
    FROM lineitem l JOIN edges e ON l.l_returnflag = e.g
    GROUP BY l.l_returnflag, e.lo, e.hi
    ORDER BY grp
"""


@register("op_winsorize", oracle=_WINSOR_SQL)
def op_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregate: clip the feature at its per-group DISCRETE
    p05/p95 (the value at rank floor(q·(n−1)) — an actual member of
    the set, so edges are exact BIGINTs and the clipped sum is integer
    arithmetic; interpolated percentiles would drag the whole sum into
    float territory). The outlier-taming transform every robust
    feature pipeline applies before scaling.

    Scale: the edge derivation rides the VALUE-COUNT MAP, not a sort —
    one groupBy to (group, value) counts, a running sum over the ≤|v|
    rows per group (bounded by the column's distinct-value count, the
    same two-phase shape as the built-in percentile's partial map),
    then the 3-row edge table broadcasts back onto one fact pass.
    High-cardinality columns switch the edge step to the bucket-
    histogram tail rank (`agg_percentile`'s p99 block) — clip pass
    unchanged.
    """
    return Q(spark, sf_dir, _WINSOR_SQL)


# --- 31. robust z-score outliers (median/MAD, integer-exact) ----------------

_ROBUST_Z_SQL = """
    WITH vc AS (
      SELECT l_returnflag AS g, CAST(floor(l_quantity) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM vc GROUP BY g),
    cum AS (
      SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM vc),
    med AS (
      SELECT c.g,
             min(CASE WHEN cum > CAST(floor((n - 1) / 2.0) AS BIGINT)
                      THEN v END)
             + min(CASE WHEN cum > CAST(ceil((n - 1) / 2.0) AS BIGINT)
                        THEN v END) AS med2
      FROM cum c JOIN tot t ON c.g = t.g GROUP BY c.g),
    dv AS (
      SELECT vc.g, abs(2 * vc.v - m.med2) AS dev2, vc.c
      FROM vc JOIN med m ON vc.g = m.g),
    dvc AS (SELECT g, dev2, CAST(sum(c) AS BIGINT) AS c
            FROM dv GROUP BY g, dev2),
    dcum AS (
      SELECT g, dev2, sum(c) OVER (PARTITION BY g ORDER BY dev2
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM dvc),
    mad AS (
      SELECT d.g,
             min(CASE WHEN cum > CAST(floor((n - 1) / 2.0) AS BIGINT)
                      THEN dev2 END)
             + min(CASE WHEN cum > CAST(ceil((n - 1) / 2.0) AS BIGINT)
                        THEN dev2 END) AS mad4
      FROM dcum d JOIN tot t ON d.g = t.g GROUP BY d.g)
    SELECT m.g AS grp, m.med2 AS med2, md.mad4 AS mad4,
           CAST(sum(CASE WHEN abs(2 * vc.v - m.med2) * 4 > 3 * md.mad4
                         THEN vc.c ELSE 0 END) AS BIGINT)
             AS n_beyond_1p5mad,
           CAST(sum(CASE WHEN abs(2 * vc.v - m.med2) * 2 > 3 * md.mad4
                         THEN vc.c ELSE 0 END) AS BIGINT)
             AS n_beyond_3mad
    FROM vc, med m, mad md
    WHERE vc.g = m.g AND m.g = md.g
    GROUP BY m.g, m.med2, md.mad4
    ORDER BY grp
"""


@register("op_robust_zscore", oracle=_ROBUST_Z_SQL)
def op_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier counts — the robust alternative to mean/σ
    z-scores (one fat-finger row cannot drag the center). Everything
    stays in scaled integers: med2 = 2×median (sum of the two middle
    members), mad4 = 4×MAD (2×median of 2×|deviations|), and both
    tail tests are exact BIGINT comparisons — no sqrt, no division,
    no float anywhere. Two thresholds (|v−med| > t·MAD rewritten into
    the scaled integers: t=1.5 ⟺ |2v−med2|·4 > 3·mad4, t=3 ⟺
    |2v−med2|·2 > 3·mad4): `n_beyond_1p5mad` is the mild-outlier band
    (the r6 review caught the original single column mislabeling this
    very test as 3-MAD), `n_beyond_3mad` the classic strict cut — on
    the bounded 1..50 quantity fixture the strict count is provably
    zero, so the 1.5-MAD column is what keeps the tail arm
    fixture-exercised.

    Scale: both medians ride the value-count map (groupBy to (group,
    value), running sum over per-group distinct values — the same
    bounded two-phase shape as `op_winsorize`); the deviation map
    derives from the VALUE map, not the fact, so the second median is
    ~free. One final fact-free aggregate counts tail mass. For
    unbounded-cardinality columns switch both median steps to the
    bucket-histogram tail rank.
    """
    return Q(spark, sf_dir, _ROBUST_Z_SQL)


# --- 32. deterministic weighted sampling ------------------------------------

_WSAMPLE_SQL = """
    WITH w AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             least(999999, CAST(round(o_totalprice * 100) AS BIGINT)
                             / 50) AS weight_ppm,
             ((o_orderkey % 1000003) * 2654435761) % 1000000 AS h
      FROM orders)
    SELECT o_orderpriority AS grp,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(cents) AS BIGINT) AS kept_cents,
           CAST(sum(o_orderkey % 1000003) AS BIGINT) AS key_checksum
    FROM w WHERE h < weight_ppm
    GROUP BY o_orderpriority ORDER BY grp
"""


@register("op_sample_weighted", oracle=_WSAMPLE_SQL)
def op_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sampling, fully deterministic:
    each row's keep-probability is its integer weight in ppm (here
    price-proportional, capped), and the coin flip is a Knuth-
    multiplicative hash of the key against that threshold — the same
    row set on every engine, every run, every partitioning (the
    property `rand()`-based sampling can never give a training-data
    pipeline that must be replayable). Emits per-class kept counts,
    kept mass, and a key checksum pinning WHICH rows.

    Scale: map-only — a filter the scan evaluates inline; no shuffle
    until the final tiny aggregate. The hash-threshold trick is also
    the resumable form: re-running after appends keeps exactly the
    old rows' verdicts (keyed, not positional).
    """
    return Q(spark, sf_dir, _WSAMPLE_SQL)


# --- 33. equal-frequency feature binning ------------------------------------

_QBIN_DUCK_SQL = """
    WITH t AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey,
             ntile(8) OVER (ORDER BY CAST(round(o_totalprice * 100)
                                          AS BIGINT), o_orderkey) AS bin
      FROM orders)
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM t GROUP BY bin ORDER BY bin
"""


@register("op_quantile_binning", oracle=_QBIN_DUCK_SQL)
def op_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quantile) binning of a numeric feature into 8
    bins with their realized edges — the discretization step tree /
    NB / WoE pipelines apply before encoding. Bin assignment is SQL
    ntile over the strict total order (cents, orderkey), so bin
    populations differ by at most one row and edges are exact members.

    Scale: the oracle's global ntile window is the single-task trap;
    the engine runs `operators.distributed_ntile` instead — one
    range-partitioned sort + per-partition row_number + a broadcast
    |partitions|-row offset table, bit-identical to the built-in by
    its remainder-rule arithmetic (integer div/%), then a tiny bin
    aggregate. The same decomposition `op_curriculum_order` rides.
    """
    t = (table(spark, sf_dir, "orders")
         .select(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
                  .alias("cents"), "o_orderkey"))
    tiled = distributed_ntile(t, ["cents", "o_orderkey"], 8, "bin")
    return (tiled.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.min("cents").cast("bigint").alias("lo_cents"),
                 F.max("cents").cast("bigint").alias("hi_cents"))
            .orderBy("bin"))


# --- 34. time-horizon train/val/test split ----------------------------------

_TSPLIT_SPARK_SQL = """
    WITH s AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 'train'
                  WHEN o_orderdate < TIMESTAMP '2000-06-01' THEN 'val'
                  ELSE 'test' END AS split,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             date_format(o_orderdate, 'yyyy-MM-dd') AS d
      FROM orders)
    SELECT split, CAST(count(*) AS BIGINT) AS n,
           min(d) AS first_day, max(d) AS last_day,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM s GROUP BY split ORDER BY split
"""

_TSPLIT_DUCK_SQL = """
    WITH s AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 'train'
                  WHEN o_orderdate < TIMESTAMP '2000-06-01' THEN 'val'
                  ELSE 'test' END AS split,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             strftime(o_orderdate, '%Y-%m-%d') AS d
      FROM orders)
    SELECT split, CAST(count(*) AS BIGINT) AS n,
           min(d) AS first_day, max(d) AS last_day,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM s GROUP BY split ORDER BY split
"""


@register("op_time_split", oracle=_TSPLIT_DUCK_SQL)
def op_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-horizon train/val/test split report: fixed calendar
    boundaries partition the fact by event time (the leakage-safe
    split for forecasting — `op_stratified_split`'s hash split is the
    iid form; THIS is the one temporal models must use, or the val
    set sees the future), with per-split row counts, date coverage
    (yyyy-MM-dd strings — the cross-engine-stable date surface), and
    target mass for imbalance checks.

    Scale: map-only classify + one 3-row aggregate, one fact pass.
    The boundaries-as-literals form is what a 100 TB run wants anyway:
    partition-pruned parquet reads per split fall out for free when
    the table is date-partitioned."""
    return Q(spark, sf_dir, _TSPLIT_SPARK_SQL)


# --- 35. AUC-ROC via rank-sum (Mann-Whitney U, integer midranks) ------------

_AUC_SQL = """
    WITH r AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS score,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders),
    vc AS (
      SELECT grp, score,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(label) AS BIGINT) AS c_pos
      FROM r GROUP BY grp, score),
    cum AS (
      SELECT grp, score, c, c_pos,
             sum(c) OVER (PARTITION BY grp ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
               AS below
      FROM vc),
    s AS (
      SELECT grp,
             CAST(sum(CAST(c_pos AS DECIMAL(18, 0))
                      * (2 * below + c + 1)) AS DOUBLE) AS ranksum2,
             CAST(sum(c_pos) AS BIGINT) AS n_pos,
             CAST(sum(c - c_pos) AS BIGINT) AS n_neg
      FROM cum GROUP BY grp)
    SELECT grp, n_pos, n_neg,
           CAST(floor(1000000.0 * (ranksum2 - 1.0 * n_pos * (n_pos + 1))
                      / (2.0 * n_pos * n_neg)) AS BIGINT) AS auc_ppm
    FROM s WHERE n_pos > 0 AND n_neg > 0
    ORDER BY grp
"""


@register("op_auc_roc", oracle=_AUC_SQL)
def op_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC per segment WITHOUT sorting predictions per threshold:
    the Mann-Whitney rank-sum identity. Doubled midranks keep ties
    exact in integers — for each distinct score, midrank2 = 2·(#rows
    below) + (#tied) + 1, so Σ over positives is a BIGINT and AUC =
    (ranksum2 − n⁺(n⁺+1)) / (2·n⁺·n⁻) is ONE double division floored
    to ppm. The model-eval primitive for a trainer's offline loop.

    Scale: rides the value-count map (groupBy (group, score) with
    map-side combine), a running-sum window over per-group distinct
    scores, and a per-group fold — never a global sort of raw
    predictions, never a per-threshold pass. Continuous scores at
    extreme cardinality switch the map to fixed-point buckets first
    (binned AUC), same shape. Exactness bound: ranksum2 ≈ 2·n⁺·n
    stays under 2^63 to ~2·10^9 rows per group; past that the same
    bucketing also restores the headroom."""
    return Q(spark, sf_dir, _AUC_SQL)


# --- 36. confusion matrix + P/R/F1 at a threshold ---------------------------

_CONFUSION_SQL = """
    WITH r AS (
      SELECT CASE WHEN round(o_totalprice * 100) >= 15000000
                  THEN 1 ELSE 0 END AS pred,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders),
    c AS (
      SELECT CAST(sum(pred * label) AS BIGINT) AS tp,
             CAST(sum(pred * (1 - label)) AS BIGINT) AS fp,
             CAST(sum((1 - pred) * label) AS BIGINT) AS fn,
             CAST(sum((1 - pred) * (1 - label)) AS BIGINT) AS tn
      FROM r)
    SELECT tp, fp, fn, tn,
           CAST(floor(1000000.0 * tp / (tp + fp)) AS BIGINT)
             AS precision_ppm,
           CAST(floor(1000000.0 * tp / (tp + fn)) AS BIGINT)
             AS recall_ppm,
           CAST(floor(2000000.0 * tp / (2 * tp + fp + fn)) AS BIGINT)
             AS f1_ppm
    FROM c
"""


@register("op_confusion_matrix", oracle=_CONFUSION_SQL)
def op_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded confusion matrix with precision/recall/F1: the four
    cells are one conditional-sum aggregate (map-side partials — the
    2×2 matrix needs no groupBy key at all), and every derived metric
    is a single division of exact BIGINTs floored to ppm — F1 computed
    directly from counts (2tp / (2tp+fp+fn)) so no ppm-of-ppm rounding
    compounds.

    Scale: one map-only classify + a 1-row aggregate. Sweeping many
    thresholds pivots to one pass with a CASE per threshold or the
    `op_auc_roc` rank identity (which IS the full sweep)."""
    return Q(spark, sf_dir, _CONFUSION_SQL)


# --- 37. calibration bins (reliability diagram) -----------------------------

_CALIB_SQL = """
    WITH r AS (
      SELECT least(9, CAST(floor(round(o_totalprice * 100) / 5000000.0)
                           AS BIGINT)) AS bin,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(floor(1000000.0 * sum(label) / count(*)) AS BIGINT)
             AS rate_ppm
    FROM r GROUP BY bin ORDER BY bin
"""


@register("op_calibration_bins", oracle=_CALIB_SQL)
def op_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: score deciles (fixed-width integer
    bucketing with a top clamp — deterministic edges, no quantile
    dependence) vs realized positive rate in ppm. Calibration drift is
    the first thing to check when a deployed model's AUC holds but
    decisions degrade.

    Scale: map-only bin + 10-row aggregate, one pass; per-segment
    calibration adds the segment to the groupBy key, same shape."""
    return Q(spark, sf_dir, _CALIB_SQL)


# --- 38. Kolmogorov-Smirnov two-sample statistic ----------------------------

_KS_SQL = """
    WITH r AS (
      SELECT CAST(floor(l_quantity) AS BIGINT) AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS side
      FROM lineitem WHERE l_returnflag IN ('R', 'N')),
    vc AS (
      SELECT v, CAST(sum(side) AS BIGINT) AS ca,
             CAST(sum(1 - side) AS BIGINT) AS cb
      FROM r GROUP BY v),
    cum AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      FROM vc),
    g AS (
      SELECT (SELECT CAST(sum(ca) AS BIGINT) FROM vc) AS na,
             (SELECT CAST(sum(cb) AS BIGINT) FROM vc) AS nb,
             CAST(max(abs(cum_a * (SELECT sum(cb) FROM vc)
                          - cum_b * (SELECT sum(ca) FROM vc)))
                  AS BIGINT) AS max_cross
      FROM cum)
    SELECT na, nb, max_cross,
           CAST(floor(1000000.0 * max_cross / (1.0 * na * nb))
                AS BIGINT) AS ks_ppm
    FROM g
"""


@register("op_ks_test", oracle=_KS_SQL)
def op_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: the max CDF gap
    between two populations, computed as max |cumA·nB − cumB·nA| over
    the merged value set — cross-multiplied so the running comparison
    is EXACT BIGINT (one final division floors to ppm). The
    distribution-shift test `op_feature_drift`'s binned L1 only
    approximates; KS needs no binning at all on a discrete feature.

    Scale: value-count map (map-side combine), ONE running-sum window
    over the distinct-value set. The window is unpartitioned but its
    input is the DISTINCT VALUE table, not the fact — bounded by
    feature cardinality (~50 here); for unbounded columns bucket to
    fixed-point first, which re-introduces binning at the resolution
    you choose. Cross products stay under 2^63 while cum·n < 9e18 —
    i.e. up to ~3e9 rows per side exactly; past that, scale counts by
    a power of two first."""
    return Q(spark, sf_dir, _KS_SQL)


# --- 39. chi-squared feature screening --------------------------------------

_CHI2_SQL = """
    WITH cells AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
             CAST(count(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2),
    m AS (
      SELECT cat, label, o,
             CAST(sum(o) OVER (PARTITION BY cat) AS BIGINT) AS row_t,
             CAST(sum(o) OVER (PARTITION BY label) AS BIGINT) AS col_t,
             CAST(sum(o) OVER () AS BIGINT) AS n
      FROM cells),
    t AS (
      SELECT cat, label,
             CAST(floor(1000.0
                        * (o - 1.0 * row_t * col_t / n)
                        * (o - 1.0 * row_t * col_t / n)
                        / (1.0 * row_t * col_t / n)) AS BIGINT)
               AS term_milli
      FROM m)
    SELECT cat, CAST(sum(term_milli) AS BIGINT) AS chi2_milli_sum
    FROM t GROUP BY cat ORDER BY cat
"""


@register("op_chi2_feature", oracle=_CHI2_SQL)
def op_chi2_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence screening of a categorical feature
    against a binary label — the classic feature-selection filter.
    Per contingency cell, (O − E)²/E (E = row·col/N) is a FIXED chain
    of single IEEE ops floored to milli units — the all-BIGINT
    numerator form (O·N − R·C)² was the r6 probe's overflow find: it
    passes 2^63 already at sf1 (DuckDB raised on the INT128→INT64
    cast; Spark would have wrapped silently with ANSI off). The
    reported per-category statistic sums the floored BIGINT terms
    (sum-of-floored, not floored-sum — the deterministic definition,
    since float addition order across cells would not be).

    Scale: the contingency table is one two-phase aggregate to
    |cat|×|label| cells; margins are windows over that TINY cell
    table (not the fact); the fact is scanned once. Screening
    hundreds of features stacks them in one pass with (feature, cat)
    keys."""
    return Q(spark, sf_dir, _CHI2_SQL)


# --- 40. market-basket association rules ------------------------------------

#: Mega-basket guard (r15, the skew case the r14 docstring left open):
#: a basket with B distinct items expands to B·(B−1)/2 pair rows in ONE
#: task (the self-join keys on the order), so a single 10^5-item basket
#: is a 5·10^9-row straggler no partitioning can split. Baskets past
#: the cap are EXCLUDED from pair mining — the standard PCY / basket-cap
#: discipline — and the exclusion is mirrored verbatim in the oracle
#: twin, so it is a shared semantic, not an engine shortcut. At the cap,
#: a worst-case basket contributes ≤ ~524k pair rows (bounded task).
#: TPC-H-shaped orders carry ≤ 7 lineitems, so the cap never fires on
#: the fixture tiers (hash-neutral there); the shape that trips it is
#: pinned by the fuzz mega-basket class (tools/fuzz_parity.py seeds 40+).
_BASKET_MAX_ITEMS = 1024

_BASKET_SQL = """
    WITH raw_items AS (
      SELECT DISTINCT l_orderkey AS k, l_partkey AS item
      FROM lineitem),
    kept AS (
      SELECT k FROM raw_items GROUP BY k
      HAVING count(*) <= {basket_cap}),
    items AS (
      SELECT i.k, i.item FROM raw_items i JOIN kept USING (k)),
    n_orders AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS n FROM items),
    item_cnt AS (
      SELECT item, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY item),
    pair_cnt AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM items a JOIN items b ON a.k = b.k AND a.item < b.item
      GROUP BY a.item, b.item HAVING count(*) >= 3),
    scored AS (
      SELECT p.item_a, p.item_b, p.c_ab,
             CAST(floor(1000000.0 * p.c_ab
                        / (SELECT n FROM n_orders)) AS BIGINT)
               AS support_ppm,
             CAST(floor(1000000.0 * p.c_ab / ca.c) AS BIGINT)
               AS confidence_ppm,
             CAST(floor(1000000.0 * p.c_ab * (SELECT n FROM n_orders)
                        / (1.0 * ca.c * cb.c)) AS BIGINT) AS lift_ppm
      FROM pair_cnt p
      JOIN item_cnt ca ON p.item_a = ca.item
      JOIN item_cnt cb ON p.item_b = cb.item),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY c_ab DESC, item_a, item_b)
               AS rnk
      FROM scored)
    SELECT CAST(rnk AS BIGINT) AS rnk, item_a, item_b, c_ab,
           support_ppm, confidence_ppm, lift_ppm
    FROM ranked WHERE rnk <= 25 ORDER BY rnk
""".format(basket_cap=_BASKET_MAX_ITEMS)


def _market_basket_plan(li: DataFrame) -> DataFrame:
    """One-fact-shuffle A-Priori plan over a lineitem-shaped DataFrame
    (shared by the registered key and the prune-losslessness test).

    Shuffle ledger: the single fact exchange is the opening
    ``repartition(k)`` — ``HashPartitioning(k)`` satisfies the
    clustered distribution of BOTH the (k, item) distinct aggregate
    AND the per-order self-join, so neither adds an exchange. Item
    counts (A-Priori pass 1) are a map-side-combined groupBy whose
    output is |frequent items|-sized and re-enters as a BROADCAST —
    the textbook premise that the pass-1 survivor table fits in
    memory; on a catalog where it doesn't, fall back to the window
    form this replaced (count(*) OVER (PARTITION BY item), one extra
    fact shuffle). The remaining exchange is the pair aggregate —
    the irreducible quadratic-per-basket core. Top-25 is
    TakeOrderedAndProject; row_number runs over 25 rows."""
    raw_items = (li.select(F.col("l_orderkey").alias("k"),
                           F.col("l_partkey").alias("item"))
                 .repartition(F.col("k"))
                 .groupBy("k", "item").agg(F.lit(1).alias("_one"))
                 .drop("_one"))
    raw_items = scoped_persist(raw_items)
    # Mega-basket guard (see _BASKET_MAX_ITEMS): basket sizes and the
    # kept-set come from the SAME k-partitioned persisted table, so the
    # size groupBy, the semi-join back, and the pair self-join all run
    # exchange-free on the cached partitioning.
    sizes = raw_items.groupBy("k").agg(F.count("*").alias("bsz"))
    # basket counts collected ONCE (two BIGINTs off the persisted items
    # table) and re-entered as literals — the 1-row join alternative
    # plans as a BroadcastNestedLoopJoin, which the global plan lint
    # bans; a scalar literal folds into the ppm projections instead.
    tot = sizes.agg(
        F.count("*").cast("long").alias("n_total"),
        F.coalesce(
            F.sum(F.when(F.col("bsz") <= _BASKET_MAX_ITEMS, 1).otherwise(0)),
            F.lit(0))
         .cast("long").alias("n_kept")).collect()[0]  # driver-ok: two scalar basket counts off the persisted items table
    n_val = int(tot["n_kept"])
    if tot["n_total"] != tot["n_kept"]:
        import warnings
        warnings.warn(
            f"op_market_basket: excluded "
            f"{tot['n_total'] - tot['n_kept']} mega-basket(s) with > "
            f"{_BASKET_MAX_ITEMS} distinct items from pair mining "
            "(mirrored in the oracle twin — shared semantic, see "
            "_BASKET_MAX_ITEMS).", RuntimeWarning, stacklevel=2)
    items = raw_items.join(
        sizes.filter(F.col("bsz") <= _BASKET_MAX_ITEMS).select("k"),
        "k", "left_semi")
    counts = (items.groupBy("item")
              .agg(F.count("*").cast("long").alias("c"))
              .filter("c >= 3"))
    fitems = items.join(F.broadcast(counts), "item")
    a = fitems.select("k", F.col("item").alias("item_a"),
                      F.col("c").alias("ca0"))
    b = fitems.select("k", F.col("item").alias("item_b"),
                      F.col("c").alias("cb0"))
    pair_cnt = (a.join(b, "k")
                .filter(F.col("item_a") < F.col("item_b"))
                .groupBy("item_a", "item_b")
                .agg(F.count("*").cast("long").alias("c_ab"),
                     F.max("ca0").alias("ca"), F.max("cb0").alias("cb"))
                .filter("c_ab >= 3"))
    scored = (pair_cnt
              .select("item_a", "item_b", "c_ab",
                      F.expr(f"CAST(floor(1000000.0 * c_ab / {n_val}L)"
                             " AS BIGINT)").alias("support_ppm"),
                      F.expr("CAST(floor(1000000.0 * c_ab / ca) AS BIGINT)")
                      .alias("confidence_ppm"),
                      F.expr(f"CAST(floor(1000000.0 * c_ab * {n_val}L"
                             " / (1.0 * ca * cb)) AS BIGINT)")
                      .alias("lift_ppm")))
    top = (scored.orderBy(F.desc("c_ab"), "item_a", "item_b").limit(25))
    w = bounded_window(F.desc("c_ab"), "item_a", "item_b",
                       bound="25-row top-k slice (post-LIMIT)")
    return (top.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .select("rnk", "item_a", "item_b", "c_ab", "support_ppm",
                    "confidence_ppm", "lift_ppm").orderBy("rnk"))


@register("op_market_basket", oracle=_BASKET_SQL)
def op_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (A-Priori): co-purchased part
    pairs per order with support / confidence / lift in floor-ppm —
    exact integer counts, one double division each.

    The engine applies BOTH A-Priori passes: pass 1 prunes at the ITEM
    level (an item in <3 orders cannot participate in any pair with
    c_ab ≥ 3 — pigeonhole-lossless, so the oracle's pair-only-prune
    SQL stays the semantic definition), pass 2 keeps the pair-level
    HAVING. The pass-1 survivor counts re-enter as a BROADCAST join
    onto the order-partitioned items, so confidence / lift need no
    fact-sized join back — each surviving pair carries ca and cb
    (constant within the group, folded by max()); see
    `_market_basket_plan` for the single-fact-shuffle ledger.

    Scale: pass 1 is where the 100 TB win lives — in a real (Zipf)
    catalog the long tail of rarely-bought items is most of the
    distinct-item space and never reaches the quadratic per-basket
    pair expansion. TPC-H's part usage is uniform (~30 orders/part at
    every SF), so the prune passes everything here and is instead
    exercised by a constructed skewed fixture in
    `tests/test_oracle_parity.py::test_market_basket_item_prune_is_lossless`.
    The self-join keys on the ORDER
    (baskets small ⇒ pairs per order k·(k−1)/2, corpus-LINEAR). The
    pathological mega-basket (one order with 10^5 items — a
    5·10^9-pair single-task straggler) is guarded by
    ``_BASKET_MAX_ITEMS`` (r15): baskets past the cap are excluded
    from pair mining on BOTH engines (the oracle twin carries the
    identical HAVING), the engine warns with the excluded count, and
    the DISTINCT already collapses repeated parts per order. The cap
    never fires on TPC-H-shaped fixtures (≤ 7 lineitems/order); the
    tripping shape is pinned by the fuzz mega-basket class."""
    out = _market_basket_plan(table(spark, sf_dir, "lineitem"))
    return out


# --- 41. sequence-gap audit (missing-block detection) -----------------------

_GAPS_SQL = """
    WITH present AS (
      SELECT DISTINCT event_id AS id FROM events
      WHERE event_id % 97 <> 0 AND event_id % 1000 <> 0),
    nxt AS (
      SELECT id, lead(id) OVER (ORDER BY id) AS next_id
      FROM present)
    SELECT CAST(id + 1 AS BIGINT) AS gap_start,
           CAST(next_id - 1 AS BIGINT) AS gap_end,
           CAST(next_id - id - 1 AS BIGINT) AS n_missing
    FROM nxt WHERE next_id > id + 1
    ORDER BY gap_start
"""


@register("op_sequence_gaps", oracle=_GAPS_SQL)
def op_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit: find every missing run in a dense id space
    (the blockchain ingestion completeness check — which BLOCKS are
    absent from the landing table; the reference's backfill planner
    needs exactly this list). The fixture plants TWO gap families —
    every 97th id (intra-bucket gaps) and every 1000th id (gaps ON the
    engine's bucket boundaries, so the cross-bucket detection arm is
    provably exercised, not dead); each maximal missing run reports
    (start, end, count).

    Scale: the oracle's global lead() window is the single-task trap
    at 10^10 blocks. The engine computes the SAME gap list with a
    range-partitioned form: ids bucket by `id div B`, per-bucket gaps
    come from a bucket-partitioned lead(), and cross-bucket gaps fall
    out of the per-bucket (min, max) summary table (metadata-sized —
    one row per bucket) joined to its lead — no global sort of the
    fact anywhere. Empty buckets between non-empty ones are covered
    by the summary-to-summary comparison, which sees the jump in
    bucket ids.

    The oracle's DISTINCT is deliberately NOT replicated: duplicate
    ids are gap-invariant (equal-id lead pairs yield next_id == id,
    dropped by the > id+1 filter; min/max are duplicate-insensitive),
    and Catalyst inlines the shared `present` CTE into BOTH consumers
    — with a distinct that meant three full fact shuffles (two
    distinct exchanges + the window). Without it the op is one fact
    shuffle (the bucket window) plus a map-side-combined min/max
    whose exchange moves |buckets| rows (r8 probe: 6.8x -> parity
    class at sf1)."""
    B = 1000
    present = (table(spark, sf_dir, "events")
               .filter((F.col("event_id") % 97 != 0)
                       & (F.col("event_id") % 1000 != 0))
               .select(F.col("event_id").alias("id"))
               .withColumn("b", F.expr(f"id div {B}")))
    wb = Window.partitionBy("b").orderBy("id")
    intra = (present
             .withColumn("next_id", F.lead("id").over(wb))
             .filter(F.col("next_id") > F.col("id") + 1)
             .select((F.col("id") + 1).cast("bigint").alias("gap_start"),
                     (F.col("next_id") - 1).cast("bigint").alias("gap_end")))
    summ = (present.groupBy("b")
            .agg(F.min("id").alias("mn"), F.max("id").alias("mx")))
    ws = bounded_window("b", bound="|buckets| rows — metadata-sized")
    cross = (summ
             .withColumn("next_mn", F.lead("mn").over(ws))
             .filter(F.col("next_mn") > F.col("mx") + 1)
             .select((F.col("mx") + 1).cast("bigint").alias("gap_start"),
                     (F.col("next_mn") - 1).cast("bigint").alias("gap_end")))
    return (intra.unionByName(cross)
            .withColumn("n_missing",
                        (F.col("gap_end") - F.col("gap_start") + 1)
                        .cast("bigint"))
            .orderBy("gap_start"))


# --- 42. output-shard assignment + skew audit -------------------------------

_SHARD_SQL = """
    WITH s AS (
      SELECT (((o_orderkey % 1000003) * 2654435761) % 1000003) % 64 AS shard,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM s GROUP BY shard)
    SELECT shard, n, total_cents,
           CAST(floor(1000000.0 * n * (SELECT count(*) FROM per)
                      / (SELECT sum(n) FROM per)) AS BIGINT)
             AS load_ppm_of_mean
    FROM per ORDER BY shard
"""


@register("op_shard_assignment", oracle=_SHARD_SQL)
def op_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard assignment audit: Knuth-hash every row to one of
    64 shards (the deterministic writer layout a training-data export
    uses so shard membership survives re-runs and appends) and report
    per-shard row count, mass, and load relative to the mean in ppm —
    the skew report that decides whether the shard count or the hash
    needs changing before a 100 TB write.

    Scale: map-only shard assignment inline at the scan + one 64-row
    aggregate; the relative-load column divides by run-once scalar
    subqueries over the 64-row table. A hot shard here means a hash
    problem, not a data problem — uniform keys × Knuth multiply is
    the standard defense. The key reduces mod 1000003 BEFORE the
    multiply so the product never passes 2^63 at any key scale
    (multiply-first wraps silently in Spark / raises in DuckDB past
    keys ~3.5e9 — the r6 review catch, applied repo-wide)."""
    return Q(spark, sf_dir, _SHARD_SQL)


# --- 43. z-score normalization table ----------------------------------------

_ZNORM_SQL = """
    WITH m AS (
      SELECT l_returnflag AS grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(l_extendedprice) AS DECIMAL(38, 0)))
                  AS BIGINT) AS sx,
             CAST(sum(CAST(floor(l_extendedprice) AS DECIMAL(18, 0))
                      * CAST(floor(l_extendedprice) AS BIGINT))
                  AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag)
    SELECT grp, n,
           CAST(floor(CAST(sx AS DOUBLE) / n) AS BIGINT) AS mean_dollars,
           CAST(floor(sqrt((1.0 * n * sxx - 1.0 * sx * sx)
                           / (1.0 * n * (n - 1)))) AS BIGINT)
             AS std_dollars
    FROM m WHERE n > 1 ORDER BY grp
"""


@register("op_zscore_normalize", oracle=_ZNORM_SQL)
def op_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization table (mean, sample std in
    floor-dollars) — the artifact a feature pipeline broadcast-joins
    onto serving rows to standardize features; `agg_corr`'s exact-
    integer-moments contract applied to the second moment: n, Σx, Σx²
    are exact BIGINTs (FLOORED DOLLARS, not cents — the r6 probe
    caught the cents form's Σx² passing 2^63 already at sf1; dollars
    hold the same headroom bound agg_corr documents) and mean/std
    each end in ONE fixed IEEE chain (divide / divide-then-sqrt)
    floored to integer dollars.

    Scale: one two-phase integer aggregate over the fact to |groups|
    rows — the map-side partials carry three BIGINTs per group. The
    same shape stacks hundreds of features into one pass with
    (feature, group) keys; the output table broadcasts."""
    return Q(spark, sf_dir, _ZNORM_SQL)


# --- 44. field-level survivorship (per-column donors) -----------------------

_SURVIVOR_FIELDS_DUCK_SQL = """
    WITH p AS (
      SELECT doc_id, lang, source, n_chars,
             array_to_string(string_split(trim(text), ' ')[1:3], ' ')
               AS prefix
      FROM documents),
    grp AS (
      SELECT prefix, CAST(count(*) AS BIGINT) AS n_members
      FROM p GROUP BY prefix HAVING count(*) > 1),
    m AS (
      SELECT p.prefix, p.doc_id, p.lang, p.source, p.n_chars,
             row_number() OVER (PARTITION BY p.prefix
                                ORDER BY p.n_chars DESC, p.doc_id)
               AS content_rn,
             row_number() OVER (PARTITION BY p.prefix
                                ORDER BY p.doc_id) AS first_rn,
             row_number() OVER (PARTITION BY p.prefix
                                ORDER BY length(p.source) DESC,
                                         p.source DESC, p.doc_id)
               AS fresh_rn
      FROM p JOIN grp ON p.prefix = grp.prefix)
    SELECT g.prefix, g.n_members,
           min(CASE WHEN first_rn = 1 THEN doc_id END)
             AS canonical_doc_id,
           min(CASE WHEN content_rn = 1 THEN doc_id END)
             AS content_donor_id,
           CAST(min(CASE WHEN content_rn = 1 THEN n_chars END) AS BIGINT)
             AS survivor_n_chars,
           min(CASE WHEN first_rn = 1 THEN lang END) AS survivor_lang,
           min(CASE WHEN fresh_rn = 1 THEN source END) AS survivor_source,
           min(CASE WHEN fresh_rn = 1 THEN doc_id END)
             AS source_donor_id,
           CAST(count(DISTINCT CASE WHEN content_rn = 1 THEN doc_id
                                    WHEN first_rn = 1 THEN doc_id
                                    WHEN fresh_rn = 1 THEN doc_id END)
                AS BIGINT) AS n_donors
    FROM m JOIN grp g ON m.prefix = g.prefix
    GROUP BY g.prefix, g.n_members
    ORDER BY g.prefix
"""


@register("op_survivorship_fields", oracle=_SURVIVOR_FIELDS_DUCK_SQL)
def op_survivorship_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level survivorship: the golden record assembled PER COLUMN
    from potentially DIFFERENT donors — content from the richest copy
    (max n_chars, id tie-break), identity and lang from the first-seen
    copy (min doc_id), source from the freshest copy (max source, id
    tie-break) — with every election rule explicit and deterministic,
    and `n_donors` counting how many distinct rows actually
    contributed a field (the row-level key `op_survivorship` is the
    single-donor degenerate case). This is the form MDM pipelines
    actually need: the best value of each attribute rarely lives in
    one row.

    Scale: same single shuffle on the duplicate-group key as the
    row-level key; the three election windows share one partitioning
    (one WindowExec stage, three rank columns); partition size =
    duplicate-cluster size, bounded by the upstream dedup caps."""
    spark_sql = _SURVIVOR_FIELDS_DUCK_SQL.replace(
        "array_to_string(string_split(trim(text), ' ')[1:3], ' ')",
        # CASE guard: Spark's concat_ws renders a NULL token array as
        # '' where the oracle's array_to_string propagates NULL — a
        # NULL-text doc must keep a NULL prefix (its own group), not
        # merge into the empty-text group (r12 null-seed fuzz)
        "CASE WHEN text IS NULL THEN NULL ELSE"
        " concat_ws(' ', slice(split(trim(text), ' '), 1, 3)) END")
    return Q(spark, sf_dir, spark_sql)


# --- 45. seasonality profile (dow × hour heatmap + per-day peak) -------------

_SEASON_SPARK_SQL = """
    WITH base AS (
      SELECT dayofweek(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    cell AS (
      SELECT dow, hr, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM base GROUP BY dow, hr),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY dow
                                   ORDER BY n DESC, hr) AS rnk
      FROM cell)
    SELECT CAST(dow AS BIGINT) AS dow, hr, n, total_cents,
           rnk = 1 AS is_peak_hour
    FROM ranked ORDER BY dow, hr
"""

_SEASON_DUCK_SQL = """
    WITH base AS (
      SELECT dayofweek(ts) + 1 AS dow, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    cell AS (
      SELECT dow, hr, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM base GROUP BY dow, hr),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY dow
                                   ORDER BY n DESC, hr) AS rnk
      FROM cell)
    SELECT CAST(dow AS BIGINT) AS dow, hr, n, total_cents,
           rnk = 1 AS is_peak_hour
    FROM ranked ORDER BY dow, hr
"""


@register("op_seasonality_profile", oracle=_SEASON_DUCK_SQL)
def op_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heatmap: activity by (day-of-week × hour) with the
    per-day peak hour flagged — the profile capacity planning and
    anomaly baselining both start from (an alert threshold that
    ignores the Tuesday-10am peak pages someone every Tuesday).

    Determinism: day-of-week numbering is the dialect trap — Spark's
    `dayofweek` is 1=Sunday..7 while DuckDB's is 0=Sunday..6, so the
    twins differ by exactly `+1` and nothing else; counts and cents
    are exact BIGINTs, peak election ties break on the earlier hour.

    Scale: one two-phase aggregate to ≤168 cells; the peak rank is a
    window over ≤24 rows per day partition. The fact is scanned once
    whatever the calendar resolution — finer grids (month × dow ×
    hour) only widen the cell table."""
    return Q(spark, sf_dir, _SEASON_SPARK_SQL)


# --- 44. Gini impurity per feature split (feature-selection primitive) ------

_GINI_DUCK_SQL = """
    WITH lab AS (
      SELECT o.o_orderstatus AS cls, o.o_orderpriority AS prio,
             c.c_mktsegment AS seg
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cell AS (
      SELECT 'priority' AS feature, prio AS grp, cls,
             CAST(count(*) AS BIGINT) AS c
      FROM lab GROUP BY 2, 3
      UNION ALL
      SELECT 'segment' AS feature, seg AS grp, cls,
             CAST(count(*) AS BIGINT) AS c
      FROM lab GROUP BY 2, 3),
    p AS (
      SELECT feature, grp,
             CAST(sum(c) OVER (PARTITION BY feature, grp) AS BIGINT) AS n,
             CAST(floor(1000000.0 * c
                        / sum(c) OVER (PARTITION BY feature, grp))
                  AS BIGINT) AS pippm
      FROM cell)
    SELECT feature, grp, max(n) AS n,
           CAST(1000000 - floor(1.0 * sum(pippm * pippm) / 1000000)
                AS BIGINT) AS gini_ppm
    FROM p GROUP BY feature, grp
    ORDER BY feature, grp
"""


@register("op_gini_impurity", oracle=_GINI_DUCK_SQL)
def op_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of the order-status class under two candidate
    feature splits (order priority, customer market segment) — the
    decision-tree / feature-selection scoring primitive: the split
    with lower weighted impurity separates the label better.

    Determinism: the whole metric is rational — per-cell class shares
    are floor-ppm BIGINTs and Gini is 10^6 − floor(Σ p_ppm² / 10^6),
    so there is no ln()/entropy in sight (the repo's no-transcendental
    rule) and no overflow at ANY scale: p_ppm ≤ 10^6 caps the inner
    sum at |classes|·10^12 regardless of row count — by-construction
    immunity to the 2^63 class of defect the sf1 probe caught in r6.

    Scale: one orders ⋈ customer pass (merge-hinted — both sides are
    fact-class) aggregated straight to the (priority, segment,
    status) cross-grid, persisted; each feature's cells roll up from
    that GRID, so adding candidate features adds grid rollups, never
    another join execution. Every window below runs over the
    metadata-sized cell table."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").hint("merge")
    lab = (o.join(c, o.o_custkey == c.c_custkey)
           .select(F.col("o_orderstatus").alias("cls"),
                   F.col("o_orderpriority").alias("prio"),
                   F.col("c_mktsegment").alias("seg")))
    # ONE fact-join pass: aggregate to the (prio, seg, cls) cross-cell
    # grid first (≤ |prios|·|segs|·|statuses| rows), then roll each
    # feature's cells up from the GRID — a unionAll of two groupBys over
    # `lab` would execute the merge join twice (Spark reuses exchanges,
    # not arbitrary subplans), which is what the scale note promises NOT
    # to do
    grid = scoped_persist(
        lab.groupBy("prio", "seg", "cls")
           .agg(F.count("*").cast("bigint").alias("c")))
    cell = (grid.groupBy(F.lit("priority").alias("feature"),
                         F.col("prio").alias("grp"), "cls")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .unionAll(
                grid.groupBy(F.lit("segment").alias("feature"),
                             F.col("seg").alias("grp"), "cls")
                .agg(F.sum("c").cast("bigint").alias("c"))))
    w = Window.partitionBy("feature", "grp")
    p = cell.select(
        "feature", "grp",
        F.sum("c").over(w).cast("bigint").alias("n"),
        F.expr("CAST(floor(1000000.0 * c / sum(c) OVER "
               "(PARTITION BY feature, grp)) AS BIGINT)").alias("pippm"))
    return (p.groupBy("feature", "grp")
            .agg(F.max("n").alias("n"),
                 F.expr("CAST(1000000 - floor(1.0 * sum(pippm * pippm)"
                        " / 1000000) AS BIGINT)").alias("gini_ppm"))
            .orderBy("feature", "grp"))


# --- 45. churn labels (training-label generation) ---------------------------

_CHURN_DAYS = 90

_CHURN_DUCK_SQL = f"""
    WITH per AS (
      SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey)
    SELECT custkey, last_order, n_orders,
           CAST(CASE WHEN last_order <
                  (SELECT max(o_orderdate) FROM orders)
                    - INTERVAL {_CHURN_DAYS} DAY
                THEN 1 ELSE 0 END AS BIGINT) AS churned
    FROM per ORDER BY custkey
"""


@register("op_churn_labels", oracle=_CHURN_DUCK_SQL)
def op_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-label generation: per customer, last order date, lifetime
    order count, and a churned flag (no order within {_CHURN_DAYS}
    days of the dataset's last day) — the label-building step every
    supervised churn model starts from, expressed as data (the repo's
    target-encoding / time-split keys consume exactly this shape).

    Determinism: dates compare exactly; the cutoff is computed from
    the collected max date with python's date arithmetic, which
    matches the oracle's DATE - INTERVAL exactly (no timestamp /
    timezone arithmetic in sight).

    Scale: one two-phase aggregate to customer grain; the global max
    date is collected off that AGGREGATE (customer-sized, not the
    fact) as one row and folded back as a literal — the repo's
    collect-tiny-dims-once idiom, so no unpartitioned window and no
    second fact pass."""
    import datetime

    per = (table(spark, sf_dir, "orders")
           .groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.max("o_orderdate").alias("last_order"),
                F.count("*").cast("bigint").alias("n_orders")))
    per = scoped_persist(per)  # customer-grain aggregate feeds the max
    # collect AND the returned plan — persist so the fact is scanned
    # once; scoped so the caller can release after materializing
    maxd = per.agg(F.max("last_order")).collect()[0][0]  # driver-ok: 1-row max off the persisted aggregate
    # empty input: no customers exist, so the cutoff is never compared —
    # any literal keeps the plan total
    cutoff = (maxd - datetime.timedelta(days=_CHURN_DAYS)
              if maxd is not None else datetime.date(1970, 1, 1))
    return (per.withColumn(
        "churned",
        F.when(F.col("last_order") < F.lit(cutoff), 1)
        .otherwise(0).cast("bigint"))
        .orderBy("custkey"))


# Render the constant into the plain-string docstring (an f-string would
# not be a docstring at all — __doc__ None; the meta-test pins that trap).
op_churn_labels.__doc__ = op_churn_labels.__doc__.replace(
    "{_CHURN_DAYS}", str(_CHURN_DAYS))


# --- 46. two-hop reach over the co-purchase graph ---------------------------

_TWOHOP_CUST_CAP = 128

#: The capped bipartite edge block shared by every wedge-machinery
#: oracle (2hop, neighbor Jaccard) — ONE definition so a cap or edge
#: rework cannot silently de-synchronize them.
_CAPPED_EDGE_CTES = f"""e AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    ok AS (SELECT c FROM e GROUP BY c
           HAVING count(*) <= {_TWOHOP_CUST_CAP}),
    e2 AS (SELECT e.c, e.s FROM e JOIN ok USING (c))"""

_TWOHOP_DUCK_SQL = f"""
    WITH {_CAPPED_EDGE_CTES},
    two AS (
      SELECT a.s AS suppkey, CAST(count(DISTINCT b.s) AS BIGINT)
               AS two_hop
      FROM e2 a JOIN e2 b ON a.c = b.c AND a.s <> b.s
      GROUP BY a.s)
    SELECT suppkey, two_hop FROM two
    ORDER BY two_hop DESC, suppkey LIMIT 100
"""


def _capped_fan(spark: SparkSession, sf_dir: str,
                min_size: int = 2) -> DataFrame:
    """The capped customer fan shared by `op_graph_2hop` and
    `op_graph_jaccard`: per customer, the SORTED array of distinct
    suppliers they buy from, customers over `_TWOHOP_CUST_CAP`
    suppliers dropped (mirrors `_CAPPED_EDGE_CTES`'s e2 exactly,
    reshaped to one array row per customer).

    This is the r9 wedge rework: aggregating the fan to an array
    FIRST (one customer-keyed shuffle; collect_set dedups (c, s) in
    the same pass, so no separate DISTINCT shuffle) lets both
    consumers enumerate wedge pairs MAP-SIDE from the array instead
    of through an e2⋈e2 self-join — the wedge stream never hits a
    shuffle as rows. shuffle_hash on the order→customer join: the
    groupBy rehashes on c anyway, so an SMJ's sort of the fact is
    pure waste (measured: merge-hinted build 6.3 s vs 2.5 s at sf1).
    The cap bounds the array (≤128 entries) and the per-row pair
    expansion (≤8128), so executor memory per row is O(cap²) at any
    corpus size — including the collect_set aggregation buffer itself,
    because over-cap customers are anti-joined away BEFORE the set
    aggregate (r10; the extra count_distinct pass over the edge set is
    the price of bounded state, measured at sf1 in SCALE.md §r10).

    ``min_size``: wedge consumers drop single-supplier customers
    (no pairs to enumerate — the default 2); `op_degree_assortativity`
    and `op_graph_jaccard` pass 1 because singleton customers still
    carry an edge whose endpoint degree enters their statistics.

    r10 materialization rework, both stages MEASURED at sf3+sf10
    against the lazy and fan-only-checkpoint alternatives (SCALE.md
    §r10): the DISTINCT edge set is eagerly localCheckpoint'ed once
    (one fact pipeline total — the checkpoint-job path does not get
    AQE's ReusedExchange, so a lazy edge set re-runs the fact join per
    referencing branch, which loses by sf10), then the finished fan —
    CUSTOMER-grain, i.e. dimension-sized at any SF — is checkpointed
    again so consumers that reference it several times (jaccard: pair
    expansion + two degree broadcasts) read ~|customers| local rows.
    The small-SF cost of the extra materialization boundary (+0.9 s at
    sf3 on 2hop) buys FALLING spark:duck ratios at scale (2hop sf10
    9.9 → 7.5 s, jaccard 1.77×, assortativity 2.17× — vs rising
    ratios for both alternatives). Both checkpoints are registered
    with `caching.release_all`."""
    from ..caching import scoped_checkpoint

    e_d = scoped_checkpoint(_fan_edges(spark, sf_dir))
    return scoped_checkpoint(_fan_from_edges(e_d, min_size))


def _fan_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy distinct (customer, supplier) edge set — `_capped_fan`'s
    first checkpoint body, split out so plan tests can pin its shape
    (the checkpoint hides it from the consumer's final plan)."""
    li = table(spark, sf_dir, "lineitem")
    oh = (table(spark, sf_dir, "orders")
          .select(F.col("o_orderkey").alias("ok"),
                  F.col("o_custkey").alias("c"))
          .hint("shuffle_hash"))
    return (li.select(F.col("l_orderkey").alias("ok"),
                      F.col("l_suppkey").alias("s"))
            .join(oh, "ok")
            .select("c", "s")
            .distinct())  # keys-only hash agg, O(1) state per key


def _fan_from_edges(e_d: DataFrame, min_size: int) -> DataFrame:
    """Lazy capped fan over a (checkpointed) distinct edge set —
    `_capped_fan`'s second checkpoint body, split out for plan tests.

    Bounded state end-to-end: over-cap customers are dropped by a
    broadcast anti-join fed by an O(1)-state count aggregate BEFORE
    collect_set (the r9 post-agg size filter bounded consumers but let
    a pathological everything-buyer blow the aggregation buffer), so
    the set aggregate's per-key state is ≤ cap entries by
    construction."""
    over = (e_d.groupBy("c")
            .agg(F.count("*").alias("nd"))
            .filter(F.col("nd") > _TWOHOP_CUST_CAP)
            .select("c"))
    return (e_d.join(F.broadcast(over), "c", "left_anti")
            .groupBy("c")
            .agg(F.sort_array(F.collect_set("s")).alias("arr"))
            .filter(F.size("arr") >= min_size))


@register("op_graph_2hop", oracle=_TWOHOP_DUCK_SQL, tags=("graph",))
def op_graph_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach: per supplier, the number of distinct OTHER
    suppliers reachable through a shared customer — the
    friends-of-friends neighborhood-size primitive between degree
    (1 hop) and PageRank (all hops); in a ledger graph it sizes each
    node's money-laundering / wash-trade candidate set.

    Scale: the wedge expansion is quadratic per CUSTOMER, so the cap
    is enforced on customer degree in CODE (`_capped_fan` /
    `_TWOHOP_CUST_CAP`, identical constant in the oracle — the
    entity-blocking lesson: a cap promised in prose is not a cap).
    The r9 form: wedge pairs expand MAP-SIDE from each customer's
    sorted supplier array (both orientations, JVM `transform`/
    `flatten` — no self-join, no wedge-grain shuffle), then the
    distinct-neighbor count aggregates as BITMAPS: partial
    bitmap_construct_agg per (supplier, bucket) compresses the
    shuffle to |suppliers|·|buckets| 4 KB rows per task REGARDLESS of
    wedge count — the reduce-first move of `op_embedding_gram`
    applied to distinct counting (a row-wise pair DISTINCT shuffles
    the full wedge stream, measured 12.5 M rows at sf1 vs ≤32·|s|
    bitmap rows here; sf1 total 4.1 s → 2.2 s). Top-100 is
    TakeOrderedAndProject.

    r11: the bitmap form's breakdown bound is now DISPATCHED, not
    documented — `_two_hop_from_fan` measures the supplier id space
    with one cheap max scan of the checkpointed fan and picks direct
    bitmaps (packed ids, the fixture/driver path — plan unchanged),
    a dense order-preserving remap (sparse ids re-packed to 1..|S|,
    restoring the bitmap regime for ANY id sparsity — the r10
    docstring's named-but-unimplemented remedy), or the 16-byte
    wedge-pair form (cardinality past the bitmap payoff, where Σ d²
    pair rows beat a same-shaped fan of 4 KB bitmap payloads). All
    three regimes are exact and agree (test-pinned); the cap keeps
    every regime linear in edges."""
    return _two_hop_from_fan(_capped_fan(spark, sf_dir))


#: bitmap-regime guard (r11, VERDICT r10 item 2): the bitmap-union
#: form's candidate join fans each edge to its customer's
#: buckets-touched count with a 4 KB bitmap payload per row, so it
#: only beats the 16-byte wedge-pair stream while the supplier ID
#: SPACE packs into few 32768-bit buckets (r10 measured the win at 4
#: buckets = 100k packed ids). Past this many buckets the fan's
#: payload bytes (≈ min(d, buckets)·4 KB per edge) overtake the pair
#: stream's d·16 B per edge and the dispatch falls through — first to
#: a dense remap (sparse ids re-packed), then to pairs (true
#: cardinality > _TWOHOP_MAX_BMP_BUCKETS·32768 ≈ 1 M suppliers).
_TWOHOP_MAX_BMP_BUCKETS = 32
#: coarse bucket divisor for the dense remap's carry-in rank: at most
#: this many rank buckets at ANY id width, so the bucket-offset
#: cumsum is a ≤65536-row metadata window while each bucket's local
#: row_number sorts |S|/65536 rows under hash distribution.
_TWOHOP_RANK_BUCKETS = 65536


def _two_hop_from_fan(fan: DataFrame,
                      max_bmp_buckets: int = _TWOHOP_MAX_BMP_BUCKETS
                      ) -> DataFrame:
    """Exact per-supplier two-hop counts from a capped (customer,
    sorted supplier array) fan, dispatching on the supplier id space
    (one max scan + at most one count-distinct scan of the
    checkpointed fan — driver-ok: two scalars):

    1. **direct bitmap** — ids pack into ≤ `max_bmp_buckets` 32768-bit
       buckets: the r10 union-of-neighborhood-bitmaps form, verbatim.
    2. **dense-remap bitmap** — sparse ids but ≤ max_bmp_buckets·32768
       DISTINCT suppliers: suppliers are renumbered 1..|S| by a
       deterministic order-preserving carry-in rank (local row_number
       per coarse bucket + broadcast bucket-offset prefix — the
       op_domain_token_cap pattern, so no |S|-row single-partition
       sort), then regime 1 runs over the dense ids. Count-exactness
       is label-invariant, and the remap is deterministic so stage
       recomputation cannot mix labelings.
    3. **wedge pairs** — cardinality past the bitmap payoff: map-side
       (s, other) pair expansion from the array (Σ d² ≤ cap·|edges|
       rows of 16 B — linear in edges under the cap) into a two-phase
       count-distinct. No 4 KB payloads, no remap.

    Size-1 arrays are dropped up front so the three regimes agree for
    ANY fan, not just `_capped_fan`'s min_size=2 output: a size-1 row
    contributes no wedge (regime 3 omits its supplier) and only the
    self bit to the bitmap union (regimes 1-2 would emit two_hop=0 for
    a supplier seen ONLY in size-1 rows — ADVICE r11). Dropping it is
    count-neutral for suppliers that also appear in ≥2-size rows, since
    the self bit is subtracted from the popcount anyway.
    """
    fan = fan.filter(F.size("arr") >= 2)
    e = fan.select("c", F.explode("arr").alias("s"))
    max_s = fan.agg(F.max(F.array_max("arr"))) \
        .first()[0]  # driver-ok: one scalar over the checkpointed fan
    if max_s is None:
        return _two_hop_bitmap(e, "s")  # empty fan: empty result
    if (max_s - 1) // 32768 + 1 <= max_bmp_buckets:
        return _two_hop_bitmap(e, "s")
    n_s = e.agg(F.count_distinct("s").alias("ns")) \
        .first()[0]  # driver-ok: one scalar, sparse-id regimes only
    if n_s > max_bmp_buckets * 32768:
        pairs = (fan.select(F.explode("arr").alias("s"), "arr")
                 .select("s", F.explode("arr").alias("s2"))
                 .filter("s != s2"))
        return (pairs.groupBy(F.col("s").alias("suppkey"))
                .agg(F.count_distinct("s2").cast("long").alias("two_hop"))
                .orderBy(F.desc("two_hop"), "suppkey").limit(100))
    w = max(1, (max_s + _TWOHOP_RANK_BUCKETS - 1) // _TWOHOP_RANK_BUCKETS)
    su = e.select("s").distinct().withColumn("rb", F.expr(f"s div {w}"))
    loc = F.row_number().over(Window.partitionBy("rb").orderBy("s"))
    # bucket offsets: ≤ _TWOHOP_RANK_BUCKETS rows — metadata-sized
    # single-partition prefix, then broadcast back
    off = (su.groupBy("rb").agg(F.count("*").alias("n"))
           .withColumn("off", F.coalesce(
               F.sum("n").over(
                   bounded_window("rb", bound="≤ _TWOHOP_RANK_BUCKETS offset rows")
                   .rowsBetween(Window.unboundedPreceding, -1)),
               F.lit(0))).select("rb", "off"))
    ranks = (su.withColumn("loc", loc)
             .join(F.broadcast(off), "rb")
             .select("s", (F.col("off") + F.col("loc")).alias("did")))
    from ..caching import scoped_checkpoint

    # _two_hop_bitmap consumes its edge frame twice (cb aggregate +
    # probe side) and the remap subtree (distinct + per-bucket window
    # + offset broadcast) would re-execute per consumer — the same
    # no-ReusedExchange reason _capped_fan eagerly checkpoints its two
    # stages (r11 review pass 1)
    return _two_hop_bitmap(
        scoped_checkpoint(e.join(ranks, "s").select("c", "s", "did")),
        "did")


def _two_hop_bitmap(e: DataFrame, id_col: str) -> DataFrame:
    """The r10 union-of-neighborhood-bitmaps kernel over an
    (c, s[, did]) edge frame: per (customer, bucket), ONE bitmap of
    the customer's whole supplier set; each edge (c, s) then
    contributes that prebuilt bitmap to supplier s, and per-supplier
    bitmap_or_agg unions them. two_hop = popcount − 1 (a supplier's
    own bit is in its every customer's set — true under any injective
    id remap). The join emits edges × buckets-touched rows —
    Σ_c d_c·min(d_c, buckets) — LINEAR IN EDGES while the (possibly
    remapped) id space fits few bitmap buckets; the dispatch in
    `_two_hop_from_fan` guarantees that precondition. The wedge
    expansion this replaces is quadratic per customer UNCONDITIONALLY
    (Σ d² rows through a per-row SortAggregate once degrees saturate
    at the cap; measured sf10 7.9 → 6.1 s at 100k suppliers = 4
    buckets)."""
    cb = (e.groupBy("c", F.expr(f"bitmap_bucket_number({id_col})")
                   .alias("bkt"))
          .agg(F.expr(f"bitmap_construct_agg(bitmap_bit_position({id_col}))")
               .alias("bm")))
    grp = (e.select("c", "s").join(cb, "c")
           .groupBy("s", "bkt")
           .agg(F.expr("bitmap_or_agg(bm)").alias("obm")))
    return (grp.groupBy(F.col("s").alias("suppkey"))
            .agg(F.expr("CAST(sum(bitmap_count(obm)) - 1 AS BIGINT)")
                 .alias("two_hop"))
            .orderBy(F.desc("two_hop"), "suppkey").limit(100))


# --- 47. join-key skew audit ------------------------------------------------

_SKEW_AUDIT_SQL = """
    WITH k AS (
      SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_suppkey),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS nk FROM k)
    SELECT key, c,
           CAST(floor(1000000.0 * c / (SELECT total FROM t)) AS BIGINT)
             AS share_ppm,
           c * (SELECT nk FROM t) > 2 * (SELECT total FROM t) AS is_hot
    FROM k ORDER BY c DESC, key LIMIT 100
"""


@register("op_skew_audit", oracle=_SKEW_AUDIT_SQL, tags=("scale",))
def op_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: the top-100 hottest supplier keys on the
    fact with their floor-ppm share and a `is_hot` flag (count > 2×
    the mean per key) — the report to read BEFORE choosing between a
    plain shuffle join, salting, and AQE skew handling on any key (the
    repo's own `join_skew_salted` is the remedy this audit indicates).

    Determinism: the hot test is exact integer cross-multiplication
    (c·nk > 2·total — no mean rounding), share is one floor-ppm
    divide; ties in the ranking break on the key.

    Scale: one two-phase aggregate to |keys| rows; the two scalars
    ride scalar subqueries over the 1-row total (the `subq_scalar`
    plan shape, no 1-row join), top-100 is TakeOrderedAndProject.
    Overflow headroom: c·nk needs c and nk to MULTIPLY past 2^63 —
    6·10^9 rows on one key × 10^7 distinct keys is 6·10^16, three
    orders inside the bound. Identical SQL text on both engines."""
    return Q(spark, sf_dir, _SKEW_AUDIT_SQL)


# --- 48. last-touch attribution ---------------------------------------------

_ATTRIBUTION_SQL = """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
    e AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'),
    cand AS (
      SELECT p.event_id AS pid, e.event_type AS t,
             e.ts AS ets, e.event_id AS eid
      FROM p JOIN e ON e.user_id = p.user_id
       AND e.ts >= p.ts - INTERVAL 7 DAY
       AND (e.ts < p.ts
            OR (e.ts = p.ts AND e.event_id < p.event_id))),
    pick AS (
      SELECT pid, max_by(t, struct(ets, eid)) AS t
      FROM cand GROUP BY pid),
    att AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n_purchases
      FROM pick GROUP BY t),
    tot AS (SELECT CAST(sum(n_purchases) AS BIGINT) AS np FROM att)
    SELECT t AS attributed_type, n_purchases,
           CAST(floor(1000000.0 * n_purchases / (SELECT np FROM tot))
                AS BIGINT) AS share_ppm
    FROM att ORDER BY attributed_type
"""
# Engine-side election (r13): max_by over struct(ets, eid) — the SAME
# argmax the oracle's packed-key arg_max computes, replacing the
# row_number window. The window form SORTED the full candidate join
# (Σ_u purchases·touches_week = 2.2B rows at sf10) inside WindowExec —
# 441 s on local[32]; the aggregate form is two-phase (map-side
# partial max per partition, |purchases|-group final), no fact-grain
# sort anywhere, and is the form that distributes on a cluster.
# (ets, eid) is unique per event, so the struct max has no ties.

# DuckDB twin (r13, VERDICT r12 item 1): the shared-text oracle
# OOM-killed at sf10 (88 GB RSS — SCALE.md) because the row_number
# window over the event-grain candidate set requires a full
# materialize+sort of Σ_u purchases(u)·touches_week(u) rows. The
# election "newest (ets, eid)" is an ARGMAX, so the twin replaces the
# window with arg_max over a packed HUGEINT sort key
# (epoch_us·10^19 + event_id — order-equivalent to (ets, eid) while
# event_id < 10^19, forever at any realistic id width; DuckDB's
# arg_max has no composite-key overload): the 2.2B-row candidate join
# (measured, sf10) now STREAMS through a |purchases|-group hash
# aggregate. Two measured memory traps shaped the final form:
# a zero-padded VARCHAR key ballooned the 32 per-thread partial-agg
# state tables to a 24.9 GB peak (heap string per group ×2M groups
# ×32 threads) where the 16-byte HUGEINT stays ~3 GB; and `att` left
# un-MATERIALIZED is referenced twice (share + total), so DuckDB
# re-inlined THE WHOLE join+aggregate per reference — the r12 88 GB
# OOM was this doubling stacked on the window sort. Value-identical
# to the engine's (ts DESC, event_id DESC) election — (ets, eid) is
# unique per event, so no tie ambiguity exists on either route.
_ATTRIBUTION_DUCK_SQL = """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
    e AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'),
    cand AS (
      SELECT p.event_id AS pid, e.event_type AS t,
             e.ts AS ets, e.event_id AS eid
      FROM p JOIN e ON e.user_id = p.user_id
       AND e.ts >= p.ts - INTERVAL 7 DAY
       AND (e.ts < p.ts
            OR (e.ts = p.ts AND e.event_id < p.event_id))),
    pick AS (
      SELECT pid,
             arg_max(t, CAST(epoch_us(ets) AS HUGEINT)
                        * 10000000000000000000 + eid) AS t
      FROM cand GROUP BY pid),
    att AS MATERIALIZED (
      SELECT t, CAST(count(*) AS BIGINT) AS n_purchases
      FROM pick GROUP BY t),
    tot AS (SELECT CAST(sum(n_purchases) AS BIGINT) AS np FROM att)
    SELECT t AS attributed_type, n_purchases,
           CAST(floor(1000000.0 * n_purchases / (SELECT np FROM tot))
                AS BIGINT) AS share_ppm
    FROM att ORDER BY attributed_type
"""


@register("op_attribution_last_touch", oracle=_ATTRIBUTION_DUCK_SQL,
          tags=("events",))
def op_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent non-purchase event within a 7-day lookback; output is
    the credit share per event type — the marketing-attribution shape
    (and, on a ledger, the which-interaction-preceded-the-transfer
    question).

    Determinism: the "most recent" election orders by (ts DESC,
    event_id DESC) — a total order — and same-timestamp events only
    attribute when their event_id precedes the purchase's (strict
    happened-before, identical predicate on both engines).

    Scale: the candidate join is per-user with a 7-day band — a
    sort-merge join on user_id whose per-purchase candidate set is
    bounded by one user-week of activity, never the corpus; the
    row_number window partitions by purchase (high cardinality,
    uniform). A hyperactive-user hot key is the documented skew; the
    `join_asof_bucketed` time-bucket decomposition is the landed
    upgrade path if one user-week stops fitting a task. The final
    aggregate is |event types|-sized with a scalar-subquery total."""
    return Q(spark, sf_dir, _ATTRIBUTION_SQL)


# --- 49. power-of-two magnitude histogram ----------------------------------

_LOG2_HIST_SPARK_SQL = """
    WITH c AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE floor(value * 100) >= 1),
    b AS (SELECT cents,
                 CAST(length(bin(cents)) - 1 AS BIGINT) AS bin
          FROM c)
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           min(cents) AS min_cents, max(cents) AS max_cents
    FROM b GROUP BY bin ORDER BY bin
"""

_LOG2_HIST_DUCK_SQL = """
    WITH c AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE floor(value * 100) >= 1),
    b AS (SELECT cents,
                 CAST(length(format('{:b}', cents)) - 1 AS BIGINT) AS bin
          FROM c)
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           min(cents) AS min_cents, max(cents) AS max_cents
    FROM b GROUP BY bin ORDER BY bin
"""


@register("op_log2_histogram", oracle=_LOG2_HIST_DUCK_SQL,
          tags=("events",))
def op_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two magnitude histogram of transaction value (cents):
    bin = ⌊log2(cents)⌋ with count and min/max per bin — the
    order-of-magnitude distribution read (dust vs whale payments on a
    ledger; token-count scales on a corpus) that a linear-bin
    histogram (agg_histogram) flattens.

    Determinism: ⌊log2⌋ is computed as the length of the BINARY STRING
    minus one (Spark `bin()`, DuckDB `format('{:b}')`) — pure integer,
    no floating log2 whose boundary rounding (log2(2^k−1) rounding up
    to k) could disagree between engines; the dialect twins differ in
    the formatter name only.

    Scale: map-side projection + a two-phase aggregate to ≤ 63 bins —
    the cells are bounded by the BIGINT width itself, so the output is
    metadata-sized at any corpus size."""
    return Q(spark, sf_dir, _LOG2_HIST_SPARK_SQL)


# --- 50. weekly active users + week-over-week retention ---------------------

_WEEKLY_ACTIVE_SQL = """
    WITH wu AS (
      SELECT DISTINCT date_trunc('week', ts) AS wk, user_id AS u
      FROM events),
    a AS (SELECT wk, CAST(count(*) AS BIGINT) AS wau
          FROM wu GROUP BY wk),
    ret AS (
      SELECT c.wk AS wk, CAST(count(*) AS BIGINT) AS retained
      FROM wu c JOIN wu p
        ON p.u = c.u AND p.wk = c.wk - INTERVAL 7 DAY
      GROUP BY c.wk),
    j AS (
      SELECT a.wk, a.wau, coalesce(r.retained, 0) AS retained,
             lag(a.wau) OVER (ORDER BY a.wk) AS prev_wau
      FROM a LEFT JOIN ret r ON r.wk = a.wk)
    SELECT wk, wau, retained,
           CASE WHEN prev_wau IS NULL THEN NULL
                ELSE CAST(floor(1000000.0 * retained / prev_wau)
                          AS BIGINT) END AS retention_ppm
    FROM j ORDER BY wk
"""


@register("op_weekly_active", oracle=_WEEKLY_ACTIVE_SQL,
          tags=("events",))
def op_weekly_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active users with week-over-week retention: per ISO week,
    distinct active users, how many of them were also active the
    PRIOR week, and that count as a floor-ppm share of the prior
    week's WAU — the standard growth-accounting curve
    (op_retention_cohort is the from-first-seen cohort triangle; this
    is the rolling diagonal operators watch weekly).

    Determinism: both engines' date_trunc('week') is the ISO Monday;
    the week step is an exact 7-day timestamp interval; counts are
    exact and the share is one floor-ppm divide (NULL for the first
    week, which has no prior).

    Scale: one distinct-aggregate to (week, user) grain, the
    retention self-join keys on the USER (uniform, and each user
    carries ≤ |weeks| rows), and everything after — the left join,
    the lag window — runs over the |weeks|-row summary (the
    metadata-sized-window convention). Identical SQL text on both
    engines."""
    return Q(spark, sf_dir, _WEEKLY_ACTIVE_SQL)


# --- 51. event-type co-occurrence / lift -----------------------------------

_EVENT_COOC_SQL = """
    WITH tu AS (
      SELECT DISTINCT event_type AS t, user_id AS u FROM events),
    n AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nu FROM tu),
    c AS (SELECT t, CAST(count(*) AS BIGINT) AS cu FROM tu GROUP BY t),
    pair AS (
      SELECT a.t AS type_a, b.t AS type_b,
             CAST(count(*) AS BIGINT) AS both_u
      FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
      GROUP BY 1, 2)
    SELECT type_a, type_b, both_u,
           CAST(floor(1000000.0 * both_u * (SELECT nu FROM n)
                      / (1.0 * ca.cu * cb.cu)) AS BIGINT) AS lift_ppm
    FROM pair
    JOIN c ca ON ca.t = type_a
    JOIN c cb ON cb.t = type_b
    ORDER BY type_a, type_b
"""


@register("op_event_cooccurrence", oracle=_EVENT_COOC_SQL,
          tags=("events",))
def op_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence with lift: for every type pair, how
    many users did both, and the independence-normalized lift in
    floor-ppm (10^6 = independent, above = the pair travels together)
    — `op_market_basket`'s formula at USER grain over the behavioral
    alphabet: which actions predict each other.

    Scale: the distinct (type, user) projection is the only fact
    pass; the pair self-join keys on the USER whose per-key fan-out
    is bounded by the TYPE ALPHABET (≤ |types|²/2 pairs per user —
    a constant, so no basket-style mega-key exists by construction);
    type counts re-enter via a |types|-row broadcast join and the
    user total is a scalar subquery over tu (the |types|×|users|-
    bounded projection — never a second fact scan; Spark inlines
    CTEs, so deriving it from the fact would really re-scan). Identical SQL text on both
    engines."""
    return Q(spark, sf_dir, _EVENT_COOC_SQL)


# --- 52. join-size audit (planning primitive) -------------------------------

_JOIN_SIZE_SQL = """
    WITH lo AS (
      SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_orderkey),
    oo AS (
      SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY o_orderkey),
    ls AS (
      SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_suppkey),
    ss AS (
      SELECT s_suppkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM supplier GROUP BY s_suppkey),
    j1 AS (
      SELECT CAST(sum(CAST(lo.c AS DECIMAL(19, 0)) * oo.c)
               AS BIGINT) AS predicted_rows,
             CAST(count(*) AS BIGINT) AS matched_keys,
             CAST(max(CAST(lo.c AS DECIMAL(19, 0)) * oo.c)
               AS BIGINT) AS hottest_key_rows
      FROM lo JOIN oo ON lo.k = oo.k),
    j2 AS (
      SELECT CAST(sum(CAST(ls.c AS DECIMAL(19, 0)) * ss.c)
               AS BIGINT) AS predicted_rows,
             CAST(count(*) AS BIGINT) AS matched_keys,
             CAST(max(CAST(ls.c AS DECIMAL(19, 0)) * ss.c)
               AS BIGINT) AS hottest_key_rows
      FROM ls JOIN ss ON ls.k = ss.k)
    SELECT 'lineitem-orders@orderkey' AS join_key, predicted_rows,
           matched_keys, hottest_key_rows
    FROM j1
    UNION ALL
    SELECT 'lineitem-supplier@suppkey', predicted_rows,
           matched_keys, hottest_key_rows
    FROM j2
    ORDER BY join_key
"""


@register("op_join_size_audit", oracle=_JOIN_SIZE_SQL, tags=("scale",))
def op_join_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size audit: the EXACT output cardinality of a join,
    computed WITHOUT running it — Σ c_left(k)·c_right(k) over the
    per-key count tables, plus the matched-key count and the hottest
    single key's contribution. This is the planning read before an
    expensive fact-fact join: predicted_rows prices the shuffle,
    hottest_key_rows is the skew verdict (`op_skew_audit` per join,
    in one number), and the count-table join costs |keys|, not
    |output|.

    Determinism: pure BIGINT count arithmetic. Overflow: c_l·c_r per
    key passes 2^63 only when one key alone would produce 9·10^18
    joined rows — at which point the audit's job is precisely to have
    told you long before.

    Scale: two-phase aggregates collapse each side to key grain; the
    audit join is key-grain × key-grain on uniform keys; the sum is a
    1-row aggregate. The same shape prices ANY equi-join — add a CTE
    pair per candidate key. Identical SQL text on both engines."""
    return Q(spark, sf_dir, _JOIN_SIZE_SQL)


# --- 53. conversion delay (first click → first purchase) --------------------

_CONV_DELAY_SPARK_SQL = """
    WITH fc AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'click' GROUP BY user_id),
    fp AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN fc ON fc.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fc.t0
      GROUP BY e.user_id),
    d AS (
      SELECT CAST((unix_micros(t1) - unix_micros(t0)) div 1000000
               AS BIGINT) AS delay_s
      FROM fc JOIN fp ON fp.user_id = fc.user_id),
    b AS (
      SELECT CASE WHEN delay_s <= 0 THEN 0
                  ELSE CAST(length(bin(delay_s)) - 1 AS BIGINT) END
               AS bin, delay_s
      FROM d)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_users,
           min(delay_s) AS min_s, max(delay_s) AS max_s
    FROM b GROUP BY bin ORDER BY bin
"""

_CONV_DELAY_DUCK_SQL = """
    WITH fc AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'click' GROUP BY user_id),
    fp AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN fc ON fc.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fc.t0
      GROUP BY e.user_id),
    d AS (
      SELECT CAST((epoch_us(t1) - epoch_us(t0)) // 1000000
               AS BIGINT) AS delay_s
      FROM fc JOIN fp ON fp.user_id = fc.user_id),
    b AS (
      SELECT CASE WHEN delay_s <= 0 THEN 0
                  ELSE CAST(length(format('{:b}', delay_s)) - 1
                            AS BIGINT) END AS bin, delay_s
      FROM d)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_users,
           min(delay_s) AS min_s, max(delay_s) AS max_s
    FROM b GROUP BY bin ORDER BY bin
"""


@register("op_conversion_delay", oracle=_CONV_DELAY_DUCK_SQL,
          tags=("events",))
def op_conversion_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-delay distribution: per user, seconds from first
    click to the first purchase at-or-after it, bucketed into
    power-of-two bins (same-second conversions land in bin 0) — the
    time-to-convert histogram funnel analyses read next to the
    conversion RATE `op_funnel` reports (sub-minute bins vs
    multi-day bins want different product responses).

    Determinism: exact MICROsecond subtraction with integer floor
    division to seconds (DuckDB's epoch() keeps fractional seconds
    and its double→BIGINT cast ROUNDS — the truncate-vs-round trap
    the repo's decimal contract documents; unix_micros/epoch_us
    sidestep it entirely); the binary-string-length log2 idiom (no
    floating log2); exact counts and min/max per bin.

    Scale: two user-keyed aggregates and one user-keyed join — all on
    the uniform user key — then a map-side bin projection and a
    ≤63-cell aggregate. The per-user firsts are min() two-phase
    aggregates, never a window over raw events."""
    return Q(spark, sf_dir, _CONV_DELAY_SPARK_SQL)


# --- 54. k-core decomposition (bounded peeling) -----------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6


def _kcore_duck_sql() -> str:
    """Unrolled peeling oracle (the op_ann_ivf unrolled-Lloyd's
    pattern: a fixed iteration count as static CTE chain — no
    recursive-CTE self-reference limits, identical logic per round)."""
    # every CTE is MATERIALIZED: each round references the previous
    # alive set TWICE (both endpoints), so inlining doubles the plan per
    # round — 2^rounds copies of the fact join; measured >120 s at
    # sf0.1 inlined vs seconds materialized. (Spark's engine loop has
    # no such trap: each round is one plan layer.)
    ctes = ["""e0 AS MATERIALIZED (
      SELECT 2 * o_custkey AS u, 2 * l_suppkey + 1 AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey, l_suppkey
      HAVING count(DISTINCT o_orderkey) >= 2),
    edges AS MATERIALIZED (SELECT u, v FROM e0
              UNION ALL SELECT v AS u, u AS v FROM e0),
    a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM edges)"""]
    for r in range(1, _KCORE_ROUNDS + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
      SELECT e.u, CAST(count(*) AS BIGINT) AS c FROM edges e
      JOIN a{r - 1} x ON x.node = e.u
      JOIN a{r - 1} y ON y.node = e.v
      GROUP BY e.u),
    a{r} AS MATERIALIZED (SELECT u AS node FROM d{r}
                          WHERE c >= {_KCORE_K})""")
    n = _KCORE_ROUNDS
    return f"""
    WITH {", ".join(ctes)}
    SELECT e.u AS node, CAST(count(*) AS BIGINT) AS core_degree,
           (SELECT count(*) FROM a{n - 1})
             = (SELECT count(*) FROM a{n}) AS converged
    FROM edges e
    JOIN a{n} x ON x.node = e.u
    JOIN a{n} y ON y.node = e.v
    GROUP BY e.u ORDER BY node
"""


@register("op_kcore", oracle=_kcore_duck_sql(), tags=("graph", "scale"))
def op_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k = {_KCORE_K}, bounded peeling): the
    maximal subgraph where every node keeps ≥ k neighbors, found by
    repeatedly deleting under-degree nodes — the densest-region
    extraction between triangle counting (local density) and
    connected components (mere reachability); on a ledger graph the
    k-core is where collusive clusters live. The graph is the
    REPEAT-business customer↔supplier edge set (≥ 2 distinct orders
    per pair — the binomial thinning that gives TPC-H's uniform fan
    the degree variance peeling needs). Output: core members with
    their in-core degree and a convergence flag (did the peel reach
    its fixpoint within {_KCORE_ROUNDS} rounds — same bounded-BSP
    honesty as op_pagerank's fixed iterations).

    Scale: BSP rounds over a persisted edge table (edges never
    recompute); each round is two semi-joins (endpoints alive) + a
    two-phase degree aggregate on the uniform node key, its |V|-row
    result localCheckpoint'ed and the superseded round released — the
    loop exits at the count fixpoint (monotone shrink ⇒ equal counts
    = equal sets, so the truncated peel is bit-identical to the full
    unroll). The checkpoint is load-bearing, not hygiene: `alive`
    enters each round twice, so a lazy chain DOUBLES the logical plan
    per round — 2^rounds copies for Catalyst, measured as a flat
    ~25 s of plan work at every SF (the engine-side twin of the
    oracle's exponential CTE inlining, fixed the same way:
    materialize per round; 27.5 s → 2.0 s at sf1). The oracle
    unrolls the full {_KCORE_ROUNDS} rounds as MATERIALIZED CTEs."""
    # edge build, r9 form: pre-distinct (orderkey, suppkey) on the fact
    # side turns the countDistinct into a plain count (no EXPAND), and
    # shuffle_hash on the order join skips the SMJ sort the downstream
    # (cu, su) rehash would waste anyway — measured 6.3 s → 2.5 s at
    # sf1 for an identical edge set (the build, not the BSP rounds,
    # was the key's whole sf1 gap: rounds ride AQE-broadcast semis off
    # the cached edges)
    oh = (table(spark, sf_dir, "orders")
          .select(F.col("o_orderkey").alias("ok"),
                  F.col("o_custkey").alias("cu"))
          .hint("shuffle_hash"))
    e0 = (_shared_osup(spark, sf_dir)    # build-once (ok, s) base, r13
          .select("ok", F.col("s").alias("su"))
          .join(oh, "ok")
          .groupBy("cu", "su")
          .agg(F.count("*").alias("no"))
          .filter(F.col("no") >= 2)
          .select((2 * F.col("cu")).alias("u"),
                  (2 * F.col("su") + 1).alias("v")))
    edges = scoped_persist(
        e0.unionAll(e0.select(F.col("v").alias("u"),
                              F.col("u").alias("v"))))
    # Round loop, r9 form: each round's |V|-row alive set is
    # localCheckpoint'ed and the loop EXITS at the count fixpoint
    # (alive only shrinks, so equal counts = equal sets = every later
    # round is a no-op — the truncated peel returns bit-identical core
    # membership to the oracle's full 13-round unroll). The previous
    # form chained all 13 rounds lazily, and because `alive` enters
    # each round TWICE (both endpoint semi-joins), the logical plan
    # doubled per round — 2^13 copies of the edge build for Catalyst
    # to analyze, measured as a FLAT ~25 s of driver-side plan work at
    # every SF (the engine-side twin of the r8 oracle's exponential
    # CTE inlining, fixed the same way: materialize per round). The
    # superseded round's checkpoint blocks are released immediately
    # (the dedup_clusters discipline), so state is one |V|-row table.
    from .llm_pipeline import _release_checkpoint

    alive = (edges.select(F.col("u").alias("node")).distinct()
             .localCheckpoint())
    n_prev = alive.count()  # driver-ok: |V|-row checkpointed state
    converged = False
    for _ in range(_KCORE_ROUNDS):
        deg = (edges
               .join(alive.withColumnRenamed("node", "u"), "u", "left_semi")
               .join(alive.withColumnRenamed("node", "v"), "v", "left_semi")
               .groupBy("u").agg(F.count("*").cast("bigint").alias("c")))
        nxt = (deg.filter(F.col("c") >= _KCORE_K)
               .select(F.col("u").alias("node")).localCheckpoint())
        n = nxt.count()  # driver-ok: |V|-row checkpointed round state
        _release_checkpoint(alive)
        alive = nxt
        if n == n_prev:
            converged = True
            break
        n_prev = n
    # the FINAL alive set's checkpoint blocks back the returned plan —
    # register so release_all() can free them post-materialization
    scoped_register(alive)
    core_edges = (edges
                  .join(alive.withColumnRenamed("node", "u"), "u",
                        "left_semi")
                  .join(alive.withColumnRenamed("node", "v"), "v",
                        "left_semi"))
    return (core_edges.groupBy(F.col("u").alias("node"))
            .agg(F.count("*").cast("bigint").alias("core_degree"))
            .withColumn("converged", F.lit(converged))
            .orderBy("node"))


# Render the constants into the plain-string docstring (f-string would
# not be a docstring; the meta-test pins that trap).
op_kcore.__doc__ = (op_kcore.__doc__
                    .replace("{_KCORE_K}", str(_KCORE_K))
                    .replace("{_KCORE_ROUNDS}", str(_KCORE_ROUNDS)))


# --- 55. neighbor-set Jaccard (link prediction) -----------------------------

_LINKPRED_SQL = f"""
    WITH {_CAPPED_EDGE_CTES},
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e2 GROUP BY s),
    common AS (
      SELECT a.s AS s_a, b.s AS s_b, CAST(count(*) AS BIGINT) AS cmn
      FROM e2 a JOIN e2 b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s),
    scored AS (
      SELECT s_a, s_b, cmn,
             CAST(floor(1000000.0 * cmn / (da.d + db.d - cmn))
                  AS BIGINT) AS jaccard_ppm
      FROM common
      JOIN deg da ON da.s = s_a
      JOIN deg db ON db.s = s_b)
    SELECT s_a, s_b, cmn, jaccard_ppm
    FROM scored
    ORDER BY jaccard_ppm DESC, s_a, s_b LIMIT 25
"""


@register("op_graph_jaccard", oracle=_LINKPRED_SQL, tags=("graph",))
def op_graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard between supplier pairs (|shared customers|
    / |customer union|), top-25 — the classic link-prediction /
    node-similarity feature (two suppliers whose customer sets
    overlap heavily are one merger, one shared shell entity, or the
    next edge to form; the same score over wallets is an
    entity-resolution signal on a ledger).

    Scale: shares `op_graph_2hop`'s `_capped_fan` (cap enforced in
    code and oracle alike — `_TWOHOP_CUST_CAP`). The r9 form: ordered
    wedge pairs (sa < sb, each wedge once — the sorted array gives
    the half-stream for free via slice) expand MAP-SIDE from the fan
    array, and the common-customer count is ONE two-phase aggregate
    on the pair key — partial counts combine map-side, so the shuffle
    carries pair-grain partial sums, not the wedge stream (the e2⋈e2
    self-join this replaces shuffled every wedge as a row). Degrees
    come off the same fan (explode + supplier-grain count — supplier
    cardinality is dimension-sized, so both degree joins broadcast),
    and top-25 is TakeOrderedAndProject. Jaccard in exact floor-ppm
    (cmn / (da + db − cmn), all BIGINT).

    min_size=1 is load-bearing (r10 fix): the oracle's `deg` counts
    over e2, which INCLUDES single-supplier customers — a supplier's
    degree must count its singleton customers even though singleton
    fans contribute no wedge pairs (a 1-element array expands to zero
    pairs via the slice, so the pair stream is unchanged; only the
    degrees needed the full fan). With the old min_size=2 fan a
    singleton customer of supplier A deflated A's union size and
    inflated jaccard_ppm — latent at SFs with no singleton-fan
    customers, divergent at sf1+."""
    fan = _capped_fan(spark, sf_dir, min_size=1)
    half = (fan.select(F.explode(F.expr(
        "flatten(transform(arr, (x, i) -> transform("
        "slice(arr, i + 2, size(arr)), y -> struct(x AS sa, y AS sb))))"))
        .alias("p")).select("p.sa", "p.sb"))
    common = (half.groupBy(F.col("sa").alias("s_a"),
                           F.col("sb").alias("s_b"))
              .agg(F.count("*").cast("bigint").alias("cmn")))
    deg = (fan.select(F.explode("arr").alias("s"))
           .groupBy("s").agg(F.count("*").cast("bigint").alias("d")))
    da = F.broadcast(deg.select(F.col("s").alias("s_a"),
                                F.col("d").alias("da")))
    db = F.broadcast(deg.select(F.col("s").alias("s_b"),
                                F.col("d").alias("db")))
    return (common.join(da, "s_a").join(db, "s_b")
            .select("s_a", "s_b", "cmn",
                    F.expr("CAST(floor(1000000.0 * cmn / (da + db - cmn))"
                           " AS BIGINT)").alias("jaccard_ppm"))
            .orderBy(F.desc("jaccard_ppm"), "s_a", "s_b").limit(25))


# --- 56. degree distribution (graph summary) --------------------------------

_DEGREE_DIST_SPARK_SQL = """
    WITH e AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    deg AS (
      SELECT 2 * s + 1 AS node, CAST(count(*) AS BIGINT) AS d
      FROM e GROUP BY s
      UNION ALL
      SELECT 2 * c AS node, CAST(count(*) AS BIGINT) AS d
      FROM e GROUP BY c),
    b AS (SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bin, d,
                 CASE WHEN node % 2 = 1 THEN 'supplier'
                      ELSE 'customer' END AS side
          FROM deg)
    SELECT side, bin, CAST(count(*) AS BIGINT) AS n_nodes,
           min(d) AS min_deg, max(d) AS max_deg
    FROM b GROUP BY side, bin ORDER BY side, bin
"""

_DEGREE_DIST_DUCK_SQL = _DEGREE_DIST_SPARK_SQL.replace(
    "length(bin(d))", "length(format('{:b}', d))")


@register("op_degree_distribution", oracle=_DEGREE_DIST_DUCK_SQL,
          tags=("graph",))
def op_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the bipartite trade graph, both sides,
    in power-of-two bins — the first diagnostic read on any new graph
    (scale-free vs uniform decides every downstream algorithm's skew
    strategy: a power-law tail means salting and caps, a uniform
    distribution means plain shuffles are fine — this repo's cap
    constants were themselves chosen off exactly this read).

    Determinism: the binary-string-length log2 idiom; customers ride
    the same pipeline as suppliers via the op_pagerank even/odd node
    encoding (2c / 2s+1 — a sign flip would misfile id 0), labeled
    back to a side column off the parity bit.

    Scale: one distinct-edge aggregate, two key-grain degree
    aggregates, a ≤2×63-cell rollup. Identical SQL text modulo the
    binary formatter."""
    return Q(spark, sf_dir, _DEGREE_DIST_SPARK_SQL)


# --- 57. round-number bias (forensic) ---------------------------------------

_ROUND_BIAS_SQL = """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE floor(value * 100) >= 1),
    f AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS whole_unit,
             CAST(sum(CASE WHEN cents % 1000 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS round_ten
      FROM c GROUP BY event_type)
    SELECT event_type, n, whole_unit, round_ten,
           CAST(floor(1000000.0 * whole_unit / n) AS BIGINT)
             AS whole_unit_ppm,
           CAST(floor(1000000.0 * round_ten / n) AS BIGINT)
             AS round_ten_ppm
    FROM f ORDER BY event_type
"""


@register("op_round_number_bias", oracle=_ROUND_BIAS_SQL,
          tags=("events",))
def op_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number bias per event type: the floor-ppm share of values
    landing exactly on whole units and on tens of units — `op_benford`'s
    forensic sibling (organic amounts are fractional; human-invented
    ones cluster on round numbers, so an elevated share flags
    fabricated transactions, wash trades, or fee-structure artifacts).

    Determinism: cents via the standard floor idiom, then pure
    integer modulus and counts; two floor-ppm divides.

    Scale: map-side projection + one two-phase aggregate to |types|
    rows. Identical SQL text on both engines."""
    return Q(spark, sf_dir, _ROUND_BIAS_SQL)


# --- 58. dormancy reactivation ----------------------------------------------

#: Dormancy threshold in days. Production growth accounting uses 30;
#: the fixture's event stream spans ~30 days TOTAL (max observed
#: active-day gap: 3-4), so the registered constant is 2 to keep both
#: the gap arm and the no-gap arm of the predicate exercised — the
#: fixture-fit rule from the CDC/sequence-gap keys (an unexercisable
#: predicate arm is a hole the r5 verdict called out by name).
_DORMANT_GAP_DAYS = 2


def _reactivation_sql(day_gap: str) -> str:
    """Dialect twins differ only in the day-difference spelling: Spark
    date − date is an INTERVAL (so `datediff`), DuckDB's is an integer
    day count."""
    return f"""
    WITH g AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    lagged AS (
      SELECT user_id, d,
             lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM g),
    react AS (
      SELECT user_id, d FROM lagged
      WHERE prev_d IS NOT NULL AND {day_gap} >= {_DORMANT_GAP_DAYS}),
    wk AS (
      SELECT date_trunc('week', CAST(d AS TIMESTAMP)) AS wk,
             CAST(count(*) AS BIGINT) AS reactivations,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users
      FROM react GROUP BY 1)
    SELECT wk, reactivations, users FROM wk ORDER BY wk
"""


_REACTIVATION_SPARK_SQL = _reactivation_sql("datediff(d, prev_d)")
_REACTIVATION_DUCK_SQL = _reactivation_sql("(d - prev_d)")


@register("op_dormant_reactivation", oracle=_REACTIVATION_DUCK_SQL,
          tags=("events",))
def op_dormant_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy reactivation: per week, how many active-day gaps of
    ≥ `_DORMANT_GAP_DAYS` (2) days ENDED (a dormant user came back)
    and how many distinct users did so — the resurrection curve growth accounting tracks
    next to `op_weekly_active`'s retention (new + retained +
    resurrected = WAU; this key supplies the third term).

    Determinism: date arithmetic on DATE grain (day-exact, no
    timestamp rounding); `d - prev_d` is an integer day count on both
    engines; exact counts.

    Scale: one distinct-aggregate to (user, active-day) grain, ONE
    user-keyed window for the gap detection (lag over the per-user
    day sequence — bounded by active days per user), then a
    |weeks|-row rollup. Twins differ only in the day-diff spelling."""
    return Q(spark, sf_dir, _REACTIVATION_SPARK_SQL)


# --- 59. degree assortativity (graph science) -------------------------------

_ASSORT_SQL = f"""
    WITH {_CAPPED_EDGE_CTES},
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e2 GROUP BY s),
    cdeg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM e2 GROUP BY c),
    pairs AS (
      SELECT cd.d AS dx, sd.d AS dy
      FROM e2 JOIN cdeg cd ON cd.c = e2.c
              JOIN deg sd ON sd.s = e2.s),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(dx AS DECIMAL(38, 0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(dy AS DECIMAL(38, 0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(dx AS DECIMAL(18, 0))
                      * CAST(dy AS DECIMAL(18, 0))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(dx AS DECIMAL(18, 0))
                      * CAST(dx AS DECIMAL(18, 0))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(dy AS DECIMAL(18, 0))
                      * CAST(dy AS DECIMAL(18, 0))) AS DOUBLE) AS syy
      FROM pairs)
    SELECT n AS n_edges,
           CAST(floor(1000000.0 * (n * sxy - sx * sy) /
                sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
             AS BIGINT) AS assortativity_ppm
    FROM m
"""


@register("op_degree_assortativity", oracle=_ASSORT_SQL, tags=("graph",))
def op_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the capped trade graph: the Pearson
    correlation (floor-ppm) between the two endpoint degrees over all
    edges — THE one-number topology summary after the degree
    distribution (positive = hubs trade with hubs, the social-network
    signature; negative = hub-and-spoke, the marketplace/exchange
    signature; a sign change over time is a structural market shift).

    Determinism: `agg_corr`'s integer-moments contract, hardened r10 —
    BIGINT degree products summed as DECIMAL(38,0) on BOTH engines
    (a BIGINT sum wraps on Spark but promotes to HUGEINT on DuckDB;
    sums of dy² clear 2^63 at ~1e9-degree scale), one double cast of
    the exact sum, one sqrt (bit-identical across engines per the
    repo's numeric notes), one floor-ppm divide.

    Scale: rides the checkpointed `_capped_fan` (min_size=1 —
    singleton customers still carry an edge), so the fact is scanned
    once per query; the customer degree is size(arr) attached
    map-side at explode time; the edge stream collapses to
    (supplier, dx, cnt) cells in one keys-only BIGINT aggregate and
    everything after — supplier degree, decimal moments, the final
    ratio — is cell-table-sized. The oracle keeps the per-pair CTE
    spelling (DuckDB evaluates it fine; identical exact sums)."""
    fan = _capped_fan(spark, sf_dir, min_size=1)
    ex = fan.select(F.size("arr").cast("long").alias("dx"),
                    F.explode("arr").alias("s"))
    # r10 compact-cell moments: every edge with the same (supplier,
    # customer-degree) contributes the SAME (dx, dy) sample, so the
    # edge stream collapses to (s, dx, cnt) cells in ONE keys-only
    # BIGINT hash aggregate (≤ |suppliers|·cap cells — dimension-sized
    # at any SF), the supplier degree derives from those cells
    # (dy = Σ_dx cnt, no second fan pass), and the exact DECIMAL(38,0)
    # moment arithmetic — which wraps as BIGINT on Spark at
    # ~1e9-degree scale but is slow per-row — runs over the tiny cell
    # table only, weighted by cnt. Measured at sf3: the per-edge
    # decimal accumulation this replaces cost +63 % (SCALE.md §r10).
    # DuckDB keeps the per-pair spelling; both sums are exact integers,
    # so the double casts agree bit-for-bit.
    cells0 = (ex.groupBy("s", "dx")
              .agg(F.count("*").cast("long").alias("cnt")))
    deg = (cells0.groupBy("s")
           .agg(F.sum("cnt").cast("long").alias("dy")))
    cells = cells0.join(F.broadcast(deg), "s")
    m = cells.agg(
        F.expr("CAST(sum(cnt) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(CAST(cnt AS DECIMAL(38, 0)) * dx) AS DOUBLE)")
        .alias("sx"),
        F.expr("CAST(sum(CAST(cnt AS DECIMAL(38, 0)) * dy) AS DOUBLE)")
        .alias("sy"),
        F.expr("CAST(sum(CAST(cnt AS DECIMAL(38, 0)) * dx * dy)"
               " AS DOUBLE)").alias("sxy"),
        F.expr("CAST(sum(CAST(cnt AS DECIMAL(38, 0)) * dx * dx)"
               " AS DOUBLE)").alias("sxx"),
        F.expr("CAST(sum(CAST(cnt AS DECIMAL(38, 0)) * dy * dy)"
               " AS DOUBLE)").alias("syy"))
    return m.select(
        F.col("n").alias("n_edges"),
        F.expr("CAST(floor(1000000.0 * (n * sxy - sx * sy) /"
               " sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))"
               " AS BIGINT)").alias("assortativity_ppm"))


# --- 60. market concentration (HHI) -----------------------------------------

_HHI_SQL = """
    WITH rev AS (
      SELECT n_name AS nation, s_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS r
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name, s_suppkey),
    tot AS (SELECT nation, CAST(sum(r) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS n_suppliers
            FROM rev GROUP BY nation),
    sh AS (
      SELECT rev.nation,
             CAST(floor(1000000.0 * rev.r / tot.t) AS BIGINT) AS s_ppm
      FROM rev JOIN tot ON tot.nation = rev.nation)
    SELECT sh.nation, max(tot.n_suppliers) AS n_suppliers,
           CAST(floor(1.0 * sum(s_ppm * s_ppm) / 1000000) AS BIGINT)
             AS hhi_ppm
    FROM sh JOIN tot ON tot.nation = sh.nation
    GROUP BY sh.nation ORDER BY sh.nation
"""


@register("op_hhi_concentration", oracle=_HHI_SQL)
def op_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market concentration per nation: the Herfindahl–Hirschman index
    over supplier revenue shares, in floor-ppm (10^6 = monopoly,
    10^6/n = perfect competition) — the antitrust-grade concentration
    read (on a ledger: validator / miner / bridge concentration, the
    decentralization metric).

    Determinism: revenue goes to CENTS first (floor of the identical
    IEEE double product on both engines — the decimal-sum route was
    measured to flip share boundaries here: Spark and DuckDB round
    the product→decimal cast differently, and a ±0.0001 revenue
    difference moves a floor-ppm share), each share is ONE floor-ppm
    divide over exact BIGINTs, and the index is the integer
    Σ share² / 10^6 — the same per-cell floor-then-sum discipline as
    `op_gini_impurity`, overflow-free at any scale (s_ppm ≤ 10^6 caps
    every term).

    Scale: one fact pass to (nation, supplier) grain (broadcast dim
    joins), a |nations|-row total, and a supplier-grain share
    projection — the index aggregate is |nations| rows. Identical SQL
    text on both engines."""
    return Q(spark, sf_dir, _HHI_SQL)


# --- 61. burst detection (peak trailing-hour rate) --------------------------

_BURST_SQL = """
    WITH r AS (
      SELECT user_id, ts, event_id,
             CAST(count(*) OVER w AS BIGINT) AS trailing_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW)),
    ranked AS (
      SELECT user_id, ts, trailing_1h,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY trailing_1h DESC, ts, event_id)
               AS rn
      FROM r)
    SELECT user_id, trailing_1h AS peak_1h_events, ts AS peak_at
    FROM ranked WHERE rn = 1 ORDER BY user_id
"""


@register("op_burst_detection", oracle=_BURST_SQL, tags=("events",))
def op_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: each user's PEAK trailing-one-hour event count
    and when it happened — the rate-limit / bot / wash-trade screen
    (a user whose peak hour holds 500 of their 600 lifetime events is
    a script; a flat profile is a human), built on the time-RANGE
    frame `win_range_interval` establishes.

    Determinism: RANGE peers share frames identically on both
    engines; the peak election orders by (count DESC, ts, event_id) —
    a total order, earliest peak wins ties.

    Scale: ONE user-keyed shuffle serves both windows (same
    partitioning; the rank sorts within the same partition), O(1)
    frame state per row. Identical SQL text on both engines."""
    return Q(spark, sf_dir, _BURST_SQL)


# --- 62. CUSUM change detection (prefix-min identity) -----------------------

_CUSUM_DRIFT_CENTS = 50
#: Alert threshold COEFFICIENT: h_cell = floor(_CUSUM_H_COEF · √n_cell).
#: A fixed absolute h saturates as cells densify — a zero-drift random
#: walk's excursions grow as σ·√n, so replicating the fixture 10×
#: pushed every cell over any constant that sf0.001 could also alert
#: on. √n scaling holds the false-alarm rate roughly constant instead
#: (and sqrt is bit-identical cross-engine per the repo's numeric
#: notes). Calibrated so BOTH predicate arms are live at sf0.001 and
#: sf0.01 (the fixture-fit rule).
_CUSUM_H_COEF = 3000

def _cusum_sql(day_expr: str) -> str:
    """Dialect twins differ only in the day-string spelling (the repo's
    standard DATE serialization twin: pandas round-trips DuckDB dates
    as midnight timestamps, so day columns surface as strings)."""
    return f"""
    WITH c AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    mu AS (
      SELECT event_type,
             CAST(floor(1.0 * sum(cents) / count(*)) AS BIGINT) AS m
      FROM c GROUP BY event_type),
    d AS (
      SELECT /*+ BROADCAST(mu) */
             c.event_type, {day_expr} AS day, ts, event_id,
             cents - m - {_CUSUM_DRIFT_CENTS} AS dev
      FROM c JOIN mu ON mu.event_type = c.event_type),
    p AS (
      SELECT event_type, day, ts, event_id,
             CAST(sum(dev) OVER w AS BIGINT) AS pf,
             CAST(floor({_CUSUM_H_COEF}
                        * sqrt(count(*) OVER cell)) AS BIGINT) AS h
      FROM d
      WINDOW w AS (PARTITION BY event_type, day ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING),
             cell AS (PARTITION BY event_type, day)),
    s AS (
      SELECT event_type, day, h,
             pf - least(CAST(0 AS BIGINT), CAST(min(pf) OVER w2
                                                AS BIGINT)) AS cusum
      FROM p
      WINDOW w2 AS (PARTITION BY event_type, day ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING))
    SELECT event_type, day,
           CAST(max(cusum) AS BIGINT) AS max_cusum,
           CAST(max(h) AS BIGINT) AS h_cell,
           CAST(sum(CASE WHEN cusum > h THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alert_steps,
           max(cusum) > max(h) AS alerted
    FROM s GROUP BY event_type, day
    ORDER BY event_type, day
"""


_CUSUM_SPARK_SQL = _cusum_sql("date_format(ts, 'yyyy-MM-dd')")
_CUSUM_DUCK_SQL = _cusum_sql("strftime(ts, '%Y-%m-%d')")


@register("op_cusum_alerts", oracle=_CUSUM_DUCK_SQL, tags=("events",))
def op_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change detection per (event type, day): the one-sided
    cumulative-sum control chart s_i = max(0, s_{i-1} + (x_i − μ − k))
    with drift k and a √n-scaled alert threshold (see `_CUSUM_H_COEF`
    — a fixed h saturates under densifying cells) — the standard sequential
    drift detector (a sustained shift in transaction values fires
    long before any single value trips a z-score; `op_anomaly_zscore`
    catches spikes, this catches creeps).

    The scale insight this key exists to demonstrate: the recurrence
    LOOKS inherently sequential (each s depends on the previous), but
    the max(0, ·) reset has a closed form — with P_i the plain prefix
    sum of deviations, s_i = P_i − min(0, min_{j≤i} P_j). That
    identity turns the "needs a Python loop" kernel into TWO stacked
    window functions over ONE (type, day)-keyed shuffle (same
    partition spec ⇒ one WindowExec chain, O(1) state per row,
    whole-stage codegen) — where the naive reading would reach for
    applyInPandas and pay the Arrow round-trip. The oracle runs the
    identical SQL, so the identity itself is hash-verified against
    DuckDB's evaluation of the same algebra.

    Determinism: cents floor idiom, integer-floor mean, BIGINT
    prefix sums, total (ts, event_id) order within every partition.

    Scale: one fact shuffle on (type, day) — high-cardinality uniform
    keys; the per-type means re-enter via a |types|-row broadcast
    join; daily partitions bound window state AND give the chart its
    production reset semantics.

    FLOOR-FINAL (r11, measured): the verdict-suggested day-grain
    pre-aggregate + join-back for h (the op_boxplot_stats shape) was
    raced head-to-head at sf10 — 4.687 s vs 3.844 s for this form —
    because the unordered `cell` count window rides the ordered
    windows' existing (type, day) exchange for free, while the
    pre-aggregate pays a second fact scan plus a (type, day) shuffle
    join. The remaining gap to DuckDB is WindowExec sort throughput
    on a single node; the (type, day) key space distributes on a real
    cluster (SCALE.md §r11)."""
    return Q(spark, sf_dir, _CUSUM_SPARK_SQL)


# --- 63. Lorenz/Gini inequality by window algebra ---------------------------

_GINI_REV_SQL = """
    WITH r AS (
      SELECT l_suppkey AS s,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_suppkey),
    ranked AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents, s) AS BIGINT) AS i
      FROM r),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cents AS DECIMAL(38, 0))) AS DOUBLE) AS tot,
             CAST(sum(CAST(i AS DECIMAL(18, 0)) * cents) AS DOUBLE)
               AS wsum
      FROM ranked)
    SELECT n AS n_suppliers,
           CAST(floor(1000000.0 * (2.0 * wsum / (n * tot)
                                   - (n + 1.0) / n)) AS BIGINT)
             AS gini_ppm
    FROM m
"""


@register("op_gini_revenue", oracle=_GINI_REV_SQL)
def op_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of supplier revenue by pure window algebra:
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over revenues ranked ascending —
    the inequality number next to `op_hhi_concentration`'s
    concentration (HHI weights the head, Gini reads the whole Lorenz
    curve; on a ledger this is wealth concentration).

    This is the declarative twin of `udaf_grouped` — the SAME
    statistic that key computes with a grouped-map applyInPandas
    kernel — expressed as rank window + exact integer moments: no
    Arrow round-trip, whole-stage codegen end to end, and the pair
    documents the API trade-off the UDAF section exists to show
    (imperative kernels buy generality; when the algebra is
    window-expressible, the declarative form is the 100 TB choice).

    Determinism: revenue in cents (floor of the identical IEEE
    product — the HHI lesson), rank over the total (cents, suppkey)
    order so ties cannot reorder i·x sums, exact BIGINT moments, one
    floored double expression at the very end (identical operand
    order both engines).

    Scale: one fact aggregate to supplier grain; the rank is ONE
    global sort of the |suppliers|-row summary (key-grain, not fact-
    grain — the unpartitioned window rides the aggregate, within the
    repo's metadata-sized-window convention; at 10^9 suppliers swap
    in `distributed_ntile`'s two-level rank, the landed pattern);
    the moment aggregate is one row. Identical SQL text on both
    engines."""
    return Q(spark, sf_dir, _GINI_REV_SQL)


# --- 64. box-plot five-number summary + Tukey outliers ----------------------

def _boxplot_sql(q_expr: str, i0: int) -> str:
    """Dialect twins: Spark ``percentile(x, array(...))`` (0-indexed)
    vs DuckDB ``quantile_cont(x, [...])`` (1-indexed lists)."""
    return f"""
    WITH q AS (
      SELECT l_returnflag AS grp, {q_expr} AS qs
      FROM lineitem GROUP BY l_returnflag),
    f AS (
      SELECT grp, qs[{i0}] AS q1, qs[{i0 + 1}] AS med, qs[{i0 + 2}] AS q3,
             qs[{i0}] - 1.5 * (qs[{i0 + 2}] - qs[{i0}]) AS lo,
             qs[{i0 + 2}] + 1.5 * (qs[{i0 + 2}] - qs[{i0}]) AS hi
      FROM q)
    SELECT f.grp, round(q1, 4) AS q1, round(med, 4) AS median,
           round(q3, 4) AS q3,
           CAST(count(CASE WHEN l_quantity < lo THEN 1 END) AS BIGINT)
             AS n_low_outliers,
           CAST(count(CASE WHEN l_quantity > hi THEN 1 END) AS BIGINT)
             AS n_high_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN f ON f.grp = l_returnflag
    GROUP BY f.grp, q1, med, q3, lo, hi
    ORDER BY grp
"""


_BOXPLOT_SPARK_SQL = _boxplot_sql(
    "percentile(l_quantity, array(0.25, 0.5, 0.75))", 0)
_BOXPLOT_DUCK_SQL = _boxplot_sql(
    "quantile_cont(l_quantity, [0.25, 0.5, 0.75])", 1)


@register("op_boxplot_stats", oracle=_BOXPLOT_DUCK_SQL)
def op_boxplot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-plot statistics per group: exact interpolated quartiles and
    Tukey-fence outlier counts (x < Q1 − 1.5·IQR / x > Q3 + 1.5·IQR)
    — the distribution-shape audit a feature column gets before a
    model sees it (`op_winsorize` is the remedy whose cutoffs this
    report justifies; `op_log2_histogram` is the magnitude sibling).

    Determinism: exact interpolated quantiles (identical lerp both
    engines, the `agg_percentile` contract), fences computed with the
    identical double algebra in both texts, integer outlier counts.

    Scale: pass 1 is a two-phase value-map percentile per group
    (l_quantity is ~50-distinct — the cheap class; a near-unique
    column swaps in `agg_percentile`'s bucket-histogram tail rank,
    the landed pattern); pass 2 re-joins the 3-row fence table
    (broadcast) and counts conditionally — two fact passes total,
    both map-side-combined aggregates, no fact sort anywhere.
    Twins differ in the quantile spelling and list indexing only."""
    return Q(spark, sf_dir, _BOXPLOT_SPARK_SQL)


# --- 65. interquantile mean (trimmed-by-value mean) --------------------------

def _iqm_sql(q_expr: str, i0: int) -> str:
    return f"""
    WITH q AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls, {q_expr} AS qs
      FROM lineitem GROUP BY l_returnflag, l_linestatus),
    f AS (SELECT rf, ls, qs[{i0}] AS lo, qs[{i0 + 1}] AS hi FROM q)
    SELECT rf, ls,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN l_quantity >= lo AND l_quantity <= hi
                           THEN 1 END) AS BIGINT) AS n_kept,
           CAST(floor(sum(CASE WHEN l_quantity >= lo AND l_quantity <= hi
                               THEN CAST(floor(l_quantity) AS BIGINT)
                               ELSE CAST(0 AS BIGINT) END) * 1000000.0
                      / count(CASE WHEN l_quantity >= lo
                                    AND l_quantity <= hi THEN 1 END))
                AS BIGINT) AS iqm_micro
    FROM lineitem JOIN f ON f.rf = l_returnflag AND f.ls = l_linestatus
    GROUP BY rf, ls
    ORDER BY rf, ls
"""


_IQM_SPARK_SQL = _iqm_sql("percentile(l_quantity, array(0.1, 0.9))", 0)
_IQM_DUCK_SQL = _iqm_sql("quantile_cont(l_quantity, [0.1, 0.9])", 1)


@register("op_interquantile_mean", oracle=_IQM_DUCK_SQL)
def op_interquantile_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interquantile (10–90) mean per (returnflag, linestatus) cell:
    the mean of values between the exact p10 and p90 — the
    outlier-robust central tendency between plain mean (fragile) and
    median (discards mass); the trimmed estimate a monitoring
    dashboard wants when single fat rows shouldn't move the line.

    Determinism: value-threshold trimming (not rank trimming), so tie
    handling cannot differ between engines; exact interpolated
    thresholds; the kept-sum is exact BIGINT (quantity is
    integer-valued) and ONE floored micro-units divide at the end.

    Scale: identical two-pass shape to `op_boxplot_stats` — value-map
    percentile then broadcast threshold re-join with conditional
    two-phase aggregation; trimming by VALUE instead of rank is also
    the scale choice (rank trimming needs a per-group total sort or
    the bucket-tail machinery; value trimming is a map-side
    predicate). Twins differ in quantile spelling and indexing."""
    return Q(spark, sf_dir, _IQM_SPARK_SQL)


# --- 66. data-freshness / staleness audit ------------------------------------

def _stale_sql(us_expr: str) -> str:
    return f"""
    WITH per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(max({us_expr}) AS BIGINT) AS last_us
      FROM events GROUP BY event_type),
    lagd AS (
      SELECT event_type, n_events,
             CAST(max(last_us) OVER () - last_us AS BIGINT) AS lag_us
      FROM per)
    SELECT event_type, n_events, lag_us,
           CAST(floor(lag_us / 60000000.0) AS BIGINT)
             AS staleness_minutes,
           lag_us > 86400000000 AS stale_24h
    FROM lagd ORDER BY event_type
"""


_STALE_SPARK_SQL = _stale_sql("unix_micros(ts)")
_STALE_DUCK_SQL = _stale_sql("epoch_us(ts)")


@register("op_stale_data_audit", oracle=_STALE_DUCK_SQL, tags=("events",))
def op_stale_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit: per event type, the last-seen timestamp's lag
    behind the newest event anywhere, with a 24 h staleness flag — the
    is-the-feed-alive dashboard (a source whose tail went quiet is an
    upstream outage BEFORE it becomes a data-quality incident; the
    streaming twin of this number is the watermark).

    Determinism: integer microsecond arithmetic end to end
    (`unix_micros` / `epoch_us` — the repo's standard twin); the
    minutes conversion floors an explicit DOUBLE divide — a bare
    BIGINT `/` + CAST is the documented trap (Spark truncates the
    double, DuckDB rounds it: this key's first parity run caught
    exactly that one-minute flip).

    Scale: ONE two-phase aggregate to the |event types| grain, ONE
    fact scan — the global max rides an unordered OVER () window on
    the |types|-row AGGREGATE (a scalar subquery over the same CTE
    would INLINE the fact pipeline once per reference: Spark CTEs are
    not materialization points, the op_degree_assortativity lesson).
    Twins differ in the epoch spelling only."""
    return Q(spark, sf_dir, _STALE_SPARK_SQL)


# --- 67. inter-event gap histogram (log2 bins) --------------------------------

def _gap_hist_sql(us_expr: str, div_expr: str, bin_expr: str) -> str:
    return f"""
    WITH o AS (
      SELECT user_id, {us_expr} AS us, event_id FROM events),
    g AS (
      SELECT us - lag(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS gap_us
      FROM o),
    s AS (SELECT CAST({div_expr} AS BIGINT) AS gap_s FROM g
          WHERE gap_us IS NOT NULL),
    b AS (SELECT gap_s,
                 CASE WHEN gap_s <= 0 THEN -1
                      ELSE CAST({bin_expr} AS BIGINT) END AS bin
          FROM s)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_gaps,
           min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
    FROM b GROUP BY bin ORDER BY bin
"""


_GAP_HIST_SPARK_SQL = _gap_hist_sql(
    "unix_micros(ts)", "gap_us div 1000000", "length(bin(gap_s)) - 1")
_GAP_HIST_DUCK_SQL = _gap_hist_sql(
    "epoch_us(ts)", "gap_us // 1000000",
    "length(format('{:b}', gap_s)) - 1")


@register("op_gap_histogram", oracle=_GAP_HIST_DUCK_SQL, tags=("events",))
def op_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram: per-user consecutive-event gaps in
    power-of-two second bins (bin −1 = sub-second) — the
    think-time/latency distribution read (bots cluster in the low
    bins, humans spread log-normally; `op_burst_detection` flags the
    extreme low tail, this shows the whole shape).

    Determinism: integer microsecond gaps (`unix_micros`/`epoch_us`
    twin), integer floor-division to seconds (nonnegative — events
    within one user sort ascending), ⌊log2⌋ via binary-string length
    (the repo's exact-integer log2; never the float log2).

    Scale: ONE user-keyed shuffle (high-cardinality uniform) for the
    lag window, then a ≤64-bin two-phase aggregate — gap extraction
    is O(1) per row in frame state. Twins differ in epoch / integer
    division / binary-format spellings."""
    return Q(spark, sf_dir, _GAP_HIST_SPARK_SQL)


# --- 68. effective type cardinality (inverse Simpson) ------------------------

_EFF_CARD_SQL = """
    WITH tc AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type),
    u AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CAST(c AS DECIMAL(18, 0)) * c) AS DOUBLE) AS s2
      FROM tc GROUP BY user_id)
    SELECT user_id, n_events, n_types,
           CAST(floor(1000000.0 * n_events * n_events / s2) AS BIGINT)
             AS eff_types_ppm
    FROM u ORDER BY user_id
"""


@register("op_effective_cardinality", oracle=_EFF_CARD_SQL,
          tags=("events",))
def op_effective_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective type cardinality per user (inverse Simpson index,
    n²/Σc² in ppm): "how many event types does this user REALLY use"
    — 5 types at 96/1/1/1/1 is effectively ~1.08 types, not 5; the
    diversity number behind `op_type_diversity`'s raw counts, chosen
    over Shannon entropy because it is a RATIONAL function of the
    counts (exact cross-engine integers; entropy's ln() is the
    documented determinism trap).

    Determinism: Σc² by self-multiplication (never `**` — the DuckDB
    DOUBLE-pow trap), one floored double divide with identical
    operand order.

    Scale: two stacked two-phase aggregates on the same high-
    cardinality user key — (user, type) partial-dedups map-side, the
    user rollup is a rehash of key-grain rows; no window, no join.
    Identical SQL text on both engines."""
    return Q(spark, sf_dir, _EFF_CARD_SQL)


# --- 69. behavioral trigrams ---------------------------------------------------

_TRIGRAM_SQL = """
    WITH t AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    c AS (
      SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
      FROM t WHERE e3 IS NOT NULL GROUP BY e1, e2, e3)
    SELECT e1, e2, e3, n,
           CAST(floor(1000000.0 * n / sum(n) OVER ()) AS BIGINT)
             AS share_ppm
    FROM c ORDER BY n DESC, e1, e2, e3 LIMIT 25
"""


@register("op_event_trigrams", oracle=_TRIGRAM_SQL, tags=("events",))
def op_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 behavioral trigrams: the most common length-3 event-type
    sequences across all user journeys — the pattern-mining step up
    from `op_markov_transitions`' first-order pairs (a trigram whose
    middle hop is rare under the bigram model is a genuine sequential
    motif, not two coincidences).

    Determinism: the per-user order is total ((ts, event_id)); the
    top-25 breaks count ties on the full trigram.

    Scale: ONE user-keyed shuffle; both lead()s share one window spec
    (one WindowExec, O(1) frame state), the trigram count is a
    two-phase aggregate on uniform composite keys, the total is a
    scalar subquery over the trigram AGGREGATE (|types|³ bounded),
    and top-25 is TakeOrderedAndProject; the share total rides an
    unordered OVER () window on that bounded aggregate (a scalar
    subquery would re-run the fact window once per reference — the
    CTE-inlining trap). Identical SQL text."""
    return Q(spark, sf_dir, _TRIGRAM_SQL)


# --- 70. linear multi-touch attribution --------------------------------------

_ATTRIB_LINEAR_SQL = """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
    e AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'),
    pt AS (
      SELECT p.event_id AS pid, e.event_type AS t,
             CAST(count(*) AS BIGINT) AS k
      FROM p JOIN e ON e.user_id = p.user_id
       AND e.ts >= p.ts - INTERVAL 7 DAY
       AND (e.ts < p.ts
            OR (e.ts = p.ts AND e.event_id < p.event_id))
      GROUP BY p.event_id, e.event_type),
    cnt AS (
      SELECT pid, CAST(sum(k) AS BIGINT) AS n FROM pt GROUP BY pid),
    att AS (
      SELECT pt.t, CAST(sum(pt.k) AS BIGINT) AS n_touches,
             CAST(sum(pt.k * CAST(floor(1000000.0 / cnt.n) AS BIGINT))
                  AS BIGINT) AS credit_ppm
      FROM pt JOIN cnt ON cnt.pid = pt.pid GROUP BY pt.t)
    SELECT t AS attributed_type, n_touches, credit_ppm,
           CAST(floor(1000000.0 * credit_ppm
                      / sum(credit_ppm) OVER ()) AS BIGINT) AS share_ppm
    FROM att ORDER BY attributed_type
"""
# Engine-side decomposition (r13): Σ w_ppm per type ≡ Σ k·floor(1e6/n)
# over (purchase, type) cells — every one of a cell's k rows carries
# the SAME per-purchase weight, so the per-row window
# `count(*) OVER (PARTITION BY pid)` (which SORTED the 2.2B-row
# candidate join and OOM-killed a 16 g local[32] heap at sf10) folds
# into two two-phase hash aggregates plus a |purchases|-row join —
# no fact-grain sort; the identical twin decomposition runs in the
# oracle (`_ATTRIB_LINEAR_DUCK_SQL`).

# DuckDB twin (r13, VERDICT r12 item 1): the shared-text oracle spilled
# 93 GB to disk-full at sf10 — count(*) OVER (PARTITION BY pid) on the
# event-grain candidate set materializes and sorts the whole join
# output. Decomposed: candidates pre-aggregate to (purchase, type,
# count) — Σ w_ppm per type equals Σ k·floor(1e6/n_pid) exactly, since
# every one of the k rows in a (pid, t) cell carries the SAME
# floor(1e6/n_pid) weight. `pt` is MATERIALIZED because it is
# referenced twice and DuckDB re-inlines multiply-referenced CTEs (the
# kcore lesson) — without it the candidate join would run twice.
_ATTRIB_LINEAR_DUCK_SQL = """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'),
    e AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'),
    pt AS MATERIALIZED (
      SELECT p.event_id AS pid, e.event_type AS t,
             CAST(count(*) AS BIGINT) AS k
      FROM p JOIN e ON e.user_id = p.user_id
       AND e.ts >= p.ts - INTERVAL 7 DAY
       AND (e.ts < p.ts
            OR (e.ts = p.ts AND e.event_id < p.event_id))
      GROUP BY p.event_id, e.event_type),
    cnt AS (
      SELECT pid, CAST(sum(k) AS BIGINT) AS n FROM pt GROUP BY pid),
    att AS (
      SELECT pt.t, CAST(sum(pt.k) AS BIGINT) AS n_touches,
             CAST(sum(pt.k * CAST(floor(1000000.0 / cnt.n) AS BIGINT))
                  AS BIGINT) AS credit_ppm
      FROM pt JOIN cnt ON cnt.pid = pt.pid GROUP BY pt.t)
    SELECT t AS attributed_type, n_touches, credit_ppm,
           CAST(floor(1000000.0 * credit_ppm
                      / sum(credit_ppm) OVER ()) AS BIGINT) AS share_ppm
    FROM att ORDER BY attributed_type
"""


@register("op_attribution_linear", oracle=_ATTRIB_LINEAR_DUCK_SQL,
          tags=("events",))
def op_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's credit splits
    EQUALLY across all touches in its 7-day lookback (floor-ppm
    micro-credits), the fairness counterpoint to
    `op_attribution_last_touch`'s winner-take-all — run both and the
    spread between them is how much the last-touch model overpays the
    closing channel.

    Determinism: identical candidate predicate to the last-touch key
    (strict happened-before on (ts, event_id)); the per-purchase
    weight floor(1e6/n) is one double divide with identical operand
    order; credits sum exactly as BIGINTs.

    Scale: same user-banded candidate join as last-touch (per-
    purchase candidates bounded by one user-week); the weight window
    partitions by purchase id (high cardinality, uniform, unordered —
    O(1) state); final aggregate is |event types|-sized. Identical
    SQL text on both engines."""
    return Q(spark, sf_dir, _ATTRIB_LINEAR_SQL)


# --- 71. revenue Pareto (suppliers-to-80%) ------------------------------------

_PARETO_SQL = """
    WITH rev AS (
      SELECT n_name AS nation, s_suppkey AS suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name, s_suppkey),
    r AS (
      SELECT nation, cents,
             CAST(row_number() OVER (PARTITION BY nation
                                     ORDER BY cents DESC, suppkey)
                  AS BIGINT) AS rnk,
             CAST(sum(cents) OVER (PARTITION BY nation
                                   ORDER BY cents DESC, suppkey
                                   ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum,
             CAST(sum(cents) OVER (PARTITION BY nation) AS BIGINT)
               AS tot,
             CAST(count(*) OVER (PARTITION BY nation) AS BIGINT) AS ns
      FROM rev)
    SELECT nation, max(ns) AS n_suppliers,
           CAST(min(CASE WHEN 5 * cum >= 4 * tot THEN rnk END)
                AS BIGINT) AS suppliers_to_80pct,
           CAST(floor(1000000.0
                      * min(CASE WHEN 5 * cum >= 4 * tot THEN rnk END)
                      / max(ns)) AS BIGINT) AS head_share_ppm
    FROM r GROUP BY nation ORDER BY nation
"""


@register("op_revenue_pareto", oracle=_PARETO_SQL)
def op_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue Pareto per nation: how many top suppliers carry 80 % of
    the nation's revenue, and what fraction of the supplier base that
    head is (the 80/20 read) — `op_hhi_concentration` scores the
    concentration, `op_gini_revenue` scores the inequality, this
    answers the operational question: how short is the list that
    matters.

    Determinism: integer cents (the HHI lesson: floor the identical
    IEEE product before any sum), the 80 % crossing as the EXACT
    integer predicate 5·cum ≥ 4·tot (no 0.8 double), rank over the
    total (cents DESC, suppkey) order.

    Scale: one fact aggregate to (nation, supplier) grain with two
    broadcast dimension joins; all windows partition by nation over
    the supplier-grain AGGREGATE (key-grain input, uniform — the
    running sum and the two cell constants share one window shuffle);
    final rollup is |nations| rows. Identical SQL text."""
    return Q(spark, sf_dir, _PARETO_SQL)


# --- 72. multi-horizon rolling features ---------------------------------------

def _mh_rolling_sql(us_expr: str) -> str:
    return f"""
    WITH daily AS (
      SELECT user_id,
             CAST({us_expr} AS BIGINT) AS dayi,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id, {us_expr})
    SELECT user_id, dayi, n AS n_day,
           CAST(sum(n) OVER (PARTITION BY user_id ORDER BY dayi
                             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_7d,
           CAST(sum(n) OVER (PARTITION BY user_id ORDER BY dayi
                             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_30d,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY dayi
                             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cents_30d
    FROM daily ORDER BY user_id, dayi
"""


_MH_ROLLING_SPARK_SQL = _mh_rolling_sql("unix_micros(ts) div 86400000000")
_MH_ROLLING_DUCK_SQL = _mh_rolling_sql("epoch_us(ts) // 86400000000")


@register("op_multi_horizon_rolling", oracle=_MH_ROLLING_DUCK_SQL,
          tags=("events",))
def op_multi_horizon_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon rolling features: per user-day, the day's event
    count plus true calendar 7-day and 30-day rolling counts and
    30-day value sums — the standard recency feature block a churn /
    propensity model consumes (`op_lag_features` is the offset
    sibling; these are the windowed sums).

    Determinism: integer day index (micros floor-div — the epoch
    twin), exact BIGINT sums; RANGE frames over the integer day give
    true calendar windows (gaps count as zero days) identically on
    both engines.

    Scale: ONE user-keyed shuffle serves the daily aggregate AND all
    three RANGE frames (same partition spec → one sort, one
    WindowExec chain, O(window-days) frame state); the fact reduces
    to user-day grain BEFORE any window touches it. Twins differ in
    the epoch spelling only."""
    return Q(spark, sf_dir, _MH_ROLLING_SPARK_SQL)


# --- 73. burstiness index ------------------------------------------------------

def _burstiness_sql(us_expr: str, div_expr: str) -> str:
    return f"""
    WITH o AS (SELECT user_id, {us_expr} AS us, event_id FROM events),
    g AS (
      SELECT user_id,
             us - lag(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS gap_us
      FROM o),
    s AS (SELECT user_id, CAST({div_expr} AS BIGINT) AS gap_s FROM g
          WHERE gap_us IS NOT NULL),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap_s) AS BIGINT) AS sx,
             CAST(sum(gap_s * gap_s) AS BIGINT) AS sxx
      FROM s GROUP BY user_id)
    SELECT user_id, n AS n_gaps,
           CAST(floor(1000000.0
                      * (sqrt((1.0 * n * sxx - 1.0 * sx * sx) / (1.0 * n * n))
                         - (1.0 * sx / n))
                      / (sqrt((1.0 * n * sxx - 1.0 * sx * sx) / (1.0 * n * n))
                         + (1.0 * sx / n))) AS BIGINT) AS burstiness_ppm
    FROM m
    WHERE n >= 2 AND sx > 0
    ORDER BY user_id
"""


_BURSTINESS_SPARK_SQL = _burstiness_sql("unix_micros(ts)",
                                        "gap_us div 1000000")
_BURSTINESS_DUCK_SQL = _burstiness_sql("epoch_us(ts)",
                                       "gap_us // 1000000")


@register("op_burstiness_index", oracle=_BURSTINESS_DUCK_SQL,
          tags=("events",))
def op_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness index per user: B = (σ−μ)/(σ+μ) over inter-event
    gaps in floor-ppm — the Goh-Barabási one-number rhythm classifier
    (B→−1 metronome/cron, B≈0 Poisson, B→+1 bursty human sessions);
    `op_gap_histogram` shows the corpus shape, this scores each actor
    (cron-like wallets on a ledger literally announce themselves with
    B near −1).

    Determinism: exact BIGINT gap moments (n, Σg, Σg²; squares by
    self-multiply), population σ via one sqrt (bit-identical), and
    the final ratio floored once — both engines evaluate the same
    operand tree. Degenerate guards: n ≥ 2 (σ undefined below) and
    Σg > 0 (all-zero gaps ⇒ B = 0/0).

    Scale: one user-keyed shuffle for the lag window, then a
    two-phase moment aggregate on the same key — the window output
    never re-shuffles (same partitioning). Overflow: gap² ≤ 9·10¹⁴
    for month-long gaps; Σ over any real per-user history stays far
    inside 2⁶³ (the op_zscore_normalize headroom argument). Twins
    differ in epoch / integer-division spellings."""
    return Q(spark, sf_dir, _BURSTINESS_SPARK_SQL)


# --- 74. new vs returning users ------------------------------------------------

def _nvr_sql(us_expr: str) -> str:
    return f"""
    WITH dd AS (
      SELECT DISTINCT user_id,
             CAST({us_expr} AS BIGINT) AS dayi
      FROM events),
    m AS (
      SELECT dayi,
             dayi = min(dayi) OVER (PARTITION BY user_id) AS is_first
      FROM dd)
    SELECT dayi,
           CAST(count(CASE WHEN is_first THEN 1 END) AS BIGINT)
             AS new_users,
           CAST(count(CASE WHEN NOT is_first THEN 1 END) AS BIGINT)
             AS returning_users
    FROM m GROUP BY dayi ORDER BY dayi
"""


_NVR_SPARK_SQL = _nvr_sql("unix_micros(ts) div 86400000000")
_NVR_DUCK_SQL = _nvr_sql("epoch_us(ts) // 86400000000")


@register("op_new_vs_returning", oracle=_NVR_DUCK_SQL, tags=("events",))
def op_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active users: per day, how many active
    users are seen for the first time ever vs seen before — THE
    growth-accounting split (flat DAU can hide a leaky bucket: high
    new + high churn; `op_retention_cohort` is the matrix view, this
    is its one-line-per-day summary).

    Determinism: integer day indexes; first-day via a key-grain
    window min — exact.

    Scale: ONE fact scan to the distinct (user, active-day) grain
    (two-phase, map-side dedup), then a user-partitioned unordered
    window over those KEY-GRAIN rows marks first days without a
    second pass (the min-per-user + join-back spelling would inline
    the fact pipeline twice — the CTE trap this batch keeps dodging),
    and a |days|-row rollup. Twins differ in the epoch spelling."""
    return Q(spark, sf_dir, _NVR_SPARK_SQL)


# --- 75. order cycle time -------------------------------------------------------

def _cycle_sql(gap_expr: str, med_expr: str, bin_expr: str) -> str:
    return f"""
    WITH g AS (
      SELECT o_custkey AS c,
             CAST({gap_expr} AS BIGINT) AS gap_d
      FROM orders),
    gg AS (SELECT c, gap_d FROM g WHERE gap_d IS NOT NULL),
    med AS (
      SELECT c, CAST(floor(10.0 * {med_expr}) AS BIGINT) AS med_decidays
      FROM gg GROUP BY c),
    b AS (
      SELECT med_decidays,
             CASE WHEN med_decidays <= 0 THEN -1
                  ELSE CAST({bin_expr} AS BIGINT) END AS bin
      FROM med)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_customers,
           min(med_decidays) AS min_med_decidays,
           max(med_decidays) AS max_med_decidays
    FROM b GROUP BY bin ORDER BY bin
"""


_CYCLE_SPARK_SQL = _cycle_sql(
    "datediff(o_orderdate, lag(o_orderdate) OVER (PARTITION BY o_custkey"
    " ORDER BY o_orderdate, o_orderkey))",
    "percentile(gap_d, 0.5)",
    "length(bin(med_decidays)) - 1")
_CYCLE_DUCK_SQL = _cycle_sql(
    # o_orderdate lands as TIMESTAMP in the parquet (dates round-trip
    # as midnight timestamps — the documented fixture trap), so plain
    # subtraction is an INTERVAL in DuckDB too; date_diff is the twin.
    "date_diff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey"
    " ORDER BY o_orderdate, o_orderkey), o_orderdate)",
    "quantile_cont(gap_d, 0.5)",
    "length(format('{:b}', med_decidays)) - 1")


@register("op_order_cycle_time", oracle=_CYCLE_DUCK_SQL)
def op_order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order cycle time: each customer's MEDIAN days between
    consecutive orders, rolled into a power-of-two histogram (bin −1
    = same-day medians, deciday resolution keeps .5 medians exact) —
    the reorder-rhythm read behind replenishment forecasting and the
    `op_dormant_reactivation` gap threshold (set the dormancy cutoff
    where this histogram's mass ends).

    Determinism: date−date via the datediff twin (Spark's date
    subtraction yields INTERVAL — the documented trap), exact .5
    medians surfaced as floor-decidays, ⌊log2⌋ via binary-string
    length.

    Scale: one customer-keyed shuffle serves the lag window AND the
    per-customer median (same partitioning; the median's value map is
    bounded by orders-per-customer); the histogram is a ≤64-bin
    two-phase rollup. Twins differ in date-diff / quantile / binary
    spellings."""
    return Q(spark, sf_dir, _CYCLE_SPARK_SQL)


# --- 66. bipartite graph density by segment ---------------------------------

_BIPARTITE_DENSITY_SQL = """
    WITH e AS (
      SELECT /*+ SHUFFLE_HASH(orders), BROADCAST(customer) */
             DISTINCT c_mktsegment AS seg, o_custkey AS c, l_suppkey AS s
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey),
    m AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n_edges,
             CAST(count(DISTINCT c) AS BIGINT) AS n_customers,
             CAST(count(DISTINCT s) AS BIGINT) AS n_suppliers
      FROM e GROUP BY seg)
    SELECT seg, n_customers, n_suppliers, n_edges,
           CAST(floor(1000000.0 * n_edges
                      / n_customers / n_suppliers) AS BIGINT)
             AS density_ppm
    FROM m ORDER BY seg
"""


@register("op_bipartite_density", oracle=_BIPARTITE_DENSITY_SQL,
          tags=("graph",))
def op_bipartite_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite trade-graph density per market segment: realized
    customer→supplier edges over the possible |C|·|S| grid, in
    floor-ppm — the one-number "how interconnected is this market"
    read (a densifying segment is consolidating routing; on a ledger,
    contract-user density separates broad-use protocols from
    single-whale ones) and the denominator every edge-count metric in
    the graph family should be normalized by before comparing
    segments of different size.

    Determinism: exact BIGINT counts, floor-ppm via SEQUENTIAL double
    divides (/ n_customers / n_suppliers) — never the raw BIGINT
    product n_customers * n_suppliers, which wraps past ~3e9 × 3e9
    entities and sits outside the sum()-scoped overflow lint (r10
    ADVICE). Identical operand order both engines; the shared-SQL
    twin.

    Scale: one distinct to edge grain (keys-only hash aggregate, O(1)
    state), then one multi-distinct aggregate per segment — Spark
    plans the two COUNT(DISTINCT) with an Expand (3× the EDGE rows,
    not the fact rows; edges are the small post-distinct set), each
    leg map-side combined. |segments| output rows."""
    return Q(spark, sf_dir, _BIPARTITE_DENSITY_SQL)


# --- 67. mergeable exact moments (parallel statistics contract) --------------

_MOMENTS_MERGE_N_SHARDS = 8

_MOMENTS_MERGE_SQL = f"""
    WITH c AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    sh AS (
      SELECT event_type, event_id % {_MOMENTS_MERGE_N_SHARDS} AS shard,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(cents AS DECIMAL(38, 0))) AS s1,
             sum(CAST(cents AS DECIMAL(38, 0)) * cents) AS s2
      FROM c GROUP BY event_type, event_id % {_MOMENTS_MERGE_N_SHARDS}),
    m AS (
      SELECT event_type,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_shards,
             CAST(sum(s1) AS DOUBLE) AS s1,
             CAST(sum(s2) AS DOUBLE) AS s2
      FROM sh GROUP BY event_type)
    SELECT event_type, n, n_shards,
           CAST(floor(1000.0 * s1 / n) AS BIGINT) AS mean_millicents,
           CAST(floor(1000.0 * (n * s2 - s1 * s1) / (1.0 * n * n))
             AS BIGINT) AS var_millicents
    FROM m ORDER BY event_type
"""


@register("agg_moments_merge", oracle=_MOMENTS_MERGE_SQL,
          tags=("events",))
def agg_moments_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable exact moments: per event type, mean and population
    variance computed as a TWO-LEVEL merge — per-shard exact
    (n, Σx, Σx²) states combined into the global statistic — the
    algebraic contract every distributed/incremental statistics
    system rests on (a day's partial states merge into the month's
    without rescanning the day; `agg_sketch_merge` shows it for
    approximate sketches, this key shows it loss-FREE for moments).

    Determinism: cents floor idiom; both Σx and Σx² accumulate as
    DECIMAL(38,0) — EXACT at any scale (a BIGINT Σx² wraps on Spark at
    ~1e5-cent values × 1e9 rows; the assortativity lesson) — and the
    shard split (event_id mod 8, `_MOMENTS_MERGE_N_SHARDS`) is
    content-deterministic, so the merged sums equal the direct sums
    bit-for-bit; the final mean/variance go through one identical
    double expression (exact integers < 2^53 at fixture scales; the
    op_regression_slope caveat documents the regime beyond).

    Scale: two stacked two-phase aggregates — fact → (type, shard)
    grain → |types| rows; everything after the first combine is
    metadata-sized. The shard level is deliberately materialized in
    the plan (not folded away) because it IS the artifact a real
    pipeline persists: per-partition moment states that tomorrow's
    run merges without re-reading today's fact."""
    return Q(spark, sf_dir, _MOMENTS_MERGE_SQL)


# --- 68. trade-graph connected components ------------------------------------

_COMPONENTS_SQL = """
    WITH RECURSIVE osup AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
      WHERE l_quantity >= 48),
    e AS MATERIALIZED (
      SELECT a.s AS u, b.s AS v
      FROM osup a JOIN osup b ON a.ok = b.ok AND a.s < b.s
      GROUP BY a.s, b.s HAVING count(*) >= 2),
    ee AS MATERIALIZED (
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    reach(src, dst) AS (
      SELECT u AS src, u AS dst FROM (SELECT u FROM ee GROUP BY u)
      UNION
      SELECT r.src, ee.v AS dst FROM reach r JOIN ee ON ee.u = r.dst),
    comp AS (
      SELECT src AS node, CAST(min(dst) AS BIGINT) AS component
      FROM reach GROUP BY src)
    SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
    FROM comp GROUP BY component ORDER BY component
"""


@register("op_trade_components", oracle=_COMPONENTS_SQL, tags=("graph",))
def op_trade_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the HIGH-VALUE supplier co-purchase
    graph (suppliers co-appearing on ≥2 orders through near-full-
    quantity lineitems — the quantity filter thins the TPC-H-uniform
    co-purchase clique into real structure: 14 components at sf0.01;
    `op_triangle_count` keeps the dense threshold-5 edge set),
    reported as component → node count — the graph partition every
    entity-resolution / ring-detection pass starts from (a component
    is a candidate trading ring; its min-node id is the canonical
    label), and the TRADE-graph twin of the text side's
    `dedup_clusters` (which labels near-dup document components).

    Spark side: the shared pointer-doubling min-label kernel
    (`llm_pipeline._cc_labels` — O(log diameter) rounds, per-round
    localCheckpoint + superseded-state release), reused verbatim on a
    different edge source; components then roll up in one aggregate.
    The oracle is a recursive transitive closure (every CTE
    MATERIALIZED — the kcore lesson: DuckDB inlines multiply-referenced
    CTEs exponentially otherwise), feasible because the qualifying
    edge set is dimension-scale (suppliers, not facts).

    Determinism: exact integer labels (min over node ids), exact
    counts; no floats anywhere.

    Scale: the edge build is the triangle key's measured shape (distinct
    to (order, supplier) grain, pair-join bounded per order); the
    fixpoint shuffles the |nodes|-row label table per round, never
    edges-as-state; the closure's O(V·component-size) row blowup is
    oracle-only."""
    # build-once high-value pair table (r13): LPA's edge predicate is
    # IDENTICAL (qty ≥ 48, ≥ 2 shared orders) — one builder, two keys
    e = _shared_pairs_hi(spark, sf_dir)
    from .llm_pipeline import _cc_labels

    labels = _cc_labels(e.select(F.col("u").alias("doc_a"),
                                 F.col("v").alias("doc_b")))
    # (edge build mirrors the oracle's quantity-filtered CTEs)
    return (labels.groupBy(F.col("cluster_id").alias("component"))
            .agg(F.count("*").cast("long").alias("n_nodes"))
            .orderBy("component"))


# --- 69. watermark planner (event-time disorder audit) ------------------------

#: carry-in bucket width on the arrival axis (event_id). Sized so the
#: (type, bucket) aggregate table stays join-cheap while each bucket's
#: running-max window holds ~1M rows of state-free scan.
_WM_BKT = 1048576

_WM_TAIL_SQL = """
    d AS (
      SELECT event_type,
             CASE WHEN rm IS NULL OR rm <= es THEN CAST(0 AS BIGINT)
                  ELSE CAST(rm - es AS BIGINT) END AS dis
      FROM j),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN dis > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
             CAST(sum(CASE WHEN dis > 60 THEN 1 ELSE 0 END) AS BIGINT)
               AS late_60s,
             CAST(sum(CASE WHEN dis > 600 THEN 1 ELSE 0 END) AS BIGINT)
               AS late_600s,
             CAST(sum(CASE WHEN dis > 3600 THEN 1 ELSE 0 END) AS BIGINT)
               AS late_3600s,
             CAST(max(dis) AS BIGINT) AS max_disorder_s
      FROM d GROUP BY event_type)
    SELECT event_type, n_events, n_late, late_60s, late_600s, late_3600s,
           max_disorder_s,
           CAST(CASE WHEN 1000 * late_60s <= n_events THEN 60
                     WHEN 1000 * late_600s <= n_events THEN 600
                     WHEN 1000 * late_3600s <= n_events THEN 3600
                     ELSE -1 END AS BIGINT) AS suggested_watermark_s
    FROM agg ORDER BY event_type
"""

_WM_SPARK_SQL = f"""
    WITH c AS (
      SELECT event_type, event_id, unix_micros(ts) div 1000000 AS es,
             event_id div {_WM_BKT} AS bkt
      FROM events),
    loc AS (
      SELECT event_type, bkt, es,
             max(es) OVER (PARTITION BY event_type, bkt ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS rm_loc
      FROM c),
    ba AS (SELECT event_type, bkt, max(es) AS bmax
           FROM c GROUP BY event_type, bkt),
    cr AS (
      SELECT event_type, bkt,
             max(bmax) OVER (PARTITION BY event_type ORDER BY bkt
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS carry
      FROM ba),
    j AS (
      -- <=> : same null-key rule as op_twap's stitch — the oracle's
      -- single window keeps a NULL event_type group; the carry-in
      -- join must not drop it (r12 null-seed fuzz)
      SELECT l.event_type, l.es,
             greatest(l.rm_loc, cr.carry) AS rm
      FROM loc l JOIN cr ON cr.event_type <=> l.event_type
                        AND cr.bkt = l.bkt),
    {_WM_TAIL_SQL}
"""

_WM_DUCK_SQL = f"""
    WITH c AS (
      SELECT event_type, event_id, epoch_us(ts) // 1000000 AS es
      FROM events),
    j AS (
      SELECT event_type, es,
             max(es) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS rm
      FROM c),
    {_WM_TAIL_SQL}
"""


@register("op_watermark_planner", oracle=_WM_DUCK_SQL, tags=("events",))
def op_watermark_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark planning from measured event-time disorder: per event
    type, how late events actually arrive — disorder = (max event time
    already seen in arrival order) − (this event's time), with arrival
    order proxied by event_id (the ingest sequence) — rolled into late
    counts at the 60 s / 600 s / 3600 s ladder and a suggested
    watermark: the smallest rung that keeps late arrivals ≤ 0.1 %
    (exact integer cross-multiplication, no rate rounding; −1 = even
    1 h drops too much). This is the measurement every
    `withWatermark()` in the streaming family should be configured
    FROM — guessing a watermark either drops data (too tight) or
    bloats state (too loose); `stream_watermark_late` shows the drop
    semantics, this key sizes the knob.

    Determinism: epoch seconds via the unix_micros-div / epoch_us-//
    twin (the documented fractional-seconds trap); exact BIGINT
    arithmetic end to end; ties in the running max are harmless (max
    is commutative).

    Scale: the running max LOOKS type-grain-sequential (|types| ≈ 5
    would cap parallelism at 5), so the Spark side decomposes it with
    `join_asof_bucketed`'s carry-in pattern: a (type, 2^20-wide
    arrival-bucket) local window — parallelism grows with data — plus
    a carry-in prefix max over the (type, bucket) AGGREGATE (bounded:
    one row per bucket), re-joined on the bucket key. The oracle keeps
    the single-window spelling; identical integers either way."""
    return Q(spark, sf_dir, _WM_SPARK_SQL)


# --- 70. small-file compaction plan ------------------------------------------

_COMPACTION_ROWS_PER_FILE = 10000

_COMPACTION_SQL = f"""
    WITH p AS (
      SELECT date_trunc('day', ts) AS pday,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY date_trunc('day', ts)),
    plan AS (
      SELECT pday, n_rows,
             CAST((n_rows + {_COMPACTION_ROWS_PER_FILE - 1})
                  / {_COMPACTION_ROWS_PER_FILE} AS BIGINT) AS n_files
      FROM p)
    SELECT {{DAY_FMT}} AS pday, n_rows, n_files,
           2 * n_rows < {_COMPACTION_ROWS_PER_FILE} AS merge_candidate,
           CAST(floor(1000000.0
                      * (n_files * {_COMPACTION_ROWS_PER_FILE} - n_rows)
                      / (n_files * {_COMPACTION_ROWS_PER_FILE}))
             AS BIGINT) AS slack_ppm
    FROM plan ORDER BY pday
"""


@register("op_compaction_plan",
          oracle=_COMPACTION_SQL
          .replace(f"/ {_COMPACTION_ROWS_PER_FILE} AS BIGINT",
                   f"// {_COMPACTION_ROWS_PER_FILE} AS BIGINT")
          .replace("{DAY_FMT}", "strftime(pday, '%Y-%m-%d')"),
          tags=("events", "scale"))
def op_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: per DAY partition of the event
    stream, the row count, the file count a 10k-rows-per-file target
    implies (ceil), a merge-candidate flag for partitions under half a
    file, and the slack (unused capacity of the planned files) in
    floor-ppm — the table-maintenance report every partitioned parquet
    lake needs on a schedule (small files are the classic 100 TB
    metadata killer: a day of 1k-row writes costs more in open/list
    overhead than in bytes; `op_zorder_layout` plans the layout WITHIN
    files, this plans the file COUNT).

    Determinism: exact integer ceil via (n + target−1) div target
    (Spark `/` on BIGINTs returns DOUBLE, so the twin spells it `//`
    for DuckDB and the Spark text uses div — see the oracle replace);
    the merge flag is exact cross-multiplication (2n < target); the
    month surfaces as a STRING via the date_format/strftime twins (a
    duck DATE round-trips through pandas as a midnight timestamp).

    Scale: one two-phase aggregate to |days| rows; everything after
    is metadata-sized arithmetic."""
    return Q(spark, sf_dir, _COMPACTION_SQL
             .replace(f"/ {_COMPACTION_ROWS_PER_FILE} AS BIGINT",
                      f"div {_COMPACTION_ROWS_PER_FILE} AS BIGINT")
             .replace("{DAY_FMT}", "date_format(pday, 'yyyy-MM-dd')"))


# --- 71. cold-start coverage audit -------------------------------------------

_COLDSTART_DAYS = 30

_COLDSTART_SQL = f"""
    WITH cutoff AS (
      SELECT max(o_orderdate) - INTERVAL {_COLDSTART_DAYS} DAY AS c
      FROM orders),
    train_c AS (SELECT DISTINCT o_custkey AS k FROM orders
                WHERE o_orderdate < (SELECT c FROM cutoff)),
    test_c AS (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_orderdate >= (SELECT c FROM cutoff)),
    train_p AS (SELECT DISTINCT l_partkey AS k
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderdate < (SELECT c FROM cutoff)),
    test_p AS (SELECT DISTINCT l_partkey AS k
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               WHERE o_orderdate >= (SELECT c FROM cutoff)),
    m AS (
      SELECT 'customer' AS entity,
             CAST((SELECT count(*) FROM test_c) AS BIGINT) AS n_test,
             CAST((SELECT count(*) FROM test_c
                   WHERE k NOT IN (SELECT k FROM train_c)) AS BIGINT)
               AS n_unseen
      UNION ALL
      SELECT 'part' AS entity,
             CAST((SELECT count(*) FROM test_p) AS BIGINT) AS n_test,
             CAST((SELECT count(*) FROM test_p
                   WHERE k NOT IN (SELECT k FROM train_p)) AS BIGINT)
               AS n_unseen)
    SELECT entity, n_test, n_unseen,
           CAST(CASE WHEN n_test = 0 THEN 0
                     ELSE floor(1000000.0 * n_unseen / n_test)
                END AS BIGINT) AS unseen_ppm
    FROM m ORDER BY entity
"""


@register("op_coldstart_audit", oracle=_COLDSTART_SQL)
def op_coldstart_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start coverage audit: split the order history at
    (max date − 30 days) into train/test the way `op_time_split`
    does, then measure what fraction of TEST-period entities
    (customers, parts) were never seen in train — the number that
    decides whether an id-embedding model can serve the next month at
    all (high unseen ppm ⇒ features must come from content, not ids)
    and the leakage sanity check on any temporal split.

    Determinism: DATE-grain comparison against a collected-free scalar
    subquery cutoff (exact day arithmetic both engines); exact counts;
    one guarded floor-ppm divide.

    Scale: each entity class is one pushed-filter scan → keys-only
    distinct (O(1) state) → a left-anti-shaped NOT IN on the
    dimension-sized train key set (Catalyst plans it as a broadcast
    null-aware anti join — train keys are entity-grain, not fact-
    grain); the union'd report is 2 rows."""
    return Q(spark, sf_dir, _COLDSTART_SQL)


# --- 72. shipping SLA compliance ----------------------------------------------

_SHIP_SLA_SPARK_SQL = """
    WITH d AS (
      SELECT /*+ SHUFFLE_HASH(orders) */
             date_trunc('month', o_orderdate) AS omonth,
             datediff(l_shipdate, o_orderdate) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    m AS (
      SELECT omonth, CAST(count(*) AS BIGINT) AS n_lineitems,
             CAST(sum(CASE WHEN lag_days <= 7 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_within_7d,
             CAST(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_within_30d
      FROM d GROUP BY omonth)
    SELECT {MONTH_FMT} AS omonth, n_lineitems,
           n_within_7d, n_within_30d,
           CAST(floor(1000000.0 * n_within_7d / n_lineitems) AS BIGINT)
             AS sla7_ppm,
           CAST(floor(1000000.0 * n_within_30d / n_lineitems) AS BIGINT)
             AS sla30_ppm
    FROM m ORDER BY omonth
"""

_SHIP_SLA_DUCK_SQL = (_SHIP_SLA_SPARK_SQL
                      .replace("datediff(l_shipdate, o_orderdate)",
                               "date_diff('day', o_orderdate, l_shipdate)")
                      .replace("{MONTH_FMT}",
                               "strftime(omonth, '%Y-%m')"))


@register("op_ship_sla", oracle=_SHIP_SLA_DUCK_SQL)
def op_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-SLA compliance by order month: the fraction of line
    items shipped within 7 and within 30 days of their order date, in
    floor-ppm — the operational twin of `op_conversion_delay` (that
    key distributes event-funnel latency; this one scores a
    fulfillment PROMISE against order-grain facts, the shape of every
    settlement-time / finality-latency SLA on a ledger).

    Determinism: day lag via the datediff / date_diff('day') twins
    (Spark date subtraction yields INTERVAL and DuckDB's `-` does too
    on timestamps — both sides spell the day count explicitly); month
    as a STRING via the format twins; exact counts; two floor-ppm
    divides.

    Scale: ONE fact-fact join (order key — Catalyst picks the join
    side; the month rollup is a two-phase aggregate to |months| rows);
    no windows, no distinct."""
    return Q(spark, sf_dir, _SHIP_SLA_SPARK_SQL.replace(
        "{MONTH_FMT}", "date_format(omonth, 'yyyy-MM')"))


# --- 73. order-insensitive table checksum (migration validation) -------------

_CHECKSUM_MOD = 1000000007

#: canonical per-row hash: md5 of a '|'-joined canonical string, first
#: 15 hex digits as BIGINT (fits int64), summed EXACTLY as decimal and
#: reduced mod a prime. Column canonicalization dodges every
#: cross-engine serialization trap: doubles go to floor-cents, dates
#: to formatted strings, everything else casts to its string form.
_CHECKSUM_SQL = f"""
    WITH h AS (
      SELECT 'orders' AS table_name,
             {{HEX2INT}} AS hv
      FROM (
        SELECT md5(concat_ws('|', CAST(o_orderkey AS STRING),
                             CAST(o_custkey AS STRING), o_orderstatus,
                             CAST(CAST(floor(o_totalprice * 100)
                                       AS BIGINT) AS STRING),
                             {{DAYFMT_O}})) AS m
        FROM orders)
      UNION ALL
      SELECT 'lineitem' AS table_name,
             {{HEX2INT}} AS hv
      FROM (
        SELECT md5(concat_ws('|', CAST(l_orderkey AS STRING),
                             CAST(l_partkey AS STRING),
                             CAST(l_suppkey AS STRING),
                             CAST(l_linenumber AS STRING),
                             CAST(CAST(floor(l_extendedprice * 100)
                                       AS BIGINT) AS STRING),
                             {{DAYFMT_L}})) AS m
        FROM lineitem))
    SELECT table_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(hv AS DECIMAL(38, 0))) % {_CHECKSUM_MOD}
             AS BIGINT) AS checksum
    FROM h GROUP BY table_name ORDER BY table_name
"""

_CHECKSUM_SPARK_SQL = (
    _CHECKSUM_SQL
    .replace("{HEX2INT}",
             "cast(conv(substring(m, 1, 15), 16, 10) as bigint)")
    .replace("{DAYFMT_O}", "date_format(o_orderdate, 'yyyy-MM-dd')")
    .replace("{DAYFMT_L}", "date_format(l_shipdate, 'yyyy-MM-dd')"))

_CHECKSUM_DUCK_SQL = (
    _CHECKSUM_SQL
    .replace("{HEX2INT}",
             "CAST(('0x' || substring(m, 1, 15)) AS BIGINT)")
    .replace("{DAYFMT_O}", "strftime(o_orderdate, '%Y-%m-%d')")
    .replace("{DAYFMT_L}", "strftime(l_shipdate, '%Y-%m-%d')"))


@register("op_table_checksum", oracle=_CHECKSUM_DUCK_SQL,
          tags=("scale",))
def op_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum: per table, an exact content
    fingerprint — md5 of each row's CANONICAL string (ints/strings as
    text, doubles as floor-cents, dates via the format twins — every
    cross-engine serialization trap dodged at the column level), the
    first 15 hex digits as a BIGINT, summed exactly and reduced mod a
    prime. Two engines (or two copies: pre/post migration, source vs
    replica, yesterday's snapshot vs a restored backup) computing the
    same number means the same multiset of rows — THE cheap answer to
    "did the copy preserve every row?" that row counts alone cannot
    give (a dropped row plus a duplicated one keeps the count).

    Determinism: md5 is engine-identical on identical strings; 15 hex
    digits < 2^60 fit BIGINT on both engines; the sum accumulates as
    DECIMAL(38,0) (the overflow-audit contract — a BIGINT sum of
    2^60-scale values wraps at ~10 rows short of nothing: 2^3 rows)
    and the mod folds it to a comparable BIGINT.

    Scale: embarrassingly parallel — one narrow projection + hash per
    row, partial decimal sums combine map-side, |tables| output rows;
    no shuffle beyond the final 2-row aggregate. Collision odds for a
    ~2^60-bit sum mod 1e9+7: adversarial inputs can collide, random
    corruption is caught with p ≈ 1 − 1e-9 — the right tool for
    integrity monitoring, not authentication."""
    return Q(spark, sf_dir, _CHECKSUM_SPARK_SQL)


# --- 70. OHLC candlestick bars (r11) -----------------------------------------

def _ohlc_sql(day_expr: str, argmin: str, argmax: str) -> str:
    """Twins differ in the day-string spelling and the argmin/argmax
    function names (Spark min_by/max_by ≡ DuckDB arg_min/arg_max).

    FILTER on open/close (r12 null-seed fuzz): a NULL-value tick is
    not a price. high/low/volume already skip NULLs on both engines
    (plain aggregates), but the argmin/argmax pair diverges — Spark's
    max_by is null-sensitive, DuckDB's arg_max null-skipping — so the
    explicit FILTER pins the skip semantics identically (probed on
    both); n_trades stays count(*) over ALL ticks, null-valued ones
    included, which is what a trade count means."""
    return f"""
    WITH c AS (
      SELECT event_type, {day_expr} AS day, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_type, day,
           CAST({argmin}(cents, event_id)
                FILTER (WHERE cents IS NOT NULL) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST({argmax}(cents, event_id)
                FILTER (WHERE cents IS NOT NULL) AS BIGINT) AS close_cents,
           CAST(count(*) AS BIGINT) AS n_trades,
           CAST(sum(cents) AS BIGINT) AS volume_cents
    FROM c GROUP BY event_type, day
    ORDER BY event_type, day
"""


_OHLC_SPARK_SQL = _ohlc_sql("date_format(ts, 'yyyy-MM-dd')",
                            "min_by", "max_by")
_OHLC_DUCK_SQL = _ohlc_sql("strftime(ts, '%Y-%m-%d')",
                           "arg_min", "arg_max")


@register("op_ohlc_bars", oracle=_OHLC_DUCK_SQL, tags=("events",))
def op_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars: per (event type, day), the open / high /
    low / close value plus trade count and volume — the standard
    market-data downsampling every charting and signal pipeline runs
    first (on a ledger: per-asset daily price bars from raw swap
    events). `op_timeseries_resample` keeps the mean-resample shape;
    this key pins the ORDER-DEPENDENT endpoints (open/close are
    argmin/argmax by sequence, not extrema).

    Determinism: cents floor idiom; open/close selected by the UNIQUE
    event_id ingest sequence (min_by/arg_min twins — no timestamp
    ties to break), exact BIGINT extrema/sums.

    Scale: ONE two-phase hash aggregate — min_by/max_by carry O(1)
    state (current best + its key) exactly like min/max, so the map
    side combines everything and the shuffle moves |types|·|days|
    aggregate cells, never rows. No window, no sort, no join."""
    return Q(spark, sf_dir, _OHLC_SPARK_SQL)


# --- 71. time-weighted average price (r11) -----------------------------------

def _twap_sql(es_expr: str) -> str:
    return f"""
    WITH c AS (
      SELECT event_type, event_id, {es_expr} AS es,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    g AS (
      SELECT event_type, cents,
             lead(es) OVER (PARTITION BY event_type
                            ORDER BY es, event_id) - es AS gap_s
      FROM c),
    a AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_used,
             CAST(sum(gap_s) AS BIGINT) AS total_seconds,
             CAST(sum(CAST(cents AS DECIMAL(38, 0)) * gap_s) AS DOUBLE)
               AS wsum
      FROM g WHERE gap_s IS NOT NULL GROUP BY event_type)
    SELECT event_type, n_used, total_seconds,
           CAST(floor(1000.0 * wsum / total_seconds) AS BIGINT)
             AS twap_millicents
    FROM a WHERE total_seconds > 0 ORDER BY event_type
"""


#: Spark side (r11, measured at sf10): the single-key (type) lead
#: window serializes each type into one task — 8.70 s at sf10 vs
#: 2.06 s for this (type, day-bucket) carry-in form (local lead per
#: bucket; each bucket's LAST row takes the next bucket's first
#: event-time from a bucket-grain lead — the fourth instance of the
#: carry-in decomposition). Bucketing by es keeps bucket order
#: consistent with the (es, event_id) total order, so the stitched
#: gaps are exactly the single-window gaps (equality checked in the
#: race and by the shared oracle, which keeps the one-window
#: spelling).
_TWAP_SPARK_SQL = """
    WITH c AS (
      SELECT event_type, event_id, unix_micros(ts) div 1000000 AS es,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             (unix_micros(ts) div 1000000) div 86400 AS bkt
      FROM events),
    loc AS (
      SELECT event_type, bkt, es, cents,
             lead(es) OVER (PARTITION BY event_type, bkt
                            ORDER BY es, event_id) AS nxt
      FROM c),
    fb AS (SELECT event_type, bkt, min(es) AS first_es
           FROM c GROUP BY event_type, bkt),
    nf AS (SELECT event_type, bkt,
                  lead(first_es) OVER (PARTITION BY event_type
                                       ORDER BY bkt) AS next_first
           FROM fb),
    g AS (
      -- <=> : the carry-in stitch must not DROP a NULL event_type
      -- group the oracle's single window keeps — a bare = join
      -- silently loses every null-key row when the decomposition
      -- replaces a window with a join (r12 null-seed fuzz)
      SELECT l.event_type, l.cents,
             coalesce(l.nxt, nf.next_first) - l.es AS gap_s
      FROM loc l JOIN nf ON nf.event_type <=> l.event_type
                        AND nf.bkt = l.bkt),
    a AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_used,
             CAST(sum(gap_s) AS BIGINT) AS total_seconds,
             CAST(sum(CAST(cents AS DECIMAL(38, 0)) * gap_s) AS DOUBLE)
               AS wsum
      FROM g WHERE gap_s IS NOT NULL GROUP BY event_type)
    SELECT event_type, n_used, total_seconds,
           CAST(floor(1000.0 * wsum / total_seconds) AS BIGINT)
             AS twap_millicents
    FROM a WHERE total_seconds > 0 ORDER BY event_type
"""
_TWAP_DUCK_SQL = _twap_sql("epoch_us(ts) // 1000000")


@register("op_twap", oracle=_TWAP_DUCK_SQL, tags=("events",))
def op_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price: per event type, each value is
    weighted by how long it REMAINED the latest observation (seconds
    to the next event), the final open-ended observation excluded —
    the standard TWAP benchmark execution algos settle against, and
    the irregular-sampling average `op_vwap` (volume weights) and
    plain mean (count weights) both misstate (a price that held for
    an hour counts 3600× one that held a second).

    Determinism: integer epoch seconds (the unix_micros/epoch_us
    twins), exact BIGINT gaps, the cents·gap product accumulated as
    DECIMAL(38,0) (the overflow-audit contract — cents ≈ 2^16 × gaps
    ≈ 2^17 wraps a BIGINT sum near 2^30 facts), one floor-milli
    divide in identical operand order — guarded WHERE total_seconds
    > 0 (a type whose events share one epoch second would otherwise
    split Spark-NULL vs DuckDB-inf-cast-error; total by construction,
    the span-corruption pattern).

    Scale (r11, re-measured): the lead gap runs per (type,
    day-bucket) with a bucket-grain carry join stitching each
    bucket's last gap to the next bucket's first event — NO gap is
    lost at the boundary, and no 5-value type key ever owns a
    single-task window (the naive single-key form measured 8.70 s at
    sf10 vs 2.06 s for this one; the first draft shipped the naive
    form with a prose caveat — the caveat is now the implementation).
    The oracle keeps the one-window spelling, so the stitching
    algebra is hash-verified against the direct evaluation."""
    return Q(spark, sf_dir, _TWAP_SPARK_SQL)


# --- 72. equi-join cardinality estimator (r11) --------------------------------

_JOINCARD_SQL = """
    WITH lo AS (
      SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_orderkey),
    oo AS (
      SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY o_orderkey),
    ls AS (
      SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_suppkey),
    ss AS (
      SELECT s_suppkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM supplier GROUP BY s_suppkey),
    pairs AS (
      SELECT 'lineitem*orders@orderkey' AS join_name,
             CAST(count(*) AS BIGINT) AS n_common_keys,
             CAST(sum(CAST(lo.c AS DECIMAL(38, 0)) * oo.c) AS BIGINT)
               AS est_rows,
             CAST(max(lo.c * oo.c) AS BIGINT) AS hottest_key_rows
      FROM lo JOIN oo ON lo.k = oo.k
      UNION ALL
      SELECT 'lineitem*supplier@suppkey' AS join_name,
             CAST(count(*) AS BIGINT) AS n_common_keys,
             CAST(sum(CAST(ls.c AS DECIMAL(38, 0)) * ss.c) AS BIGINT)
               AS est_rows,
             CAST(max(ls.c * ss.c) AS BIGINT) AS hottest_key_rows
      FROM ls JOIN ss ON ls.k = ss.k
      UNION ALL
      SELECT 'lineitem*lineitem@suppkey' AS join_name,
             CAST(count(*) AS BIGINT) AS n_common_keys,
             CAST(sum(CAST(c AS DECIMAL(38, 0)) * c) AS BIGINT)
               AS est_rows,
             CAST(max(c * c) AS BIGINT) AS hottest_key_rows
      FROM ls)
    SELECT join_name, n_common_keys, est_rows, hottest_key_rows,
           CAST(floor(1000000.0 * hottest_key_rows / est_rows)
             AS BIGINT) AS hottest_share_ppm
    FROM pairs ORDER BY join_name
"""


@register("op_join_cardinality_estimate", oracle=_JOINCARD_SQL,
          tags=("scale",))
def op_join_cardinality_estimate(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Equi-join output-size prediction WITHOUT running the join:
    |A ⋈ B on k| = Σ_k c_A(k)·c_B(k) from the two per-key histograms —
    including the self-join (Σ c² — the skew-blowup number that says
    whether a planned join needs salting BEFORE it is launched), the
    hottest key's contribution, and its output share. This is the
    measurement `join_skew_salted` assumes and `op_skew_audit` only
    approximates (a hot INPUT key matters exactly by its OUTPUT
    product); running it first is how a 100 TB pipeline avoids
    discovering a 10¹²-row join at executor-OOM time.

    Determinism: exact BIGINT per-key counts; the product sum
    accumulates as DECIMAL(38,0) (overflow-audit contract — two
    fact-grain counts multiply to 2^80 at scale) and lands in BIGINT
    only after the fixture-bounded cast; per-key products (count ×
    dimension-unique count, and c × c at ≤ fact-per-key grain) stay
    far under 2^63 at any plausible per-key density.

    Scale: per-key counts are two-phase aggregates (map-side combine
    eats the fact); the histogram join is key-grain (|distinct keys|
    rows, not fact rows); output is 3 audit rows. The whole estimator
    costs ~one aggregation pass per side — orders of magnitude under
    the join it sizes."""
    return Q(spark, sf_dir, _JOINCARD_SQL)


# --- 73. empirical CDF at fixed probe points (r11) ----------------------------

#: probe thresholds (cents) spanning the fixture value distribution —
#: median ≈ 3.5k cents, p90 ≈ 11.4k — so every probe's ≤ arm is live
#: at sf0.001+ (the fixture-fit rule).
_CDF_PROBES = (1000, 3000, 8000, 20000)

def _cdf_sql(probes_expr: str) -> str:
    """Twins differ only in the literal-array explode spelling (Spark
    explode(array(...)) ≡ DuckDB unnest([...])) — a VALUES cross join
    would plan a BroadcastNestedLoopJoin (the banned degenerate shape);
    the explode replicates each row map-side with no join operator."""
    return f"""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
             {{probes}} AS probe_cents
      FROM events),
    a AS (
      SELECT event_type, CAST(probe_cents AS BIGINT) AS probe_cents,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN cents <= probe_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS n_le
      FROM c GROUP BY event_type, probe_cents)
    SELECT event_type, probe_cents, n, n_le,
           CAST(floor(1000000.0 * n_le / n) AS BIGINT) AS le_ppm
    FROM a ORDER BY event_type, probe_cents
""".replace("{probes}", probes_expr)


_CDF_SPARK_SQL = _cdf_sql(
    f"explode(array({', '.join(map(str, _CDF_PROBES))}))")
_CDF_DUCK_SQL = _cdf_sql(
    f"unnest([{', '.join(map(str, _CDF_PROBES))}])")


@register("op_cdf_at_points", oracle=_CDF_DUCK_SQL, tags=("events",))
def op_cdf_at_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical CDF evaluated at fixed probe thresholds per event
    type — the monitoring primitive behind SLO dashboards ("what
    fraction of fees sit under X?"): unlike `agg_histogram` (fixed
    bins) or `agg_percentile` (value at a rank), this answers the
    inverse question (rank at a value) exactly, at the handful of
    thresholds a dashboard actually plots, and two runs' outputs are
    directly comparable numbers (percentiles of shifted data move;
    probe points don't).

    Determinism: exact integer counts against integer probes; one
    floor-ppm per cell.

    Scale: the probe list explodes from a LITERAL array — each fact
    row replicates |probes| times map-side (a Generate node, no join
    operator at all; a VALUES cross join would plan the banned
    BroadcastNestedLoopJoin), and the aggregate is two-phase on
    (type, probe) — |types|·|probes| cells. The equivalent 4 separate
    filtered aggregates would scan the fact 4×; this form scans
    once."""
    return Q(spark, sf_dir, _CDF_SPARK_SQL)


# --- 74. synchronous label propagation communities (r11) ----------------------

#: fixed LPA rounds: synchronous updates converge (mod oscillation)
#: within a few rounds on short-diameter co-purchase graphs; a FIXED
#: count keeps the result deterministic and the oracle unrollable.
_LPA_ROUNDS = 3

_LPA_SQL_BODY = """
    osup AS {MAT}(
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
      WHERE l_quantity >= 48),
    e AS {MAT}(
      SELECT a.s AS u, b.s AS v
      FROM osup a JOIN osup b ON a.ok = b.ok AND a.s < b.s
      GROUP BY a.s, b.s HAVING count(*) >= 2),
    ee AS {MAT}(
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    r0 AS {MAT}(
      SELECT u AS node, CAST(u AS BIGINT) AS label
      FROM ee GROUP BY u),
    {ROUNDS}
    SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes
    FROM r{N} GROUP BY label ORDER BY community
"""


def _lpa_round(i: int) -> str:
    """One synchronous vote: node takes its neighbors' most frequent
    label, ties broken by the SMALLEST label (deterministic)."""
    return f"""
    v{i} AS {{MAT}}(
      SELECT ee.u AS node, r{i - 1}.label,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ee JOIN r{i - 1} ON r{i - 1}.node = ee.v
      GROUP BY ee.u, r{i - 1}.label),
    r{i} AS {{MAT}}(
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM v{i}) t WHERE rn = 1)"""


def _lpa_sql() -> str:
    """DuckDB oracle only (the Spark side is the DataFrame loop in
    `op_label_propagation` since r12 — keep the vote algebra in sync
    BY HAND across the two). DuckDB inlines multiply-referenced CTEs
    exponentially (the kcore lesson), so every round's tables are
    MATERIALIZED."""
    rounds = ",".join(_lpa_round(i) for i in range(1, _LPA_ROUNDS + 1))
    body = ("WITH " + _LPA_SQL_BODY.replace("{ROUNDS}", rounds)
            .replace("{N}", str(_LPA_ROUNDS)))
    return body.replace("{MAT}", "MATERIALIZED ")


_LPA_DUCK_SQL = _lpa_sql()


@register("op_label_propagation", oracle=_LPA_DUCK_SQL, tags=("graph",))
def op_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) on the high-value supplier co-purchase graph — 3
    fixed rounds, each node adopting its neighbors' most frequent
    label with ties to the SMALLEST label — reported as community →
    size. Where `op_trade_components` answers "who is CONNECTED" (the
    transitive hull), LPA answers "who is DENSELY connected" (labels
    only spread along majority edges, so sparse bridges between
    communities don't merge them) — the ring-detection refinement a
    components pass is too coarse for.

    Determinism: a FIXED round count (LPA's convergence oscillates on
    bipartite-ish structures; a fixpoint loop would be
    run-order-dependent), integer labels, the (cnt DESC, label ASC)
    vote is a total order. The DuckDB twin keeps the unrolled
    MATERIALIZED-CTE spelling of the identical vote algebra.

    Scale (r12, VERDICT r11 item 6): the SQL-CTE form re-ran the
    whole edge-builder subtree (the 60M-row fact scan + per-order
    self-join — 81% of the op's sf10 cost, SCALE.md) once per vote
    round. Now the symmetrized edge table is persisted, so the
    subtree executes exactly once — rounds 2-3 (and every broadcast
    build) read the InMemoryRelation. Each round is then: broadcast
    label table (node-grain, dimension-bounded — suppliers) into the
    vote join, a two-phase (u, label) count whose exchange moves
    only post-combine vote partials (bounded by |edges| — 8,774 at
    sf10), and a rank-1 WindowGroupLimit window. Rounds are fixed at
    `_LPA_ROUNDS` = 3: a static pipeline, no driver loop. The
    persist is EAGERLY materialized (one scalar count) — this is
    load-bearing twice over, both raced at sf10: (1) a lazy cache is
    computed REDUNDANTLY by every broadcast-subtree consumer racing
    ahead of the fill (3.65 → 23.9 s — the r10 multiply-referenced-
    lazy-subtree lesson, now measured for caches too), and (2) only a
    materialized InMemoryRelation reports its final
    HashPartitioning(u) under AQE (an unmaterialized cache — and a
    localCheckpoint, whose LogicalRDD sees the adaptive plan's
    UnknownPartitioning — reports none), which is what lets the
    repartition("u") below make every round exchange-free. Building
    this plan therefore runs a job, exactly like the eager
    scoped_checkpoint ops (`op_mutual_top_partners`, `_capped_fan`);
    the test-suite release fixtures drop the cache per test.
    Plan-pinned in test_lpa_rounds_reuse_edge_partitioning: one
    edge-builder subtree behind the cache, three broadcast vote
    joins, zero post-cache exchanges below the community rollup."""
    ee = scoped_persist(_lpa_edges(spark, sf_dir).repartition("u"))
    # driver-ok: one scalar — eager cache materialization (see above)
    ee.count()
    r = (ee.select("u").distinct()
         .select(F.col("u").alias("node"),
                 F.col("u").cast("long").alias("label")))
    for _ in range(_LPA_ROUNDS):
        votes = (ee.join(F.broadcast(r), r["node"] == ee["v"])
                 .groupBy("u", "label")
                 .agg(F.count("*").cast("long").alias("cnt")))
        w = Window.partitionBy("u").orderBy(F.desc("cnt"),
                                            F.asc("label"))
        r = (votes.withColumn("rn", F.row_number().over(w))
             .filter("rn = 1")
             .select(F.col("u").alias("node"), "label"))
    return (r.groupBy(F.col("label").alias("community"))
            .agg(F.count("*").cast("long").alias("n_nodes"))
            .orderBy("community"))


def _lpa_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized co-purchase edges (u, v): the union mirror over the
    SHARED high-value pair table (`_shared_pairs_hi` — build-once per
    session, r13). The DataFrame spelling of the oracle's osup/e/ee
    CTEs; only the mirror is op-local."""
    e = _shared_pairs_hi(spark, sf_dir)
    return e.unionAll(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))


# --- 75. SAX symbolization of per-user value series (r11) ---------------------

def _sax_sql(es_expr: str, agg_expr: str) -> str:
    """Twins differ in the epoch spelling and the ordered string-agg
    spelling (Spark listagg WITHIN GROUP ≡ DuckDB string_agg ORDER
    BY); the z-score algebra is shared text."""
    return f"""
    WITH c AS (
      SELECT user_id, event_id, {es_expr} AS es,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id < 30),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(cents AS DECIMAL(38, 0))) AS DOUBLE) AS s1,
             CAST(sum(CAST(cents AS DECIMAL(38, 0)) * cents) AS DOUBLE)
               AS s2
      FROM c GROUP BY user_id),
    z AS (
      SELECT c.user_id, event_id,
             CASE WHEN (m.n * m.s2 - m.s1 * m.s1) <= 0
                  THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(1000.0 * (m.n * cents - m.s1)
                            / sqrt(m.n * m.s2 - m.s1 * m.s1))
                       AS BIGINT) END AS zn
      FROM c JOIN m ON m.user_id = c.user_id),
    sy AS (
      SELECT user_id, event_id,
             CASE WHEN zn < -674 THEN 'a' WHEN zn < 0 THEN 'b'
                  WHEN zn < 674 THEN 'c' ELSE 'd' END AS sym
      FROM z)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           {agg_expr} AS sax
    FROM sy GROUP BY user_id ORDER BY user_id
"""


_SAX_SPARK_SQL = _sax_sql(
    "unix_micros(ts) div 1000000",
    "listagg(sym, '') WITHIN GROUP (ORDER BY event_id)")
_SAX_DUCK_SQL = _sax_sql(
    "epoch_us(ts) // 1000000",
    "string_agg(sym, '' ORDER BY event_id)")


@register("op_sax_symbols", oracle=_SAX_DUCK_SQL, tags=("events",))
def op_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin et al. 2003): each user's value series
    z-normalized against its own mean/stddev and quantized to a
    4-letter alphabet at the standard N(0,1) quartile breakpoints
    (±0.674, 0 — scaled to z-millis ±674), concatenated in event
    order into one symbol string per user — the discretization that
    turns numeric series into text so motif mining, near-dup
    grepping, and sequence models apply (`op_markov_transitions` on
    event TYPES; this is its twin on event VALUES).

    Determinism: exact integer moments (DECIMAL products per the
    overflow contract), the z-score as ONE shared-text IEEE chain —
    (n·x − s1)/√(n·s2 − s1²), sqrt bit-identical — floored to
    z-millis BEFORE the integer breakpoint compares (a breakpoint
    compare on raw doubles would hinge on the last ulp); zero
    variance collapses to z=0 → symbol 'c'; the concat order key
    (event_id) is unique, so the string is total-order deterministic
    (the agg_listagg contract).

    Scale: one (user)-keyed two-phase moment aggregate, a moment
    broadcast-back join (|users| rows), one ordered string aggregate
    per user — the per-user string is bounded by that user's event
    count (the fixture caps output at 30 users; a production run
    would window by (user, week) to bound string length, the
    win_sessionize move)."""
    return Q(spark, sf_dir, _SAX_SPARK_SQL)


# --- 76. bivariate histogram (value × hour-of-day heatmap) (r11) ---------------

_HIST2D_BOUNDS = (1000, 3000, 8000)

_HIST2D_SQL = f"""
    WITH c AS (
      SELECT event_type, hour(ts) AS hh,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    b AS (
      SELECT event_type, CAST(hh AS BIGINT) AS hour_of_day,
             CASE WHEN cents < {_HIST2D_BOUNDS[0]} THEN 0
                  WHEN cents < {_HIST2D_BOUNDS[1]} THEN 1
                  WHEN cents < {_HIST2D_BOUNDS[2]} THEN 2
                  ELSE 3 END AS value_bin
      FROM c),
    a AS (
      SELECT event_type, hour_of_day, CAST(value_bin AS BIGINT)
               AS value_bin,
             CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY event_type, hour_of_day, value_bin),
    t AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS total
      FROM a GROUP BY event_type)
    SELECT a.event_type, hour_of_day, value_bin, n,
           CAST(floor(1000000.0 * n / t.total) AS BIGINT) AS share_ppm
    FROM a JOIN t ON t.event_type = a.event_type
    ORDER BY a.event_type, hour_of_day, value_bin
"""


@register("op_hist2d", oracle=_HIST2D_SQL, tags=("events",))
def op_hist2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate histogram — value bin × hour of day per event type —
    the heatmap behind "do big transactions cluster at odd hours?"
    (wash-trade and bot activity show up as off-diagonal hot cells;
    `agg_histogram` sees only the value margin, `op_seasonality_
    profile` only the time margin — joint structure needs the joint
    table).

    Determinism: integer cents thresholds (`_HIST2D_BOUNDS`), hour()
    on both engines over the same µs timestamps, exact counts, one
    floor-ppm against the per-type total.

    Scale: one map-side double binning (CASE chain + hour, both
    codegen) into a two-phase aggregate at ≤ |types|·24·4 cells; the
    per-type total joins back at cell grain (broadcast — the total
    table is |types| rows). Single fact scan."""
    return Q(spark, sf_dir, _HIST2D_SQL)


# --- 77. reciprocal-best trading partners (r11) --------------------------------

_MUTUAL_SQL = """
    WITH r AS (
      SELECT o_custkey AS c, l_suppkey AS s,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey, l_suppkey),
    bs AS (
      SELECT c, s, cents FROM (
        SELECT c, s, cents,
               row_number() OVER (PARTITION BY s
                                  ORDER BY cents DESC, c ASC) AS rn
        FROM r) t WHERE rn = 1),
    bc AS (
      SELECT c, s, cents FROM (
        SELECT c, s, cents,
               row_number() OVER (PARTITION BY c
                                  ORDER BY cents DESC, s ASC) AS rn
        FROM r) t WHERE rn = 1)
    SELECT bs.s AS suppkey, bs.c AS custkey,
           CAST(bs.cents AS BIGINT) AS pair_cents
    FROM bs JOIN bc ON bc.c = bs.c AND bc.s = bs.s
    ORDER BY suppkey
"""


_MUTUAL_PAIR_SQL = """
    SELECT /*+ SHUFFLE_HASH(orders) */
           o_custkey AS c, l_suppkey AS s,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey, l_suppkey
"""


@register("op_mutual_top_partners", oracle=_MUTUAL_SQL, tags=("graph",))
def op_mutual_top_partners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-best trading partners: (supplier, customer) pairs
    where each is the OTHER's top revenue counterparty — the
    mutual-best-match primitive of entity resolution and stable
    matching (a one-directional argmax pairs every supplier with
    someone; requiring reciprocity keeps only the pairs both sides
    would confirm — on a ledger, the strongly-coupled wallet pairs
    worth investigating first).

    Determinism: exact cents revenue at (customer, supplier) grain;
    both argmaxes are row_number over the total order (cents DESC,
    key ASC) — no max_by/arg_max tie ambiguity.

    Scale: revenue aggregates once at pair grain (two-phase); each
    direction's argmax is a WindowGroupLimit-eligible rank-1 filter
    (k rows per group per partition cross the exchange); the
    reciprocity join is (c, s)-keyed over two ≤|entities|-row
    rank-1 tables. The pair-grain table is eagerly checkpointed and
    REUSED by both windows — as a twice-referenced SQL CTE Spark
    inlines it per reference and executes the fact join twice (no
    ReusedExchange across the differently-partitioned windows;
    measured sf10 12.3 s inlined → 7.5 s checkpointed → 5.8 s with
    the shuffle_hash hint on the order side, since the pair groupBy
    rehashes anyway and an SMJ's fact sort is pure waste — the
    _capped_fan rule twice over). The oracle keeps the
    single-statement CTE spelling: DuckDB materializes
    multiply-referenced CTEs.

    FLOOR-FINAL by measurement (r12, SCALE.md): raced against the
    chained-two-windows-no-join form and a two-phase max_by-argmax +
    broadcast-join form in one session — all three tie within noise
    at sf3 and sf10, because the pair-grain aggregate both rank
    directions need costs more alone than any full variant. No rank
    or join strategy beats an operand it shares with the oracle."""
    from ..caching import scoped_checkpoint

    r = scoped_checkpoint(Q(spark, sf_dir, _MUTUAL_PAIR_SQL))
    w_s = Window.partitionBy("s").orderBy(F.desc("cents"), F.asc("c"))
    w_c = Window.partitionBy("c").orderBy(F.desc("cents"), F.asc("s"))
    bs = (r.withColumn("rn", F.row_number().over(w_s))
          .filter("rn = 1").select("c", "s", "cents"))
    bc = (r.withColumn("rn", F.row_number().over(w_c))
          .filter("rn = 1").select("c", "s"))
    return (bs.join(bc, ["c", "s"])
            .select(F.col("s").alias("suppkey"),
                    F.col("c").alias("custkey"),
                    F.col("cents").alias("pair_cents"))
            .orderBy("suppkey"))


# --- 78. Bollinger bands with breach flags (r11 batch 3) ----------------------

def _boll_sql(es_expr: str, day_expr: str) -> str:
    return f"""
    WITH c AS (
      SELECT event_type, {day_expr} AS day, event_id, {es_expr} AS es,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id < 40),
    m AS (
      SELECT event_type, day, event_id, cents,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(CAST(cents AS DECIMAL(38, 0))) OVER w AS DOUBLE)
               AS s1,
             CAST(sum(CAST(cents AS DECIMAL(38, 0)) * cents) OVER w
               AS DOUBLE) AS s2
      FROM c
      WINDOW w AS (PARTITION BY event_type, day ORDER BY es, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
    b AS (
      SELECT event_type, day, event_id, cents, n,
             CAST(floor(s1 / n) AS BIGINT) AS ma_cents,
             CAST(floor(2.0 * sqrt((n * s2 - s1 * s1) / (1.0 * n * n)))
               AS BIGINT) AS band_cents
      FROM m WHERE n >= 5)
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(CASE WHEN cents > ma_cents + band_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_up,
           CAST(sum(CASE WHEN cents < ma_cents - band_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_down,
           CAST(max(band_cents) AS BIGINT) AS max_band_cents
    FROM b GROUP BY event_type, day ORDER BY event_type, day
"""


_BOLL_SPARK_SQL = _boll_sql("unix_micros(ts) div 1000000",
                            "date_format(ts, 'yyyy-MM-dd')")
_BOLL_DUCK_SQL = _boll_sql("epoch_us(ts) // 1000000",
                           "strftime(ts, '%Y-%m-%d')")


@register("op_bollinger_bands", oracle=_BOLL_DUCK_SQL, tags=("events",))
def op_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breach monitoring: a 20-observation rolling
    mean ± 2σ envelope per (type, day), reported as per-day breach
    counts above/below the band — the mean-reversion / volatility-
    regime signal next to `op_cusum_alerts` (drift) and
    `op_anomaly_zscore` (global spikes): a band breach is local,
    scale-free, and self-calibrating (the band widens with recent
    volatility).

    Determinism: exact DECIMAL frame moments (the `win_rolling_corr`
    allowlist pattern — 20-row frame bounds the product sum), band =
    floor(2√σ²) in one shared IEEE chain (sqrt bit-identical),
    integer breach compares; frames shorter than 5 are warm-up and
    excluded (both twins).

    Scale: ONE (type, day)-keyed shuffle; all three window aggregates
    share the same partition+order spec, so they ride one WindowExec
    chain with O(frame) state; the day key bounds every partition
    (the cusum partitioning argument) and the rollup is two-phase."""
    return Q(spark, sf_dir, _BOLL_SPARK_SQL)


# --- 79. maximum drawdown via carry-in running max (r11 batch 3) ---------------

#: carry-in bucket width on the arrival axis — the watermark-planner
#: decomposition applied to running MAX: local window per (type,
#: bucket) + a bucket-maxima prefix, so no low-cardinality type key
#: ever owns a single-task full-series window.
_DD_BKT = 1048576

def _dd_sql(idiv: str = "div") -> str:
    return f"""
    WITH c AS (
      SELECT event_type, event_id, event_id {idiv} {_DD_BKT} AS bkt,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    loc AS (
      SELECT event_type, bkt, event_id, cents,
             max(cents) OVER (PARTITION BY event_type, bkt
                              ORDER BY event_id
                              ROWS UNBOUNDED PRECEDING) AS rm_loc
      FROM c),
    ba AS (SELECT event_type, bkt, max(cents) AS bmax
           FROM c GROUP BY event_type, bkt),
    cr AS (
      SELECT event_type, bkt,
             max(bmax) OVER (PARTITION BY event_type ORDER BY bkt
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS carry
      FROM ba),
    d AS (
      -- first bucket has no carry: coalesce to the row's OWN rm_loc
      -- (a true identity for max) rather than 0, which would clamp
      -- the running max at >=0 and price drawdowns against a phantom
      -- 0 peak if cents were ever negative (ADVICE r11)
      SELECT l.event_type,
             greatest(l.rm_loc, coalesce(cr.carry, l.rm_loc))
               - l.cents AS dd
      FROM loc l JOIN cr ON cr.event_type = l.event_type
                        AND cr.bkt = l.bkt)
    SELECT event_type,
           CAST(max(dd) AS BIGINT) AS max_drawdown_cents,
           CAST(sum(CASE WHEN dd > 20000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deep_rows,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM d GROUP BY event_type ORDER BY event_type
"""


@register("op_drawdown", oracle=_dd_sql("//"),
          tags=("events",))
def op_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per event type — the largest peak-to-current
    drop over the ingest-ordered value series (running max − current,
    maxed), plus a deep-drawdown row count — the risk statistic
    behind "how far under its high-water mark has this asset been";
    the cusum family detects the drift, drawdown prices it.

    The scale point this key demonstrates: running max over a
    5-value type key is the textbook single-task window, and the
    carry-in bucket decomposition (local running max per (type,
    1M-row bucket) + a bucket-maxima prefix re-broadcast by join)
    computes the IDENTICAL series fully distributed — the
    `op_watermark_planner` shape applied to max instead of
    event-time disorder. Both twins run the same decomposition, so
    the algebra itself is hash-verified.

    Determinism: exact integer cents, ingest order (event_id) is
    unique and total, greatest/coalesce shared text.

    Scale: one (type, bucket) window with bucket-bounded state, one
    bucket-grain aggregate + tiny prefix window (|types|·|buckets|
    rows), one broadcastable carry join, one two-phase rollup. The
    `c` projection is referenced by loc AND ba — deliberately NOT
    checkpointed: it is a narrow map-only scan, and re-reading
    pruned parquet twice beats materializing a fact-sized
    intermediate (the checkpoint rule applies to re-EXECUTED
    shuffles/windows, not to scans; contrast op_peak_concurrency's
    sessionized table)."""
    return Q(spark, sf_dir, _dd_sql("div"))


# --- 80. consistent-hash ring sharding audit (r11 batch 3) ---------------------

import hashlib as _hl


def _ring_points(n_shards: int, vnodes: int = 16) -> list[int]:
    """The ring as packed literals: md5-position·64 + shard (shard <
    64, position < 2^32 — the pack keeps min() ordering by position).
    Pure constants: engine-independent, computed once at import."""
    pts = []
    for s in range(n_shards):
        for v in range(vnodes):
            pos = int(_hl.md5(f"shard-{s}-vn-{v}".encode())
                      .hexdigest()[:8], 16)
            pts.append(pos * 64 + s)
    return sorted(pts)


_RING_8 = _ring_points(8)
_RING_9 = _ring_points(9)


def _ring_sql(hex_expr: str, arr_open: str, arr_close: str,
              filt: str, amin: str, first_idx: int) -> str:
    # wrap-around fallback must be the ring's FIRST (smallest) point:
    # Spark arrays are 0-indexed, DuckDB lists 1-indexed — r11 review
    # pass 2 caught the shared [1] assigning wrapping entities the
    # SECOND point on Spark (invisible at sf0.01, where no user_id
    # hashes past the last ring point; live at sf0.1+)
    r8 = ", ".join(str(p) for p in _RING_8)
    r9 = ", ".join(str(p) for p in _RING_9)
    return f"""
    WITH u AS (
      SELECT DISTINCT user_id FROM events),
    h AS (
      SELECT user_id, ({hex_expr}) % 4294967296 AS pos FROM u),
    a AS (
      SELECT user_id,
             coalesce({amin}({filt}({arr_open}{r8}{arr_close},
                                     x -> x >= pos * 64)),
                      {arr_open}{r8}{arr_close}[{first_idx}]) % 64
               AS shard8,
             coalesce({amin}({filt}({arr_open}{r9}{arr_close},
                                     x -> x >= pos * 64)),
                      {arr_open}{r9}{arr_close}[{first_idx}]) % 64
               AS shard9
      FROM h)
    SELECT CAST(shard8 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_entities,
           CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_reassigned_on_grow
    FROM a GROUP BY shard8 ORDER BY shard
"""


_RING_SPARK_SQL = _ring_sql(
    "cast(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) "
    "as bigint)", "array(", ")", "filter", "array_min", 0)
_RING_DUCK_SQL = _ring_sql(
    "CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT)", "[", "]", "list_filter", "list_min", 1)


@register("op_consistent_hash_ring", oracle=_RING_DUCK_SQL,
          tags=("scale",))
def op_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring sharding audit: entities assigned to 8
    shards via a 16-vnode md5 ring, with the rebalance cost of
    growing to 9 shards measured per shard — the elastic-sharding
    contract (`op_shard_assignment`'s static mod-N reassigns ~8/9 of
    all entities on grow; a consistent ring reassigns ~1/9, and THIS
    table is the proof, per shard). The ring is how every scalable
    KV/stream partitioner (Dynamo, Kafka, Cassandra) bounds
    rebalance I/O — at 100 TB, resharding cost IS the migration.

    Determinism: ring points are import-time md5 CONSTANTS embedded
    as a sorted literal array (identical on both engines); entity
    position is the md5-hex-prefix idiom; assignment = min ring
    point ≥ position, wrapping to the ring's FIRST point — indexed
    [0] on Spark and [1] on DuckDB (0- vs 1-based arrays, a
    cross-engine divergence the sf0.01 gate cannot see because no
    small user_id hashes past the last ring point; pinned at sf0.1
    by test) — on PACKED pos·64+shard literals, so the min is by
    position with the shard riding along.

    Scale: one distinct to entity grain, then a fully MAP-SIDE
    lambda over a 128/144-element literal array per row (codegen'd
    HOF — no join, no explode, no BNLJ), one two-phase aggregate.
    |shards| output rows."""
    return Q(spark, sf_dir, _RING_SPARK_SQL)


# --- 81. Kaplan–Meier life table (r11 batch 3) ---------------------------------

#: observation horizon (days) and censor margin: lifetimes are
#: measured first→last event in days; users whose last event falls in
#: the final 3 fixture days are right-CENSORED (still alive at cut).
#: Horizon 31 covers the fixture's 30-day window — lifetimes cluster
#: at 26–30 days, so at-risk decay is live in the tail rows. Margin 1
#: (not 3): the synthetic users are active to the very end, so a
#: 3-day margin censors EVERYONE and the churned arm goes dead; at 1
#: day, 1/15 users churn at sf0.001 and 17/150 at sf0.01 — both arms
#: live at every SF (the fixture-fit rule, measured not assumed).
_KM_HORIZON = 31
_KM_CENSOR_DAYS = 1


def _km_sql(es_expr: str, explode_expr: str) -> str:
    return f"""
    WITH span AS (
      SELECT CAST(max({es_expr}) AS BIGINT) AS tmax FROM events),
    u AS (
      SELECT user_id,
             CAST(floor((max({es_expr}) - min({es_expr})) / 86400.0)
               AS BIGINT) AS life_days,
             CAST(max({es_expr}) AS BIGINT) AS last_es
      FROM events GROUP BY user_id),
    lab AS (
      SELECT user_id, life_days,
             last_es > (SELECT tmax FROM span)
                       - {_KM_CENSOR_DAYS * 86400} AS censored
      FROM u),
    x AS (
      SELECT life_days, censored, {explode_expr} AS t FROM lab),
    lt AS (
      SELECT CAST(t AS BIGINT) AS t,
             CAST(sum(CASE WHEN life_days >= t THEN 1 ELSE 0 END)
               AS BIGINT) AS at_risk,
             CAST(sum(CASE WHEN life_days = t AND NOT censored
                           THEN 1 ELSE 0 END) AS BIGINT) AS churned,
             CAST(sum(CASE WHEN life_days = t AND censored
                           THEN 1 ELSE 0 END) AS BIGINT) AS censored_t
      FROM x GROUP BY t)
    SELECT t, at_risk, churned, censored_t,
           CAST(CASE WHEN at_risk > 0
                     THEN floor(1000000.0 * churned / at_risk)
                     ELSE 0 END AS BIGINT) AS hazard_ppm
    FROM lt ORDER BY t
"""


_KM_SPARK_SQL = _km_sql(
    "unix_micros(ts) div 1000000",
    "explode(sequence(0, " + str(_KM_HORIZON) + "))")
_KM_DUCK_SQL = _km_sql(
    "epoch_us(ts) // 1000000",
    "unnest(generate_series(0, " + str(_KM_HORIZON) + "))")


@register("op_km_lifetable", oracle=_KM_DUCK_SQL, tags=("events",))
def op_km_lifetable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier life table with right censoring: per lifetime day
    t, the users still at risk, the churn events at exactly t, the
    censored exits at t (last activity inside the final 1-day margin
    — "still alive at data cut", the distinction naive churn rates
    get wrong), and the discrete hazard ppm. This is the integer
    SKELETON of the KM estimator — the survival product Π(1−h_t) is a
    float chain a dashboard can fold locally; the engine ships the
    exact (at_risk, events) pairs it is built from, which is also
    what any two engines can agree on bit-for-bit
    (`op_churn_labels` gives the binary label; this gives the curve).

    Determinism: integer epoch-second lifetimes via explicit floor()
    (the bare-CAST trap: Spark truncates a double cast, DuckDB
    rounds), the
    censor boundary from an exact max-scan scalar, exact counts, one
    guarded floor-ppm.

    Scale: one user-grain two-phase aggregate (the fact collapses
    first), a 32-value literal sequence exploding PER USER ROW
    map-side (Generate, no join — the cross-join spelling planned the
    banned BroadcastNestedLoopJoin and was rewritten before commit),
    one (t)-grain rollup. The horizon is a constant; the corpus is
    scanned once."""
    return Q(spark, sf_dir, _KM_SPARK_SQL)


# --- 82. Merkle root over the order ledger (r11 batch 4) -----------------------

#: 16-ary tree, 8 fixed levels → 16^8 ≈ 4.3 G leaf-index space; each
#: level is ONE two-phase aggregate whose groups hold ≤16 children.
_MERKLE_ARITY = 16
_MERKLE_LEVELS = 8


def _merkle_sql(idiv: str, agg: str) -> str:
    lvls = []
    for k in range(1, _MERKLE_LEVELS + 1):
        lvls.append(f"""
    l{k} AS (
      SELECT i {idiv} {_MERKLE_ARITY} AS i,
             md5({agg}) AS h
      FROM l{k - 1} GROUP BY i {idiv} {_MERKLE_ARITY})""")
    return f"""
    WITH l0 AS (
      SELECT o_orderkey AS i,
             md5(concat(CAST(o_orderkey AS {{STR}}), '|',
                        CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                             AS {{STR}}))) AS h
      FROM orders),{",".join(lvls)}
    SELECT h AS merkle_root,
           (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_leaves
    FROM l{_MERKLE_LEVELS}
"""


_MERKLE_SPARK_SQL = (_merkle_sql(
    "div", "listagg(h, '') WITHIN GROUP (ORDER BY i)")
    .replace("{STR}", "STRING"))
_MERKLE_DUCK_SQL = (_merkle_sql("//", "string_agg(h, '' ORDER BY i)")
                    .replace("{STR}", "VARCHAR"))


@register("op_merkle_root", oracle=_MERKLE_DUCK_SQL, tags=("scale",))
def op_merkle_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle root of the order ledger: leaf = md5(key|cents), 8
    fixed levels of a 16-ary hash tree (children concatenated in
    index order, sparse gaps simply absent from the concat —
    position-committed by the index-ordered aggregation) — the
    STRUCTURED integrity commitment next to `op_table_checksum`'s
    commutative sum: the sum says "same multiset", the tree root
    additionally supports log-depth membership proofs and lets two
    replicas BISECT to the differing subtree in 8 round trips instead
    of re-shipping a table — how chains, git, and certificate logs
    compare state at 100 TB.

    Determinism: md5 of canonical strings (engine-identical), ordered
    listagg/string_agg concat (total order on the child index), fixed
    arity/levels — the root is a single reproducible hex string.

    Scale: each level is ONE two-phase hash aggregate with ≤16-row
    groups, shrinking the table 16× — 8 shuffles of geometrically
    vanishing size (Σ ≈ 1.07× the leaf pass, the classic log-depth
    reduction); n_leaves counts the BASE table, not l0 — a scalar
    subquery on l0 would re-run the whole md5 leaf pass (Spark
    inlines per reference; r11 review pass 2); no windows, no
    driver-side tree walk; level count is
    a compile-time constant supporting 4.3 G leaf indexes (raise
    `_MERKLE_LEVELS` for more — cost is one more tiny aggregate)."""
    return Q(spark, sf_dir, _MERKLE_SPARK_SQL)


# --- 83. peak concurrency via interval deltas (r11 batch 4) --------------------

#: session gap (s) — matches win_sessionize's 30-minute idle rule.
_CONC_GAP_S = 1800


def _conc_iv_sql(es_expr: str) -> str:
    """Sessionize to (user, session) → [start, end] epoch intervals."""
    return f"""
    WITH e AS (
      SELECT user_id, {es_expr} AS es, event_id FROM events),
    s AS (
      SELECT user_id, es, event_id,
             CASE WHEN es - lag(es) OVER (PARTITION BY user_id
                                          ORDER BY es, event_id)
                       > {_CONC_GAP_S}
                  THEN 1 ELSE 0 END AS is_new
      FROM e),
    sid AS (
      SELECT user_id, es,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY es, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM s)
    SELECT user_id, sess, min(es) AS s_es, max(es) AS e_es
    FROM sid GROUP BY user_id, sess
"""


def _conc_tail_sql(iv: str, idiv: str, explode_expr: str) -> str:
    """Deltas → per-second NET → bucket-local running sum + day spine
    + carry — the r11 review-pass-2 algebra: (1) deltas NET per
    second BEFORE the running sum, so a start and an end at the same
    instant cannot manufacture a transient +1 peak; (2) the peak
    includes the CARRY level itself (sessions spanning midnight keep
    a day at `carry` even before/without any delta that day); (3) a
    literal day SPINE emits every day between the first and last
    delta, so a day fully inside long sessions still reports its
    (carry-level) peak."""
    return f"""
    WITH d AS (
      SELECT s_es AS es, CAST(1 AS BIGINT) AS delta FROM {iv}
      UNION ALL
      SELECT e_es + 1 AS es, CAST(-1 AS BIGINT) AS delta FROM {iv}),
    nd AS (
      SELECT es, CAST(sum(delta) AS BIGINT) AS delta
      FROM d GROUP BY es),
    loc AS (
      SELECT es, delta, es {idiv} 86400 AS bkt,
             sum(delta) OVER (PARTITION BY es {idiv} 86400
                              ORDER BY es
                              ROWS UNBOUNDED PRECEDING) AS run_loc
      FROM nd),
    ba AS (SELECT es {idiv} 86400 AS bkt,
                  CAST(sum(delta) AS BIGINT) AS bsum
           FROM nd GROUP BY es {idiv} 86400),
    sp AS (SELECT {explode_expr} AS bkt),
    ba2 AS (
      SELECT sp.bkt, coalesce(ba.bsum, CAST(0 AS BIGINT)) AS bsum
      FROM sp LEFT JOIN ba ON ba.bkt = sp.bkt),
    cr AS (
      SELECT bkt, coalesce(sum(bsum) OVER (ORDER BY bkt
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING),
                           CAST(0 AS BIGINT)) AS carry
      FROM ba2),
    mx AS (SELECT bkt, CAST(max(run_loc) AS BIGINT) AS max_run
           FROM loc GROUP BY bkt),
    st AS (SELECT s_es {idiv} 86400 AS bkt,
                  CAST(count(*) AS BIGINT) AS n
           FROM {iv} GROUP BY s_es {idiv} 86400)
    SELECT CAST(cr.bkt AS BIGINT) AS day_bucket,
           CAST(greatest(cr.carry,
                         cr.carry + coalesce(mx.max_run,
                                             CAST(0 AS BIGINT)))
             AS BIGINT) AS peak_concurrent,
           coalesce(st.n, CAST(0 AS BIGINT)) AS n_sessions_started
    FROM cr LEFT JOIN mx ON mx.bkt = cr.bkt
            LEFT JOIN st ON st.bkt = cr.bkt
    ORDER BY day_bucket
"""


def _conc_duck() -> str:
    """One oracle statement: the whole sessionize subquery becomes a
    MATERIALIZED CTE (DuckDB re-inlines multiply-referenced CTEs
    otherwise — the kcore lesson; the tail references it 3×), spliced
    ahead of the tail's own CTE chain."""
    iv_inner = _conc_iv_sql("epoch_us(ts) // 1000000").strip()
    iv_cte = "WITH iv AS MATERIALIZED (" + iv_inner + "\n    ), "
    tail = _conc_tail_sql(
        "iv", "//",
        "unnest(generate_series((SELECT min(es // 86400) FROM d), "
        "(SELECT max(es // 86400) FROM d)))")
    return iv_cte + tail.strip()[len("WITH "):]


_CONC_DUCK_SQL = _conc_duck()


@register("op_peak_concurrency", oracle=_CONC_DUCK_SQL,
          tags=("events",))
def op_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — sessionize (30-min idle
    gap, the `win_sessionize` rule), convert each session to
    (+1 at start, −1 after end) deltas, NET them per second, and take
    the daily max of the GLOBAL running level over a full day spine —
    the capacity-planning number ("how many simultaneous users must
    this system hold") that per-day session COUNTS overstate by
    10-100× (sessions spread over a day never all overlap).

    Exactness (r11 review pass 2 hardened all three edges): same-
    second start/end pairs net BEFORE the running sum (no transient
    +1 peak); the carry level itself competes in the max (a midnight-
    spanning session keeps its day at `carry` even before the first
    delta); the day spine emits delta-less days at their carry level.

    The running sum over the netted delta stream is the third
    instance of the carry-in bucket decomposition (watermark planner:
    running max of time; drawdown: running max of value; here:
    running SUM whose bucket aggregate is the bucket's NET delta) — a
    sequential-looking scan over a global order, fully distributed.

    Determinism: integer epoch seconds; half-open [start, end+1)
    intervals; exact counts.

    Scale: sessionize is one (user)-keyed window chain over the fact,
    materialized ONCE (scoped checkpoint — the tail references the
    session table four times, and Spark re-executes a multiply-
    referenced subtree per reference, the op_mutual_top_partners
    lesson); everything after is SESSION grain (≪ fact grain): a
    per-second net aggregate, a (day-bucket)-local running sum, a
    |days|-row spine/prefix/rollup."""
    from ..caching import scoped_checkpoint

    iv = scoped_checkpoint(Q(spark, sf_dir,
                             _conc_iv_sql("unix_micros(ts) div 1000000")))
    iv.createOrReplaceTempView("_conc_iv")
    return spark.sql(_conc_tail_sql(
        "_conc_iv", "div",
        "explode(sequence((SELECT min(es div 86400) FROM d), "
        "(SELECT max(es div 86400) FROM d)))"))


# --- 84. time-decay attribution with exact dyadic weights (r11 batch 4) --------

#: lookback horizon (calendar days): touches older attribute nothing.
_TDECAY_HORIZON_D = 7


def _tdecay_sql(day_expr: str, shl: str) -> str:
    return f"""
    WITH e AS (
      SELECT user_id, event_type, {day_expr} AS day FROM events),
    conv AS (
      SELECT user_id, day AS cday, CAST(count(*) AS BIGINT) AS n_convs
      FROM e WHERE event_type = 'purchase' GROUP BY user_id, day),
    tch AS (
      SELECT user_id, day AS tday, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM e WHERE event_type <> 'purchase'
      GROUP BY user_id, day, event_type),
    pair AS (
      SELECT c.user_id, c.cday, c.n_convs, t.event_type,
             CAST(t.n * {shl} AS BIGINT) AS w
      FROM conv c JOIN tch t ON t.user_id = c.user_id
      WHERE t.tday <= c.cday
        AND t.tday > c.cday - {_TDECAY_HORIZON_D + 1}),
    tot AS (
      SELECT user_id, cday, CAST(sum(w) AS BIGINT) AS wtot
      FROM pair GROUP BY user_id, cday),
    sh AS (
      SELECT p.event_type,
             sum(CAST(floor(1000000000.0 * p.n_convs * p.w / t.wtot)
                      AS DECIMAL(38, 0))) AS credit_nano
      FROM pair p JOIN tot t ON t.user_id = p.user_id
                            AND t.cday = p.cday
      GROUP BY p.event_type)
    SELECT event_type,
           CAST(floor(CAST(credit_nano AS DOUBLE) / 1000000.0)
             AS BIGINT) AS attributed_conversions_milli
    FROM sh ORDER BY event_type
"""


def _tdecay(spark_side: bool) -> str:
    if spark_side:
        return _tdecay_sql(
            "(unix_micros(ts) div 1000000) div 86400",
            f"shiftleft(CAST(1 AS BIGINT), "
            f"{_TDECAY_HORIZON_D} - (c.cday - t.tday))")
    return _tdecay_sql(
        "(epoch_us(ts) // 1000000) // 86400",
        f"(CAST(1 AS BIGINT) << ({_TDECAY_HORIZON_D} - (c.cday - t.tday)))")


@register("op_attribution_time_decay", oracle=_tdecay(False),
          tags=("events",))
def op_attribution_time_decay(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Time-decay attribution: each purchase's credit is split over
    the user's preceding 7 CALENDAR DAYS of touches with weight
    2^(7−age_days) — halving per day of staleness — completing the
    attribution triptych (`op_attribution_last_touch`: all to the
    newest; `op_attribution_linear`: equal; here: exponential
    recency).

    Determinism: the decay weights are exact INTEGERS (a left shift —
    no pow(), whose cross-engine bit-identity this repo never
    assumes); each touch-day's share n·w/Σw is floored to integer
    NANO-credits PER CELL (one shared-text divide+floor — never an
    order-dependent sum of raw doubles), summed exactly in DECIMAL.
    Credit conservation (Σ shares = n_convs per (user, day), minus
    deterministic sub-nano floor dust) is property-pinned.

    Scale (r11, rewritten after measurement): the first draft joined
    raw conversions to raw touches — per-user pairs grow with
    per-user density SQUARED, measured superlinear in BOTH engines at
    sf3 (Spark 4.0 → 23.6 s, DuckDB 1.2 → 7.4 s for 3× data). Because
    the weight depends only on the CALENDAR-day age, touches
    pre-aggregate exactly to (user, day, type, count) and conversions
    to (user, day, n_convs) BEFORE the join — the candidate join is
    now (user-day × ≤8 days × |types|), LINEAR in user-days at any
    per-user density, and user-keyed (high-cardinality uniform — the
    good shuffle). Same output columns; the rolling-age variant is
    recoverable by keying days off each conversion's timestamp, at
    the measured quadratic price."""
    return Q(spark, sf_dir, _tdecay(True))


# --- 85. heavy changers between corpus halves (r11 batch 4) --------------------

def _changers_sql(idiv: str) -> str:
    return f"""
    WITH m AS (SELECT (max(event_id) + 1) {idiv} 2 AS mid FROM events),
    c AS (
      SELECT event_type, user_id,
             CAST(sum(CASE WHEN event_id < (SELECT mid FROM m)
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN event_id >= (SELECT mid FROM m)
                           THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM events GROUP BY event_type, user_id)
    SELECT event_type, user_id, c1, c2,
           CAST(c2 - c1 AS BIGINT) AS delta
    FROM c
    ORDER BY abs(c2 - c1) DESC, event_type, user_id
    LIMIT 20
"""


@register("op_heavy_changers", oracle=_changers_sql("//"),
          tags=("events",))
def op_heavy_changers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy changers: the (type, user) keys whose activity count
    moved most between the corpus's first and second half (split at
    the event-id midpoint) — the per-KEY delta top-k that
    distribution-level drift (`op_feature_drift`) cannot name: drift
    says "something shifted", this says WHO.

    Determinism: integer midpoint ((max+1) integer-div 2), exact
    half-counts in one conditional-aggregate pass, total order
    (|delta| DESC, keys ASC) on the top-20.

    Scale: ONE fact pass (both halves counted in the same two-phase
    aggregate — not two scans), key-grain output into
    TakeOrderedAndProject; the midpoint is a scalar subquery
    broadcast."""
    return Q(spark, sf_dir, _changers_sql("div"))


# --- 86. session journey paths (r11 batch 5) -----------------------------------

def _paths_sql(es_expr: str, agg_expr: str) -> str:
    return f"""
    WITH e AS (
      SELECT user_id, {es_expr} AS es, event_id, event_type
      FROM events),
    s AS (
      SELECT user_id, es, event_id, event_type,
             CASE WHEN es - lag(es) OVER (PARTITION BY user_id
                                          ORDER BY es, event_id)
                       > {_CONC_GAP_S}
                  THEN 1 ELSE 0 END AS is_new
      FROM e),
    sid AS (
      SELECT user_id, es, event_id, event_type,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY es, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM s),
    st AS (
      SELECT user_id, es, event_id, event_type, sess,
             row_number() OVER (PARTITION BY user_id, sess
                                ORDER BY es, event_id) AS step
      FROM sid),
    p AS (
      SELECT user_id, sess, {agg_expr} AS path
      FROM st WHERE step <= 3 GROUP BY user_id, sess)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 25
"""


_PATHS_SPARK_SQL = _paths_sql(
    "unix_micros(ts) div 1000000",
    "listagg(event_type, '>') WITHIN GROUP (ORDER BY es, event_id)")
_PATHS_DUCK_SQL = _paths_sql(
    "epoch_us(ts) // 1000000",
    "string_agg(event_type, '>' ORDER BY es, event_id)")


@register("op_session_paths", oracle=_PATHS_DUCK_SQL, tags=("events",))
def op_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session journey paths: each session's first three event
    types concatenated in order ("view>click>purchase"), counted
    across all sessions, top-25 — the UX/conversion funnel-discovery
    primitive (`op_funnel` checks ONE hypothesized ordering;
    `op_path_trigrams` counts global type-trigrams ignoring session
    boundaries; this surfaces which session OPENINGS actually occur,
    ranked).

    Determinism: the session id and step number ride the same
    (es, event_id) total order; the path string is an ordered
    listagg/string_agg over ≤3 pre-filtered steps.

    Scale: the sessionize windows are one (user)-keyed WindowExec
    chain (sess and step share the (user) exchange); `step <= 3`
    prunes to ≤3 rows per session BEFORE the
    string aggregate, so path strings are bounded by construction;
    the path rollup is two-phase into TakeOrderedAndProject."""
    return Q(spark, sf_dir, _PATHS_SPARK_SQL)


# --- 87. backfill plan from day-count shortfall (r11 batch 5) -------------------

def _backfill_sql(day_expr: str) -> str:
    """Median handled in DOUBLED units: median over BIGINTs is either
    an integer or x.5, so 2·median is an EXACT integer-valued double
    and its BIGINT cast is identical on both engines — the bare
    CAST(median(..)) would hit the truncate-vs-round trap on every
    odd-sum middle pair (r11 review pass 3: sf0.1's median is
    3336.5). The median itself rides a metadata-sized OVER ()
    window over the day-grain aggregate so the fact is scanned ONCE
    (a scalar-subquery med re-runs the day aggregate per reference —
    the merkle n_leaves lesson)."""
    return f"""
    WITH d AS (
      SELECT {day_expr} AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY {day_expr}),
    w AS (
      SELECT day, n,
             CAST(2 * median(n) OVER () AS BIGINT) AS med2
      FROM d)
    SELECT day, n,
           CAST(floor(med2 / 2.0) AS BIGINT) AS median_day_rows,
           CAST(floor(2000000.0 * n / med2) AS BIGINT) AS fill_ppm,
           40 * n < 19 * med2 AS needs_backfill
    FROM w ORDER BY day
"""


@register("op_backfill_plan",
          oracle=_backfill_sql("strftime(ts, '%Y-%m-%d')"),
          tags=("events",))
def op_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planning: per ingest day, the row count against the
    median day, flagging days under 95 % fill as backfill candidates
    (calibrated: 11/30 days trip at sf0.001 and 3/30 at sf0.01 under
    the fixture's organic day-to-day variance — both arms live; a
    real outage day lands far below either threshold)
    — the first question after any outage or consumer bug ("which
    partitions are short?") answered as a work list
    (`op_stale_data_audit` finds silent STALENESS; this finds silent
    GAPS; `op_sequence_gaps` finds per-entity id holes).

    Determinism: exact day counts; the median enters ONLY as
    2·median — an exact integer-valued double whose BIGINT cast is
    engine-identical (a bare CAST(median) truncates on Spark and
    rounds-half-even on DuckDB whenever the middle pair sums odd —
    the km_lifetable cast trap, caught here by review pass 3);
    reported median floors the half deterministically; the flag is
    the integer cross-multiply 40n < 19·med2.

    Scale: one two-phase day-grain aggregate; the median is an
    unpartitioned unordered window over |days| metadata rows riding
    the aggregate's output — ONE fact scan (the scalar-subquery
    spelling re-runs the day aggregate per reference)."""
    return Q(spark, sf_dir,
             _backfill_sql("date_format(ts, 'yyyy-MM-dd')"))


# --- 88. structuring candidates (r11 batch 5) -----------------------------------

def _struct_sql(hex_expr: str, idiv: str, explode3: str) -> str:
    """A deterministic ~4 % of orders are split THREE WAYS (same
    customer, same day, equal thirds — the planted smurfing pattern;
    the TPC-H-ish fixture's organic orders never repeat a (customer,
    amount, day), so without planting both arms would be dead — the
    alo/reorg planting discipline)."""
    return f"""
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey AS c, o_orderdate AS d,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             {hex_expr} % 25 AS slot,
             (SELECT max(o_orderkey) + 1 FROM orders) AS mk
      FROM orders),
    landing AS (
      SELECT k, c, d, cents FROM o WHERE slot <> 0
      UNION ALL
      SELECT k + i * mk AS k, c, d,
             cents {idiv} 3 AS cents
      FROM (SELECT *, {explode3} AS i FROM o WHERE slot = 0) sp),
    g AS (
      SELECT c, cents, d, CAST(count(*) AS BIGINT) AS n_same,
             CAST(min(k) AS BIGINT) AS first_key
      FROM landing GROUP BY c, cents, d HAVING count(*) >= 2)
    SELECT c AS custkey, CAST(cents AS BIGINT) AS cents,
           d AS order_day, n_same, first_key
    FROM g ORDER BY n_same DESC, custkey, cents, order_day LIMIT 100
"""


_STRUCT_SPARK_SQL = _struct_sql(
    "cast(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10) "
    "as bigint)", "div", "explode(array(1, 2, 3))")
_STRUCT_DUCK_SQL = _struct_sql(
    "CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) "
    "AS BIGINT)", "//", "unnest([1, 2, 3])")


@register("op_structuring_candidates", oracle=_STRUCT_DUCK_SQL)
def op_structuring_candidates(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Structuring (smurfing) candidates: customers placing MULTIPLE
    identical-amount orders on the same day — the split-one-payment-
    into-many pattern AML monitoring flags first (same-amount
    repetition is how reporting thresholds are dodged;
    `op_round_number_bias` finds suspicious AMOUNTS, this finds
    suspicious REPETITION), top-100 by repetition count over a
    landing where a deterministic ~4 % of orders arrive as equal
    thirds (md5 slot plant — the fixture's organic orders never
    repeat a (customer, amount, day), so the plant keeps both the
    detector's hit arm and the ≥2 threshold live at every SF).

    Determinism: md5-hex plant idiom, integer-third cents (div twin),
    exact counts, total order on the top-100.

    Scale: ONE two-phase aggregate on the composite (customer, cents,
    day) key — no self-join (the naive spelling joins orders to
    itself on the composite key, Σ per-key n² rows; HAVING on the
    groupBy is the same information at group grain), into
    TakeOrderedAndProject. The plant explodes a literal 3-array over
    only the 4 % slice, map-side (a VALUES cross join would plan the
    banned BroadcastNestedLoopJoin)."""
    return Q(spark, sf_dir, _STRUCT_SPARK_SQL)


# --- 89. rare-category collapse plan (r11 batch 5) ------------------------------

_RARECAT_SQL = """
    WITH c AS (
      -- coalesce: a NULL categorical is its own explicit level (the
      -- standard missing-indicator move), pinned because the bare
      -- concat diverges — Spark nulls the whole key, DuckDB SKIPS the
      -- null piece and silently fuses missing into '@<bucket>'
      -- (r12 null-seed fuzz)
      SELECT concat(coalesce(event_type, '__NULL__'), '@',
                    CAST(user_id % 50 AS {STR})) AS category,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      GROUP BY concat(coalesce(event_type, '__NULL__'), '@',
                      CAST(user_id % 50 AS {STR}))),
    m AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS nc FROM c),
    lab AS (
      SELECT CASE WHEN n * (SELECT nc FROM m) >= (SELECT tot FROM m)
                  THEN category
                  ELSE '__OTHER__' END AS mapped, n
      FROM c)
    SELECT mapped, CAST(count(*) AS BIGINT) AS n_source_categories,
           CAST(sum(n) AS BIGINT) AS n_rows
    FROM lab GROUP BY mapped
    ORDER BY n_rows DESC, mapped LIMIT 50
"""


@register("op_rare_category_collapse",
          oracle=_RARECAT_SQL.replace("{STR}", "VARCHAR"),
          tags=("events",))
def op_rare_category_collapse(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Rare-category collapse plan: high-cardinality categoricals
    (here the synthetic type@user-bucket cross) mapped to themselves
    when at-or-above the MEAN category count and to __OTHER__
    otherwise (a relative threshold — an absolute row floor goes
    all-OTHER at small SFs and all-keep at large ones; above-mean
    keeps both arms live at every SF: 38/75 survive at sf0.001,
    130/250 at sf0.01),
    reporting surviving categories with their source-category and row
    coverage — the standard feature-engineering step before one-hot /
    target encoding (`op_target_encoding` assumes this ran: unseen
    and rare levels otherwise leak noise), and the vocabulary-size
    contract a feature store enforces.

    Determinism: exact counts, the integer cross-multiply
    n·|categories| ≥ total (no division), total output order.

    Scale: one two-phase aggregate to category grain (the fact never
    reshuffles), a category-grain CASE + second tiny aggregate. The
    plan a naive implementation ships — count, join the counts back
    to the FACT, re-aggregate — pays a fact-sized join for nothing:
    the collapse is decidable at category grain, and downstream
    appliers need only the (category → mapped) dimension this emits."""
    return Q(spark, sf_dir, _RARECAT_SQL.replace("{STR}", "STRING"))
