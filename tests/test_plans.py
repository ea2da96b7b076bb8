"""Physical-plan regression tests: the optimizations SURVEY.md §4 relies
on must actually appear in the plans — a correct-but-degenerate plan (no
pushdown, no broadcast, no partial agg) would still pass the value
oracle while being 100× off at scale.
"""

from __future__ import annotations

import pytest

from blockchain_data_ingestion_spark.queries import load_all


def _plan(spark, sf_dir, key: str, mode: str = "formatted") -> str:
    df = load_all()[key].spark(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "filter_pred")
    assert "PushedFilters: [" in p
    # the range predicate must reach the parquet reader, not sit in a
    # post-scan Filter only
    assert "GreaterThanOrEqual(o_totalprice" in p


def test_column_pruning_reaches_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "proj_expr")
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    # projection uses a handful of columns; the scan must not read all of
    # orders' 9 columns
    assert read.count(",") <= 5, read


def test_small_dim_join_broadcasts(spark, sf_dir):
    p = _plan(spark, sf_dir, "join_broadcast")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_aggregate_is_two_phase(spark, sf_dir):
    """Partial (map-side) + final HashAggregate — the shuffle must move
    pre-aggregated groups, not raw rows."""
    p = _plan(spark, sf_dir, "agg_count_group")
    assert p.count("HashAggregate") >= 2


def test_global_topk_avoids_full_sort(spark, sf_dir):
    """LIMIT+ORDER BY must plan as TakeOrderedAndProject (partial top-k
    per partition), never a total sort followed by limit."""
    p = _plan(spark, sf_dir, "sort_limit")
    assert "TakeOrderedAndProject" in p


def test_similarity_broadcasts_queries(spark, sf_dir):
    """The ANN query set must broadcast; a shuffled corpus would be the
    100 TB anti-plan."""
    p = _plan(spark, sf_dir, "op_similarity")
    assert "Broadcast" in p


def test_asof_is_single_shuffle(spark, sf_dir):
    """The union+window asof must not contain any join operator — its
    entire point is replacing the join explosion with one exchange."""
    p = _plan(spark, sf_dir, "join_asof")
    assert "Join" not in p
    assert "Window" in p


def test_asof_bucketed_window_includes_time_bucket(spark, sf_dir):
    """join_asof_bucketed's hot-key contract: the ROW-LEVEL carry
    window must partition by (entity, time-bucket) — never the entity
    alone — so one hot key's history splits across its buckets. The
    only key-alone window allowed is the carry-in scan, whose input is
    the bucket-level HashAggregate (one row per (key, bucket))."""
    import re
    p = _plan(spark, sf_dir, "join_asof_bucketed", "simple")
    specs = re.findall(r"windowspecdefinition\(([^)]*?specifiedwindowframe)",
                       p)
    assert len(specs) == 2, specs
    # row-level carry: bkt is a PARTITION column (no ASC/DESC suffix),
    # ordering starts at t — one hot key splits across buckets.
    row_level = [s for s in specs
                 if re.match(r"k#\d+L?, bkt#\d+L?, t#\d+ ASC", s)]
    assert len(row_level) == 1, specs
    # carry-in: partition by k alone, ORDER BY bkt (ASC suffix) — legal
    # only because its input is the bucket-level aggregate; pin that the
    # aggregate (SortAggregate: max over struct isn't hash-aggregable)
    # sits below it in the plan text.
    carry = [s for s in specs
             if re.match(r"k#\d+L?, bkt#\d+L? ASC", s)]
    assert len(carry) == 1, specs
    win_pos = p.find(carry[0])
    agg_pos = p.find("SortAggregate", win_pos)
    assert agg_pos != -1, p


#: representative keys spanning every query module whose hot path must
#: fuse into WholeStageCodegen (SCALE.md's "JVM codegen covers the
#: plan" claim, asserted registry-wide rather than on 2 keys —
#: VERDICT r6 #4). Deliberately NOT in this list: ops whose row path
#: is higher-order-function lambdas (Catalyst excludes lambda exprs
#: from codegen — op_embedding_quantize, arr_higher_order, the
#: HOF-dot vector ops) and Arrow-batched Python ops; those are
#: covered by the registry-wide BatchEvalPython ban instead.
_CODEGEN_KEYS = [
    # relational
    "join_inner_equi", "join_broadcast", "topk", "set_union_all",
    "subq_correlated", "sample_hash",
    # aggregates
    "agg_sum_min_max_avg", "agg_count_group", "agg_histogram",
    "agg_latest_per_group", "op_retention_cohort",
    # windows
    "win_row_number", "win_moving_avg", "join_asof", "win_sessionize",
    # scalar / nested
    "str_concat_format", "math_arith", "cond_funcs", "hash_funcs",
    "date_trunc_extract", "arr_explode",
    # tpch
    "tpch_q1", "tpch_q6", "tpch_q9",
    # analytics
    "op_benford", "op_vwap", "op_auc_roc", "op_graph_degree",
    # llm text / pipeline
    "op_token_count", "dedup_exact", "op_doc_chunk", "op_lang_id",
    # ingest
    "proj_computed_col", "cast_numeric",
]


@pytest.mark.parametrize("key", _CODEGEN_KEYS)
def test_whole_stage_codegen_covers_plan(spark, sf_dir, key):
    """The hot path must compile to whole-stage codegen. AQE only
    finalizes (and fuses) the plan on execution, so run the query first
    and assert on the executed plan."""
    df = load_all()[key].spark(spark, sf_dir)
    df.collect()  # a write goes through a separate QueryExecution; collect
    # finalizes THIS one's AdaptiveSparkPlan in place
    p = df._jdf.queryExecution().executedPlan().toString()
    # exchange-free (map-only) plans never get an AdaptiveSparkPlan
    # wrapper — only assert finality where AQE applied
    if "AdaptiveSparkPlan" in p:
        assert "isFinalPlan=true" in p
    # '*(n)' prefixes mark operators fused into WholeStageCodegen stage n
    assert "*(" in p
    # and the SCAN itself must sit inside a fused stage (a plan whose
    # only codegen span is a leaf projection would vacuously pass):
    # every ColumnarToRow bridging a parquet scan carries a '*(n)'.
    for line in p.splitlines():
        if "ColumnarToRow" in line:
            assert "*(" in line, (key, line)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """The whole point of join_bucketed: bucket metadata satisfies the
    join distribution, so no Exchange feeds the SortMergeJoin."""
    df = load_all()["join_bucketed"].spark(spark, sf_dir)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"))
    assert "SortMergeJoin" in p
    assert "Bucketed: true" in p
    # the ONLY exchange is the post-join aggregation's; neither join input
    # may shuffle (bucket layout already satisfies the distribution)
    assert p.count("Exchange") == 1, p


def test_salted_join_is_merge_not_broadcast(spark, sf_dir):
    """Salting only matters under a shuffled join — the merge hint must
    survive planning (broadcast would hide the technique)."""
    p = _plan(spark, sf_dir, "join_skew_salted")
    assert "SortMergeJoin" in p


def test_topk_limits_groups_before_shuffle(spark, sf_dir):
    """Rank-filtered window top-k must compile to WindowGroupLimit with a
    map-side Partial phase (only k rows per group per partition cross the
    one exchange) and a Final phase above it — never a full-group sort
    feeding the shuffle."""
    p = _plan(spark, sf_dir, "topk")
    assert "WindowGroupLimit" in p
    assert "Partial" in p and "Final" in p
    # formatted mode prints each node twice (tree + detail); count on the
    # simple rendering
    assert _plan(spark, sf_dir, "topk", "simple").count("Exchange") == 1


def test_tpch_q6_predicates_push_to_scan(spark, sf_dir):
    """Every Q6 predicate (shipdate range, discount band, quantity cap)
    must reach the parquet reader as a pushed filter, and the scan must
    read only the four referenced columns."""
    p = _plan(spark, sf_dir, "tpch_q6")
    assert "PushedFilters: [" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_quantity" in p
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert read.count(",") <= 4, read


def test_tpch_q5_snowflake_broadcasts_dims(spark, sf_dir):
    """The 6-way snowflake must broadcast its dimension sides (region,
    nation at minimum) and aggregate in two phases; a plan that shuffles
    a dim table at this size is a planner regression."""
    p = _plan(spark, sf_dir, "tpch_q5", "simple")
    assert "BroadcastHashJoin" in p
    assert p.count("HashAggregate") >= 2


def _lineitem_under_broadcast(plan: str) -> bool:
    """True if any BroadcastExchange's subtree scans the raw lineitem
    fact (an aggregated intermediate over lineitem is fine — the hash
    table then holds groups, not rows)."""
    return _fact_under_broadcast(plan, "lineitem")


@pytest.mark.parametrize("key", ["tpch_q3", "tpch_q5", "tpch_q7",
                                 "tpch_q8", "tpch_q10", "tpch_q11",
                                 "tpch_q15", "tpch_q16",
                                 "tpch_q17", "tpch_q18", "tpch_q19"])
def test_tpch_fact_is_never_the_build_side(spark, sf_dir, key):
    """The fact table must stream as the probe side; Catalyst's
    stats-free size estimate put lineitem's pruned scan under the 10 MB
    broadcast threshold and built a hash table over the whole fact
    (3x slower locally, unbounded at scale). The CTE-broadcast rewrite
    pins the correct shape — this guards it."""
    p = _plan(spark, sf_dir, key, "simple")
    assert not _lineitem_under_broadcast(p), key
    # and lineitem must not be shuffled for a sort-merge join either
    assert "SortMergeJoin" not in p, key


@pytest.mark.parametrize("key", ["tpch_q2", "tpch_q9", "tpch_q12",
                                 "tpch_q20", "tpch_q21"])
def test_tpch_fact_fact_joins_shuffle_never_broadcast(spark, sf_dir, key):
    """The queries whose correct 100 TB plan legitimately shuffles
    fact-sized inputs (derived ps catalog, orders x lineitem,
    EXISTS/NOT-EXISTS on the same fact): the raw fact must never sit
    under a BroadcastExchange. At toy SF Catalyst's stats-free estimate
    put the whole orders table — and even lineitem-derived EXISTS
    sides — under the 10 MB broadcast threshold; the MERGE hints pin
    the shuffle-merge shape this guards."""
    p = _plan(spark, sf_dir, key, "simple")
    assert not _lineitem_under_broadcast(p), key
    assert not _orders_under_broadcast(p), key


def _orders_under_broadcast(plan: str) -> bool:
    """Same contract as _lineitem_under_broadcast for the orders fact."""
    return _fact_under_broadcast(plan, "orders")


def _fact_under_broadcast(plan: str, table: str) -> bool:
    """Shared kernel: split on BroadcastExchange, so each segment is the
    text strictly between consecutive exchange nodes (no nested token);
    the text from the segment start to its first parquet scan is the
    operator chain sitting between that exchange and the scan — an
    aggregate there means the broadcast holds groups, not raw fact
    rows, which is fine."""
    for seg in plan.split("BroadcastExchange")[1:]:
        scan = seg.find("Scan parquet")
        if scan == -1:
            continue
        if table in seg[scan:scan + 400] \
                and "HashAggregate" not in seg[:scan]:
            return True
    return False


def test_graph_degree_fact_join_merges_and_topk_is_bounded(spark, sf_dir):
    """op_graph_degree: the lineitem x orders fact join must be
    sort-merge on orderkey (never a broadcast of either fact; the r15
    SHUFFLE_HASH experiment measured ~25% slower at sf1 and was
    reverted), and the top-100 hubs must be TakeOrderedAndProject, not
    a global sort."""
    p = _plan(spark, sf_dir, "op_graph_degree", "simple")
    assert "SortMergeJoin [l_orderkey" in p, p
    assert not _lineitem_under_broadcast(p), p
    assert not _orders_under_broadcast(p), p
    assert "TakeOrderedAndProject" in p, p


def test_resample_grid_is_generated_executor_side(spark, sf_dir):
    """op_timeseries_resample: the dense grid must come from an
    executor-side explode(sequence(...)) over per-user span rows —
    never a shuffled pre-materialized calendar."""
    p = _plan(spark, sf_dir, "op_timeseries_resample", "simple")
    assert "Generate explode(sequence(" in p, p


def test_zscore_is_one_shuffle_plus_broadcast(spark, sf_dir):
    """op_anomaly_zscore: the per-type moments are one two-phase
    aggregate (a single hash exchange) and the stats ride a broadcast
    back over the fact scan."""
    p = _plan(spark, sf_dir, "op_anomaly_zscore", "simple")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "BroadcastHashJoin" in p, p


def test_entity_match_verifies_inside_block_join(spark, sf_dir):
    """op_entity_block_match: the levenshtein verify must be a residual
    condition of the block-key equi-join (codegen, JVM-side), and the
    block-size cap must appear as an aggregate feeding the join — the
    cap is code, not prose."""
    p = _plan(spark, sf_dir, "op_entity_block_match", "simple")
    assert "levenshtein" in p, p
    assert "CartesianProduct" not in p, p
    assert "HashAggregate" in p, p


def test_bm25_broadcasts_stats_and_bounds_topk(spark, sf_dir):
    """op_text_search_bm25: the only nested-loop join allowed is the
    1-row corpus-stats broadcast (a scalar, not a relation — same class
    as op_similarity's whitelisting); df must broadcast on term; the
    top-k must be TakeOrderedAndProject, and the query-term IN filter
    must sit on the exploded token stream (no unfiltered fact-sized
    shuffle)."""
    p = _plan(spark, sf_dir, "op_text_search_bm25", "simple")
    assert "TakeOrderedAndProject" in p, p
    # every BNLJ subtree must contain a full-corpus aggregate (the
    # 1-row stats), i.e. its broadcast side is scalar-sized by
    # construction
    for seg in p.split("BroadcastNestedLoopJoin")[1:]:
        assert "HashAggregate" in seg, p
    assert "BroadcastHashJoin [term" in p, p


def test_quantile_tail_histogram_is_partial_agg(spark, sf_dir):
    """group_quantile_tail: the bucket histogram must be a two-phase
    HashAggregate (partial combine on ints), the threshold must broadcast,
    and the full value column must never feed a percentile value-map
    (no Percentile over l_extendedprice)."""
    p = _plan(spark, sf_dir, "agg_percentile")
    assert p.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in p
    import re
    assert not re.search(r"percentile\(l_extendedprice", p), \
        "p99 must use the tail-rank path, not the value-map aggregate"


def test_partitioned_layout_prunes_at_scan(spark, sf_dir):
    """SCALE.md's storage claim, executed: a scan with a filter on the
    partition column of the engine's partitioned layout
    (`sink_parquet_delta`'s write shape) must prune directories via
    PartitionFilters — not read everything and filter post-scan."""
    from blockchain_data_ingestion_spark.catalog import table as T
    from blockchain_data_ingestion_spark.scratch import fresh_scratch_dir
    from pyspark.sql import functions as F

    out = fresh_scratch_dir("plan_partition_prune")
    (T(spark, sf_dir, "orders")
     .select("o_orderkey", "o_orderstatus", "o_totalprice")
     .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out))
    df = (spark.read.parquet(out)
          .filter(F.col("o_orderstatus") == "F")
          .groupBy().agg(F.count("*").alias("n")))
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple")
    p = df._jdf.queryExecution().explainString(jmode)
    part = next(l for l in p.splitlines() if "PartitionFilters" in l)
    assert "(o_orderstatus" in part.split("PartitionFilters")[1][:120], part
    # the partition predicate must NOT appear as a pushed data filter —
    # it is satisfied by directory pruning before any file is opened
    assert df.collect()[0]["n"] > 0


def test_ivf_assignment_never_shuffles(spark, sf_dir):
    """op_ann_ivf's assignment embeds the k-centroid model as a literal
    and computes the argmin as a HOF projection: the returned plan (the
    final assignment over the full corpus) must contain no Exchange and
    no Join of any kind — the corpus only streams."""
    p = _plan(spark, sf_dir, "op_ann_ivf", "simple")
    assert "Exchange" not in p, p
    assert "Join" not in p, p


def test_correlated_subqueries_decorrelate(spark, sf_dir):
    """subq_correlated must plan as aggregate-plus-join (Catalyst
    decorrelation) — no per-row subquery execution survives: the plan
    contains joins and two-phase aggregates but no InSubquery/
    ScalarSubquery runtime nodes."""
    p = _plan(spark, sf_dir, "subq_correlated", "simple")
    assert "Join" in p
    assert "HashAggregate" in p
    assert "Subquery" not in p, p


def test_no_degenerate_shapes_anywhere(spark, sf_dir):
    """Global invariants over every batch key's plan: no row-at-a-time
    Python (BatchEvalPython — SCALE.md's 'Python is never row-at-a-time'
    claim), no CartesianProduct, and BroadcastNestedLoopJoin only where
    it IS the design (op_similarity's broadcast-queries × corpus scan).
    Streaming keys are skipped (plan text requires starting a query)."""
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("simple")
    # the broadcast-query-set pattern: a BNLJ whose broadcast side is a
    # bounded query/needle set (10 vectors, a term list) streaming once
    # over the corpus is the CORRECT plan for brute-force scoring —
    # op_knn_classify shares op_similarity's shape.
    bnlj_ok = {"op_similarity", "op_text_search_bm25", "op_knn_classify",
               "op_ann_pq_search",
               # composes op_similarity verbatim as its ground truth, so
               # it inherits that key's documented broadcast-needle BNLJ
               "op_ann_recall_at_k"}
    # udtf_python_split EXISTS to demonstrate the Python UDTF node —
    # and its input is the per-status range table (metadata-sized),
    # never the fact, so row-at-a-time Python off the hot path is the
    # documented design there, not a regression.
    pyudtf_ok = {"udtf_python_split"}
    offenders = []
    for k, spec in sorted(load_all().items()):
        if k.startswith("stream_"):
            continue
        p = spec.spark(spark, sf_dir)._jdf.queryExecution() \
            .explainString(jmode)
        if "BatchEvalPython" in p and k not in pyudtf_ok:
            offenders.append((k, "BatchEvalPython"))
        if "CartesianProduct" in p:
            offenders.append((k, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in p and k not in bnlj_ok:
            offenders.append((k, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_seq_pack_prefix_sum_is_two_level(spark, sf_dir):
    """op_seq_pack's only single-partition exchange must feed the tiny
    bucket-base window (n/64 rows), never the document stream: the plan
    has exactly one SinglePartition exchange, a partial+final
    HashAggregate pair before it (bucket totals), a broadcast join of
    the bases, and a hash-partitioned window for the per-bucket scan."""
    p = _plan(spark, sf_dir, "op_seq_pack", "simple")
    assert p.count("Exchange SinglePartition") == 1, p
    assert "BroadcastHashJoin" in p, p
    assert "Exchange hashpartitioning(bkt" in p, p


def test_chunk_and_quality_are_shuffle_free(spark, sf_dir):
    """op_doc_chunk / op_quality_filter are per-row pipelines: one scan,
    zero exchanges, no Python in the row path. The chunk grid stays
    inside whole-stage codegen; the quality gate's HOF lambdas
    (filter/array) are interpreted-JVM (Catalyst excludes lambda
    expressions from codegen) — still no row-at-a-time Python."""
    for key in ("op_doc_chunk", "op_quality_filter"):
        p = _plan(spark, sf_dir, key, "simple")
        assert "Exchange" not in p, (key, p)
        assert "BatchEvalPython" not in p, (key, p)
    assert "codegen id" in _plan(spark, sf_dir, "op_doc_chunk", "formatted")


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark shingle set is the bounded side — it must ride a
    BroadcastHashJoin (never a shuffle join of the full corpus against
    it), and the source filters must reach the parquet scan."""
    p = _plan(spark, sf_dir, "op_decontaminate", "simple")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "PushedFilters: [IsNotNull(source)" in p, p


def test_no_driver_side_corpus_collect():
    """No registered operator may materialize a table on the driver:
    ``.toPandas()`` / ``.collect()`` in a query module is only legitimate
    for metadata-sized state (a scalar bound, a k-row k-means model), and
    every such site must carry an inline ``# driver-ok:`` justification.
    This is the source-level twin of the plan-shape checks — a driver
    collect is invisible in ``explain`` output but is the first thing
    that dies at 100 TB (VERDICT r2 'What's wrong' item 2)."""
    import pathlib

    pkg = (pathlib.Path(__file__).resolve().parent.parent
           / "blockchain_data_ingestion_spark")
    # queries/ is the registry; streaming/ feeds it (the r15 verdict
    # found an untagged collect in streaming/jobs.py outside this
    # lint's reach — scan the whole streaming package too).
    files = sorted((pkg / "queries").glob("*.py")) + \
        sorted((pkg / "streaming").glob("*.py"))
    offenders = []
    for f in files:
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if _driver_collect_hit(line) and "# driver-ok:" not in line:
                offenders.append(f"{f.name}:{i}: {line.strip()}")
    assert not offenders, (
        "driver-side materialization without a '# driver-ok:' "
        f"justification:\n" + "\n".join(offenders))


def _driver_collect_hit(line: str) -> bool:
    """True iff the line calls a driver-materializing method on anything
    other than the standalone ``F`` pyspark-functions namespace. A bare
    ``(?<!F)`` lookbehind exempts ANY receiver ending in capital F
    (``myDF.collect()`` slipped through — ADVICE r11), so the exemption
    is checked as a standalone-token test on the match prefix instead."""
    import re

    for m in re.finditer(r"\.(toPandas|collect|first|head|take)\(", line):
        if re.search(r"(?<![A-Za-z0-9_.])F$", line[: m.start()]):
            continue  # F.first(...) etc. — pyspark.sql.functions, not a DF
        return True
    return False


def test_driver_collect_lint_is_two_sided():
    """Planted meta-test for the lint above: the ``F.`` exemption must
    not leak to arbitrary receivers that merely END in ``F`` (the r11
    ADVICE finding), and the real driver-collect shapes must still hit."""
    assert _driver_collect_hit("rows = myDF.collect()")          # ADVICE case
    assert _driver_collect_hit("x = df.toPandas()")
    assert _driver_collect_hit("df.groupBy('k').count().first()")
    assert not _driver_collect_hit("F.first('col', ignorenulls=True)")
    assert not _driver_collect_hit("agg(F.first('a'), F.take)")
    # attribute access on a module alias other than F is still a hit
    assert _driver_collect_hit("GF.collect()")


def test_ivf_large_k_broadcast_assignment(spark):
    """Above `_IVF_LITERAL_MAX_K` cells the assignment must switch from
    a plan-embedded literal model to a one-row broadcast: plan text
    stays bounded (model is data, not plan), the corpus side still
    never exchanges (BroadcastNestedLoopJoin of one row, no
    hash/range partitioning), and both formulations assign
    identically."""
    import random

    from pyspark.sql import functions as F

    from blockchain_data_ingestion_spark.queries.llm_vec import (
        _IVF_LITERAL_MAX_K, _ivf_assign)

    rng = random.Random(7)
    dim, k, n = 8, 1024, 64
    assert k > _IVF_LITERAL_MAX_K
    cents = [[rng.randrange(0, 1 << 20) for _ in range(dim)]
             for _ in range(k)]
    e = spark.createDataFrame(
        [(i, [rng.randrange(0, 1 << 20) for _ in range(dim)])
         for i in range(n)],
        "vec_id long, v array<bigint>")

    big = _ivf_assign(e, cents)
    plan = big._sc._jvm.PythonSQLUtils.explainString(
        big._jdf.queryExecution(), "simple")
    assert len(plan) < 20_000, f"plan text {len(plan)} chars — model leaked into plan"
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan

    # literal formulation at a small k agrees value-for-value with the
    # broadcast formulation on the same model
    small_cents = cents[:32]
    lit = _ivf_assign(e, small_cents).select("vec_id", "cid", "dist")
    # force the broadcast path for the same small model
    model = spark.createDataFrame(
        [([list(c) for c in small_cents],)], "cents array<array<bigint>>")
    from blockchain_data_ingestion_spark.queries.llm_vec import (
        _SPARK_SQDIST)
    bc = (e.crossJoin(F.broadcast(model))
          .withColumn("dists", F.expr(
              f"transform(cents, c -> {_SPARK_SQDIST.format(a='v', b='c')})"))
          .withColumn("dist", F.expr("array_min(dists)"))
          .withColumn("cid", F.expr(
              "CAST(array_position(dists, dist) - 1 AS BIGINT)"))
          .select("vec_id", "cid", "dist"))
    a = {r.vec_id: (r.cid, r.dist) for r in lit.collect()}
    b = {r.vec_id: (r.cid, r.dist) for r in bc.collect()}
    assert a == b


def test_ngram_jaccard_hot_set_rides_broadcast_anti_join(spark, sf_dir):
    """The DF cap must appear in the PLAN as a broadcast LEFT ANTI join
    of the (tiny) hot-shingle set against the inverted index — hot rows
    are dropped map-side and never cross the candidate join's shuffle —
    and the candidate aggregation must be two-phase (partial before the
    exchange)."""
    p = _plan(spark, sf_dir, "dedup_ngram_jaccard", "simple")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "CartesianProduct" not in p
    assert "partial_count" in p, p


def test_ngram_stats_is_partial_agg_plus_topk(spark, sf_dir):
    """The DF report must plan as map-side partial counts (a hot shingle
    costs one combiner row per mapper, never a raw-row bucket) feeding a
    global TakeOrderedAndProject — no full sort."""
    p = _plan(spark, sf_dir, "op_ngram_stats", "simple")
    assert "partial_count" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_pack_segments_single_uniform_groupby(spark, sf_dir):
    """Segment aggregation adds exactly one seq_id-keyed exchange on top
    of the packing kernel (whose own single-partition prefix stage is
    pinned elsewhere) and stays Python-free."""
    p = _plan(spark, sf_dir, "op_pack_segments", "simple")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange hashpartitioning(seq_id") == 1, p


def test_embedding_lsh_joins_on_bucket_not_cartesian(spark, sf_dir):
    """dedup_embedding_lsh must meet on the bucket equi-key (hash or
    sort-merge join) with a global TakeOrderedAndProject top-k — never a
    cartesian/nested-loop pair space, never a full sort."""
    p = _plan(spark, sf_dir, "dedup_embedding_lsh", "simple")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_partitioned_scan_prunes_partitions(spark, sf_dir):
    """src_parquet_partition_pruned's literal lang predicate must reach
    the scan as a PartitionFilter (directory-level pruning — unselected
    partitions are never opened), not survive as a post-scan Filter."""
    p = _plan(spark, sf_dir, "src_parquet_partition_pruned")
    line = next(l for l in p.splitlines() if "PartitionFilters" in l)
    assert "lang" in line, p
    assert "de" in line or "isnotnull" in line, p


def test_ngram_index_self_join_is_sort_merge(spark, sf_dir):
    """The inverted-index self-join in `dedup_ngram_jaccard` is
    large × large by design (both sides are the whole DF-capped shingle
    index): it must stay a sort-merge join. AQE's fixture-scale size
    estimate would otherwise collect the entire index to the driver for
    a broadcast — 2.8× slower locally and a driver OOM at corpus scale
    (SCALE.md "Build-side discipline")."""
    p = _plan(spark, sf_dir, "dedup_ngram_jaccard", "simple")
    assert "SortMergeJoin" in p
    # the only broadcasts allowed are provably-small sides: the
    # hot-shingle set (behind a HashAggregate) and AQE-final drop sets —
    # never a raw shingle index (documents scan with no aggregate above).
    for head in p.split("BroadcastExchange")[1:]:
        scan = head.find("Scan parquet")
        if scan == -1:
            continue
        assert "HashAggregate" in head[:scan], (
            "raw shingle index under a BroadcastExchange")


def test_lateral_decorrelates_to_ranked_join(spark, sf_dir):
    """join_lateral: the per-row LIMIT subquery must decorrelate into
    a ranked window + join (row_number over o_custkey), never a
    nested-loop per-outer-row execution."""
    p = _plan(spark, sf_dir, "join_lateral", "simple")
    assert "row_number()" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_recursive_cte_plans_as_union_loop(spark, sf_dir):
    """subq_recursive: Spark 4.x executes WITH RECURSIVE as an
    iterated union (UnionLoop) — pin the mechanism so a regression to
    an unsupported-feature fallback or a silent cross join is loud."""
    p = _plan(spark, sf_dir, "subq_recursive", "simple")
    assert "UnionLoop" in p, p


# --- round-7 pins: the round-6 plan claims, asserted (VERDICT r6 #3) -------


def test_substring_spans_one_explode_one_hash_shuffle_no_join(spark, sf_dir):
    """op_substring_dedup_spans' r6 rewrite, pinned: exactly ONE gram
    explode; the gram phase shuffles 128-bit hash pairs once
    (hashpartitioning(h1,h2)) into a min/max WINDOW — never an
    aggregate + join-back (the r5 triple-shuffle defect had gram
    STRINGS crossing three exchanges); the only other hash exchange is
    the doc-local island window's; no Join operator anywhere."""
    p = _plan(spark, sf_dir, "op_substring_dedup_spans", "simple")
    assert p.count("Generate explode") == 1, p
    assert "Join" not in p, p
    hashes = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hashes) == 2, hashes
    assert any("h1#" in l and "h2#" in l for l in hashes), hashes
    assert any("doc_id#" in l for l in hashes), hashes
    # the gram dedup is a window (min/max over the hash partition),
    # not a distinct-aggregate feeding a join back
    assert "windowspecdefinition(h1#" in p, p


def test_sequence_gaps_no_global_window_over_fact(spark, sf_dir):
    """op_sequence_gaps' decomposition, pinned: the fact-side lead()
    window partitions by the id bucket (never a global order over all
    ids), and the single SinglePartition exchange feeds the
    |buckets|-row min/max summary aggregate — the only place a global
    order exists is over metadata-sized input."""
    p = _plan(spark, sf_dir, "op_sequence_gaps", "simple")
    # fact-side lead: bucket column is a PARTITION key of the spec
    assert "windowspecdefinition(b#" in p, p
    single = p.split("Exchange SinglePartition")
    assert len(single) == 2, "exactly one SinglePartition exchange"
    # its input (next plan lines) must be the bucket-keyed summary agg
    assert "HashAggregate(keys=[b#" in single[1][:400], single[1][:400]


def test_ivf_pq_corpus_encodes_before_single_cid_shuffle(spark, sf_dir):
    """op_ann_ivf_pq's scale claims, pinned: the corpus never shuffles
    for assignment or encoding — its ONLY exchange is the single cid
    equi-join (a SortMergeJoin on cid), and the rows crossing it carry
    the 4-bit-code BIGINT (pq_code computed BELOW the exchange), never
    raw embeddings. Query-side model joins stay broadcast; the
    per-query top-k is a two-phase WindowGroupLimit."""
    p = _plan(spark, sf_dir, "op_ann_ivf_pq", "simple")
    assert p.count("SortMergeJoin") == 1, p
    assert "SortMergeJoin [cid#" in p, p
    # three hash exchanges total: both cid join sides + the final
    # per-query rank; everything else must be broadcast
    assert p.count("Exchange hashpartitioning") == 3, p
    assert "WindowGroupLimit" in p and "Partial" in p, p
    # corpus side: pq_code is computed below its cid exchange — the
    # segment between that exchange and the corpus scan contains the
    # code projection and no further exchange
    corpus = [seg for seg in p.split("Exchange hashpartitioning")[1:]
              if "pq_code" in seg.split("Exchange")[0]]
    assert corpus, "no exchange segment carries pq_code directly"


def test_pq_lut_branch_gates_both_ways(spark, sf_dir, monkeypatch):
    """The LUT rewrite must FIRE at >= _PQ_LUT_MIN_QUERIES queries
    (plan gathers from the precomputed lut with element_at) and fall
    back to direct ADC below the threshold (no lut column in the
    plan). The >= arm is also covered by
    test_pq_lut_path_is_bit_identical_and_gated; this pins the <
    arm, which no fixture reaches (the registered query set is 10)."""
    from blockchain_data_ingestion_spark.queries import llm_vec

    p_hi = _plan(spark, sf_dir, "op_ann_pq_search", "simple")
    # the fired branch must actually GATHER from the precomputed lut
    # (element_at over the lut column), not merely carry a lut column
    assert "lut#" in p_hi, p_hi
    assert "element_at(" in p_hi, p_hi
    monkeypatch.setattr(llm_vec, "_PQ_LUT_MIN_QUERIES", 99)
    p_lo = _plan(spark, sf_dir, "op_ann_pq_search", "simple")
    assert "lut#" not in p_lo, p_lo


def test_stream_window_topk_rank_reads_only_preaggregate(spark, sf_dir):
    """stream_window_topk's batch stage, pinned: the returned (batch)
    plan ranks the LANDED streaming aggregate — it scans the memory
    sink only (no events parquet scan anywhere) and bounds the rank
    with a two-phase WindowGroupLimit, so the rank input is
    aggregate-sized by construction."""
    df = load_all()["stream_window_topk"].spark(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("simple")
    p = df._jdf.queryExecution().explainString(jmode)
    assert "Scan parquet" not in p, p
    assert "WindowGroupLimit" in p, p


def test_market_basket_one_fact_shuffle_and_broadcast_pass1(spark, sf_dir):
    """op_market_basket's r8 rewrite, pinned: the only exchange over the
    RAW fact is the opening repartition on the order key (printed
    REPARTITION_BY_COL) — the (k, item) distinct aggregate runs in
    place on that partitioning (no exchange keyed on (k, item) exists
    anywhere), the A-Priori pass-1 survivor counts re-enter under a
    BroadcastExchange (never a fact-sized join back), the pair
    aggregate is the one remaining fact-derived hash exchange, and
    top-25 plans as TakeOrderedAndProject so the rank window input is
    25 rows by construction. Join strategy is deliberately unpinned:
    at toy SF AQE broadcasts one self-join side; at scale both sides
    inherit the k-partitioning and merge-join exchange-free."""
    import re

    p = _plan(spark, sf_dir, "op_market_basket", "simple")
    k_ex = [l for l in p.splitlines()
            if re.search(r"Exchange hashpartitioning\(k#\d+L,", l)]
    assert k_ex and all("REPARTITION_BY_COL" in l for l in k_ex), k_ex
    # the distinct agg must reuse the repartition, not add its own
    assert not re.search(r"hashpartitioning\(k#\d+L, item#", p), p
    # pass-1 survivor counts (HAVING c >= 3) enter via broadcast
    assert any("HashAggregate(keys=[item#" in seg.split("Exchange", 1)[0]
               or "c#" in seg.split("+- Project", 1)[0]
               for seg in p.split("BroadcastExchange")[1:]), p
    assert re.search(r"Exchange hashpartitioning\(item_a#", p), p
    assert "TakeOrderedAndProject(limit=25" in p, p


def test_embedding_gram_is_reduce_first(spark, sf_dir):
    """op_embedding_gram's scale claim, pinned: the corpus NEVER
    explodes to per-element rows — the plan is scan → one Arrow
    MapInPandas (per-partition d×d accumulation) → one hash exchange
    of cell rows → final aggregate. No Generate/explode, no join, and
    exactly one exchange (the 2080-cell aggregate)."""
    p = _plan(spark, sf_dir, "op_embedding_gram", "simple")
    assert "MapInPandas" in p, p
    assert "Generate" not in p, p
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_capped_fan_build_is_single_scan_bounded_state(spark, sf_dir):
    """The shared graph fan's r10 materialization contract, pinned in
    two stages (the localCheckpoint between them hides each from the
    other's plan):

    Stage 1 (`_fan_edges`, checkpointed once per query): the distinct
    (customer, supplier) edge set is ONE fact join + ONE keys-only
    hash aggregate — O(1) dedup state per key, a single lineitem scan.

    Stage 2 (`_fan_from_edges` over the checkpointed edges): over-cap
    customers are dropped by a broadcast LeftAnti fed by an O(1)-state
    count aggregate BEFORE collect_set, so the set aggregate's per-key
    buffer is ≤ cap entries by construction (the r9 post-agg size
    filter bounded consumers, not the aggregation state — ADVICE r9
    medium)."""
    import re

    from blockchain_data_ingestion_spark.queries.analytics import (
        _fan_edges, _fan_from_edges)

    jmode = (spark._jvm.org.apache.spark.sql.execution.ExplainMode
             .fromString("simple"))

    p1 = (_fan_edges(spark, sf_dir)
          ._jdf.queryExecution().explainString(jmode))
    assert re.search(r"HashAggregate\(keys=\[c#\d+L, s#\d+L\], "
                     r"functions=\[\]", p1), p1   # keys-only dedup
    assert p1.count("lineitem.parquet") == 1, p1    # single fact scan
    assert p1.count("Join") == 1, p1
    assert "collect_set" not in p1, p1

    e_d = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "c long, s long")
    p2 = (_fan_from_edges(e_d, 2)
          ._jdf.queryExecution().explainString(jmode))
    assert re.search(r"Filter \(nd#\d+L? > 128\)", p2), p2
    assert re.search(r"BroadcastHashJoin .*LeftAnti", p2), p2
    assert "collect_set" in p2, p2
    # the anti sits BELOW the set aggregate: the LeftAnti join line
    # must appear after (deeper than) the ObjectHashAggregate line
    assert (p2.index("partial_collect_set")
            < p2.index("LeftAnti")), p2
    assert "SortMergeJoin" not in p2, p2


def test_graph_2hop_unions_neighborhood_bitmaps(spark, sf_dir):
    """op_graph_2hop's r10 bitmap-union shape, pinned: the consumer
    plan reads the CHECKPOINTED fan only (Scan ExistingRDD, no fact
    scan), builds ONE bitmap per (customer, bucket) via
    bitmap_construct_agg, joins it to the |edges|-grain explode on the
    customer key (shuffled hash — both sides are fan-derived, no sort
    needed), and unions per supplier with a TWO-PHASE bitmap_or_agg
    (partial before the exchange — the OR combines map-side, so the
    shuffle carries |suppliers|·|buckets| bitmap cells per task, never
    the edge stream). NO wedge expansion anywhere: the old
    explode(flatten(transform(...))) pair stream was quadratic per
    customer unconditionally (Σ d² rows once degrees saturate at the
    cap); this form is linear in edges × buckets-touched (quadratic
    again only past |suppliers| ≈ cap·32768 — the docstring owns the
    precise bound; measured sf10 7.9 → 6.1 s). Top-100 is
    TakeOrderedAndProject; two_hop = popcount − 1 (a supplier's own
    bit rides in from each of its customers' sets)."""
    p = _plan(spark, sf_dir, "op_graph_2hop", "simple")
    assert p.count("Scan ExistingRDD") == 2, p      # fan, twice
    assert "FileScan" not in p, p                   # no fact rejoin
    assert "partial_bitmap_construct_agg" in p, p
    assert "partial_bitmap_or_agg" in p, p          # map-side OR combine
    assert p.count("Join") == 1, p                  # the edge⋈bitmap join
    assert "flatten(transform" not in p, p          # no wedge expansion
    assert "TakeOrderedAndProject(limit=100" in p, p


def test_graph_2hop_dispatch_regimes(spark):
    """r11 (VERDICT r10 item 2): the bitmap breakdown bound is
    dispatched, not documented. Over a SPARSE supplier id space
    (max id ≫ 32·32768 but few distinct suppliers) `_two_hop_from_fan`
    must renumber suppliers densely and STILL plan the bitmap kernel —
    with the offset prefix broadcast, never an |S|-row single-partition
    sort of the edge stream; past the cardinality threshold it must
    plan 16-byte wedge pairs with NO bitmap payloads. All regimes
    agree exactly with brute force (label-invariance of popcount−1)."""
    from itertools import combinations

    from blockchain_data_ingestion_spark.queries.analytics import (
        _two_hop_from_fan)

    # sparse ids: ~1e9-spaced suppliers, 3 customers, shared suppliers;
    # customer 4's size-1 fan plants the ADVICE r11 divergence case (a
    # supplier seen ONLY in size-1 rows) — the helper's up-front
    # size>=2 filter must make all three regimes OMIT it identically
    # (brute force over wedges naturally never sees it)
    sup = {1: [1_000_000_007, 2_000_000_011, 3_000_000_019],
           2: [2_000_000_011, 4_000_000_003],
           3: [3_000_000_019, 4_000_000_003, 5_000_000_021],
           4: [6_000_000_001]}
    fan = spark.createDataFrame(
        [(c, sorted(ss)) for c, ss in sup.items()],
        "c long, arr array<long>")
    reach: dict[int, set[int]] = {}
    for ss in sup.values():
        for a, b in combinations(ss, 2):
            reach.setdefault(a, set()).add(b)
            reach.setdefault(b, set()).add(a)
    expect = sorted(((k, len(v)) for k, v in reach.items()),
                    key=lambda t: (-t[1], t[0]))

    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("simple")

    # regime 2: default thresholds → dense remap, bitmap kernel kept.
    # The remapped edge frame is eagerly checkpointed (it feeds both
    # the cb aggregate and the probe side — the no-ReusedExchange
    # rule), so the consumer plan reads Scan ExistingRDD and the
    # remap's own subtree (distinct + per-bucket row_number +
    # broadcast offset join) is hidden behind the boundary.
    remap = _two_hop_from_fan(fan)
    p2 = remap._jdf.queryExecution().explainString(jmode)
    assert "bitmap_construct_agg" in p2, p2
    assert "bitmap_or_agg" in p2, p2
    assert "Scan ExistingRDD" in p2, p2    # checkpointed remap frame
    assert "flatten(transform" not in p2, p2
    assert [(r["suppkey"], r["two_hop"]) for r in remap.collect()] \
        == expect

    # regime 1: thresholds lifted → raw ids bitmap directly (no remap
    # join, exactly the fixture plan shape)
    direct = _two_hop_from_fan(fan, max_bmp_buckets=10**15)
    p1 = direct._jdf.queryExecution().explainString(jmode)
    assert "bitmap_construct_agg" in p1, p1
    assert p1.count("Join") == 1, p1       # edge⋈bitmap only, no remap
    assert [(r["suppkey"], r["two_hop"]) for r in direct.collect()] \
        == expect

    # regime 3: thresholds zeroed → wedge pairs, zero 4 KB payloads
    pairs = _two_hop_from_fan(fan, max_bmp_buckets=0)
    p3 = pairs._jdf.queryExecution().explainString(jmode)
    assert "bitmap" not in p3, p3
    assert "count(distinct s2" in p3 or "count(s2" in p3, p3
    assert [(r["suppkey"], r["two_hop"]) for r in pairs.collect()] \
        == expect


def test_graph_jaccard_counts_pairs_two_phase_broadcast_degrees(spark,
                                                                sf_dir):
    """op_graph_jaccard's r10 shape, pinned: ordered wedge pairs expand
    map-side from the CHECKPOINTED fan (slice form — each wedge once;
    min_size=1 so DEGREES count singleton-fan customers, the r9
    ADVICE-high fix), the common-customer count is a two-phase
    aggregate on the pair key (partial_count before the exchange — the
    shuffle moves pair-grain partials, not wedges), BOTH
    supplier-degree joins broadcast, every fan reference is an
    ExistingRDD scan (zero fact joins in the consumer plan), and
    top-25 is TakeOrderedAndProject."""
    import re

    p = _plan(spark, sf_dir, "op_graph_jaccard", "simple")
    assert "Generate explode(flatten(transform" in p, p
    assert "slice(arr" in p, p
    assert re.search(r"HashAggregate\(keys=\[sa#\d+L, sb#\d+L\], "
                     r"functions=\[partial_count", p), p
    assert p.count("BroadcastHashJoin") == 2, p     # the two degree joins
    assert p.count("Scan ExistingRDD") == 3, p      # pairs + 2 degree refs
    assert "FileScan" not in p, p                   # no fact rejoin
    assert "SortMergeJoin" not in p, p
    assert "TakeOrderedAndProject(limit=25" in p, p
    # singleton fans must SURVIVE into the degree branch: no >= 2 and
    # no post-agg <= cap filter anywhere in the consumer plan
    assert not re.search(r"size\(arr#\d+, true\) >= 2", p), p
    assert not re.search(r"size\(arr#\d+, true\) <= ", p), p


def test_assortativity_moments_ride_compact_cells(spark, sf_dir):
    """op_degree_assortativity's r10 shape, pinned: the exploded edge
    stream collapses through ONE keys-(s, dx) BIGINT count aggregate
    (partial before the exchange), the supplier degree derives from
    those cells (no second fan pass — exactly one non-degree
    ExistingRDD scan feeds the explode), the degree join broadcasts,
    and the exact DECIMAL(38,0) moment sums run over the cell table
    only (never per edge — the per-edge decimal accumulation cost
    +63 % at sf3, SCALE.md §r10)."""
    import re

    p = _plan(spark, sf_dir, "op_degree_assortativity", "simple")
    assert re.search(r"HashAggregate\(keys=\[s#\d+L, dx#\d+L\], "
                     r"functions=\[partial_count", p), p
    assert p.count("BroadcastHashJoin") == 1, p
    assert "FileScan" not in p, p                   # checkpointed fan only
    assert "SortMergeJoin" not in p, p
    # decimal arithmetic must sit ABOVE the cell aggregate (applied to
    # cnt), never below it (applied per exploded edge)
    first_decimal = p.index("cast(cnt")
    cell_agg = p.index("partial_count")
    assert first_decimal < cell_agg, p  # plan prints top-down


def test_percentile_sketch_is_single_array_form(spark, sf_dir):
    """agg_approx_percentile's r8 fix, pinned: exactly ONE
    approx_percentile aggregate (array form) at accuracy 2000 — two
    scalar accuracy-10000 sketches were the measured 75 s state
    blowup at sf1; a regression to either shape must fail here."""
    p = _plan(spark, sf_dir, "agg_approx_percentile", "simple")
    assert p.count("partial_approx_percentile") == 1, p
    assert "2000" in p.split("partial_approx_percentile", 1)[1][:80], p


def test_ngram_novelty_shuffles_hashes_not_grams(spark, sf_dir):
    """op_ngram_novelty's claim, pinned: one gram explode; the first-
    occurrence min rides a WINDOW over the 128-bit hash-pair partition
    (never a gram-table aggregate joined back — no Join anywhere); the
    only hash exchanges carry (h1, h2) and doc_id."""
    import re

    p = _plan(spark, sf_dir, "op_ngram_novelty", "simple")
    assert p.count("Generate explode") == 1, p
    assert "Join" not in p, p
    hashes = [l for l in p.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hashes) == 2, hashes
    assert any("h1#" in l and "h2#" in l for l in hashes), hashes
    assert any("doc_id#" in l for l in hashes), hashes
    assert re.search(r"windowspecdefinition\(h1#", p), p


def test_shingle_containment_index_join_is_smj(spark, sf_dir):
    """op_shingle_containment inherits dedup_ngram_jaccard's inverted-
    index discipline: the large×large index self-join must be a
    SortMergeJoin (an AQE broadcast of the index is the shape that
    OOMs the driver at corpus scale), and no BroadcastExchange may
    carry the raw shingle index (only the hot-shingle set and the
    pair-grain cardinality joins are broadcast-sized)."""
    p = _plan(spark, sf_dir, "op_shingle_containment", "simple")
    assert "SortMergeJoin" in p, p
    # same discrimination as the jaccard test: a parquet scan under a
    # BroadcastExchange must have a HashAggregate between them (the
    # broadcast side is aggregate-sized — hot set, cardinality table),
    # never the raw exploded index
    for head in p.split("BroadcastExchange")[1:]:
        scan = head.find("Scan parquet")
        if scan == -1:
            continue
        assert "HashAggregate" in head[:scan], (
            "raw shingle index under a BroadcastExchange")


def test_domain_token_cap_single_source_shuffle(spark, sf_dir):
    """op_domain_token_cap's claim, pinned: ONE fact exchange on the
    source key serves both the prefix-sum window and the per-source
    aggregate (same partitioning — no second exchange), and the sort
    for the window is the only sort."""
    import re

    p = _plan(spark, sf_dir, "op_domain_token_cap", "simple")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert re.search(r"Exchange hashpartitioning\(source#", p), p
    assert "windowspecdefinition(source#" in p, p


def test_kcore_rounds_read_persisted_edges(spark, sf_dir):
    """op_kcore's scale claim, pinned: the returned plan reads the
    PERSISTED edge table and alive set (InMemoryTableScan — the peel
    rounds never recompute edges from the fact), the final core join
    is the two alive-endpoint semi-joins, and nothing explodes."""
    p = _plan(spark, sf_dir, "op_kcore", "simple")
    assert "InMemoryTableScan" in p, p
    # cached-subtree printing repeats the inner chain text, so count
    # semis only in the TOP layer (before the first InMemoryRelation
    # expansion): the final core join is exactly the two alive-endpoint
    # semi-joins reading cached inputs
    top = p.split("InMemoryRelation", 1)[0]
    assert top.count("LeftSemi") == 2, top
    assert "Generate" not in top, top


def test_cusum_is_one_shuffle_window_chain(spark, sf_dir):
    """op_cusum_alerts' headline claim, pinned: the prefix-min
    identity keeps the whole control chart on ONE (type, day) fact
    exchange — every window spec shares that partitioning, so no
    second hash exchange over the fact exists (the only other
    exchanges are the |types|-row mean broadcast and the final
    cell-grain aggregate), and no Python node appears anywhere."""
    import re

    p = _plan(spark, sf_dir, "op_cusum_alerts", "simple")
    assert "EvalPython" not in p and "InPandas" not in p, p
    fact_ex = [l for l in p.splitlines()
               if re.search(r"Exchange hashpartitioning\(event_type#\d+, day#", l)]
    assert len(fact_ex) == 1, fact_ex
    assert p.count("BroadcastExchange") == 1, p


#: Registry keys ALLOWED to plan an ordered window with empty
#: partitioning, each with its documented input bound. An ordered
#: unpartitioned WindowExec moves its whole input to ONE partition —
#: legitimate only when that input is metadata-sized by construction
#: (the repo convention VERDICT r8 asked to enforce mechanically).
_GLOBAL_WINDOW_OK = {
    # distributed_ntile's level-2 offset rank: |shuffle partitions| rows
    "op_curriculum_order": "ntile offset table, |partitions| rows",
    "op_rfm_segments": "ntile offset table, |partitions| rows (×2 keys)",
    "op_quantile_binning": "ntile offset table, |partitions| rows",
    # seq-pack recursion top: ≤ max_doc_id/B² bucket rows (llm_pipeline:182)
    "op_seq_pack": "3-level prefix sum top, ≤ |docs|/B² bucket rows",
    "op_pack_segments": "same packing prefix-sum top as op_seq_pack",
    "op_packing_efficiency": "same packing prefix-sum top as op_seq_pack",
    "op_pipeline_e2e": "same packing prefix-sum top as op_seq_pack",
    # key-grain summaries (bounded by a dimension, not the fact)
    "op_gini_revenue": "|suppliers|-row revenue summary (docstring: swap "
                       "to distributed_ntile past 1e9 suppliers)",
    "op_coverage_curve": "|sources|-row token summary",
    "op_vocab_topk": "top-K vocabulary slice after the DF cap",
    "op_bigram_condprob": "per-bigram aggregate capped to report top-K",
    "op_weekly_active": "|weeks|-row activity summary",
    "op_peak_concurrency": "day-bucket NET-delta prefix, |days| rows "
                           "(the carry-in decomposition's tiny top — "
                           "the fact-grain running sum is "
                           "(day-bucket)-partitioned)",
    "op_ks_test": "distinct-value table (~50 rows at any SF)",
    "op_sequence_gaps": "|buckets| summary (analytics.py:2469)",
    "op_market_basket": "25-row top-k table (analytics.py:2368)",
    # the pedagogical global-ntile key itself — fact-grain BY DESIGN,
    # docstring carries the 100 TB caveat pointing at distributed_ntile
    "win_ntile": "demo of the naive global form; distributed_ntile is "
                 "the scale path (see op_curriculum_order)",
}


def _top_bracket_groups(s: str) -> list[str]:
    groups, depth, cur = [], 0, None
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                cur = None
                continue
        if cur is not None:
            cur.append(ch)
    return groups


def test_unpartitioned_ordered_windows_are_whitelisted(spark, sf_dir):
    """Walk EVERY registry key's optimized logical plan; any ordered
    Window with an empty partition spec must be on the documented
    whitelist above (two-sided: stale whitelist entries fail too, so
    the list can't rot). A logical Window node renders
    ``Window [funcs], [partition], [order]`` — two bracket groups with
    sort markers in the last = ordered-but-unpartitioned, the shape
    that becomes a single-partition sort of its input at scale."""
    reg = load_all()
    flagged = set()
    for key, spec in reg.items():
        df = spec.spark(spark, sf_dir)
        if df.isStreaming:
            continue
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            t = line.strip()
            i = t.find("Window ")
            if i < 0 or (i > 0 and t[:i].strip(" +-:*") != ""):
                continue
            g = _top_bracket_groups(t[i + len("Window "):])
            if len(g) == 2 and (" ASC" in g[1] or " DESC" in g[1]):
                flagged.add(key)
                break
    allowed = set(_GLOBAL_WINDOW_OK)
    assert flagged <= allowed, (
        f"NEW fact-risk global windows (document or repartition): "
        f"{sorted(flagged - allowed)}")
    assert allowed <= flagged, (
        f"stale whitelist rows (window gone — prune): "
        f"{sorted(allowed - flagged)}")


def test_global_window_sites_use_helper():
    """r13 (VERDICT r12 item 4): every INTENTIONAL global window in the
    package must construct its spec through
    `operators.bounded.bounded_window` (which demands a written
    boundedness argument) — a bare `Window.orderBy(...)` /
    `W.orderBy(...)` spec is the anti-pattern this textual lint bans.
    The runtime WindowExec warning is suppressed session-wide (it had
    become pure noise), so this lint plus the plan-walk allowlist above
    are the alarms now. Textual by design: it fires at review time on
    NEW call sites even for code paths no registry key exercises."""
    import re
    from pathlib import Path

    pkg = Path(__file__).parent.parent / "blockchain_data_ingestion_spark"
    bad = []
    for py in sorted(pkg.rglob("*.py")):
        if py.name == "bounded.py":
            continue
        for i, ln in enumerate(py.read_text().splitlines(), 1):
            if re.search(r"\b(?:Window|W)\s*\.\s*orderBy\s*\(", ln):
                bad.append(f"{py.relative_to(pkg.parent)}:{i}: {ln.strip()}")
    assert not bad, (
        "bare global-window spec(s) — route through "
        "operators.bounded.bounded_window with a bound= argument:\n"
        + "\n".join(bad))


def test_lpa_rounds_reuse_edge_partitioning(spark, sf_dir):
    """op_label_propagation's r12 shape (VERDICT r11 item 6), pinned
    over the WHOLE plan (rounds 1-2 live inside broadcast subtrees
    printed after round 3's cache scan — a head-only check would miss
    them): the edge-builder subtree sits once behind an EAGERLY
    materialized InMemoryRelation read by all four consumers (r0
    distinct + 3 vote rounds) — eager because a lazy cache is computed
    redundantly by every racing broadcast consumer (3.65 → 23.9 s at
    sf10, SCALE.md r12) and because only a materialized cache reports
    its HashPartitioning(u) under AQE; each round is a broadcast vote
    join; and NO exchange on the vote key `u` (alone or with label)
    survives anywhere in the plan — the cache's partitioning satisfies
    the (u,label) count and the per-node rank-1 window of all three
    rounds. Only the label-grain rollup and final range sort
    exchange."""
    import re

    from blockchain_data_ingestion_spark.caching import (release_all,
                                                         release_shared)

    p = _plan(spark, sf_dir, "op_label_propagation", "simple")
    release_all()  # the op eagerly materialized its scoped edge cache
    release_shared()  # … and the r13 build-once pair table beneath it
    spark.catalog.clearCache()

    # three vote joins (build side = the broadcast label table), no SMJ
    assert p.count("], [node#") == 3, p
    assert "SortMergeJoin" not in p, p
    # r0 + 3 rounds all read cached edge relations; since r13 the ee
    # cache itself reads the SHARED pair cache (nested InMemoryRelation
    # — `_shared_pairs_hi`, one builder for LPA + trade-components), so
    # the printed plan repeats the cached lineage and exact scan counts
    # are layout-dependent: pin the floor (≥ 4 consumer reads) and the
    # nesting (≥ 2 distinct cache relations present).
    assert p.count("InMemoryTableScan") >= 4, p
    assert p.count("InMemoryRelation") >= 2, p
    # no parquet scan outside the cached edge-builder subtree
    assert "Scan parquet" not in p.split("InMemoryRelation", 1)[0], p
    # zero vote-key exchanges ANYWHERE outside the cache's own
    # repartition (tagged REPARTITION_BY_COL): the rounds ride the
    # cache's HashPartitioning(u)
    for ln in p.splitlines():
        if re.search(r"Exchange hashpartitioning\(u#\d+L[,)]", ln):
            assert "REPARTITION_BY_COL" in ln, ln
    # the exchanges that DO remain are label-grain + the final sort
    assert re.search(r"Exchange hashpartitioning\(label#\d+L", p), p
    assert "Exchange rangepartitioning(community" in p, p
