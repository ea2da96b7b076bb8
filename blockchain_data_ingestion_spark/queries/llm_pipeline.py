"""LLM training-data pipeline — corpus shaping stages.

Extends the §2.11 text/dedup surface with the remaining stages a
production pre-training data pipeline runs between "raw deduped corpus"
and "training batches":

- ``op_seq_pack``      — concatenate-and-split sequence packing (the
                          standard GPT-style packing: docs laid end to
                          end, cut every L tokens);
- ``op_doc_chunk``     — overlapping token-window chunking (RAG/eval
                          context windows);
- ``op_quality_filter``— composite Gopher/C4-style quality gate with
                          per-document failure reasons;
- ``dedup_clusters``   — duplicate-cluster resolution: connected
                          components over the near-dup pair graph
                          (keep-one-per-cluster needs the cluster, not
                          the pairs);
- ``op_decontaminate`` — benchmark n-gram decontamination: flag corpus
                          documents sharing any k-gram with a held-out
                          benchmark set.

Cross-engine determinism: everything is integer/string math (ppm
BIGINTs, token counts, min-labels) — no floats anywhere. Integer
division only ever sees non-negative operands (Spark ``div`` truncates
toward zero, DuckDB ``//`` floors — they agree only for ≥0).

Scale design (100 TB corpus), per op in its docstring; the common
theme: no global sort, no driver materialization, shuffles only on
natural keys (bucket id, shingle, doc id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import (release_checkpoint, scoped_persist,
                        scoped_register)
from ..catalog import query_sql as Q
from ..operators.bounded import bounded_window
from ..catalog import table as T
from . import register
from .llm_text import (
    _DUCK_MINHASH_CTES,
    _DUCK_NGRAM_CTES,
    _DUCK_TOKS,
    _SPARK_TOKS,
    _duck_kgrams,
    _ppm,
    _qc_logit,
    _spark_kgrams,
)


# ---------------------------------------------------------------------------
# op_seq_pack — concatenate-and-split sequence packing
# ---------------------------------------------------------------------------

#: training sequence length (tokens). Fixture docs average ~54 tokens, so
#: L=128 packs ~2-3 docs per sequence and regularly splits one across a
#: boundary — both code paths exercised.
_PACK_L = 128
#: docs per offset bucket (stage-2 prefix runs over n/_PACK_B rows).
_PACK_B = 64

_PACK_SPANS = """
    SELECT doc_id, seq_id,
           CAST(greatest(s, seq_id * {L}) - s AS BIGINT) AS doc_tok_start,
           CAST(greatest(s, seq_id * {L}) - seq_id * {L} AS BIGINT)
             AS seq_tok_start,
           CAST(least(s + n, (seq_id + 1) * {L})
                - greatest(s, seq_id * {L}) AS BIGINT) AS n_toks
"""


@register(
    "op_seq_pack",
    oracle=f"""
    WITH d AS (SELECT doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n
               FROM documents),
    off AS (SELECT doc_id, n,
                   CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS s
            FROM d),
    spans AS (SELECT doc_id, n, s,
                     unnest(generate_series(s // {_PACK_L},
                                            (s + n - 1) // {_PACK_L}))
                       AS seq_id
              FROM off)
    {_PACK_SPANS.format(L=_PACK_L)}
    FROM spans
    """,
    tags=("llm", "pipeline"),
)
def op_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: documents are laid end to end in
    doc_id order and cut into fixed ``L``-token training sequences; a
    document crossing a cut is split across two sequences. Output is the
    packing manifest — one row per (document × sequence) overlap with
    the three offsets a batch writer needs. Every token lands in exactly
    one sequence slot (property-tested).

    Scale: the only global state is the exclusive prefix sum of token
    counts, computed as a k-level scan (`_bucket_bases`; depth picked per input
    by `_pack_levels` from Catalyst's lazy size estimate) — (1)
    per-bucket totals (one small shuffle on ``doc_id div {B}``), (2)
    recursive super-bucket scans shrinking the serial top window 64×
    per level (at depth 3, 10^12 docs leave ~4M rows in the one
    single-partition window; toy corpora stay at depth 1, paying zero
    extra stages), (3) per-bucket windows,
    partitioned and parallel, add the broadcast bucket bases. Span
    expansion is a JVM ``explode(sequence(...))`` — no Python, no
    O(corpus) window.
    """
    d = (T(spark, sf_dir, "documents")
         .select("doc_id",
                 F.expr(f"size({_SPARK_TOKS})").cast("long").alias("n")))
    return _pack_spans(d)


#: Row cap for the one single-partition window at the top of the
#: prefix-sum tree (~4M rows ≈ 64 MB — comfortably one task). Depth is
#: chosen per input so the top level stays under this: each extra level
#: divides it by B=64, so depth 2 covers ~17·10^9 docs and depth 3
#: ~10^12. The decision input is Catalyst's LAZY sizeInBytes estimate
#: (file statistics — no job runs), conservatively read at 8 bytes/row
#: (real rows are wider, so depth only ever over-provisions); the toy
#: scale therefore pays zero extra stages (measured: always-on depth 3
#: cost +0.5 s on `op_seq_pack` and +1.2 s on `op_pipeline_e2e` at
#: sf0.1 — pure fixed stage tax on metadata-sized tables). Correctness
#: is depth-invariant (test_bucket_bases_depth_invariant pins 3 live
#: levels == flat == driver-side scan), so a mis-estimate can only
#: shift the serial-window size, never the answer.
_PACK_FLAT_MAX = 1 << 22


def _pack_levels(d: DataFrame) -> int:
    """Scan depth for `_bucket_bases` from the input's lazy size
    estimate; falls back to 2 (safe for ~10^10 docs) when the plan has
    no statistics."""
    try:
        size = int(d._jdf.queryExecution().optimizedPlan().stats()
                    .sizeInBytes())
    except Exception:  # noqa: BLE001 — stats are best-effort
        return 2
    return _levels_for_size(size)


def _levels_for_size(size_bytes: int) -> int:
    """Threshold rule: smallest depth whose serial top window stays
    under `_PACK_FLAT_MAX` rows at ~8 bytes/row (capped at 4 ≈ 10^14+
    docs). Pure arithmetic — pinned directly in tests."""
    est_buckets = max(size_bytes // 8 // _PACK_B, 1)
    levels = 1
    while est_buckets > _PACK_FLAT_MAX and levels < 4:
        est_buckets //= _PACK_B
        levels += 1
    return levels


def _bucket_bases(totals: DataFrame, levels: int) -> DataFrame:
    """Exclusive prefix-sum base per bucket over (bkt, bn) total rows —
    the recursive k-level scan (round-4 verdict ask #8: the third level
    is now code, not prose, and stays fully lazy — no count() action,
    no checkpoint; depth comes from `_pack_levels`' row-count-threshold
    rule over the plan's size statistics).

    levels=1: one single-partition window over every bucket row.
    levels>1: group buckets into super-buckets of `_PACK_B`, recurse
    for the super-bucket bases (each level shrinks the serial top
    window by 64×), then add the within-super exclusive scan — a
    window PARTITIONED by super-bucket, ≤64 rows per partition, fully
    parallel. Every intermediate table is bucket-level metadata (64×
    smaller per level than the doc table), so the broadcast of the
    recursed bases is bounded by max_doc_id/B² rows at the widest.

    Correctness is depth-invariant (sum associativity); pinned by
    tests/test_llm_pipeline.py::test_bucket_bases_depth_invariant at a
    synthetic bucket count that exercises three live levels."""
    if levels <= 1:
        return (totals.withColumn(
                    "base", F.coalesce(
                        F.sum("bn").over(
                            bounded_window(
                                "bkt",
                                bound="3-level prefix-sum top: "
                                      "≤ |docs|/B² bucket rows"
                            ).rowsBetween(
                                Window.unboundedPreceding, -1)),
                        F.lit(0)))
                .select("bkt", "base"))
    sup = totals.withColumn("skt", F.expr(f"bkt div {_PACK_B}"))
    sup_tot = (sup.groupBy("skt").agg(F.sum("bn").alias("bn"))
                  .withColumnRenamed("skt", "bkt"))
    sup_bases = (_bucket_bases(sup_tot, levels - 1)
                 .withColumnRenamed("bkt", "skt")
                 .withColumnRenamed("base", "sbase"))
    w_in = (Window.partitionBy("skt").orderBy("bkt")
                  .rowsBetween(Window.unboundedPreceding, -1))
    return (sup.join(F.broadcast(sup_bases), "skt")
               .withColumn("base", F.col("sbase") + F.coalesce(
                   F.sum("bn").over(w_in), F.lit(0)))
               .select("bkt", "base"))


def _pack_spans(d: DataFrame) -> DataFrame:
    """The packing kernel over any (doc_id, n) table — k-level
    distributed prefix sum + span expansion (see `op_seq_pack` and
    `_bucket_bases`)."""
    levels = _pack_levels(d)
    d = d.withColumn("bkt", F.expr(f"doc_id div {_PACK_B}"))
    bases = _bucket_bases(d.groupBy("bkt").agg(F.sum("n").alias("bn")),
                          levels)
    off = (d.join(F.broadcast(bases), "bkt")
            .withColumn("s", F.col("base") + F.coalesce(
                F.sum("n").over(
                    Window.partitionBy("bkt").orderBy("doc_id")
                          .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0))))
    # n > 0 guard keeps the kernel total: DuckDB's generate_series emits
    # nothing for an empty doc, but Spark's sequence(s div L, (s-1) div L)
    # would emit a bogus DESCENDING 2-span grid. (Zero-token docs still
    # participate in the prefix sum above, contributing 0 — only the span
    # expansion skips them.)
    spans = off.filter(F.col("n") > 0).select(
        "doc_id", "n", "s",
        F.explode(F.expr(
            f"sequence(s div {_PACK_L}, (s + n - 1) div {_PACK_L})"))
         .alias("seq_id"))
    return spans.selectExpr(
        "doc_id", "seq_id",
        f"CAST(greatest(s, seq_id * {_PACK_L}) - s AS BIGINT)"
        f" AS doc_tok_start",
        f"CAST(greatest(s, seq_id * {_PACK_L}) - seq_id * {_PACK_L}"
        f" AS BIGINT) AS seq_tok_start",
        f"CAST(least(s + n, (seq_id + 1) * {_PACK_L})"
        f" - greatest(s, seq_id * {_PACK_L}) AS BIGINT) AS n_toks")


# ---------------------------------------------------------------------------
# op_doc_chunk — overlapping token-window chunking
# ---------------------------------------------------------------------------

#: chunk window / stride (tokens): 32-token chunks, 8-token overlap.
_CHUNK_W, _CHUNK_S = 32, 24


@register(
    "op_doc_chunk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    sized AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM tok),
    grid AS (SELECT doc_id, toks, n,
                    unnest(generate_series(0,
                        CASE WHEN n > {_CHUNK_W}
                             THEN (n - {_CHUNK_W} + {_CHUNK_S} - 1)
                                  // {_CHUNK_S}
                             ELSE 0 END)) AS chunk_id
             FROM sized)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(
               toks[1 + chunk_id * {_CHUNK_S}
                    : chunk_id * {_CHUNK_S} + {_CHUNK_W}], ' ')
             AS chunk_text,
           CAST(least(n - chunk_id * {_CHUNK_S}, {_CHUNK_W}) AS BIGINT)
             AS n_toks
    FROM grid
    """,
    tags=("llm", "pipeline"),
)
def op_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (RAG / long-context eval prep):
    each document yields ``ceil((n-W)/S)+1`` chunks of ``W`` tokens at
    stride ``S`` (last chunk short, never empty; a doc shorter than one
    window yields exactly one chunk). Chunk grid and slicing are pure
    JVM HOFs (``sequence`` → ``explode`` → ``slice``/``concat_ws``).

    Scale: embarrassingly parallel — one scan, no shuffle, no Python;
    output size is input × ~W/S expansion, streamed straight to the
    sink. The chunk grid never sees a negative operand, so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree."""
    d = (T(spark, sf_dir, "documents")
         .selectExpr("doc_id", f"{_SPARK_TOKS} AS toks")
         .selectExpr("doc_id", "toks",
                     "CAST(size(toks) AS BIGINT) AS n"))
    grid = d.select(
        "doc_id", "toks", "n",
        F.explode(F.expr(
            f"sequence(0, CASE WHEN n > {_CHUNK_W}"
            f" THEN (n - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S}"
            f" ELSE 0 END)")).alias("chunk_id"))
    return grid.selectExpr(
        "doc_id", "CAST(chunk_id AS BIGINT) AS chunk_id",
        # NULL text chunks NULL (null-in → null-out, the oracle's
        # array_to_string(NULL) behavior) — bare concat_ws would
        # render the NULL token array as '' and masquerade as an
        # empty-text doc (r12 null-seed fuzz)
        f"CASE WHEN toks IS NULL THEN NULL ELSE"
        f" concat_ws(' ', slice(toks, CAST(1 + chunk_id * {_CHUNK_S} AS INT),"
        f" {_CHUNK_W})) END AS chunk_text",
        f"CAST(least(n - chunk_id * {_CHUNK_S}, {_CHUNK_W}) AS BIGINT)"
        f" AS n_toks")


# ---------------------------------------------------------------------------
# op_quality_filter — composite Gopher/C4-style quality gate
# ---------------------------------------------------------------------------

#: rule thresholds (ppm where ratios): doc length in words, minimum
#: stopword ratio (real text contains function words), minimum
#: distinct-token ratio (repetition filter). On the fixture corpus the
#: three rules keep 358/442/219 of 500 docs respectively — each rule
#: does real work.
_QF_MIN_WORDS, _QF_MAX_WORDS = 20, 80
_QF_MIN_STOPWORD_PPM = 20_000
_QF_MIN_DISTINCT_PPM = 500_000

_QF_REASONS = """
    CASE WHEN n_words < {minw} OR n_words > {maxw} THEN 'len' END,
    CASE WHEN stopword_ppm < {minstop} THEN 'stopword' END,
    CASE WHEN distinct_ppm < {mindist} THEN 'repetition' END
""".format(minw=_QF_MIN_WORDS, maxw=_QF_MAX_WORDS,
           minstop=_QF_MIN_STOPWORD_PPM, mindist=_QF_MIN_DISTINCT_PPM)


@register(
    "op_quality_filter",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    stats AS (SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     {_ppm("len(list_filter(toks, t -> t IN ('a','the')))",
                           "len(toks)")} AS stopword_ppm,
                     {_ppm("len(list_distinct(toks))", "len(toks)")}
                       AS distinct_ppm
              FROM tok)
    SELECT doc_id, n_words, stopword_ppm, distinct_ppm,
           coalesce(array_to_string(list_filter([{_QF_REASONS}],
                                                x -> x IS NOT NULL), ','),
                    '') AS fail_reasons,
           CAST(len(list_filter([{_QF_REASONS}], x -> x IS NOT NULL)) = 0
                AS BOOLEAN) AS keep
    FROM stats
    """,
    tags=("llm", "pipeline"),
)
def op_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality gate in the Gopher/C4 style: word-count bounds,
    minimum stopword ratio, minimum distinct-token (repetition) ratio —
    every document annotated with its failure reasons (auditable
    filtering: a pipeline that only drops rows can't explain its yield).
    ``keep`` is the conjunction; downstream selects ``WHERE keep``.

    Scale: one scan, narrow per-row HOFs, no shuffle, no Python; rule
    evaluation is a constant-folded CASE chain inside whole-stage
    codegen. Ratios are ppm BIGINTs (exact cross-engine parity)."""
    stats = (T(spark, sf_dir, "documents")
             .selectExpr("doc_id", f"{_SPARK_TOKS} AS toks")
             .selectExpr(
                 "doc_id",
                 "CAST(size(toks) AS BIGINT) AS n_words",
                 _ppm("size(filter(toks, t -> t IN ('a','the')))",
                      "size(toks)") + " AS stopword_ppm",
                 _ppm("size(array_distinct(toks))", "size(toks)")
                 + " AS distinct_ppm"))
    return stats.selectExpr(
        "doc_id", "n_words", "stopword_ppm", "distinct_ppm",
        f"array_join(filter(array({_QF_REASONS}), x -> x IS NOT NULL), ',')"
        f" AS fail_reasons",
        f"CAST(size(filter(array({_QF_REASONS}), x -> x IS NOT NULL)) = 0"
        f" AS BOOLEAN) AS keep")


# ---------------------------------------------------------------------------
# dedup_clusters — connected components over the near-dup pair graph
# ---------------------------------------------------------------------------

#: fixpoint-round ceiling. Each round does min-label propagation over
#: the edges PLUS a pointer-doubling shortcut (label ← label(label), the
#: path-halving move of star-contraction connectivity), so labels reach
#: the component minimum in O(log diameter) rounds — 16 rounds cover
#: components ~2^16 hops deep, far beyond any real near-dup graph. The
#: loop exits as soon as no label changes; hitting the ceiling raises
#: (the op never silently returns fragmented clusters).
_CC_MAX_ROUNDS = 16


#: single definition lives in caching.py (the code-review r10 dedup);
#: kept importable under the old name — kcore and the release tests
#: reach it through this module.
_release_checkpoint = release_checkpoint


def _cc_labels(pairs: DataFrame) -> DataFrame:
    """Connected-component labels over an undirected (doc_a, doc_b) pair
    graph: every node maps to the MINIMUM doc_id of its component.

    The kernel behind `dedup_clusters` / `dedup_apply` /
    `op_pipeline_e2e` — the edge source is pluggable (n-gram Jaccard
    pairs, MinHash-LSH pairs, any near-dup detector's output).

    Scale (restructured r15 — guide §2.4 "remove shuffles outright" and
    §1.2 "the distributed algorithm" applied to the fixpoint):

    - **Round 0 is folded into initialization.** Labels start at
      ``min(doc_id, min(neighbor))`` via one groupBy over the
      symmetrized edge list — the first propagation costs one shuffle
      and ZERO joins (identity labels make neighbor labels just
      ``doc_b``), where the old identity-init spent a full
      join-propagation round discovering the same values.
    - **One candidate union per round, min-combined.** new_label(x) =
      min(label(x), min over neighbors y of label(y) [propagation],
      label(label(x)) [pointer-halving shortcut]) — expressed as
      labels ∪ prop-join ∪ shortcut-join → ``groupBy(doc_id).min``.
      Two joins + one aggregate per round where the old
      propagate-merge-shortcut chain ran three joins + one aggregate
      AND evaluated the merged subplan twice inside the checkpoint
      job. Convergence stays O(log d): the shortcut halves remaining
      pointer-path length each round.
    - **The edge table is shuffled ONCE, not once per round.** Edges
      are repartitioned on ``doc_b`` (the propagation join key) before
      caching; every round's propagation join then reshuffles only the
      node-scale label table to match. At 100 TB the edge list is the
      fact-scale side — this removes the only per-round fact-scale
      exchange. (AQE may still broadcast the label side when it is
      measured small — also edge-shuffle-free.)
    - **Checkpoint and convergence witness share one action.** Each
      round's label table is ``localCheckpoint(eager=False)`` and the
      witness aggregate (see below) materializes it — one action per
      round where eager-checkpoint-then-collect paid two. The
      checkpoint truncates the otherwise 2^rounds lineage (the
      1g-driver OOM class pinned by tests/test_driver_env.py) and the
      superseded round's blocks are released immediately, so a
      long-lived session holds exactly one label table plus the cached
      edge list, both freed on return.

    Convergence check WITHOUT a join: every node's label is
    non-increasing (all three candidate sources include the current
    label under min), so the label-sum strictly decreases until the
    fixpoint and is equal exactly at it; comparing against the previous
    round's scalar is a single map-reduce pass over the checkpointed
    label table (decimal sum: no silent int64 wrap at 10^10-scale
    ids)."""
    pairs = pairs.select("doc_a", "doc_b")
    sym = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b")))
    edges = sym.repartition(F.col("doc_b")).cache()

    def _witness(df: DataFrame):
        # Materializes the round's lazy checkpoint in the same action.
        return df.agg(F.sum(F.col("cluster_id").cast("decimal(38,0)"))
                      ).collect()[0][0]  # driver-ok: scalar convergence witness

    labels = (edges.groupBy("doc_a")
                   .agg(F.min("doc_b").alias("nb"))
                   .select(F.col("doc_a").alias("doc_id"),
                           F.least(F.col("doc_a"), F.col("nb"))
                            .alias("cluster_id"))
                   .localCheckpoint(eager=False))
    prev_sum = _witness(labels)
    try:
        for _ in range(_CC_MAX_ROUNDS):
            prop = (edges.join(labels, edges.doc_b == labels.doc_id)
                         .select(F.col("doc_a").alias("doc_id"),
                                 "cluster_id"))
            # shortcut lookup stays inside the component (labels are
            # always node ids of the same component, so m1.cluster_id
            # has a row in m2); inner join — a missing row just
            # contributes no candidate, and `labels` itself is in the
            # union, so the kernel stays total either way.
            m1, m2 = labels.alias("m1"), labels.alias("m2")
            shortcut = (m1.join(m2, F.col("m1.cluster_id")
                                == F.col("m2.doc_id"))
                          .select(F.col("m1.doc_id").alias("doc_id"),
                                  F.col("m2.cluster_id")
                                   .alias("cluster_id")))
            new_labels = (labels.unionByName(prop)
                                .unionByName(shortcut)
                                .groupBy("doc_id")
                                .agg(F.min("cluster_id")
                                      .alias("cluster_id"))
                                .localCheckpoint(eager=False))
            cur_sum = _witness(new_labels)
            _release_checkpoint(labels)
            labels = new_labels
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            raise RuntimeError(
                f"_cc_labels did not converge within {_CC_MAX_ROUNDS} "
                f"shortcutted min-label rounds — component diameter "
                f"exceeds ~2^{_CC_MAX_ROUNDS}; this graph is no "
                f"near-dup graph.")
    finally:
        edges.unpersist()
    # the FINAL label table's checkpoint blocks back the returned plan
    # — register them so release_all() can free what this function
    # cannot (the r9 verdict's persist-leak item)
    scoped_register(labels)
    return labels.select(F.col("doc_id").cast("long").alias("doc_id"),
                         F.col("cluster_id").cast("long")
                          .alias("cluster_id"))

#: near-dup pair edges: the dedup_ngram_jaccard candidate query (shared
#: VERBATIM from llm_text's `_DUCK_NGRAM_CTES` — clusters are defined
#: over the SAME DF-capped pair set the pairwise op reports, so the cap
#: fix lives in exactly one place for all four dependent keys).
_DUCK_PAIRS = f"""{_DUCK_NGRAM_CTES},
    pairs AS (SELECT doc_a, doc_b FROM ngram_pairs)
"""

#: same shape over the MinHash-LSH candidate pairs (`_DUCK_MINHASH_CTES`)
#: — the edge source `op_pipeline_e2e` runs on.
_DUCK_MH_PAIRS = f"""{_DUCK_MINHASH_CTES},
    pairs AS (SELECT doc_a, doc_b FROM mh_pairs)
"""


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_DUCK_PAIRS},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc_id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(min(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY doc_id
    """,
    tags=("llm", "dedup"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str,
                   pairs: DataFrame | None = None) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the
    near-dup pair graph (pairs alone can't drive keep-one-per-cluster —
    {A,B},{B,C} must collapse to ONE canonical doc, not two). Each
    clustered document maps to ``cluster_id`` = the minimum doc_id in
    its component; the retention rule is then ``keep doc_id ==
    cluster_id``. The edge source is pluggable (``pairs`` — any
    (doc_a, doc_b) near-dup output); the registered default is the
    DF-capped `dedup_ngram_jaccard` pairs, so cluster membership is
    consistent with the pairwise report by construction.

    Scale: see `_cc_labels` — shortcutted min-label propagation,
    O(log diameter) rounds, label table as the only iterated state.
    The oracle's recursive CTE computes the exact transitive closure,
    so parity cross-checks the fixpoint independently."""
    if pairs is None:
        from .llm_text import dedup_ngram_jaccard
        pairs = dedup_ngram_jaccard(spark, sf_dir)
    return _cc_labels(pairs)


# ---------------------------------------------------------------------------
# op_mixture_sample — per-stratum deterministic data-mixture sampling
# ---------------------------------------------------------------------------

#: per-language sampling rates in percent — the data-mixture knob of a
#: pre-training run (up-weight scarce high-value strata, down-weight the
#: dominant one). Unlisted strata get the default.
_MIX_RATES = {"en": 40, "de": 100, "fr": 100}
_MIX_DEFAULT = 75

_MIX_CASE = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_RATES.items()))
    + f" ELSE {_MIX_DEFAULT} END")


@register(
    "op_mixture_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 < {_MIX_CASE}
    """,
    tags=("llm", "pipeline"),
)
def op_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling: each stratum (language) keeps a
    deterministic hash-fraction of its documents at a per-stratum rate —
    the mixture-weights stage of a pre-training pipeline (down-weight
    the dominant language, keep scarce strata whole). Hash-mod (not
    seeded random) so the sample is reproducible across engines, runs
    and re-partitionings, samples whole documents, and evaluates as an
    ordinary pushable filter.

    Scale: one scan, zero shuffle, no Python; the rate lookup is a
    constant-folded CASE. This exact shape tunes trillion-token mixture
    weights — changing the mix is a literal edit, not a reshuffle."""
    return (T(spark, sf_dir, "documents")
            .selectExpr("doc_id", "lang", "source")
            .filter(F.expr(
                f"cast(conv(substring(md5(cast(doc_id as string)), 1, 8),"
                f" 16, 10) as bigint) % 100 < {_MIX_CASE}")))


# ---------------------------------------------------------------------------
# dedup_apply — retained corpus after cluster resolution
# ---------------------------------------------------------------------------

@register(
    "dedup_apply",
    oracle=f"""
    WITH RECURSIVE {_DUCK_PAIRS},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc_id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
    ),
    clusters AS (SELECT doc_id, min(r) AS cluster_id
                 FROM reach GROUP BY doc_id),
    drop_set AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_set)
    """,
    tags=("llm", "dedup"),
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's actual output: the retained corpus. Resolve
    near-dup clusters (`dedup_clusters`), keep one canonical document
    per cluster (the min-id root) plus every unclustered document —
    i.e. drop exactly the non-root cluster members via left-anti join.

    Scale: the drop set is |clustered docs − clusters| rows — tiny
    relative to the corpus (dup fraction × corpus) — so the anti-join
    broadcasts it against the one full corpus scan; one job end to end
    on top of the propagation rounds."""
    labels = dedup_clusters(spark, sf_dir)
    drop = labels.filter("doc_id != cluster_id").select("doc_id")
    return (T(spark, sf_dir, "documents")
            .select("doc_id", "lang", "source")
            .join(F.broadcast(drop), "doc_id", "left_anti"))


# ---------------------------------------------------------------------------
# op_decontaminate — benchmark n-gram contamination flagging
# ---------------------------------------------------------------------------

#: contamination shingle width: overlapping runs of ≥5 tokens count as
#: contamination (real pipelines use 8-13; the fixture's planted
#: near-dups share 5-token runs across sources, so 5 exercises hits).
_DECON_K = 5
#: the held-out "benchmark" slice of the fixture corpus.
_DECON_BENCH_SRC = "src0"


@register(
    "op_decontaminate",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
                    WHERE source <> '{_DECON_BENCH_SRC}'),
    bench AS (SELECT {_DUCK_TOKS} AS toks FROM documents
              WHERE source = '{_DECON_BENCH_SRC}'),
    bench_sh AS (SELECT DISTINCT unnest({_duck_kgrams(_DECON_K)}) AS s
                 FROM bench),
    corpus_sh AS (SELECT doc_id, unnest({_duck_kgrams(_DECON_K)}) AS s
                  FROM corpus)
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hit_ngrams
    FROM corpus_sh c JOIN bench_sh b ON c.s = b.s
    GROUP BY c.doc_id
    """,
    tags=("llm", "pipeline"),
)
def op_decontaminate(spark: SparkSession, sf_dir: str,
                     docs: DataFrame | None = None) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    {_DECON_K}-token run with a held-out benchmark set (here the
    '{_DECON_BENCH_SRC}' source slice stands in for the eval suite).
    Output is the contamination report — doc_id × distinct shared
    n-gram count; the pipeline drops (or audits) these before training.

    Scale: the benchmark shingle set is small and bounded (eval suites
    are MBs, not TBs) — it broadcasts; the corpus side is one scan +
    per-row shingling, the only shuffle the per-doc hit count (keyed on
    doc_id, uniform). The classic 13-gram Books/Wiki decontamination
    runs exactly this shape at 100 TB."""
    # ``docs`` (optional, columns doc_id + source + toks) lets
    # op_pipeline_e2e feed its one shared tokenized corpus here instead
    # of this stage re-scanning + re-splitting documents.text.
    # Standalone, the source filters sit below the tokenize projection
    # so they push to the parquet scan (pinned by
    # test_decontaminate_broadcasts_benchmark_side).
    if docs is None:
        docs = (T(spark, sf_dir, "documents")
                .selectExpr("doc_id", "source", f"{_SPARK_TOKS} AS toks"))
    corpus_sh = (docs.filter(F.col("source") != _DECON_BENCH_SRC)
                     .selectExpr("doc_id",
                                 f"explode({_spark_kgrams(_DECON_K)}) AS s"))
    bench_sh = (docs.filter(F.col("source") == _DECON_BENCH_SRC)
                    .selectExpr(f"explode({_spark_kgrams(_DECON_K)}) AS s")
                    .distinct())
    return (corpus_sh.join(F.broadcast(bench_sh), "s")
                     .groupBy("doc_id")
                     .agg(F.count("*").cast("long").alias("n_hit_ngrams")))


# ---------------------------------------------------------------------------
# op_pipeline_e2e — the whole training-data pipeline as one composition
# ---------------------------------------------------------------------------

#: e2e quality predicate over a `toks` column — the same three rules as
#: op_quality_filter, inlined as one conjunction (engine-agnostic pieces
#: formatted per engine below).
def _qf_pred(size_fn: str, filt: str, dist: str) -> str:
    return (
        f"{size_fn} >= {_QF_MIN_WORDS} AND {size_fn} <= {_QF_MAX_WORDS}"
        f" AND {_ppm(filt, size_fn)} >= {_QF_MIN_STOPWORD_PPM}"
        f" AND {_ppm(dist, size_fn)} >= {_QF_MIN_DISTINCT_PPM}")


_QF_PRED_SPARK = _qf_pred(
    "size(toks)", "size(filter(toks, t -> t IN ('a','the')))",
    "size(array_distinct(toks))")
_QF_PRED_DUCK = _qf_pred(
    "len(toks)", "len(list_filter(toks, t -> t IN ('a','the')))",
    "len(list_distinct(toks))")

_MIX_PRED_DUCK = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    f" % 100 < {_MIX_CASE}")


@register(
    "op_pipeline_e2e",
    oracle=f"""
    WITH RECURSIVE {_DUCK_MH_PAIRS},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc_id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
    ),
    drop_set AS (SELECT doc_id FROM reach GROUP BY doc_id
                 HAVING doc_id <> min(r)),
    corpus AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents
               WHERE source <> '{_DECON_BENCH_SRC}'),
    bench_sh AS (SELECT DISTINCT unnest({_duck_kgrams(_DECON_K)}) AS s
                 FROM (SELECT {_DUCK_TOKS} AS toks FROM documents
                       WHERE source = '{_DECON_BENCH_SRC}')),
    contaminated AS (SELECT DISTINCT c.doc_id
                     FROM (SELECT doc_id,
                                  unnest({_duck_kgrams(_DECON_K)}) AS s
                           FROM corpus) c
                     JOIN bench_sh b ON c.s = b.s),
    kept AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n
             FROM corpus
             WHERE {_QF_PRED_DUCK}
               AND doc_id NOT IN (SELECT doc_id FROM drop_set)
               AND doc_id NOT IN (SELECT doc_id FROM contaminated)
               AND {_MIX_PRED_DUCK}),
    off AS (SELECT doc_id, n,
                   CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS s
            FROM kept),
    spans AS (SELECT doc_id, n, s,
                     unnest(generate_series(s // {_PACK_L},
                                            (s + n - 1) // {_PACK_L}))
                       AS seq_id
              FROM off)
    {_PACK_SPANS.format(L=_PACK_L)}
    FROM spans
    """,
    tags=("llm", "pipeline"),
)
def op_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pre-training data pipeline, composed end to end from
    the registered stages and emitting the final packing manifest:

    1. corpus = every document outside the held-out benchmark slice;
    2. quality gate (`op_quality_filter` rules);
    3. near-dup removal: drop non-root cluster members — clusters via
       `_cc_labels` over **MinHash-LSH candidate pairs**
       (`op_minhash_dedup`), the 100 TB edge source: LSH bucket sizes
       are bounded by construction, where even a DF-capped shingle
       self-join still scales with corpus boilerplate. Computed
       globally, so a corpus doc that near-duplicates a benchmark doc
       is dropped too, which is the conservative call;
    4. n-gram decontamination vs the benchmark (`op_decontaminate`);
    5. data-mixture sampling (`op_mixture_sample` rates);
    6. GPT-style sequence packing of the survivors (`_pack_spans`).

    The value of the composition is what it proves: every stage is a
    DataFrame-in/DataFrame-out operator, so the full pipeline is ONE
    lazy plan from scan to manifest (the cluster labels being the one
    materialized fixpoint), Catalyst sees across stage boundaries
    (filters fold into the scans), and one oracle hash checks the
    entire flow — the same property a production run needs to re-pack a
    trillion tokens reproducibly.

    Scale: the union of the stages' own postures — no new shuffles are
    introduced by composing; the drop/contaminated sets ride broadcast
    anti-joins over the one corpus scan."""
    from ..caching import scoped_persist
    from .llm_text import op_minhash_dedup

    # ONE tokenized corpus feeds every stage (r15, guide §8.4): the
    # quality gate, the MinHash shingling and the decontamination
    # k-grams each need (doc_id, toks) — unshared, the composition
    # scanned + split documents.text three times. The persisted frame
    # is doc-grain, round-robin-spread across cores up front (the
    # corpus lands as one file = one scan task, and everything
    # downstream is CPU-bound), MEMORY_AND_DISK, released by the
    # caller via release_all().
    tok = scoped_persist(
        T(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .selectExpr("doc_id", "lang", "source", f"{_SPARK_TOKS} AS toks"))
    quality_ok = (tok.filter(F.col("source") != _DECON_BENCH_SRC)
                     .select("doc_id", "lang", "toks")
                     .filter(F.expr(_QF_PRED_SPARK)))
    drop = (_cc_labels(op_minhash_dedup(spark, sf_dir,
                                        docs=tok.select("doc_id", "toks")))
            .filter("doc_id != cluster_id").select("doc_id"))
    contaminated = op_decontaminate(spark, sf_dir, docs=tok) \
        .select("doc_id")
    kept = (quality_ok
            .join(F.broadcast(drop), "doc_id", "left_anti")
            .join(F.broadcast(contaminated), "doc_id", "left_anti")
            .filter(F.expr(
                f"cast(conv(substring(md5(cast(doc_id as string)), 1, 8),"
                f" 16, 10) as bigint) % 100 < {_MIX_CASE}"))
            .select("doc_id",
                    F.expr("CAST(size(toks) AS BIGINT)").alias("n")))
    return _pack_spans(kept)


# ---------------------------------------------------------------------------
# op_pack_segments — per-sequence segment manifest (attention-mask input)
# ---------------------------------------------------------------------------

@register(
    "op_pack_segments",
    oracle=f"""
    WITH d AS (SELECT doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n
               FROM documents),
    off AS (SELECT doc_id, n,
                   CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS s
            FROM d),
    spans AS (SELECT doc_id, n, s,
                     unnest(generate_series(s // {_PACK_L},
                                            (s + n - 1) // {_PACK_L}))
                       AS seq_id
              FROM off WHERE n > 0),
    manifest AS ({_PACK_SPANS.format(L=_PACK_L)} FROM spans)
    SELECT seq_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(n_toks) AS BIGINT) AS n_toks,
           string_agg(doc_id || ':' || seq_tok_start || ':' || n_toks,
                      ';' ORDER BY seq_tok_start) AS segments
    FROM manifest GROUP BY seq_id
    """,
    tags=("llm", "pipeline"),
)
def op_pack_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence segment manifest over the `op_seq_pack` packing: for
    every training sequence, the ordered ``doc:start:len`` segment list
    — exactly what the batch writer consumes to build block-diagonal
    attention masks and cross-document loss masks (a packed sequence
    must not attend across document boundaries; the mask needs the
    segment offsets, not just the spans).

    Scale: one `groupBy(seq_id)` over the packing manifest — uniform
    BIGINT key (sequences are fixed {_PACK_L}-token slots), map-side
    partial aggregation, segments-per-sequence bounded by
    L/min_doc_tokens. Serialization to a sorted string is the
    engine-portable array representation (registry determinism rule)."""
    spans = op_seq_pack(spark, sf_dir)
    return (spans
            .groupBy("seq_id")
            .agg(F.count("*").cast("long").alias("n_segments"),
                 F.sum("n_toks").cast("long").alias("n_toks"),
                 F.expr(
                     "array_join(transform("
                     " array_sort(collect_list(struct("
                     "   seq_tok_start, doc_id, n_toks))),"
                     " x -> concat(x.doc_id, ':', x.seq_tok_start, ':',"
                     "             x.n_toks)), ';')")
                  .alias("segments")))


# ---------------------------------------------------------------------------
# op_ngram_stats — shingle document-frequency distribution (cap observability)
# ---------------------------------------------------------------------------

#: report size: the top slice by document frequency is where boilerplate
#: lives — the observability input for choosing `_NGRAM_DF_CAP`.
_NGRAM_STATS_TOPK = 100


@register(
    "op_ngram_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest({_duck_kgrams(3)}) AS s FROM tok),
    df AS (SELECT s, CAST(count(*) AS BIGINT) AS doc_freq FROM sh
           GROUP BY s)
    SELECT s, doc_freq FROM df
    ORDER BY doc_freq DESC, s
    LIMIT {_NGRAM_STATS_TOPK}
    """,
    tags=("llm", "pipeline"),
)
def op_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle document-frequency report: the top-{_NGRAM_STATS_TOPK}
    3-gram shingles by document frequency — the observability surface
    for the dedup family's hot-shingle cap (`_NGRAM_DF_CAP`): run this
    on a new corpus BEFORE near-dup detection to see where the
    boilerplate mass sits and whether the cap needs moving.

    Scale: explode → groupBy(shingle) with map-side partial counts
    (the hottest shingle costs one combiner row per mapper, not a
    shuffle bucket of raw rows), then a global top-k
    (TakeOrderedAndProject — never a full sort)."""
    d = (T(spark, sf_dir, "documents")
         .withColumn("toks", F.expr(_SPARK_TOKS)))
    sh = d.select("doc_id", F.explode(F.expr(_spark_kgrams(3))).alias("s"))
    return (sh.groupBy("s")
              .agg(F.count("*").cast("long").alias("doc_freq"))
              .orderBy(F.col("doc_freq").desc(), "s")
              .limit(_NGRAM_STATS_TOPK))


# ---------------------------------------------------------------------------
# op_dup_report — duplicate-rate report (cluster-size histogram)
# ---------------------------------------------------------------------------

@register(
    "op_dup_report",
    oracle=f"""
    WITH RECURSIVE {_DUCK_PAIRS},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc_id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.doc_id = e.b
    ),
    labels AS (SELECT doc_id, min(r) AS cluster_id
               FROM reach GROUP BY doc_id),
    full_labels AS (
        SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
    sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
              FROM full_labels GROUP BY cluster_id)
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    tags=("llm", "dedup"),
)
def op_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup stage's yield report: cluster-size histogram over the
    WHOLE corpus — every unclustered document counts as a size-1
    cluster, so duplicate rate falls straight out
    (1 − Σ n_clusters / Σ n_docs) and a corpus owner can see whether
    near-dups are pairwise noise or boilerplate families before
    committing to a dedup pass.

    Scale: cluster labels from the fixpoint kernel (`_cc_labels`);
    singleton fill-in is one left join of the corpus id column against
    the (tiny) label table — broadcast; the two aggregations are
    uniform-key groupBys whose outputs are histogram-sized."""
    labels = dedup_clusters(spark, sf_dir)
    full = (T(spark, sf_dir, "documents").select("doc_id")
            .join(F.broadcast(labels), "doc_id", "left")
            .withColumn("cluster_id",
                        F.coalesce("cluster_id", "doc_id")))
    sizes = (full.groupBy("cluster_id")
                 .agg(F.count("*").cast("long").alias("cluster_size")))
    return (sizes.groupBy("cluster_size")
                 .agg(F.count("*").cast("long").alias("n_clusters"))
                 .select("cluster_size", "n_clusters",
                         (F.col("cluster_size") * F.col("n_clusters"))
                         .cast("long").alias("n_docs")))


# ---------------------------------------------------------------------------
# op_stratified_split — deterministic train/val/test assignment
# ---------------------------------------------------------------------------

#: split fractions in percent (train gets the remainder). Assignment is
#: hash-mod on doc_id — reproducible across engines, runs and
#: repartitionings, and INDEPENDENT of the mixture-sampling hash (a
#: different salt), so split membership does not correlate with
#: sampling survival.
_SPLIT_VAL_PCT, _SPLIT_TEST_PCT = 5, 5
_SPLIT_SALT = "split"

_SPLIT_CASE = f"""
    CASE WHEN h < {_SPLIT_TEST_PCT} THEN 'test'
         WHEN h < {_SPLIT_TEST_PCT + _SPLIT_VAL_PCT} THEN 'val'
         ELSE 'train' END
"""


@register(
    "op_stratified_split",
    oracle=f"""
    WITH h AS (SELECT doc_id, lang,
                      CAST(('0x' || substr(md5('{_SPLIT_SALT}' ||
                           CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 100 AS h
               FROM documents)
    SELECT lang, {_SPLIT_CASE} AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM h GROUP BY lang, {_SPLIT_CASE}
    """,
    tags=("llm", "pipeline"),
)
def op_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split report: every document is
    assigned a split by salted hash-mod on its id ({_SPLIT_TEST_PCT}%
    test, {_SPLIT_VAL_PCT}% val, remainder train), reported per
    (language × split) so stratum balance is auditable — the
    holdout-assignment stage of a pre-training run. Hash-mod (not
    seeded random) means the split survives re-partitioning, re-runs
    and engine changes, and a document can never migrate between train
    and test.

    Scale: one scan, a constant-folded hash expression, one
    histogram-sized groupBy — zero Python, zero skew (hash keys are
    uniform)."""
    h = (T(spark, sf_dir, "documents")
         .selectExpr(
             "doc_id", "lang",
             f"cast(conv(substring(md5(concat('{_SPLIT_SALT}',"
             f" cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 100"
             f" AS h"))
    return (h.selectExpr("lang", f"{_SPLIT_CASE} AS split", "doc_id")
             .groupBy("lang", "split")
             .agg(F.count("*").cast("long").alias("n_docs"),
                  F.min("doc_id").cast("long").alias("min_doc_id")))


# ---------------------------------------------------------------------------
# op_corpus_shuffle — deterministic shard + shuffle for training order
# ---------------------------------------------------------------------------

_SHUF_SHARDS = 8
_SHUF_SALT = "shuf42"


@register(
    "op_corpus_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || '|{_SHUF_SALT}') AS hk
      FROM documents
    ),
    s AS (
      SELECT doc_id, hk,
             CAST(('0x' || substring(hk, 1, 8)) AS BIGINT)
               % {_SHUF_SHARDS} AS shard
      FROM h
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY hk, doc_id) AS BIGINT)
             AS pos_in_shard
    FROM s
    ORDER BY shard, pos_in_shard
    """,
    tags=("llm", "pipeline"),
)
def op_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding of the training corpus:
    every document gets a shard (salted-hash mod) and a position inside
    its shard (ordered by the same hash) — the reproducible
    input-order randomization a pre-training run needs. Seeded `rand()`
    would NOT survive re-partitioning or engine differences; the salted
    md5 permutation is identical everywhere, and changing the epoch
    order is just a salt edit.

    Scale: the shard assignment is a pushable projection; the only
    shuffle is one exchange on the shard key, and each shard's
    row_number sorts ~corpus/S rows — S is chosen so a shard fits a
    task (for 10^10 docs, S ~ 10^4, not this fixture's 8). Writing
    `partitionBy(shard)` + sorted-within gives the downstream loader
    sequential reads in shuffle order for free."""
    from pyspark.sql.window import Window
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"md5(concat(CAST(doc_id AS STRING), '|{_SHUF_SALT}'))")
         .alias("hk"))
    s = d.withColumn(
        "shard",
        F.expr(f"cast(conv(substring(hk, 1, 8), 16, 10) as bigint)"
               f" % {_SHUF_SHARDS}"))
    w = Window.partitionBy("shard").orderBy("hk", "doc_id")
    return (s.select("doc_id", F.col("shard").cast("long").alias("shard"),
                     F.row_number().over(w).cast("long")
                      .alias("pos_in_shard"))
            .orderBy("shard", "pos_in_shard"))


# ---------------------------------------------------------------------------
# op_packing_efficiency — fill/waste audit of the packing manifest
# ---------------------------------------------------------------------------

@register(
    "op_packing_efficiency",
    oracle=f"""
    WITH d AS (SELECT doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n
               FROM documents),
    off AS (SELECT doc_id, n,
                   CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS s
            FROM d),
    spans AS (SELECT doc_id, n, s,
                     unnest(generate_series(s // {_PACK_L},
                                            (s + n - 1) // {_PACK_L}))
                       AS seq_id
              FROM off WHERE n > 0),
    m AS ({_PACK_SPANS.format(L=_PACK_L)} FROM spans),
    per_seq AS (SELECT seq_id, CAST(sum(n_toks) AS BIGINT) AS fill,
                       CAST(count(*) AS BIGINT) AS n_docs
                FROM m GROUP BY seq_id)
    SELECT CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(sum(CASE WHEN fill = {_PACK_L} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_full_seqs,
           CAST(sum({_PACK_L} - fill) AS BIGINT) AS pad_tokens,
           CAST(floor(1000000.0 * sum(fill) /
                      (count(*) * {_PACK_L})) AS BIGINT) AS fill_ppm,
           CAST(max(n_docs) AS BIGINT) AS max_docs_per_seq
    FROM per_seq
    """,
    tags=("llm", "pipeline"),
)
def op_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit over the `op_seq_pack` manifest: how
    many training sequences the corpus fills, how many are perfectly
    full, total pad tokens, fill ratio (ppm), and the worst-case
    document fan-in per sequence — the numbers that decide whether the
    packer is worth its shuffle vs pad-to-longest (typical answer:
    concatenate-and-split leaves exactly ONE partially-filled sequence,
    the trailing one; this op proves it on the actual manifest).

    Scale: reuses `_pack_spans`' k-level prefix-sum plan and adds one
    two-phase aggregate on seq_id (uniform key) plus a single-row
    final fold — audit cost is a rounding error on the pack itself.
    """
    d = (T(spark, sf_dir, "documents")
         .select("doc_id",
                 F.expr(f"size({_SPARK_TOKS})").cast("long").alias("n")))
    per_seq = (_pack_spans(d)
               .groupBy("seq_id")
               .agg(F.sum("n_toks").cast("long").alias("fill"),
                    F.count("*").cast("long").alias("n_docs")))
    L = _PACK_L
    return per_seq.agg(
        F.count("*").cast("long").alias("n_seqs"),
        F.sum(F.when(F.col("fill") == L, 1).otherwise(0)).cast("long")
         .alias("n_full_seqs"),
        F.sum(F.lit(L) - F.col("fill")).cast("long").alias("pad_tokens"),
        F.expr(f"CAST(floor(1000000.0 * sum(fill) / (count(*) * {L}))"
               " AS BIGINT)").alias("fill_ppm"),
        F.max("n_docs").cast("long").alias("max_docs_per_seq"))


# ---------------------------------------------------------------------------
# op_curriculum_order — quality-decile curriculum buckets
# ---------------------------------------------------------------------------

@register(
    "op_curriculum_order",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_words,
             {_ppm("len(replace(text, ' ', ''))", f"len({_DUCK_TOKS})")}
               AS awl,
             {_ppm(f"len(list_filter({_DUCK_TOKS}, t -> t IN ('a','the')))",
                   f"len({_DUCK_TOKS})")} AS stop,
             {_ppm(f"len(list_distinct({_DUCK_TOKS}))",
                   f"len({_DUCK_TOKS})")} AS dist
      FROM documents),
    s AS (SELECT doc_id,
                 {_qc_logit('n_words', 'awl', 'stop', 'dist')} AS logit_q
          FROM f),
    d AS (SELECT doc_id, logit_q,
                 -- NULLS FIRST: a NULL-text doc has a NULL logit, and
                 -- the engines' ASC defaults DISAGREE on where nulls
                 -- sort (Spark first, DuckDB last) — every decile
                 -- boundary shifts without the explicit placement
                 -- (r12 null-seed fuzz); Spark's distributed_ntile
                 -- sorts nulls first natively
                 CAST(ntile(10) OVER (ORDER BY logit_q NULLS FIRST,
                                      doc_id)
                      AS BIGINT) AS decile
          FROM s)
    SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(logit_q) AS BIGINT) AS min_logit,
           CAST(max(logit_q) AS BIGINT) AS max_logit
    FROM d GROUP BY decile ORDER BY decile
    """,
    tags=("llm", "pipeline"),
)
def op_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum buckets: rank the corpus by the integer quality logit
    (`op_quality_classifier`'s fixed linear model) and cut exact
    deciles — the ordering a quality-ascending curriculum or an
    anneal-on-high-quality phase consumes. Reports per-decile
    population and logit range (the decile → shard mapping is then a
    filter per training phase).

    Scale: deciles come from `operators.distributed_ntile` (the
    range-partitioned two-level offset rank also under
    `op_rfm_segments`) — no unpartitioned window touches the corpus;
    the oracle's single-window ntile states the same semantics. The
    tie-break on doc_id makes the order total, so decile boundaries
    are bit-deterministic on both engines.
    """
    from ..operators import distributed_ntile

    d = T(spark, sf_dir, "documents").withColumn("toks",
                                                 F.expr(_SPARK_TOKS))
    feats = d.select(
        "doc_id",
        F.expr("CAST(size(toks) AS BIGINT)").alias("n_words"),
        F.expr(_ppm("length(replace(text, ' ', ''))", "size(toks)"))
         .alias("awl"),
        F.expr(_ppm("size(filter(toks, t -> t IN ('a','the')))",
                    "size(toks)")).alias("stop"),
        F.expr(_ppm("size(array_distinct(toks))", "size(toks)"))
         .alias("dist"))
    scored = feats.select(
        "doc_id",
        F.expr(_qc_logit("n_words", "awl", "stop", "dist"))
         .alias("logit_q"))
    tiled = distributed_ntile(scored, ["logit_q", "doc_id"], 10, "decile")
    return (tiled.groupBy(F.col("decile").cast("long").alias("decile"))
                 .agg(F.count("*").cast("long").alias("n_docs"),
                      F.min("logit_q").cast("long").alias("min_logit"),
                      F.max("logit_q").cast("long").alias("max_logit"))
                 .orderBy("decile"))


# ---------------------------------------------------------------------------
# op_domain_token_cap — per-source token budget enforcement
# ---------------------------------------------------------------------------

_DOMAIN_CAP_TOKENS = 1000

_DOMAIN_CAP_DUCK_SQL = f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len({_DUCK_TOKS}) AS BIGINT) AS toks
      FROM documents),
    c AS (
      SELECT doc_id, source, toks,
             CAST(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM d)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cum <= {_DOMAIN_CAP_TOKENS}
                    THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(sum(CASE WHEN cum <= {_DOMAIN_CAP_TOKENS}
                    THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens,
           CAST(sum(CASE WHEN cum > {_DOMAIN_CAP_TOKENS}
                    THEN 1 ELSE 0 END) AS BIGINT) AS dropped_docs
    FROM c GROUP BY source ORDER BY source
"""


@register("op_domain_token_cap", oracle=_DOMAIN_CAP_DUCK_SQL,
          tags=("llm", "pipeline"))
def op_domain_token_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget enforcement: each source contributes
    documents in doc_id (ingest) order until its running token total
    passes the cap; the rest are dropped — the mixture-capping step
    that stops one crawl domain from dominating a training mix (the
    per-domain quota in C4/Dolma-style pipelines), reported as a
    per-source audit (docs kept / tokens kept / docs dropped).

    Determinism: the keep rule is a prefix-sum threshold over the
    total (source, doc_id) order — exact BIGINT token counts, no
    sampling; identical window semantics on both engines.

    Scale: ONE source-keyed shuffle serves both the cumulative-sum
    window and the final per-source aggregate (same partitioning);
    state is O(1) per row. A skew note, since domains are Zipf: the
    window is sequential per source, so one mega-domain serializes in
    a single task — but the cap itself bounds useful work (everything
    past the budget only increments counters), and a two-level refine
    (per-shard partial sums + offset, `op_seq_pack`'s adaptive prefix
    sum) is the landed pattern to lift if a real corpus needs it."""
    d = (T(spark, sf_dir, "documents")
         .select("doc_id", "source",
                 F.expr(f"CAST(size({_SPARK_TOKS}) AS BIGINT)")
                 .alias("toks")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = d.withColumn("cum", F.sum("toks").over(w).cast("bigint"))
    kept = F.col("cum") <= _DOMAIN_CAP_TOKENS
    return (c.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum(F.when(kept, 1).otherwise(0)).cast("bigint")
                 .alias("kept_docs"),
                 F.sum(F.when(kept, F.col("toks")).otherwise(0))
                 .cast("bigint").alias("kept_tokens"),
                 F.sum(F.when(~kept, 1).otherwise(0)).cast("bigint")
                 .alias("dropped_docs"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# op_coverage_curve — cumulative corpus share by source
# ---------------------------------------------------------------------------

_COVERAGE_DUCK_SQL = f"""
    WITH s AS (
      SELECT source,
             CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS toks
      FROM documents GROUP BY source),
    r AS (
      SELECT source, toks,
             row_number() OVER (ORDER BY toks DESC, source) AS rnk,
             CAST(sum(toks) OVER (ORDER BY toks DESC, source
                                  ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM s),
    t AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM s)
    SELECT CAST(rnk AS BIGINT) AS rnk, source, toks,
           {_ppm("cum", "(SELECT total FROM t)")} AS cum_ppm
    FROM r ORDER BY rnk
"""


@register("op_coverage_curve", oracle=_COVERAGE_DUCK_SQL,
          tags=("llm", "pipeline"))
def op_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus coverage curve: sources ranked by total token
    contribution with the cumulative floor-ppm share — the how-many-
    domains-make-90% diagnostic read before choosing mixture weights
    (a corpus where 3 sources are 95% of tokens needs capping, one
    with a flat curve needs upsampling).

    Determinism: exact BIGINT token sums; rank and running sum share
    one total (toks DESC, source) order; one floor-ppm divide against
    the collected total.

    Scale: the fact collapses to a |sources|-row summary in one
    two-phase aggregate; the rank/cumsum window runs over that
    SUMMARY (unpartitioned by necessity — a global curve needs a
    global order — but bounded by |sources|, the repo's
    metadata-sized-window convention), and the corpus total is
    collected off the summary as one literal, never a second fact
    pass."""
    from pyspark.sql import Window as W

    s = (T(spark, sf_dir, "documents")
         .groupBy("source")
         .agg(F.expr(f"CAST(sum(size({_SPARK_TOKS})) AS BIGINT)")
              .alias("toks")))
    s = scoped_persist(s)  # |sources|-row summary feeds the total
    # collect AND the returned window plan — persist so the fact
    # aggregates once; scoped so callers can release post-materialize
    total = s.agg(F.sum("toks").cast("bigint")).collect()[0][0]  # driver-ok: 1-row sum off the persisted summary
    # empty input: the summary has no rows, so the divisor is never
    # evaluated — any nonzero literal keeps the plan total
    total = total if total is not None else 1
    order = [F.desc("toks"), F.asc("source")]
    wr = bounded_window(*order,
                        bound="|sources|-row token summary, never fact")
    wc = wr.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (s.select(
        F.row_number().over(wr).cast("bigint").alias("rnk"),
        "source", "toks",
        F.expr(_ppm(f"sum(toks) OVER (ORDER BY toks DESC, source "
                    f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
                    str(total))).alias("cum_ppm"))
        .orderBy("rnk"))


# ---------------------------------------------------------------------------
# op_class_balance_weights — inverse-frequency training weights
# ---------------------------------------------------------------------------

_CLASS_WEIGHT_DUCK_SQL = """
    WITH c AS (
      SELECT CAST(label AS BIGINT) AS label,
             CAST(count(*) AS BIGINT) AS n_label
      FROM embeddings GROUP BY label),
    t AS (SELECT CAST(sum(n_label) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS k FROM c)
    SELECT label, n_label,
           CAST(floor(1000000.0 * (SELECT total FROM t)
                      / ((SELECT k FROM t) * n_label)) AS BIGINT)
             AS weight_ppm
    FROM c ORDER BY label
"""


@register("op_class_balance_weights", oracle=_CLASS_WEIGHT_DUCK_SQL,
          tags=("llm", "pipeline"))
def op_class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights in floor-ppm — n/(k·n_c), the
    sklearn `class_weight="balanced"` formula: the loss-reweighting
    table a trainer consumes against a skewed label column (weight 1.0
    = 10^6 ppm when perfectly balanced, rarer classes proportionally
    above).

    Determinism: exact BIGINT counts; one floor-ppm divide with the
    (total, k) scalars folded in as literals collected off the
    |labels|-row aggregate — same collect-tiny-dims idiom as
    op_churn_labels, so no BroadcastNestedLoopJoin from a 1-row
    cross join.

    Scale: one two-phase aggregate to |labels| rows; everything after
    is label-table-sized. The weight table re-enters downstream
    training joins as a broadcast by construction."""
    c = (T(spark, sf_dir, "embeddings")
         .groupBy(F.col("label").cast("bigint").alias("label"))
         .agg(F.count("*").cast("bigint").alias("n_label")))
    c = scoped_persist(c)  # |labels|-row aggregate feeds the collect
    # AND the return; scoped so callers can release post-materialize
    rows = c.collect()  # driver-ok: |labels| rows (<= alphabet size)
    total = sum(r.n_label for r in rows)
    k = len(rows)
    return (c.withColumn(
        "weight_ppm",
        F.expr(f"CAST(floor(1000000.0 * {total}L / ({k}L * n_label))"
               " AS BIGINT)"))
        .orderBy("label"))


# ---------------------------------------------------------------------------
# Docstring constant rendering — plain-string docstrings can't interpolate
# (an f-string would not be a docstring at all; __doc__ None), so module
# constants are substituted post-definition. QuerySpec.doc resolves
# dynamically, and test_no_unrendered_placeholders_in_docstrings guards the
# class mechanically.
# ---------------------------------------------------------------------------
for _fn, _subs in (
    (op_decontaminate, {"{_DECON_K}": _DECON_K,
                        "{_DECON_BENCH_SRC}": _DECON_BENCH_SRC}),
    (op_pack_segments, {"{_PACK_L}": _PACK_L}),
    (op_ngram_stats, {"{_NGRAM_STATS_TOPK}": _NGRAM_STATS_TOPK}),
    (op_stratified_split, {"{_SPLIT_TEST_PCT}": _SPLIT_TEST_PCT,
                           "{_SPLIT_VAL_PCT}": _SPLIT_VAL_PCT}),
):
    for _ph, _val in _subs.items():
        _fn.__doc__ = _fn.__doc__.replace(_ph, str(_val))
del _fn, _subs, _ph, _val


# ---------------------------------------------------------------------------
# op_token_budget_split — per-source token-budget training cut
# ---------------------------------------------------------------------------

#: carry-in bucket: the first hex digit of the doc's md5 order key. 16
#: buckets whose ascending order IS the hash order's major digit, so
#: bucket-local cumsums + a carry-in prefix over the 16-row-per-source
#: bucket aggregate reproduce the global running sum exactly.
_BUDGET_SALT = "budget-v1"

_BUDGET_TAIL = """
    sel AS (
      SELECT c.source, c.toks, c.cs, t.total
      FROM cum c JOIN tot t ON t.source = c.source),
    agg AS (
      SELECT source, max(total) AS total,
             CAST(sum(CASE WHEN 2 * cs <= total THEN 1 ELSE 0 END)
               AS BIGINT) AS n_selected,
             CAST(sum(CASE WHEN 2 * cs <= total THEN toks ELSE 0 END)
               AS BIGINT) AS selected_toks
      FROM sel GROUP BY source)
    SELECT source, CAST(total AS BIGINT) AS total_toks,
           n_selected, selected_toks,
           CAST(CASE WHEN total = 0 THEN 0
                     ELSE floor(2000000.0 * selected_toks / total)
                END AS BIGINT) AS budget_fill_ppm
    FROM agg ORDER BY source
"""

_BUDGET_SPARK_SQL = f"""
    WITH d AS (
      SELECT source, doc_id,
             CAST(size({{SPARK_TOKS}}) AS BIGINT) AS toks,
             md5(concat(CAST(doc_id AS STRING), '|{_BUDGET_SALT}')) AS hk
      FROM documents),
    d2 AS (
      SELECT *, cast(conv(substring(hk, 1, 1), 16, 10) as bigint) AS bkt
      FROM d),
    tot AS (SELECT source, CAST(sum(toks) AS BIGINT) AS total
            FROM d GROUP BY source),
    loc AS (
      SELECT source, bkt, toks,
             sum(toks) OVER (PARTITION BY source, bkt ORDER BY hk, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cs_loc,
             count(toks) OVER (PARTITION BY source, bkt ORDER BY hk, doc_id
                               ROWS UNBOUNDED PRECEDING) AS nn_loc
      FROM d2),
    ba AS (SELECT source, bkt, sum(toks) AS bsum, count(toks) AS bnn
           FROM d2 GROUP BY source, bkt),
    cr AS (
      SELECT source, bkt,
             coalesce(sum(bsum) OVER (PARTITION BY source ORDER BY bkt
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING),
                      CAST(0 AS BIGINT)) AS carry,
             coalesce(sum(bnn) OVER (PARTITION BY source ORDER BY bkt
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING),
                      CAST(0 AS BIGINT)) AS nn_carry
      FROM ba),
    cum AS (
      -- running-sum NULL semantics, decomposed: SQL's windowed sum is
      -- NULL iff the inclusive prefix holds zero non-NULL values, else
      -- the sum of its non-NULLs. cs_loc + carry alone loses this when
      -- a NULL-toks row HEADS its bucket (NULL + carry = NULL) while
      -- the single-window oracle gives that row the preceding buckets'
      -- sum — the r13 seed-23 fuzz find (one NULL-text doc flipping
      -- n_selected by 1).
      SELECT l.source, l.toks,
             CASE WHEN cr.nn_carry + l.nn_loc = 0 THEN CAST(NULL AS BIGINT)
                  ELSE coalesce(l.cs_loc, CAST(0 AS BIGINT)) + cr.carry
             END AS cs
      FROM loc l JOIN cr ON cr.source = l.source AND cr.bkt = l.bkt),
    {_BUDGET_TAIL}
"""

_BUDGET_DUCK_SQL = f"""
    WITH d AS (
      SELECT source, doc_id, CAST(len({{DUCK_TOKS}}) AS BIGINT) AS toks,
             md5(CAST(doc_id AS VARCHAR) || '|{_BUDGET_SALT}') AS hk
      FROM documents),
    tot AS (SELECT source, CAST(sum(toks) AS BIGINT) AS total
            FROM d GROUP BY source),
    cum AS (
      SELECT source, toks,
             sum(toks) OVER (PARTITION BY source ORDER BY hk, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cs
      FROM d),
    {_BUDGET_TAIL}
"""


@register(
    "op_token_budget_split",
    oracle=_BUDGET_DUCK_SQL.replace("{DUCK_TOKS}", _DUCK_TOKS),
    tags=("llm",),
)
def op_token_budget_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget training cut: per source, select documents in a
    deterministic md5 order until HALF the source's tokens are taken
    (doc selected iff its running token total ≤ budget, i.e.
    2·cumsum ≤ total — exact integer cross-multiplication, no
    floor(total/2) rounding asymmetry), reporting docs/tokens selected
    and the fill rate against the budget in floor-ppm. This is the
    mixture-building primitive `op_mixture_sample` rate-samples and
    `op_domain_token_cap` caps — here the constraint is a TOKEN budget
    (what the training run actually pays for), and the hash order
    makes the cut reproducible and extendable (raising the budget only
    ADDS documents — the property incremental corpus builds need).

    Determinism: the md5 permutation is engine-identical (the
    corpus-shuffle idiom), cumsums are exact BIGINTs over a total
    (hk, doc_id) order, the fill rate is one floor-ppm divide
    (2000000·selected/total ≡ 1000000·selected/budget without ever
    materializing the rounded budget).

    Scale: the per-source running sum LOOKS source-grain-sequential
    (|sources| ≈ 4 caps parallelism), so the Spark side decomposes it
    with the carry-in pattern — bucket = the order key's own first hex
    digit (bucket ascension IS hash-order ascension), bucket-local
    cumsum windows at (source × 16)-way parallelism plus a prefix
    carry over the 16-row bucket aggregate. The oracle keeps the
    single-window spelling; identical integers either way."""
    return Q(spark, sf_dir,
             _BUDGET_SPARK_SQL.replace("{SPARK_TOKS}", _SPARK_TOKS))


# ---------------------------------------------------------------------------
# op_chunk_overlap_sweep — chunking-config duplication audit (r11)
# ---------------------------------------------------------------------------

#: (chunk_size, overlap) candidate grid packed as chunk*1000+overlap
#: (one literal array explodes on both engines; struct-array spellings
#: diverge). Fixture docs are 10–99 tokens, so the 64-token configs
#: split real docs and the 128 config leaves most docs whole — every
#: config's chunks>1 arm is live (fixture-fit).
_CHUNK_SWEEP_CFGS = (32_000 + 0, 32_000 + 8, 64_000 + 16)


def _chunk_sweep_sql(size_expr: str, explode_expr: str,
                     idiv: str) -> str:
    return f"""
    WITH d AS (
      SELECT source, CAST({size_expr} AS BIGINT) AS n,
             {explode_expr} AS cfg
      FROM documents),
    e AS (
      SELECT source, n, CAST(cfg {{IDIV}} 1000 AS BIGINT) AS chunk_tokens,
             CAST(cfg % 1000 AS BIGINT) AS overlap_tokens,
             CASE WHEN n <= cfg {{IDIV}} 1000 THEN CAST(1 AS BIGINT)
                  ELSE 1 + CAST(ceil(1.0 * (n - cfg {{IDIV}} 1000)
                                     / (cfg {{IDIV}} 1000 - cfg % 1000))
                           AS BIGINT) END AS n_chunks
      FROM d),
    a AS (
      SELECT source, chunk_tokens, overlap_tokens,
             CAST(sum(n) AS BIGINT) AS corpus_tokens,
             CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
             CAST(sum(CAST(n AS DECIMAL(38, 0))
                      + (n_chunks - 1) * overlap_tokens) AS BIGINT)
               AS emitted_tokens
      FROM e GROUP BY source, chunk_tokens, overlap_tokens)
    SELECT source, chunk_tokens, overlap_tokens, n_chunks,
           corpus_tokens, emitted_tokens,
           CAST(floor(1000000.0 * (emitted_tokens - corpus_tokens)
                      / corpus_tokens) AS BIGINT) AS duplication_ppm
    FROM a ORDER BY source, chunk_tokens, overlap_tokens
""".replace("{IDIV}", idiv)


_CHUNK_SWEEP_SPARK_SQL = _chunk_sweep_sql(
    f"size({_SPARK_TOKS})",
    "explode(array(" + ", ".join(map(str, _CHUNK_SWEEP_CFGS)) + "))",
    "div")
_CHUNK_SWEEP_DUCK_SQL = _chunk_sweep_sql(
    f"len({_DUCK_TOKS})",
    "unnest([" + ", ".join(map(str, _CHUNK_SWEEP_CFGS)) + "])",
    "//")


@register("op_chunk_overlap_sweep", oracle=_CHUNK_SWEEP_DUCK_SQL,
          tags=("llm",))
def op_chunk_overlap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking-config sweep: for each candidate (chunk size, overlap)
    pair, the chunk count, emitted-token total, and DUPLICATION ppm
    (overlap tokens re-emitted per extra chunk) per source — the
    closed-form price list for the RAG/pretraining chunking decision
    (`op_doc_chunk` executes ONE config; this prices the grid first —
    overlap buys boundary context at a token-duplication cost that
    compounds with short docs, which is why the per-SOURCE breakdown
    matters: a short-doc source pays 2× the duplication of a long-doc
    source at the same config).

    Determinism: pure integer arithmetic — chunks = 1 + ⌈(n−c)/(c−o)⌉
    via DOUBLE ceil on an exact ratio < 2^20 (bit-identical), token
    counts exact; integer-div/% unpack of the packed config literal
    (div vs // — the twin split, same trap list as the span-corruption
    key).

    Scale: token COUNTS only (text never exploded, unlike
    `op_doc_chunk` which materializes chunks); the config grid
    explodes from a literal array map-side (Generate, no join); one
    two-phase (source, config) aggregate. Single corpus scan for the
    whole grid."""
    return Q(spark, sf_dir, _CHUNK_SWEEP_SPARK_SQL)
