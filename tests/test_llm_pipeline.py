"""Semantic properties of the corpus-shaping pipeline ops (beyond the
oracle hash parity that tests/test_oracle_parity.py already enforces)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchain_data_ingestion_spark.queries import load_all
from blockchain_data_ingestion_spark.queries.llm_pipeline import (
    _CHUNK_S, _CHUNK_W, _PACK_L)


def _q(spark, sf_dir, key):
    return load_all()[key].spark(spark, sf_dir)


def test_seq_pack_partitions_every_token_exactly_once(spark, sf_dir):
    """The packing manifest must cover each document's tokens exactly
    once (no token lost at a sequence boundary, none duplicated) and
    fill every sequence except the last to exactly L tokens."""
    spans = _q(spark, sf_dir, "op_seq_pack").cache()
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .selectExpr("doc_id",
                        "size(split(text, ' ')) AS n_toks_expected"))
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("n_toks").alias("covered"),
        # spans within a doc must tile [0, n): min start 0, no overlap
        F.min("doc_tok_start").alias("first_start"),
        F.count("*").alias("n_spans"))
    joined = per_doc.join(docs, "doc_id")
    assert joined.filter("covered != n_toks_expected").count() == 0
    assert joined.filter("first_start != 0").count() == 0

    seq_fill = spans.groupBy("seq_id").agg(F.sum("n_toks").alias("fill"))
    last_seq = seq_fill.agg(F.max("seq_id")).collect()[0][0]
    assert seq_fill.filter(
        (F.col("seq_id") != last_seq) & (F.col("fill") != _PACK_L)
    ).count() == 0
    spans.unpersist()


def test_doc_chunk_covers_and_overlaps(spark, sf_dir):
    """Chunks tile each doc at the configured stride: chunk i holds
    min(W, n - i*S) tokens, consecutive chunks overlap by W - S, and the
    union covers every token."""
    chunks = _q(spark, sf_dir, "op_doc_chunk").cache()
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .selectExpr("doc_id", "size(split(text, ' ')) AS n"))
    g = chunks.groupBy("doc_id").agg(
        F.max(F.col("chunk_id") * _CHUNK_S + F.col("n_toks")).alias("covered"),
        F.count("*").alias("n_chunks"))
    j = g.join(docs, "doc_id")
    # last chunk's end reaches n exactly (slice clamps, never exceeds)
    assert j.filter("covered != n").count() == 0
    # every doc yields at least one chunk; short docs exactly one
    assert j.filter("n_chunks < 1").count() == 0
    assert j.filter(f"n <= {_CHUNK_W} AND n_chunks != 1").count() == 0
    # chunk text token count matches the claimed n_toks
    assert chunks.filter(
        F.expr("size(split(chunk_text, ' ')) != n_toks")).count() == 0
    chunks.unpersist()


def test_quality_filter_keep_iff_no_reasons(spark, sf_dir):
    qf = _q(spark, sf_dir, "op_quality_filter").cache()
    assert qf.filter("keep AND fail_reasons != ''").count() == 0
    assert qf.filter("NOT keep AND fail_reasons = ''").count() == 0
    # the gate must do real work on the fixture: both outcomes present
    kept = qf.filter("keep").count()
    assert 0 < kept < qf.count()
    qf.unpersist()


def test_dedup_clusters_canonical_is_member_and_minimal(spark, sf_dir):
    """cluster_id is the minimum doc_id of the component — so it must
    (a) never exceed its member's id, and (b) itself be a clustered doc
    whose cluster_id is itself (root property)."""
    labels = _q(spark, sf_dir, "dedup_clusters").cache()
    assert labels.filter("cluster_id > doc_id").count() == 0
    roots = labels.select(F.col("cluster_id").alias("doc_id")).distinct()
    self_rooted = labels.join(roots, "doc_id") \
        .filter("cluster_id != doc_id").count()
    assert self_rooted == 0
    labels.unpersist()


def test_mixture_sample_respects_stratum_rates(spark, sf_dir):
    """100%-rate strata keep every document; the down-weighted stratum
    keeps a strict, non-empty subset."""
    from blockchain_data_ingestion_spark.queries.llm_pipeline import (
        _MIX_RATES)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sample = _q(spark, sf_dir, "op_mixture_sample").cache()
    for lang, rate in _MIX_RATES.items():
        total = docs.filter(F.col("lang") == lang).count()
        kept = sample.filter(F.col("lang") == lang).count()
        if rate == 100:
            assert kept == total, lang
        else:
            assert 0 < kept < total, (lang, kept, total)
    sample.unpersist()


def test_dedup_apply_drops_exactly_nonroot_members(spark, sf_dir):
    labels = _q(spark, sf_dir, "dedup_clusters").cache()
    retained = _q(spark, sf_dir, "dedup_apply").cache()
    corpus_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    dropped_expected = labels.filter("doc_id != cluster_id").count()
    assert retained.count() == corpus_n - dropped_expected
    # no dropped doc survives; every cluster root survives
    assert retained.join(
        labels.filter("doc_id != cluster_id"), "doc_id").count() == 0
    roots = labels.select(F.col("cluster_id").alias("doc_id")).distinct()
    assert retained.join(roots, "doc_id").count() == roots.count()
    labels.unpersist()
    retained.unpersist()


def test_ivf_search_self_recall(spark, sf_dir):
    """Queries are corpus members, and a query's nearest cell is its own
    assigned cell (always probed at nprobe >= 1) — so every query must
    find itself at rank 1 with distance 0."""
    from blockchain_data_ingestion_spark.queries.llm_vec import _IVFS_NQ
    res = _q(spark, sf_dir, "op_ann_ivf_search").cache()
    top1 = res.filter("rank = 1")
    assert top1.count() == _IVFS_NQ
    assert top1.filter("query_id != vec_id OR dist_scaled != 0").count() == 0
    # each query returns a full top-k slate with strictly ordered ranks
    from blockchain_data_ingestion_spark.queries.llm_vec import _IVFS_TOPK
    per_q = res.groupBy("query_id").count()
    assert per_q.filter(f"count != {_IVFS_TOPK}").count() == 0
    res.unpersist()


def test_pipeline_e2e_consistent_with_stages(spark, sf_dir):
    """Every document in the e2e manifest must individually pass each
    composed stage: outside the benchmark slice, quality-kept, not a
    dropped dup member, not contaminated, mixture-sampled — and the
    manifest must be non-trivial (some docs survive, some don't)."""
    manifest = _q(spark, sf_dir, "op_pipeline_e2e").cache()
    docs_in = manifest.select("doc_id").distinct()
    n_kept = docs_in.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert 0 < n_kept < docs.filter("source <> 'src0'").count()
    assert docs_in.join(docs.filter("source = 'src0'"), "doc_id") \
        .count() == 0
    qf = _q(spark, sf_dir, "op_quality_filter").filter("NOT keep")
    assert docs_in.join(qf, "doc_id").count() == 0
    dropped = _q(spark, sf_dir, "dedup_clusters") \
        .filter("doc_id != cluster_id")
    assert docs_in.join(dropped, "doc_id").count() == 0
    contaminated = _q(spark, sf_dir, "op_decontaminate")
    assert docs_in.join(contaminated, "doc_id").count() == 0
    sampled = _q(spark, sf_dir, "op_mixture_sample")
    assert docs_in.join(sampled, "doc_id").count() == n_kept
    manifest.unpersist()


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe's candidate set is a superset of single-probe's (own
    bucket is always probed), so per query its best-cosine hit must be
    at least as good, and it must never return fewer neighbors."""
    single = _q(spark, sf_dir, "op_similarity_lsh") \
        .groupBy("query_id").agg(F.max("cosine").alias("best_s"),
                                 F.count("*").alias("n_s"))
    multi = _q(spark, sf_dir, "op_similarity_lsh_multiprobe") \
        .groupBy("query_id").agg(F.max("cosine").alias("best_m"),
                                 F.count("*").alias("n_m"))
    j = single.join(multi, "query_id")
    assert j.count() > 0
    assert j.filter("best_m < best_s OR n_m < n_s").count() == 0


def test_decontaminate_flags_real_overlap(spark, sf_dir):
    """The fixture's planted near-dups span sources, so the benchmark
    slice must contaminate a non-trivial, strict subset of the corpus."""
    hits = _q(spark, sf_dir, "op_decontaminate")
    corpus_n = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter("source <> 'src0'").count())
    n = hits.count()
    assert 0 < n < corpus_n
    assert hits.filter("n_hit_ngrams <= 0").count() == 0
