"""Text-dedup operator contracts the SQL oracle cannot see on its own:
the size-gated verification-shape switch of `op_minhash_dedup` (the
oracle only ever sees one result set; the gate picks between two
exact-equivalent physical shapes) and its hash-equality across shapes.
"""

from __future__ import annotations

import pytest

from blockchain_data_ingestion_spark.queries import llm_text, load_all


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_rejoin_variant_hash_equal(spark, sf_dir, monkeypatch):
    """The two verification shapes are EXACT equivalents: identical
    rows, identical schema, on the same corpus. `inline` rides the
    shingle set on band rows (fast at fixture scale); `rejoin` keeps
    band rows payload-free and re-joins the shingle index on doc_id
    (the 100 TB shape — VERDICT r13 item 2). A fixture 'straddles the
    threshold' by monkeypatching the gate both ways around the
    fixture's actual ~300 B/doc average."""
    q = load_all()["op_minhash_dedup"].spark
    # far above the fixture average → auto picks inline
    monkeypatch.setattr(
        llm_text, "_MINHASH_INLINE_MAX_AVG_TEXT_BYTES", 1 << 30)
    inline = q(spark, sf_dir)
    # below the fixture average → auto picks rejoin on the SAME corpus
    monkeypatch.setattr(llm_text, "_MINHASH_INLINE_MAX_AVG_TEXT_BYTES", 1)
    rejoin = q(spark, sf_dir)
    assert inline.columns == rejoin.columns
    assert _rows(inline) == _rows(rejoin)


def test_minhash_rejoin_band_rows_carry_no_payload(spark, sf_dir,
                                                   monkeypatch):
    """Plan assertion for the gate, both directions: the rejoin shape
    must have NO collect_list feeding the band self-join (that array is
    exactly the doc-sized payload the shape exists to keep out of the
    candidate shuffle), and the inline shape must still use it (the
    measured ~2.8× fixture-scale win must not silently vanish)."""
    q = load_all()["op_minhash_dedup"].spark
    monkeypatch.setattr(llm_text, "_MINHASH_INLINE_MAX_AVG_TEXT_BYTES", 1)
    plan = q(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan, (
        "rejoin shape still re-nests shingles onto band rows")
    assert "array_intersect" not in plan
    monkeypatch.setattr(
        llm_text, "_MINHASH_INLINE_MAX_AVG_TEXT_BYTES", 1 << 30)
    plan = q(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" in plan and "array_intersect" in plan


def test_minhash_gate_is_metadata_only_and_env_overridable(
        spark, sf_dir, monkeypatch):
    """The gate reads parquet footers, not the cluster: building either
    plan launches zero Spark jobs. The env override accepts exactly
    {auto, inline, rejoin} and rejects anything else loudly (a typo'd
    probe run must not silently fall back to auto)."""
    from blockchain_data_ingestion_spark.catalog import (
        table, table_column_avg_bytes)

    avg = table_column_avg_bytes(sf_dir, "documents", "text")
    assert avg is not None and 0 < avg < 16_384  # fixture docs are small
    table(spark, sf_dir, "documents")            # warm first-touch setup
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    load_all()["op_minhash_dedup"].spark(spark, sf_dir)
    assert set(tracker.getJobIdsForGroup(None)) == before

    monkeypatch.setenv("SPARK_GRAFT_MINHASH_VERIFY", "bogus")
    with pytest.raises(ValueError, match="SPARK_GRAFT_MINHASH_VERIFY"):
        load_all()["op_minhash_dedup"].spark(spark, sf_dir)


def test_minhash_inline_cache_gate_is_byte_budgeted(spark, sf_dir,
                                                    monkeypatch):
    """The inline band-table persist is gated on estimated TOTAL
    corpus text bytes (r16, VERDICT r15 item 3): the cached frame
    carries the full shingle payload per doc, so a many-small-docs
    corpus must not write ~3x its size to executor local disk just
    because the avg-bytes gate picked inline. Under budget the plan
    carries an InMemoryRelation; over budget the SAME logical plan runs
    unpersisted — and the results are identical either way."""
    q = load_all()["op_minhash_dedup"].spark
    # pin inline mode regardless of fixture stats
    monkeypatch.setattr(
        llm_text, "_MINHASH_INLINE_MAX_AVG_TEXT_BYTES", 1 << 30)
    monkeypatch.setattr(
        llm_text, "_MINHASH_INLINE_CACHE_MAX_TOTAL_TEXT_BYTES", 1 << 40)
    from blockchain_data_ingestion_spark.caching import release_all

    cached = q(spark, sf_dir)
    plan = cached._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, "under-budget inline lost its persist"
    cached_rows = _rows(cached)
    release_all()  # else the CacheManager substitutes the live persist
    monkeypatch.setattr(
        llm_text, "_MINHASH_INLINE_CACHE_MAX_TOTAL_TEXT_BYTES", 1)
    uncached = q(spark, sf_dir)
    plan = uncached._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan, (
        "over-budget inline still persists a corpus-scale band table")
    assert "collect_list" in plan  # still the inline verification shape
    assert cached_rows == _rows(uncached)
