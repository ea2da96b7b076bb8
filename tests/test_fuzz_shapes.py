"""Regression pins for the r12 shape-fuzz finds.

`tools/fuzz_parity.py` mutates the real sf0.001 fixtures with the
shapes that historically diverge across engines (tied timestamps,
exact-gap chains, malformed JSON, negative money, empty/degenerate
docs, zero vectors, FK orphans — and, in the seed>=10 class, NULLs in
every nullable non-key column) and oracle-compares every key. Its
first runs caught 12 real divergences and the null class 17 more plus
a global conf bug (legacy size(NULL) = -1); this module rebuilds the
seed-0 and seed-10 catalogs and re-runs exactly those keys through
the driver's own compare, so each fix stays pinned without paying the
full-registry fuzz cost per suite run (the tool remains the per-round
deep pass).
"""

from __future__ import annotations

import shutil

import pytest

#: every key the r12 fuzz runs flagged, with the fix one line each —
#: the full stories live in the keys' docstrings/oracle comments.
FUZZED_KEYS = [
    "json_parse",             # oracle raised on malformed props
    "json_path",              # oracle raised on malformed props
    "json_variant",           # strict parse_json/variant_get raised
    "src_logs_events",        # oracle raised on malformed props
    "udf_decode_event",       # unsigned/truncated hex words, rare types
    "math_arith",             # duck ln/sqrt raise where spark is null/NaN
    "udf_scalar",             # negative wei->eth formatting, both sides
    "op_doc_fingerprint",     # duck array_to_string([]) is NULL not ''
    "udf_embedding",          # zero vector: unit self-dot is 0.0 not NaN
    "sink_write_audit_publish",  # poisoned FIRST batch crashed read-back
    "op_anomaly_zscore",      # duck DECIMAL(18) square int64-overflow
    "agg_moments_merge",      # boundary-magnitude plant (contract edge)
]


#: seed-10 (null-planting class) finds: NULLs in value/props/
#: event_type/text/lang — columns the fixtures never leave empty.
NULL_FUZZED_KEYS = [
    "hash_funcs",             # || nulled the composite key, concat_ws skips
    "src_logs_events",        # same class on topics_joined
    "json_variant",           # json_valid(NULL) fell out of BOTH arms
    "dedup_prefix",           # spark concat_ws rendered NULL toks as ''
    "op_survivorship",        # same prefix class
    "op_survivorship_fields",  # same prefix class
    "op_forward_fill",        # max_by null-sensitive vs arg_max skipping
    "op_ohlc_bars",           # open/close now FILTER null ticks, both
    "stream_ohlc_bars",       # same, streaming twin
    "op_twap",                # carry-in stitch join dropped NULL key (<=>)
    "op_watermark_planner",   # same stitch class (<=>)
    "op_rare_category_collapse",  # concat null-fusion vs null-propagate
    "op_curriculum_order",    # ntile NULLS FIRST/LAST default mismatch
    "op_doc_chunk",           # NULL text chunks NULL, not ''
    "op_image_ahash",         # md5(None) crashed; null payload = no print
    "op_multimodal_meta",     # int(NaN) crashed the media decoder
    "udf_cogroup_reconcile",  # int(NaN) crashed; null credit funds 0
    # and the size(NULL) = -1 legacy conf fix (session.py) — pinned by
    # the five token-stat keys below that emitted phantom -1 counts
    "op_token_count", "op_text_stats", "op_lang_id", "arr_funcs",
    "op_quality_filter",
]


def _build(tmp_path_factory, seed: int) -> str:
    from tools.fuzz_parity import build_catalog

    out = tmp_path_factory.mktemp(f"fuzz_seed{seed}") / "cat"
    build_catalog(seed, out)
    return str(out)


@pytest.fixture(scope="module")
def fuzz_sf_dir(tmp_path_factory) -> str:
    out = _build(tmp_path_factory, 0)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def fuzz_null_sf_dir(tmp_path_factory) -> str:
    out = _build(tmp_path_factory, 10)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("key", FUZZED_KEYS)
def test_fuzzed_key_matches_oracle_on_adversarial_catalog(
        spark, fuzz_sf_dir, key):
    from blockchain_data_ingestion_spark.caching import release_all

    from .oracle import check_key

    try:
        msg = check_key(spark, fuzz_sf_dir, key)
    finally:
        release_all()
    assert msg is None, f"{key}: {msg}"


@pytest.mark.parametrize("key", NULL_FUZZED_KEYS)
def test_null_fuzzed_key_matches_oracle(spark, fuzz_null_sf_dir, key):
    from blockchain_data_ingestion_spark.caching import release_all

    from .oracle import check_key

    try:
        msg = check_key(spark, fuzz_null_sf_dir, key)
    finally:
        release_all()
    assert msg is None, f"{key}: {msg}"


#: seed-23 (r13 close, civil-time/astral class active but the find was
#: a plain planted NULL): op_token_budget_split's carry-in cumsum
#: decomposition returned NULL (cs_loc NULL + carry) for a NULL-toks
#: row HEADING its hash bucket, while the oracle's single inclusive
#: window gives that row the preceding buckets' running sum — one doc
#: flipped n_selected. Fixed by decomposing SQL running-sum NULL
#: semantics exactly: cs is NULL iff the inclusive prefix holds zero
#: non-NULL values (nn_carry + nn_loc = 0), else prefix-sum of
#: non-NULLs. The audit of every other UNBOUNDED..1 PRECEDING carry
#: site found no sibling: all are coalesced-exclusive offsets
#: (op_seq_pack family), max-carries via greatest (NULL-skipping by
#: definition — op_watermark_planner/op_drawdown), or non-null 0/1
#: operands (win_sessionize/op_funnel).
SEED23_KEYS = ["op_token_budget_split"]


@pytest.fixture(scope="module")
def fuzz_seed23_sf_dir(tmp_path_factory) -> str:
    out = _build(tmp_path_factory, 23)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("key", SEED23_KEYS)
def test_seed23_fuzzed_key_matches_oracle(spark, fuzz_seed23_sf_dir, key):
    from blockchain_data_ingestion_spark.caching import release_all

    from .oracle import check_key

    try:
        msg = check_key(spark, fuzz_seed23_sf_dir, key)
    finally:
        release_all()
    assert msg is None, f"{key}: {msg}"


def test_numeric_edge_class_actually_plants(tmp_path):
    """The seed>=30 numeric-edge class must keep planting its shapes —
    a refactor that drops a plant silently weakens the axis (clean
    runs would read as coverage). Pins: >2^53 BIGINT ids on events AND
    documents (adjacent, double-unrepresentable), IEEE -0.0 values,
    and the -0.0 / 1e-30 embedding vectors."""
    import numpy as np
    import pyarrow.parquet as pq

    from tools.fuzz_parity import build_catalog

    out = tmp_path / "cat"
    build_catalog(30, out)
    ev = pq.read_table(out / "events.parquet").to_pandas()
    big = 2 ** 53
    assert (ev.event_id > big).sum() == 5
    vals = ev.value.dropna().to_numpy()
    assert ((vals == 0.0) & np.signbit(vals)).sum() >= 4
    docs = pq.read_table(out / "documents.parquet").to_pandas()
    assert sorted(docs[docs.doc_id > big].doc_id) == [big + 1, big + 2]
    emb = pq.read_table(out / "embeddings.parquet").to_pandas()
    tail = emb.sort_values("vec_id").tail(2).embedding.tolist()
    assert np.signbit(tail[0]).all() and (np.asarray(tail[0]) == 0).all()
    assert np.allclose(tail[1], 1e-30, rtol=1e-6) and (np.asarray(tail[1]) > 0).all()
