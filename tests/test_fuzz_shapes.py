"""Regression pins for the r12 shape-fuzz finds.

`tools/fuzz_parity.py` mutates the real sf0.001 fixtures with the
shapes that historically diverge across engines (tied timestamps,
exact-gap chains, malformed JSON, negative money, empty/degenerate
docs, zero vectors, FK orphans) and oracle-compares every key. Its
first runs caught 12 real divergences; this module rebuilds the seed-0
catalog and re-runs exactly those keys through the driver's own
compare, so each fix stays pinned without paying the full-registry
fuzz cost per suite run (the tool remains the per-round deep pass).
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


@pytest.fixture(scope="module")
def fuzz_sf_dir(tmp_path_factory) -> str:
    from tools.fuzz_parity import build_catalog

    out = tmp_path_factory.mktemp("fuzz_seed0") / "cat"
    build_catalog(0, out)
    yield str(out)
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
