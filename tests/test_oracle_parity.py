"""Pre-flight for the driver's correctness gate: every registered operator
with an oracle must hash-match DuckDB at the test scale factor; oracle-less
(rows-only) ops must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from blockchain_data_ingestion_spark.queries import load_all

from .oracle import check_key

KEYS = sorted(load_all().keys())


# ops where an empty result at tiny SF is legitimate
ALLOWED_EMPTY: set[str] = set()


@pytest.mark.parametrize("key", KEYS)
def test_operator_matches_oracle(spark, sf_dir, key):
    msg = check_key(spark, sf_dir, key)
    assert msg is None, f"{key}: {msg}"


@pytest.mark.parametrize("key", KEYS)
def test_operator_nonempty(spark, sf_dir, key):
    """Guard against filters that silently select nothing (a 0=0 oracle
    match proves nothing)."""
    if key in ALLOWED_EMPTY:
        pytest.skip("empty result is expected for this op")
    from blockchain_data_ingestion_spark.queries import load_all
    n = load_all()[key].spark(spark, sf_dir).count()
    assert n > 0, f"{key} returned 0 rows at {sf_dir}"


def test_approx_distinct_error_bounds(spark, sf_dir):
    """The two rows-only HLL paths (`agg_approx_distinct`,
    `agg_sketch_merge`) must estimate within 5% of the exact per-status
    distinct count — the docstring contract their oracle omission
    relies on. The sketch path additionally proves the monthly→status
    union loses nothing vs a direct estimate (merge-correctness)."""
    from blockchain_data_ingestion_spark.queries import load_all

    reg = load_all()
    exact = {r["o_orderstatus"]: r["n_distinct_cust"]
             for r in reg["agg_count_distinct"].spark(spark, sf_dir)
             .collect()}
    for key, col in [("agg_approx_distinct", "approx_cust"),
                     ("agg_sketch_merge", "approx_cust")]:
        got = {r["o_orderstatus"]: r[col]
               for r in reg[key].spark(spark, sf_dir).collect()}
        assert set(got) == set(exact), key
        for status, est in got.items():
            rel = abs(est - exact[status]) / max(exact[status], 1)
            assert rel < 0.05, (key, status, est, exact[status])
