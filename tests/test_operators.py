"""Property tests for the two-phase rank operators (operators/rank.py).

The bucket-histogram threshold logic has edge cases the parquet fixtures
never hit: groups smaller than k, single-row groups, all-equal values,
negative values, values straddling bucket boundaries, NULLs, extreme
quantiles (0 and 1), degenerate bucket widths (everything in one bucket /
every row its own bucket). Each property asserts the two-phase operator
is *pointwise identical* to the naive formulation (full ranking window /
built-in exact ``percentile``) on random inputs.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from blockchain_data_ingestion_spark.operators import (
    group_quantile_tail,
    topk_per_group,
)

# values with heavy duplication, negatives, and bucket-boundary hits
_val = st.one_of(
    st.integers(min_value=-3, max_value=3).map(float),
    st.sampled_from([0.0, 1000.0, -1000.0, 999.999, 1000.001, 2500.0]),
    st.floats(min_value=-5e4, max_value=5e4,
              allow_nan=False, allow_infinity=False),
    st.none(),
)

_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), _val),
    min_size=1, max_size=60)


def _df(spark, rows):
    return spark.createDataFrame(
        [(g, v) for g, v in rows], "g int, v double")


@given(rows=_rows, k=st.integers(min_value=1, max_value=7),
       width=st.sampled_from([5.0, 1000.0, 1e9, 0.25]))
@example(rows=[(0, 1.0)], k=3, width=1000.0)              # group smaller than k
@example(rows=[(0, 2.0)] * 9 + [(1, None)], k=2, width=5.0)  # all-equal; all-NULL group
@example(rows=[(0, -1000.0), (0, 999.999), (0, 1000.001)], k=2,
         width=1000.0)                                    # bucket-boundary straddle
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_topk_matches_naive_window(spark, rows, k, width):
    df = _df(spark, rows)
    got = sorted(
        topk_per_group(df, ["g"], "v", k, tie_cols=("v",),
                       bucket_width=width)
        .select("g", "v", "rn").collect())
    w = W.partitionBy("g").orderBy(F.col("v").desc(), F.col("v"))
    want = sorted(
        df.filter(F.col("v").isNotNull())
          .withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= k)
          .select("g", "v", "rn").collect())
    assert got == want


@given(rows=_rows,
       q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 0.99, 1.0]),
       width=st.sampled_from([5.0, 1000.0, 1e9, 0.25]))
@example(rows=[(0, 7.5)], q=0.5, width=1000.0)            # single row
@example(rows=[(0, 2.0)] * 9, q=0.99, width=5.0)          # all-equal values
@example(rows=[(0, -1000.0), (0, 1.00001)], q=0.25,
         width=5.0)                                       # lerp ulp regression
@example(rows=[(0, -1.0), (0, 0.0), (0, 1.0)], q=1.0,
         width=0.25)                                      # q=1 → max
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_quantile_tail_matches_builtin_percentile(spark, rows, q, width):
    df = _df(spark, rows)
    got = {r["g"]: r["qv"] for r in group_quantile_tail(
        df, ["g"], "v", q, out_col="qv", bucket_width=width).collect()}
    want = {r["g"]: r["qv"] for r in (
        df.filter(F.col("v").isNotNull())
          .groupBy("g").agg(F.expr(f"percentile(v, {q!r})").alias("qv"))
          .collect())}
    assert set(got) == set(want)
    for g in want:
        assert math.isclose(got[g], want[g], rel_tol=0, abs_tol=0.0), \
            (g, got[g], want[g])


def test_eip55_gate_refuses_without_real_keccak():
    """EIP-55 must never silently fall back to hashlib.sha3_256 (NIST
    padding != Ethereum keccak — a lookalike hash would emit plausible
    but wrong checksums). In this container the gate must raise; where
    a real keccak exists it must reproduce the canonical EIP-55 vector."""
    from blockchain_data_ingestion_spark.queries.llm_vec import eip55_checksum

    try:
        out = eip55_checksum("0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed")
    except NotImplementedError as exc:
        assert "keccak" in str(exc)
    else:
        assert out == "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed"
