"""Property-based tests (SURVEY.md §5.5): algebraic invariants the engine
must hold for arbitrary inputs, via hypothesis.

Each example builds a small literal DataFrame (a Spark round-trip per
example is expensive — examples are capped and deadlines disabled), so
these probe edge cases unit fixtures miss: empty arrays, nulls in every
nullable slot, unicode-ish strings, boundary integers.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from blockchain_data_ingestion_spark.schemas import (
    BLOCK_MESSAGE_SCHEMA,
    TRANSACTION_SCHEMA,
)

# printable-ascii identifiers: the wire format is hex strings / names;
# avoids whitespace-normalization false alarms in JSON comparison.
_s = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=12)
_u64 = st.integers(min_value=0, max_value=2**62)
_u256s = st.integers(min_value=0, max_value=10**30).map(str)


def _tx(i: int, draw) -> dict:
    return {
        "tx_hash": draw(_s), "block_number": draw(st.none() | _u64),
        "transaction_index": i,
        "from_address": draw(_s), "to_address": draw(st.none() | _s),
        "value": draw(st.none() | _u256s),
        "gas_price": draw(st.none() | _u256s), "gas": draw(_u256s),
        "input": draw(st.none() | _s), "nonce": draw(st.none() | _u64),
    }


@st.composite
def _block(draw) -> dict:
    return {
        "block_number": draw(_u64), "chain_name": draw(_s),
        "hash": draw(_s), "parent_hash": draw(_s),
        "timestamp": draw(_u64), "miner": draw(_s),
        "difficulty": draw(st.none() | _u256s),
        "total_difficulty": draw(st.none() | _u256s),
        "gas_used": draw(st.none() | _u64), "gas_limit": draw(st.none() | _u64),
        "size": draw(st.none() | _u64),
        "receipts_root": draw(st.none() | _s),
        "extra_data": draw(st.none() | _s),
        "logs_bloom": draw(st.none() | _s),
        "transactions": [
            _tx(i, draw) for i in range(draw(st.integers(0, 3)))],
        "uncles": draw(st.none() | st.lists(_s, max_size=2)),
    }


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_block(), min_size=1, max_size=4))
def test_json_roundtrip_identity(spark, blocks):
    """to_json ∘ from_json == id on the block wire schema — the engine's
    serialize/consume hop (json_serialize / json_parse ops) must be
    lossless for any schema-conformant message."""
    df = spark.createDataFrame(blocks, schema=BLOCK_MESSAGE_SCHEMA)
    back = (df.select(F.to_json(F.struct(*df.columns),
                                {"ignoreNullFields": "false"}).alias("j"))
              .select(F.from_json("j", BLOCK_MESSAGE_SCHEMA).alias("m"))
              .select("m.*"))
    orig = [r.asDict(recursive=True) for r in df.collect()]
    rt = [r.asDict(recursive=True) for r in back.collect()]
    key = lambda r: (r["chain_name"], r["block_number"], r["hash"])  # noqa: E731
    assert sorted(orig, key=key) == sorted(rt, key=key)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_block(), min_size=1, max_size=4))
def test_explode_collect_inverse(spark, blocks):
    """arr_explode then agg_collect reproduces each block's transaction
    multiset (the reference's core unnest, evm_consumer.rs:124-126, must
    be invertible)."""
    df = spark.createDataFrame(blocks, schema=BLOCK_MESSAGE_SCHEMA)
    exploded = df.select("hash", F.explode("transactions").alias("tx"))
    renested = (exploded.groupBy("hash")
                .agg(F.collect_list("tx").alias("txs")))
    got = {r["hash"]: sorted(json.dumps(t.asDict(recursive=True),
                                        sort_keys=True)
                             for t in r["txs"])
           for r in renested.collect()}
    want = {b["hash"]: sorted(json.dumps(t, sort_keys=True)
                              for t in b["transactions"])
            for b in blocks if b["transactions"]}
    # explode drops blocks with zero transactions; collect can't resurrect
    # them — that asymmetry is the documented explode semantics.
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=50))
def test_decimal_sum_order_independent(spark, xs):
    """The numeric-determinism contract: decimal-routed sums are invariant
    under partitioning/ordering (the reason every money aggregate casts
    to decimal before summing — SURVEY.md §7 watch-list)."""
    vals = [(float(x) / 100.0,) for x in xs]
    df = spark.createDataFrame(vals, "x double")
    one = df.coalesce(1).agg(
        F.sum(F.col("x").cast("decimal(18,4)")).cast("double")).collect()[0][0]
    many = df.repartition(7).agg(
        F.sum(F.col("x").cast("decimal(18,4)")).cast("double")).collect()[0][0]
    assert one == many


def test_transaction_schema_matches_wire_fields():
    """TRANSACTION_SCHEMA mirrors the reference wire struct field-for-field
    (schemas/evm.rs:34-47 → SURVEY.md §1.2 mapping)."""
    assert [f.name for f in TRANSACTION_SCHEMA.fields] == [
        "tx_hash", "block_number", "transaction_index", "from_address",
        "to_address", "value", "gas_price", "gas", "input", "nonce"]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.floats(min_value=-10.0, max_value=10.0, width=32,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=64))
def test_int8_quantization_error_bound(spark, vec):
    """op_embedding_quantize's absmax-int8 scheme: every reconstructed
    component must sit within half a quantization step (scale/254) of
    the original, and |q| never exceeds 127 — on arbitrary float32
    vectors, not just the fixture."""
    df = spark.createDataFrame([(vec,)], "v array<float>")
    row = (df.withColumn("sc", F.expr(
               "array_max(transform(v, x -> abs(CAST(x AS DOUBLE))))"))
             .withColumn("q", F.expr("""
                 transform(v, x -> CASE WHEN sc = 0D THEN 0L
                   ELSE CAST(floor(CAST(x AS DOUBLE) / sc * 127.0 + 0.5)
                             AS BIGINT) END)"""))
             .collect()[0])
    sc = row["sc"]
    assert all(abs(q) <= 127 for q in row["q"])
    if sc > 0:
        step = sc / 127.0
        for x, q in zip(vec, row["q"]):
            assert abs(float(x) - q * step) <= step / 2 + 1e-9 * sc
