"""Domain ingestion-transform tests over FIXTURES.md §A generated data —
the observable-semantics checklist from SURVEY.md §1.2/§7 watch list."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from blockchain_data_ingestion_spark.ingest import (
    blocks_from_messages,
    parse_block_messages,
    transactions_from_messages,
)
from blockchain_data_ingestion_spark.ingest.fixtures import (
    block_message,
    block_messages,
)

N_BLOCKS = 120
CHAINS = ("ETH", "ARB")


def _messages_df(spark, msgs=None):
    msgs = msgs if msgs is not None else block_messages(CHAINS, N_BLOCKS)
    raw = spark.createDataFrame([(m,) for m in msgs], "value string")
    return parse_block_messages(raw)


def test_parse_drops_corrupt_messages(spark):
    msgs = block_messages(("ETH",), 10) + ["{not json", ""]
    parsed = _messages_df(spark, msgs)
    assert parsed.count() == 10


def test_blocks_flatten_semantics(spark):
    blocks = blocks_from_messages(_messages_df(spark)).cache()
    assert blocks.count() == N_BLOCKS * len(CHAINS)

    # unix seconds → timestamp (evm_consumer.rs:70-71)
    row = blocks.filter(
        (F.col("chain_name") == "ETH") & (F.col("block_number") == 5)
    ).collect()[0]
    src = block_message("ETH", 5)
    assert int(row.block_ts.timestamp()) == src["timestamp"]
    # hex lowercased, tx_count = len(transactions)
    assert row.hash == src["hash"].lower()
    assert row.tx_count == len(src["transactions"])
    # U256 stays canonical string
    assert row.difficulty == src["difficulty"]

    # empty blocks exist and carry tx_count=0 (FIXTURES.md §A1)
    assert blocks.filter(F.col("tx_count") == 0).count() > 0
    # skewed 200-tx blocks exist (AQE skew fodder)
    assert blocks.filter(F.col("tx_count") == 200).count() > 0


def test_blocks_dedup_on_chain_and_number(spark):
    msgs = block_messages(("ETH",), 20)
    dup = msgs + msgs[:7]
    blocks = blocks_from_messages(_messages_df(spark, dup))
    assert blocks.count() == 20
    # same numbers on another chain must NOT collapse (the reference's
    # chain-less UNIQUE constraint bug — SURVEY.md §1.3)
    both = block_messages(("ETH", "ARB"), 20)
    blocks2 = blocks_from_messages(_messages_df(spark, both))
    assert blocks2.count() == 40


def test_tx_flatten_null_policy(spark):
    txs = transactions_from_messages(_messages_df(spark)).cache()
    total = sum(len(block_message(c, n)["transactions"])
                for c in CHAINS for n in range(N_BLOCKS))
    assert txs.count() == total

    # zero-default for missing value (unwrap_or_default,
    # evm_consumer.rs:46-50) — fixture injects ~10% missing values
    assert txs.filter(F.col("value") == "0").count() > 0
    assert txs.filter(F.col("value").isNull()).count() == 0
    # NULL passthrough for to_address (contract creation)
    assert txs.filter(F.col("to_address").isNull()).count() > 0

    # FK integrity: every tx joins back to exactly one block
    blocks = blocks_from_messages(_messages_df(spark))
    joined = txs.join(blocks, ["chain_name", "block_number"], "inner")
    assert joined.count() == total


def test_explode_collect_inverse(spark):
    """arr_explode then agg_collect reproduces the source array as a
    multiset (SURVEY.md §5.5 property)."""
    msgs = _messages_df(spark)
    txs = transactions_from_messages(msgs)
    renested = (txs.groupBy("chain_name", "block_number")
                   .agg(F.sort_array(F.collect_list("tx_hash")).alias("h")))
    orig = (msgs.select("chain_name", "block_number",
                        F.sort_array(F.expr(
                            "transform(transactions, t -> lower(t.tx_hash))"
                        )).alias("h"))
                .filter(F.size("h") > 0))
    assert renested.exceptAll(orig).count() == 0
    assert orig.exceptAll(renested).count() == 0


def test_json_roundtrip_identity(spark):
    """to_json ∘ from_json = id on the wire schema (SURVEY.md §5.5)."""
    from blockchain_data_ingestion_spark.schemas import BLOCK_MESSAGE_SCHEMA
    msgs = _messages_df(spark)
    rt = (msgs.select(F.to_json(F.struct("*")).alias("j"))
              .select(F.from_json("j", BLOCK_MESSAGE_SCHEMA).alias("m"))
              .select("m.*"))
    assert rt.exceptAll(msgs).count() == 0
    assert msgs.exceptAll(rt).count() == 0


def test_fixture_determinism():
    a = json.dumps(block_message("ETH", 42))
    b = json.dumps(block_message("ETH", 42))
    assert a == b


def test_merge_upsert_is_idempotent(spark):
    """sink_merge_upsert's docstring contract: re-delivering the source
    batch (at-least-once duplication) must not change the merged result
    — the window keeps one winner per key regardless of how many copies
    of the source row arrive."""
    from pyspark.sql.window import Window as W

    tgt = spark.createDataFrame(
        [(1, "O", False), (2, "O", False), (3, "F", False)],
        "k long, status string, from_source boolean")
    src = spark.createDataFrame(
        [(2, "R", True), (9, "N", True)],
        "k long, status string, from_source boolean")

    def merge(t, s):
        w = W.partitionBy("k").orderBy(F.desc("from_source"))
        return (t.unionByName(s)
                 .withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") == 1).drop("rn"))

    once = merge(tgt, src)
    twice = merge(tgt, src.unionByName(src))  # duplicated delivery
    assert sorted(map(tuple, once.collect())) \
        == sorted(map(tuple, twice.collect())) \
        == [(1, "O", False), (2, "R", True), (3, "F", False),
            (9, "N", True)]


def test_landing_sources_quarantine_corrupt_records(spark):
    """src_json_landing / src_csv_landing claim PERMISSIVE quarantine —
    prove at least one injected corrupt line actually lands in
    _corrupt_record for each format (a reader that silently drops or
    mis-parses garbage would still pass the aggregate oracle)."""
    from blockchain_data_ingestion_spark.queries.ingest_q import (
        _LANDING_SCHEMA, src_csv_landing, src_json_landing)

    sf = "/root/testdata/sf0.001"
    for fn, sub, fmt in [(src_json_landing, "json_landing", "json"),
                         (src_csv_landing, "csv_landing", "csv")]:
        fn(spark, sf).collect()  # materialize the landing dir
        from blockchain_data_ingestion_spark.scratch import scratch_dir
        path = scratch_dir(sub) + "/data"
        reader = (spark.read
                  .schema(_LANDING_SCHEMA + ", _corrupt_record string")
                  .option("mode", "PERMISSIVE")
                  .option("columnNameOfCorruptRecord", "_corrupt_record"))
        if fmt == "csv":
            landed = reader.option("header", True).csv(path)
        else:
            landed = reader.json(path)
        # Spark disallows referencing ONLY _corrupt_record from raw
        # files (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — pull a data column
        # alongside and count driver-side (tiny fixture slice)
        rows = landed.select("o_orderkey", "_corrupt_record").collect()
        n_bad = sum(r["_corrupt_record"] is not None for r in rows)
        assert n_bad >= 1, f"{fmt}: corrupt line was not quarantined"
