"""Block-message → analytic-table transforms.

Direct Spark analog of the reference consumer (evm_consumer.rs):

- ``parse_block_messages``      : JSON envelope → typed struct
                                  (= ``msg.deserialize()``, :116-122)
- ``blocks_from_messages``      : header accessors → flat block row
                                  (= ``postgres_insert_block``, :64-105)
- ``transactions_from_messages``: explode tx array → flat tx rows
                                  (= the ``for transaction in
                                  block_message.transactions()`` loop +
                                  ``postgres_insert_transaction``, :124-126,
                                  :36-62)
- ``write_analytic_table``      : vectorized partitioned write (replaces
                                  row-at-a-time INSERT, :37-59)

Observable semantics reproduced exactly (SURVEY.md §1.2):
- u64→i64 narrowing on numeric header fields (:66-72) → LongType casts;
- unix seconds → TIMESTAMP (:70-71);
- U256 → canonical decimal string (:46-47), lowercased hex hashes;
- ``value``/``gas_price``/``nonce`` zero-default on missing
  (``unwrap_or_default``, :46-50) while ``to_address`` passes NULL through
  (contract creation, schemas/evm.rs:42);
- ``tx_count`` = len(transactions) (:72-73);
- dedup on (chain_name, block_number) — the engine's fix for the
  reference's chain-less UNIQUE constraint (0001_initial.sql:22-23; see
  SURVEY.md §1.3 on the latent multi-chain bug).

Scale: the whole path is narrow transformations + one optional
``dropDuplicates`` exchange; landing tables partition by
(chain_name, date) so downstream scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import BLOCK_MESSAGE_SCHEMA

__all__ = [
    "parse_block_messages",
    "blocks_from_messages",
    "transactions_from_messages",
    "write_analytic_table",
]


def parse_block_messages(raw: DataFrame,
                         value_col: str = "value") -> DataFrame:
    """JSON wire envelope → typed block-message rows.

    ``raw`` carries one JSON string per block in ``value_col`` (the Pulsar
    message payload analog, evm_producer.rs:46). Corrupt records land as
    NULL structs and are dropped — mirroring the reference's log-and-skip
    on bad messages (evm_producer.rs:49-52).
    """
    parsed = raw.select(
        F.from_json(F.col(value_col), BLOCK_MESSAGE_SCHEMA).alias("msg"))
    # from_json yields an all-null struct (not NULL) for undecodable input;
    # gate on the required key fields instead of struct nullity.
    return (parsed
            .filter(F.col("msg").isNotNull()
                    & F.col("msg.block_number").isNotNull()
                    & F.col("msg.chain_name").isNotNull())
            .select("msg.*"))


def blocks_from_messages(messages: DataFrame,
                         dedup: bool = True) -> DataFrame:
    """Flatten typed block messages into the ``blocks`` analytic table."""
    out = messages.select(
        F.col("block_number").cast("long").alias("block_number"),
        "chain_name",
        F.lower("hash").alias("hash"),
        F.lower("parent_hash").alias("parent_hash"),
        F.timestamp_seconds(F.col("timestamp")).alias("block_ts"),
        F.lower("miner").alias("miner"),
        "difficulty",
        "total_difficulty",
        F.col("gas_used").cast("long").alias("gas_used"),
        F.col("gas_limit").cast("long").alias("gas_limit"),
        F.coalesce(F.col("size"), F.lit(0)).cast("long").alias("size"),
        "receipts_root",
        F.coalesce(F.size("transactions"), F.lit(0)).alias("tx_count"),
        F.to_json("transactions").alias("transactions_json"),
    )
    if dedup:
        out = out.dropDuplicates(["chain_name", "block_number"])
    return out


def transactions_from_messages(messages: DataFrame) -> DataFrame:
    """Explode embedded tx arrays into the ``transactions`` analytic table.

    ``posexplode`` preserves array order as a fallback
    ``transaction_index`` when the wire message omits it
    (schemas/evm.rs:40 marks it optional).
    """
    tx = messages.select(
        "chain_name",
        F.col("block_number").cast("long").alias("block_number"),
        F.posexplode_outer("transactions").alias("pos", "tx"),
    ).filter(F.col("tx").isNotNull())
    return tx.select(
        "chain_name",
        "block_number",
        F.lower("tx.tx_hash").alias("tx_hash"),
        F.coalesce(F.col("tx.transaction_index"), F.col("pos").cast("int"))
         .alias("transaction_index"),
        F.lower("tx.from_address").alias("from_address"),
        F.lower("tx.to_address").alias("to_address"),   # NULL passthrough
        F.coalesce(F.col("tx.value"), F.lit("0")).alias("value"),
        F.coalesce(F.col("tx.gas_price"), F.lit("0")).alias("gas_price"),
        F.coalesce(F.col("tx.gas"), F.lit("0")).alias("gas"),
        F.col("tx.input").alias("input"),
        F.coalesce(F.col("tx.nonce"), F.lit(0)).cast("long").alias("nonce"),
    )


def write_analytic_table(df: DataFrame, path: str,
                         partition_by: tuple[str, ...] = ("chain_name",),
                         fmt: str = "parquet",
                         mode: str = "append") -> None:
    """Columnar partitioned write — the engine-native sink replacing the
    reference's per-row INSERT-per-transaction (evm_consumer.rs:37-59).

    ``fmt='delta'`` is the production target (idempotent MERGE upserts);
    the v1 image has no Delta jars, so parquet is the default and the
    Delta path raises cleanly.
    """
    if fmt == "delta":  # pragma: no cover - jars absent in v1 image
        raise NotImplementedError(
            "Delta jars are not on the classpath in this build; "
            "use fmt='parquet' (same layout, no ACID upsert)")
    (df.write.mode(mode).partitionBy(*partition_by).format(fmt).save(path))
