"""Fixed StructType declarations for the domain entities.

The reference declares its schemas statically in three places — Rust
structs (src/streams/schemas/evm.rs:9-47), SQL DDL
(migrations/0001_initial.sql:6-40), and prose for the never-implemented
Logs entity (README.md:169-196). The engine mirrors that ethos: explicit
StructTypes, schema-on-write, no inference.

Type mapping follows SURVEY.md §1.2 — notably U256 values stay canonical
decimal *strings* at rest (the reference stores them as Postgres TEXT via
``.to_string()``, evm_consumer.rs:46-47) with ``DecimalType(38,0)`` compute
casts; u64 fields take the reference's observable u64→i64 narrowing
(evm_consumer.rs:66-72) as LongType.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "TRANSACTION_SCHEMA", "BLOCK_MESSAGE_SCHEMA", "BLOCK_FLAT_SCHEMA",
    "TRANSACTION_FLAT_SCHEMA", "LOG_SCHEMA", "U256_DECIMAL",
]

#: compute type for U256-as-string columns (wei amounts). Full U256 needs
#: 78 digits; DecimalType caps at 38 — ample for real wei values (< 1e30).
#: Overflow policy: values beyond 38 digits stay string-only (no compute).
U256_DECIMAL = T.DecimalType(38, 0)

# -- wire-format transaction struct (schemas/evm.rs:34-47) -----------------
TRANSACTION_SCHEMA = T.StructType([
    T.StructField("tx_hash", T.StringType(), False),
    T.StructField("block_number", T.LongType(), True),   # pending txs: null
    T.StructField("transaction_index", T.IntegerType(), True),
    T.StructField("from_address", T.StringType(), False),
    T.StructField("to_address", T.StringType(), True),   # null = creation
    T.StructField("value", T.StringType(), True),        # U256 string
    T.StructField("gas_price", T.StringType(), True),
    T.StructField("gas", T.StringType(), True),
    T.StructField("input", T.StringType(), True),
    T.StructField("nonce", T.LongType(), True),
])

# -- wire-format block message (schemas/evm.rs:9-30): the JSON envelope the
#    producer serializes (evm_producer.rs:46) and the consumer parses
#    (evm_consumer.rs:116) -------------------------------------------------
BLOCK_MESSAGE_SCHEMA = T.StructType([
    T.StructField("block_number", T.LongType(), False),
    T.StructField("chain_name", T.StringType(), False),
    T.StructField("hash", T.StringType(), False),
    T.StructField("parent_hash", T.StringType(), False),
    T.StructField("timestamp", T.LongType(), False),     # unix seconds
    T.StructField("miner", T.StringType(), False),
    T.StructField("difficulty", T.StringType(), True),   # U256 string
    T.StructField("total_difficulty", T.StringType(), True),
    T.StructField("gas_used", T.LongType(), True),
    T.StructField("gas_limit", T.LongType(), True),
    T.StructField("size", T.LongType(), True),
    T.StructField("receipts_root", T.StringType(), True),
    T.StructField("extra_data", T.StringType(), True),
    T.StructField("logs_bloom", T.StringType(), True),
    T.StructField("transactions",
                  T.ArrayType(TRANSACTION_SCHEMA, containsNull=False), True),
    T.StructField("uncles", T.ArrayType(T.StringType()), True),
])

# -- flat analytic tables (migrations/0001_initial.sql:6-40) ---------------
BLOCK_FLAT_SCHEMA = T.StructType([
    T.StructField("block_number", T.LongType(), False),
    T.StructField("chain_name", T.StringType(), False),
    T.StructField("hash", T.StringType(), False),
    T.StructField("parent_hash", T.StringType(), False),
    T.StructField("block_ts", T.TimestampType(), False),
    T.StructField("miner", T.StringType(), False),
    T.StructField("difficulty", T.StringType(), True),
    T.StructField("total_difficulty", T.StringType(), True),
    T.StructField("gas_used", T.LongType(), True),
    T.StructField("gas_limit", T.LongType(), True),
    T.StructField("size", T.LongType(), True),
    T.StructField("receipts_root", T.StringType(), True),
    T.StructField("tx_count", T.IntegerType(), False),
    T.StructField("transactions_json", T.StringType(), True),
])

TRANSACTION_FLAT_SCHEMA = T.StructType([
    T.StructField("chain_name", T.StringType(), False),
    T.StructField("block_number", T.LongType(), False),
    T.StructField("tx_hash", T.StringType(), False),
    T.StructField("transaction_index", T.IntegerType(), True),
    T.StructField("from_address", T.StringType(), False),
    T.StructField("to_address", T.StringType(), True),
    T.StructField("value", T.StringType(), False),       # 0-defaulted
    T.StructField("gas_price", T.StringType(), False),   # 0-defaulted
    T.StructField("gas", T.StringType(), False),
    T.StructField("input", T.StringType(), True),
    T.StructField("nonce", T.LongType(), False),         # 0-defaulted
])

# -- Logs entity (README.md:169-196 — declared, never implemented) ---------
LOG_SCHEMA = T.StructType([
    T.StructField("log_index", T.LongType(), False),
    T.StructField("address", T.StringType(), False),
    T.StructField("topics", T.ArrayType(T.StringType()), False),
    T.StructField("data", T.StringType(), False),
    T.StructField("decoded_event",
                  T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("transaction_hash", T.StringType(), False),
    T.StructField("block_number", T.LongType(), False),
])
