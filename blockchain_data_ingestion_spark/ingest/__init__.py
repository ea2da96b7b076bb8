"""Ingestion layer: wire-format JSON → flat analytic tables.

The Spark-first re-expression of the reference's consumer transform
(evm_consumer.rs:36-105): one declarative DataFrame transform per entity
instead of row-at-a-time accessor code + SQL INSERTs.
"""

from .transform import (
    blocks_from_messages,
    parse_block_messages,
    transactions_from_messages,
    write_analytic_table,
)

__all__ = [
    "parse_block_messages",
    "blocks_from_messages",
    "transactions_from_messages",
    "write_analytic_table",
]
