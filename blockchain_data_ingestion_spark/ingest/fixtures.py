"""Deterministic domain fixtures (FIXTURES.md §A).

Pure-python generator for wire-format block messages: 2 chains × N blocks,
0–20 txs per block with a skewed tail (a few 200-tx blocks for AQE skew
tests), hashes derived from sha256(chain, number), fixed seed. Includes
out-of-order and duplicate block numbers so streaming dedup/watermark tests
have late data to chew on.

Everything is derived from (chain, block_number) — no RNG state leaks, so
any subset regenerates identically.
"""

from __future__ import annotations

import hashlib
import json

__all__ = ["block_message", "block_messages", "message_stream_batches"]

GENESIS_TS = 1_700_000_000  # fixed epoch base, 12s block time


def _hx(*parts: object, n: int = 64) -> str:
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).hexdigest()
    return "0x" + (h * 2)[:n]


def _det(seed: str, mod: int) -> int:
    """Deterministic pseudo-random int in [0, mod)."""
    return int.from_bytes(hashlib.sha256(seed.encode()).digest()[:8],
                          "big") % mod


def block_message(chain: str, number: int) -> dict:
    """One wire-format block message (schemas/evm.rs:9-30 shape)."""
    n_tx = _det(f"{chain}|{number}|ntx", 21)
    if number % 97 == 0:                      # skew: a few 200-tx blocks
        n_tx = 200
    txs = []
    for i in range(n_tx):
        seed = f"{chain}|{number}|{i}"
        creates_contract = _det(seed + "|cc", 10) == 0
        missing_value = _det(seed + "|mv", 10) == 0  # unwrap_or_default path
        txs.append({
            "tx_hash": _hx(seed, "tx"),
            "block_number": number,
            "transaction_index": i,
            "from_address": _hx(seed, "from", n=40),
            "to_address": None if creates_contract else _hx(seed, "to", n=40),
            "value": None if missing_value
                     else str(_det(seed + "|val", 10**19) * 10**3),
            "gas_price": str(_det(seed + "|gp", 500) * 10**9),
            "gas": str(21000 + _det(seed + "|g", 10**6)),
            "input": "0x" if _det(seed + "|in", 3) == 0
                     else _hx(seed, "input", n=128),
            "nonce": _det(seed + "|nonce", 10**6),
        })
    return {
        "block_number": number,
        "chain_name": chain,
        "hash": _hx(chain, number),
        "parent_hash": _hx(chain, number - 1),
        "timestamp": GENESIS_TS + number * 12,
        "miner": _hx(chain, number, "miner", n=40),
        "difficulty": str(10**15 + _det(f"{chain}|{number}|d", 10**12)),
        "total_difficulty": str((10**15) * (number + 1)),
        "gas_used": 1_000_000 + _det(f"{chain}|{number}|gu", 29_000_000),
        "gas_limit": 30_000_000,
        "size": _det(f"{chain}|{number}|sz", 120_000),
        "receipts_root": _hx(chain, number, "receipts"),
        "extra_data": "0x",
        "logs_bloom": _hx(chain, number, "bloom", n=64),
        "transactions": txs,
        "uncles": [_hx(chain, number, "uncle")]
                  if _det(f"{chain}|{number}|u", 20) == 0 else [],
    }


def block_messages(chains: tuple[str, ...] = ("ETH", "ARB"),
                   n_blocks: int = 200) -> list[str]:
    """JSON-serialized messages for all chains (in-order)."""
    return [json.dumps(block_message(c, n))
            for c in chains for n in range(n_blocks)]


def message_stream_batches(chain: str = "ETH", n_blocks: int = 60
                           ) -> list[list[str]]:
    """Two micro-batch payloads with late + duplicate arrivals:

    batch 0: blocks 0..n-1 except every 7th (they arrive late);
    batch 1: the held-back blocks (out of order) + duplicates of every
             10th block (at-least-once redelivery analog,
             evm_consumer.rs:130-133).
    """
    held = [n for n in range(n_blocks) if n % 7 == 3]
    batch0 = [json.dumps(block_message(chain, n))
              for n in range(n_blocks) if n not in held]
    batch1 = [json.dumps(block_message(chain, n)) for n in held]
    batch1 += [json.dumps(block_message(chain, n))
               for n in range(0, n_blocks, 10)]
    return [batch0, batch1]
