"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry key's Spark callable and its oracle SQL side-by-side,
then compares row count, column-name set, and an order-insensitive view of
the values. Used by the pytest suite as the pre-flight for the driver's
CORRECTNESS gate.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from blockchain_data_ingestion_spark.catalog import TABLES
from blockchain_data_ingestion_spark.scratch import duckdb_spill_config

__all__ = ["run_oracle", "compare_frames", "oracle_connection", "check_key",
           "spill_connect"]


def spill_connect() -> duckdb.DuckDBPyConnection:
    """Ad-hoc DuckDB connection with spill pinned to <repo>/.tmp — the
    one place the tools' stale-spill sweep looks. Tests that build
    their own views must use this instead of bare ``duckdb.connect()``
    (ADVICE r11: six bare sites undercut the r11 spill-dir fix)."""
    return duckdb.connect(config=duckdb_spill_config())


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    # spill pinned to <repo>/.tmp so a killed run's leftovers are
    # always where the tools' cleanup looks (r11 review pass 3)
    con = spill_connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = oracle_connection(sf_dir)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # bit-stable doubles on both sides per the numeric contract
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str | None:
    """Return None on match, else a human-readable mismatch description."""
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return (f"column mismatch: spark={sorted(spark_pdf.columns)} "
                f"oracle={sorted(oracle_pdf.columns)}")
    if len(spark_pdf) != len(oracle_pdf):
        return f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    s_rows = _canon_rows(spark_pdf)
    o_rows = _canon_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        return (f"{len(diffs)} differing rows (of {len(s_rows)}); "
                f"first: spark={diffs[0][0]} oracle={diffs[0][1]}")
    return None


def check_key(spark, sf_dir: str, key: str) -> str | None:
    """Run one registry key both ways; None = match."""
    from blockchain_data_ingestion_spark.queries import load_all

    spec = load_all()[key]
    spark_pdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return None if len(spark_pdf) >= 0 else "spark query failed"
    oracle_pdf = run_oracle(sf_dir, spec.oracle)
    return compare_frames(spark_pdf, oracle_pdf)
