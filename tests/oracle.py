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
    # all three pandas missing scalars canon alike (pd.NA / NaT appear
    # only via extension/datetime dtypes; both engines' frames go
    # through the same lane, so this is a spelling choice, not a
    # verdict change — and it keeps the fast lane cell-identical)
    if v is None or v is pd.NaT or v is pd.NA:
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


#: Above this row count compare_frames switches from the exact
#: cell-wise canon (itertuples + tuple sort — ~300 s for a 10M-row
#: frame, the sf10 sweep's real bottleneck) to a vectorized canonical
#: hash multiset. Semantics are pinned equal by
#: test_operators.test_fast_compare_path_matches_exact_canon; the only
#: theoretical difference is a 64-bit multiset hash collision masking a
#: real diff (~1e-6 at 10M rows) — acceptable for the replicated-tier
#: sweep tool; the driver gate and parity suite run far below this
#: threshold and always take the exact path.
_FAST_ROWS = 200_000

#: Largest magnitude float64 represents exactly for every integer.
_EXACT_INT_LIMIT = float(2 ** 53)


def _canon_col(s: pd.Series) -> pd.Series:
    """Vectorized per-column mirror of `_canon_cell`.

    str() == repr() for python floats, and numpy/pandas astype(str)
    emits the same shortest-roundtrip form for float64/float32, so the
    numeric fast lanes are C-speed; datetimes keep isoformat (its
    conditional fractional part is not strftime-able); everything else
    falls back to the exact cell function."""
    if pd.api.types.is_float_dtype(s):
        # widen float32 first: the exact lane's iteration boxes every
        # float cell to a PYTHON float (double), so float32 0.1 canons
        # as '0.10000000149011612', not its float32 shortest repr
        return s.astype("float64").astype(str).mask(s.isna(), "∅")
    if pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
        return s.astype(str).mask(s.isna(), "∅")
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.map(lambda v: "∅" if pd.isna(v) else v.isoformat())
    return s.map(_canon_cell)


def _canon_hash_multiset(df: pd.DataFrame):
    # Per-column hashing, then a column-ORDER-dependent elementwise mix
    # (multiply-rotate-xor over uint64). Hashing each column alone
    # removes the r12 separator ambiguity: with a '\x1f'-joined row
    # string, a string cell CONTAINING '\x1f' could re-segment the row
    # and make two different frames hash identically (ADVICE r12 #3).
    import numpy as np
    cols = sorted(df.columns)
    mix = np.uint64(0x9E3779B97F4A7C15)   # 2^64/phi, odd → bijective mul
    acc = None
    for c in cols:
        canon = _canon_col(df[c].reset_index(drop=True))
        hc = (pd.util.hash_pandas_object(canon, index=False)
              .to_numpy().astype(np.uint64))
        acc = hc.copy() if acc is None else (acc * mix) ^ hc
    acc.sort()
    return acc


def _align_int_float(a: pd.DataFrame, b: pd.DataFrame
                     ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Column-pairwise physical-dtype alignment before canon.

    When an integer column carries NULLs, the two pandas producers
    diverge PHYSICALLY on identical values: Spark's toPandas yields an
    object column of ints+None (canon '23'), DuckDB's fetchdf a float64
    column (canon '23.0'). That is a representation artifact, not a
    value difference — so when exactly one side of a pair is float,
    the other is lifted to float64 and both canon identically. A side
    that cannot lift (true strings) is left alone and any real
    mismatch still reports. (r12 null-seed fuzz: 8 keys false-flagged
    on this before alignment.)

    Precision guard (ADVICE r12 #2): float64 represents every integer
    only up to 2^53, so lifting a BIGINT column whose magnitudes exceed
    that would make a real ±1-unit divergence compare equal. When
    either side of the pair carries a magnitude ≥ 2^53, both sides are
    instead canonicalized to the null-aware Int64 extension dtype
    (exact); if the float side is not integral-representable there
    (true fractions / overflow), the lift falls back to float64 — in
    that case the values were never exact integers to begin with."""
    a, b = a.copy(), b.copy()
    for c in a.columns:
        if c not in b.columns:
            continue
        fa = pd.api.types.is_float_dtype(a[c])
        fb = pd.api.types.is_float_dtype(b[c])
        if fa == fb:
            continue
        target = a if fb else b      # lift the non-float side
        floats = b[c] if fb else a[c]
        try:
            lifted = target[c].astype("float64")
        except (ValueError, TypeError):
            continue
        big = bool((lifted.abs() >= _EXACT_INT_LIMIT).any()
                   or (floats.abs() >= _EXACT_INT_LIMIT).any())
        if big:
            try:
                a[c] = a[c].astype("Int64")
                b[c] = b[c].astype("Int64")
                continue
            except (ValueError, TypeError):
                pass                 # non-integral floats: lift anyway
        target[c] = lifted
    return a, b


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str | None:
    """Return None on match, else a human-readable mismatch description."""
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return (f"column mismatch: spark={sorted(spark_pdf.columns)} "
                f"oracle={sorted(oracle_pdf.columns)}")
    if len(spark_pdf) != len(oracle_pdf):
        return f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    spark_pdf, oracle_pdf = _align_int_float(spark_pdf, oracle_pdf)
    if len(spark_pdf) > _FAST_ROWS:
        import numpy as np
        hs, ho = (_canon_hash_multiset(spark_pdf),
                  _canon_hash_multiset(oracle_pdf))
        if not np.array_equal(hs, ho):
            return (f"value multiset mismatch (fast path): "
                    f"{int((hs != ho).sum())} differing hash slots of "
                    f"{len(hs)}; re-run the key at a smaller tier for "
                    f"a row-level diff")
        return None
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
