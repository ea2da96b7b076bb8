"""Cross-engine numeric determinism helpers.

The driver value-hashes every query's result against a DuckDB oracle. Plain
``sum(double)`` is order-dependent (IEEE addition is not associative), and a
parallel Spark aggregation will not reproduce DuckDB's sequential sum bit--
for-bit. The fix mirrors SURVEY.md §7's watch-list: route money-style sums
through exact decimal arithmetic, then surface a rounded double.

Contract used by every registered query AND its oracle SQL:

  sum:  cast( sum( cast(x as decimal(18,S)) ) as double)
  avg:  cast( sum( cast(x as decimal(18,S)) ) as double) / count(x)

Decimal sums are exact, hence order-independent; the final decimal→double
conversion and the division on identical doubles are deterministic IEEE
ops, so Spark and DuckDB agree to the last bit. Deliberately NO final
``round()``: Spark's ``round`` on doubles rounds the shortest decimal
repr (``BigDecimal.valueOf``) while DuckDB rounds the exact binary value,
so any value sitting on a .xx5 boundary flips between engines. Exact
results need no rounding; only genuinely approximate statistics (stddev,
corr, cosine sums) get rounded — to few enough digits that order-dependent
error (~1e-12 relative) cannot surface, where a tie landing exactly on a
round boundary is measure-zero.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec_sum", "dec_avg", "rounded", "oracle_dec_sum",
           "oracle_dec_avg", "cents_sum", "cents_avg", "oracle_cents_sum",
           "oracle_cents_avg"]

#: decimal scale used for per-row casts (money values have 2-digit cents;
#: 4 guards products like price*(1-discount)).
SCALE = 4


def dec_sum(col: Column | str, alias: str,
            scale: int = SCALE) -> Column:
    """Order-independent sum of a double column, surfaced as a double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str,
            scale: int = SCALE) -> Column:
    """Order-independent average: exact decimal sum / count, in doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
            / F.count(c)).alias(alias)


def rounded(col: Column, alias: str, round_to: int = 6) -> Column:
    """Round an order-sensitive statistic far inside its error bound."""
    return F.round(col.cast("double"), round_to).alias(alias)


# ---- oracle-side (DuckDB SQL) twins -------------------------------------

def oracle_dec_sum(expr: str, alias: str, scale: int = SCALE) -> str:
    return (f"CAST(sum(CAST(({expr}) AS DECIMAL(18,{scale}))) "
            f"AS DOUBLE) AS {alias}")


def oracle_dec_avg(expr: str, alias: str, scale: int = SCALE) -> str:
    return (f"CAST(sum(CAST(({expr}) AS DECIMAL(18,{scale}))) "
            f"AS DOUBLE) / count({expr}) AS {alias}")


# ---- int64 cents fast path ----------------------------------------------
# For 2-decimal money columns, summing CAST(round(x*100) AS BIGINT) is
# exact integer math (same determinism guarantee as the decimal route,
# ~2.5× faster: no decimal128 accumulation). Overflow bound: int64 caps a
# group's sum at ~9.2e16 cents = $9.2e14 — two orders of magnitude above
# any per-group revenue at the 100 TB design point; beyond that, fall
# back to dec_sum.

def cents_sum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a 2-decimal money double, via int64 cents."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.round(c * 100).cast("long")).cast("double") / 100
            ).alias(alias)


def cents_avg(col: Column | str, alias: str) -> Column:
    """Order-independent average via int64 cents sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.round(c * 100).cast("long")).cast("double") / 100
            / F.count(c)).alias(alias)


def oracle_cents_sum(expr: str, alias: str) -> str:
    return (f"CAST(sum(CAST(round(({expr}) * 100) AS BIGINT)) AS DOUBLE)"
            f" / 100 AS {alias}")


def oracle_cents_avg(expr: str, alias: str) -> str:
    return (f"CAST(sum(CAST(round(({expr}) * 100) AS BIGINT)) AS DOUBLE)"
            f" / 100 / count({expr}) AS {alias}")
