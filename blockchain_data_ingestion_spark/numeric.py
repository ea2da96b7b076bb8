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

__all__ = ["dec_sum", "dec_avg", "rounded", "oracle_dec_sum", "oracle_dec_avg"]

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
