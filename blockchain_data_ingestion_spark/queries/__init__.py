"""Operator registry — the driver-facing inventory.

Every operator key from SURVEY.md §2 registers here as a
:class:`QuerySpec`: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) a DuckDB oracle SQL string computing the same result
over the same parquet tables. ``__spark_entry__.py`` is a thin adapter over
this registry.

Determinism rules every spec obeys (see ``numeric`` module):
- float aggregates go through exact decimal sums, surfaced as rounded
  doubles, identically on both sides;
- window/top-k orderings always include a unique tie-break key;
- array-valued outputs are sorted and serialized to strings before hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "REGISTRY", "register", "load_all"]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        """Docstring resolved DYNAMICALLY from the callable — several
        operators render module constants into their plain-string
        docstrings AFTER definition (``fn.__doc__ = fn.__doc__
        .replace(...)``), which a decoration-time snapshot would miss
        (the r8 ADVICE brace-leak class)."""
        return (self.spark.__doc__ or "").strip()


REGISTRY: dict[str, QuerySpec] = {}


def register(key: str, oracle: str | None = None,
             tags: tuple[str, ...] = ()):
    """Decorator: register a ``(spark, sf_dir) -> DataFrame`` callable."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if key in REGISTRY:
            raise KeyError(f"duplicate query key {key!r}")
        REGISTRY[key] = QuerySpec(key=key, spark=fn, oracle=oracle,
                                  tags=tags)
        return fn
    return deco


_MODULES = (
    "relational",
    "aggregates",
    "windows",
    "scalar",
    "nested",
    "ingest_q",
    "streaming_q",
    "llm_text",
    "llm_vec",
    "llm_pipeline",
    "tpch",
    "analytics",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return the
    full registry ordered by module then definition order."""
    for mod in _MODULES:
        importlib.import_module(f"{__package__}.{mod}")
    return REGISTRY
