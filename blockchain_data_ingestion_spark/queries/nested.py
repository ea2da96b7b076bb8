"""Nested-data operators — SURVEY.md §2.8 array/map subset.

The reference's core dataflow move is unnesting a block's embedded
transaction array into per-transaction rows (``for transaction in
block_message.transactions()``, evm_consumer.rs:124-126) and re-nesting it
as a JSONB array column (migrations/0001_initial.sql:20); logs carry a
``topics: array<string>`` (README.md:191) and decoded events a string map
(README.md:192). The fixtures realize arrays as tokenized ``documents.text``.

Array outputs are sorted + serialized to strings before hashing (multiset
order is engine-dependent); element positions use the 1-based convention so
Spark ``posexplode``+1 lines up with DuckDB ``generate_subscripts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table as T
from . import register

def _tokens():
    """Tokenized text column (built lazily: Column exprs need a session)."""
    return F.split(F.col("text"), " ")


@register(
    "arr_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 200
    """,
)
def arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest an embedded array into one row per element — THE reference
    dataflow move (block.transactions → tx rows, evm_consumer.rs:124-126).

    At 100 TB ``explode`` is generate-side (no shuffle); nested-schema
    pruning keeps unread struct fields out of the parquet scan.
    """
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id", F.explode(_tokens()).alias("word"))


@register(
    "arr_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT)
             AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 100
    """,
)
def arr_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional unnest — preserves ``transaction_index`` semantics
    (schemas/evm.rs:40) when exploding an ordered array. 1-based."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.posexplode(_tokens()).alias("pos0", "word")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "word")


@register(
    "arr_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           list_contains(string_split(text, ' '), 'the') AS has_the,
           string_split(text, ' ')[1] AS first_token,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')
             AS head3,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                           ',') AS vocab
    FROM documents
    """,
)
def arr_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array toolbox: size (the reference's only computed aggregate —
    tx_count = len(transactions), evm_consumer.rs:72), contains (topics
    filter, README.md:191), element_at, slice, distinct+sort."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.array_contains(_tokens(), "the").alias("has_the"),
        F.element_at(_tokens(), 1).alias("first_token"),
        F.array_join(F.slice(_tokens(), 1, 3), " ").alias("head3"),
        F.array_join(F.sort_array(F.array_distinct(_tokens())), ",")
         .alias("vocab"),
    )


@register(
    "arr_higher_order",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(list_slice(string_split(text, ' '),
                           1, 5), x -> upper(x)), ' ') AS head5_upper,
           CAST(len(list_filter(string_split(text, ' '),
                                x -> length(x) > 5)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        x -> length(x))) AS BIGINT)
             AS total_chars,
           list_contains(string_split(text, ' '), 'spark') AS mentions_spark
    FROM documents
    """,
)
def arr_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas over arrays (transform / filter / aggregate /
    exists) — the engine-side way to compute over a block's embedded tx
    array without exploding it."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(F.slice(_tokens(), 1, 5), lambda x: F.upper(x)), " ")
         .alias("head5_upper"),
        F.size(F.filter(_tokens(), lambda x: F.length(x) > 5)).cast("long")
         .alias("n_long"),
        F.aggregate(_tokens(), F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x).cast("long"))
         .alias("total_chars"),
        F.exists(_tokens(), lambda x: x == F.lit("spark"))
         .alias("mentions_spark"),
    )


@register(
    "map_funcs",
    oracle="""
    SELECT doc_id,
           'lang,source' AS keys_sorted,
           lang AS lang_val,
           source AS source_val,
           CAST(2 AS BIGINT) AS n_entries
    FROM documents
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType column construction + map_keys/element_at/size — the
    ``decoded_event`` string-map model (README.md:192). The oracle states
    the expected scalars directly; the Spark side must actually round-trip
    them through a MapType column."""
    d = T(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"),
                     F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
        F.size(m).cast("long").alias("n_entries"),
    )


@register(
    "arr_zip_flatten",
    oracle="""
    SELECT doc_id,
           array_to_string(flatten([string_split(lang, '-'),
                                    string_split(source, '-')]), '|')
             AS flat_meta,
           CAST(len(list_zip(string_split(text, ' '),
                             string_split(text, ' '))) AS BIGINT) AS n_zipped
    FROM documents WHERE doc_id < 150
    """,
)
def arr_zip_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip / flatten — multi-array alignment (topics[] × data[]
    style pairing in the logs model)."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.array_join(
            F.flatten(F.array(F.split("lang", "-"), F.split("source", "-"))),
            "|").alias("flat_meta"),
        F.size(F.arrays_zip(_tokens(), _tokens())).cast("long").alias("n_zipped"),
    )


# ---------------------------------------------------------------------------
# arr_explode_outer — null-preserving flatten
# ---------------------------------------------------------------------------

@register(
    "arr_explode_outer",
    # DuckDB spells null-preserving unnest as LEFT JOIN LATERAL.
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= 12
                  THEN [] ELSE string_split(text, ' ') END AS toks
      FROM documents
    )
    SELECT doc_id, t.tok
    FROM d LEFT JOIN LATERAL (SELECT unnest(toks) AS tok) t ON TRUE
    ORDER BY doc_id, tok
    """,
    tags=("nested",),
)
def arr_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — the null-preserving flatten: a parent row with
    an EMPTY (or null) array survives as one row with a NULL element,
    where plain explode silently drops it. That asymmetry is the
    classic silent-data-loss bug in flatten-then-rejoin pipelines
    (every long document here is masked to an empty token list, so the
    fixture exercises BOTH branches). DuckDB spells the same semantics
    as LEFT JOIN LATERAL unnest.

    Scale: same narrow Generate (explode) node as the plain flatten —
    outer-ness is a flag on the generator, not a join.
    """
    d = T(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CASE WHEN size(split(text, ' ')) >= 12 THEN array() "
        "ELSE split(text, ' ') END AS toks")
    return (d.select("doc_id", F.explode_outer("toks").alias("tok"))
             .orderBy("doc_id", "tok"))
