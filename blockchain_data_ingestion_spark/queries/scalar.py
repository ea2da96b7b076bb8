"""Scalar function layer — SURVEY.md §2.8 (string / hex / date / math /
conditional / hash / JSON).

REF-grounded ops: hash/address stringification + case-normalization
(evm_consumer.rs:43-50,82-91), topic-name assembly (lib.rs:83,93,137),
unix-seconds→timestamp (evm_consumer.rs:70-71), JSON serialize/parse on the
wire (evm_producer.rs:46 / evm_consumer.rs:116). The rest completes the
declared "further analysis" surface (README.md:5,30,204) over TEXT/hex/
timestamp columns.

Everything here is a built-in ``pyspark.sql.functions`` expression —
JVM-side, whole-stage-codegen'd, no Python boundary — which is exactly why
the scalar layer is free at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import query_sql as Q
from ..catalog import table as T
from . import register


@register(
    "str_tostring_norm",
    oracle="""
    SELECT c_custkey,
           CAST(c_custkey AS VARCHAR) AS custkey_str,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS segment_upper
    FROM customer
    """,
)
def str_tostring_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stringify + case-normalize — the reference stringifies every hash/
    address/U256 with ``.to_string()`` and the engine lowercases hex
    (evm_consumer.rs:43-50,82-91)."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("custkey_str"),
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("segment_upper"),
    )


@register(
    "str_concat_format",
    oracle="""
    SELECT doc_id,
           'persistent://public/default/' || source || '-' || lang AS topic,
           concat_ws('-', source, lang, 'historical') AS topic_hist,
           printf('%s-%05d', source, doc_id) AS padded_id
    FROM documents
    """,
)
def str_concat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-name assembly (reference builds
    ``persistent://public/default/{chain}-{schema}[-historical]`` via
    format!/+ at lib.rs:83,93,137)."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(F.lit("persistent://public/default/"),
                 F.col("source"), F.lit("-"), F.col("lang")).alias("topic"),
        F.concat_ws("-", "source", "lang", F.lit("historical"))
         .alias("topic_hist"),
        F.format_string("%s-%05d", "source", "doc_id").alias("padded_id"),
    )


@register(
    "str_like_substr",
    oracle="""
    SELECT p_partkey,
           substring(p_name, 1, 8) AS name_prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           trim(p_brand) AS brand_trim,
           split_part(p_type, ' ', 1) AS type_head,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           replace(p_type, ' ', '_') AS type_snake,
           CAST(position('a' IN p_name) AS BIGINT) AS first_a
    FROM part WHERE p_name LIKE '%a%'
    """,
)
def str_like_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substr/length/trim/split/regexp/replace/instr + LIKE filter —
    address-prefix analytics over the reference's TEXT columns
    (migrations/0001_initial.sql:10-11,31-37)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.col("p_brand")).alias("brand_trim"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
    )


@register(
    "hex_codec",
    oracle="""
    SELECT o_orderkey,
           to_hex(o_orderkey) AS key_hex,
           o_orderkey AS key_decoded,
           substring('0x' || to_hex(o_orderkey), 1, 6) AS selector,
           decode(unhex(hex(o_orderstatus))) AS status_roundtrip
    FROM orders WHERE o_orderkey < 5000
    """,
)
def hex_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hex encode/decode round-trip + method-selector extraction (first
    bytes of 0x calldata — the ``input`` column analog,
    migrations/0001_initial.sql:37): numeric hex via `hex`/`conv`,
    byte-level via `unhex` (string → hex → bytes → utf-8, identity)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    key_hex = F.hex(F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        key_hex.alias("key_hex"),
        F.conv(key_hex, 16, 10).cast("long").alias("key_decoded"),
        F.substring(F.concat(F.lit("0x"), key_hex), 1, 6).alias("selector"),
        F.decode(F.unhex(F.hex(F.col("o_orderstatus"))), "utf-8")
         .alias("status_roundtrip"),
    )


@register(
    "date_from_unix",
    oracle="""
    SELECT event_id,
           epoch_us(ts) AS ts_micros,
           CAST(epoch_ms(ts) // 1000 AS BIGINT) AS ts_seconds,
           make_timestamp(epoch_us(ts)) AS ts_roundtrip
    FROM events
    """,
)
def date_from_unix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unix-epoch ↔ timestamp conversions (the reference converts unix
    seconds → PrimitiveDateTime at evm_consumer.rs:70-71)."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_micros("ts").alias("ts_micros"),
        F.floor(F.unix_micros("ts") / 1_000_000).cast("long")
         .alias("ts_seconds"),
        F.timestamp_micros(F.unix_micros("ts")).alias("ts_roundtrip"),
    )


@register(
    "date_trunc_extract",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           date_trunc('day', o_orderdate) AS order_day,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mth,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01')
             AS BIGINT) AS days_to_y2k,
           o_orderdate + INTERVAL 3 DAY AS plus3d
    FROM orders WHERE o_custkey < 200
    """,
)
def date_trunc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / extract / date arithmetic over the timestamp model
    (timestamp col, migrations/0001_initial.sql:12). Spark ``weekday()+1``
    == ISO day-of-week (DuckDB ``isodow``)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.date_trunc("day", "o_orderdate").alias("order_day"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
         .cast("long").alias("days_to_y2k"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAY")).alias("plus3d"),
    )


@register(
    "math_arith",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / 100000.0 AS price_scaled,
           CAST(((o_orderkey % 7) + 7) % 7 AS BIGINT) AS key_mod7,
           abs(o_totalprice - 250000.0) AS dist_from_mid,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k_ceil,
           CASE WHEN o_totalprice > 0
                THEN round(ln(o_totalprice), 6) END AS log_price,
           CASE WHEN o_totalprice >= 0
                THEN round(sqrt(o_totalprice), 6) END AS sqrt_price,
           round(power(o_totalprice, 0.25), 6) AS price_4rt
    FROM orders WHERE o_orderkey < 5000
    """,
)
def math_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic/math scalars incl. the wei→eth-style fixed-point
    division (U256-as-decimal columns, SURVEY §1.2). Transcendentals
    (ln/sqrt/pow) rounded inside the cross-libm error bound.

    Domain guards (r12 shape-fuzz, probed): Spark's log is NULL at
    x <= 0 and sqrt is NaN at x < 0 (both canon to null), while
    DuckDB RAISES on both — the oracle's CASE guards reproduce the
    null-not-error posture. power(x, 0.25) is NaN-for-negative on
    BOTH engines, so it stays bare."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    return o.select(
        "o_orderkey",
        (F.col("o_totalprice") / 100000.0).alias("price_scaled"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("long").alias("key_mod7"),
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_from_mid"),
        F.floor(F.col("o_totalprice") / 1000).cast("long")
         .alias("price_k_floor"),
        F.ceil(F.col("o_totalprice") / 1000).cast("long")
         .alias("price_k_ceil"),
        F.round(F.log(F.col("o_totalprice")), 6).alias("log_price"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        F.round(F.pow("o_totalprice", F.lit(0.25)), 6).alias("price_4rt"),
    )


@register(
    "cond_funcs",
    oracle="""
    SELECT e.event_id,
           coalesce(nullif(e.event_type, 'error'), 'recovered') AS type_fixed,
           greatest(e.value, 100.0) AS val_floor100,
           least(e.value, 100.0) AS val_cap100,
           CASE WHEN e.value IS NULL THEN -1.0 ELSE e.value END AS val_nvl
    FROM events e
    """,
)
def cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/greatest/least/CASE — the null-semantics toolbox
    (the reference zero-defaults missing value/gas_price/nonce but passes
    ``to_address`` NULL through, evm_consumer.rs:45-50)."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")),
                   F.lit("recovered")).alias("type_fixed"),
        F.greatest(F.col("value"), F.lit(100.0)).alias("val_floor100"),
        F.least(F.col("value"), F.lit(100.0)).alias("val_cap100"),
        F.when(F.col("value").isNull(), F.lit(-1.0))
         .otherwise(F.col("value")).alias("val_nvl"),
    )


@register(
    "hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(concat_ws('|', source, lang)) AS key_md5
    FROM documents
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashes for content-addressed dedup keys at 100 TB (md5 /
    sha2-256; both engines emit lowercase hex). The composite key goes
    through concat_ws in BOTH dialects (probed identical null-skip
    semantics): the || spelling nulls the whole key on one null field
    where the engine's concat_ws degrades it (r12 null-seed fuzz)."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat_ws("|", "source", "lang")).alias("key_md5"),
    )


@register(
    "json_serialize",
    oracle="""
    SELECT doc_id,
           to_json(struct_pack(doc_id := doc_id, lang := lang,
                               source := source)) AS doc_json
    FROM documents
    """,
)
def json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct → JSON string — the wire format move (the reference
    serializes whole blocks with serde_json at evm_producer.rs:46).
    ``ignoreNullFields=false`` matches DuckDB's explicit-null style."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "source"),
                  {"ignoreNullFields": "false"}).alias("doc_json"),
    )


@register(
    "json_parse",
    # Spark's from_json is the dirty-data posture: malformed input and
    # any non-integral JSON value ("87", 1.9, true, {...}) all yield
    # NULL, never an error. DuckDB's bare json_extract RAISES on
    # malformed input and its CAST coerces strings/doubles/booleans —
    # the r12 shape-fuzzer (tools/fuzz_parity.py) caught the oracle
    # erroring on a planted empty-string props. The twin below matches
    # Spark's strictness exactly (probed over a 14-value matrix): only
    # a JSON integer (json_type UBIGINT/BIGINT) produces a value, and
    # TRY_CAST nulls the >int64 tail instead of raising.
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                 AND json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
                THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT)
           END AS k_typed
    FROM events
    """,
)
def json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string → typed struct via an explicit schema (the consumer's
    ``msg.deserialize()`` analog, evm_consumer.rs:116-122; dead-code
    MessageSchema trait schema.rs:4-7)."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.from_json("props", "k BIGINT").getField("k").alias("k_typed"),
    )


@register(
    "json_path",
    # json_valid guard: get_json_object is NULL on malformed input,
    # DuckDB's json_extract_string raises (fuzz find, r12). On VALID
    # JSON the two agree textually across scalars, objects and doubles
    # (probed: '1e3' renders '1000.0' on BOTH, objects render compact
    # '{"n":1}' on both). Known dialect edge, deliberately untested:
    # integers beyond uint64 — DuckDB parses them as DOUBLE and
    # re-renders '1e20…', Spark echoes the raw token; no SQL twin can
    # recover the original text from DuckDB's parsed value.
    oracle="""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str
    FROM events
    """,
)
def json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad-hoc JSON-path extraction without a schema (the JSONB
    ``transactions`` column analog, migrations/0001_initial.sql:20)."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
    )


# ---------------------------------------------------------------------------
# str_regexp — regular-expression extract / replace / match
# ---------------------------------------------------------------------------

@register(
    "str_regexp",
    # Oracles diverge in dialect, not semantics: DuckDB's
    # regexp_replace is first-match unless the 'g' flag is passed,
    # Spark's replaces all matches — so the oracle spells the flag out.
    oracle=r"""
    SELECT doc_id,
           regexp_extract(source, '([a-z]+)_?([0-9]*)', 1) AS src_word,
           regexp_replace(text, '[aeiou]', '*', 'g') AS devoweled_head,
           CAST(regexp_matches(text, 'merge [a-z]+ join') AS BOOLEAN)
             AS has_merge_join
    FROM (SELECT doc_id, source, substring(text, 1, 40) AS text
          FROM documents)
    ORDER BY doc_id
    """,
)
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: group extract, global replace, and boolean
    match — the log-parsing workhorses (the reference's raw entities
    carry free-form hex/log payloads, README.md:187-196).

    Dialect note carried in code, not prose: Spark's regexp_replace is
    global by default where DuckDB's needs the 'g' flag, and Spark
    spells boolean match ``rlike`` vs DuckDB ``regexp_matches`` — the
    patterns here are plain POSIX classes that mean the same thing in
    Java regex and RE2, so values hash-match even though the call
    syntax differs.

    Scale: pure codegen row expressions over a pushed 3-column scan —
    no shuffle, no Python.
    """
    d = (T(spark, sf_dir, "documents")
         .select("doc_id", "source",
                 F.substring("text", 1, 40).alias("text")))
    return (d.select(
        "doc_id",
        F.regexp_extract("source", r"([a-z]+)_?([0-9]*)", 1)
         .alias("src_word"),
        F.regexp_replace("text", r"[aeiou]", "*")
         .alias("devoweled_head"),
        F.col("text").rlike("merge [a-z]+ join").alias("has_merge_join"))
        .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# cast_try — TRY_CAST: dirty-data casting that yields NULL, not a crash
# ---------------------------------------------------------------------------

_TRY_CAST_SQL = """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(TRY_CAST(substring(text, 1, 3) AS DOUBLE)) AS BIGINT)
             AS n_numeric_prefix,
           CAST(count(TRY_CAST(lang AS INT)) AS BIGINT) AS n_lang_numeric,
           CAST(count(TRY_CAST(CAST(n_chars AS STRING) AS BIGINT))
                AS BIGINT) AS n_chars_roundtrip
    FROM documents
    GROUP BY source
    ORDER BY source
"""


@register("cast_try", oracle=_TRY_CAST_SQL)
def cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST over free-form fields: malformed values become NULL
    instead of failing the job — the ingestion posture for dirty wire
    data (the reference trusts its RPC JSON; a 100 TB landing zone
    cannot). The audit counts castable values per source: a word
    prefix is never numeric, a language tag never an int, and a
    numeric round-trip always survives — so the counts pin both the
    permissive and the strict directions.

    Scale: TRY_CAST is a codegen row expression (ANSI-safe by
    construction — no per-row exception handling); the audit is one
    two-phase aggregate. Identical SQL text on both engines.
    """
    return Q(spark, sf_dir, _TRY_CAST_SQL)


# ---------------------------------------------------------------------------
# json_variant — Spark 4 VARIANT ingestion of semi-structured payloads
# ---------------------------------------------------------------------------

@register(
    "json_variant",
    # try_variant_get('long') COERCES where from_json is strict — the
    # ladder below reproduces its probed coercion table in DuckDB
    # dialect, arm by arm: JSON integers pass through exactly (TRY_CAST
    # nulls the >int64 tail); doubles TRUNCATE toward zero (-0.9 → 0,
    # where DuckDB's own BIGINT cast would round to -1); booleans map
    # to 1/0; strings coerce ONLY when integral after trim (regex arm
    # — fuzz-caught: a double-truncation fallback turned '87.5' into
    # 87 where Spark's variant string→long is strict and yields NULL;
    # DuckDB's bare TRY_CAST would have rounded it to 88); objects,
    # arrays, missing paths and malformed documents are NULL.
    oracle="""
    WITH kv AS (
      SELECT event_id,
             json_type(props, '$.k') AS t,
             json_extract(props, '$.k') AS j,
             json_extract_string(props, '$.k') AS s
      FROM events WHERE event_id < 2000
        AND coalesce(json_valid(props), FALSE)
      UNION ALL
      -- coalesce both branches: json_valid(NULL) is NULL, so a bare
      -- valid/NOT-valid split drops NULL-props rows from BOTH arms
      -- (r12 null-seed fuzz: 748 vs 744 rows)
      SELECT event_id, NULL, NULL, NULL
      FROM events WHERE event_id < 2000
        AND NOT coalesce(json_valid(props), FALSE)
    ), typed AS (
      SELECT event_id,
             CASE WHEN t IN ('UBIGINT', 'BIGINT')
                    THEN TRY_CAST(j AS BIGINT)
                  WHEN t = 'DOUBLE'
                    THEN TRY_CAST(trunc(TRY_CAST(j AS DOUBLE)) AS BIGINT)
                  WHEN t = 'BOOLEAN'
                    THEN CASE WHEN CAST(j AS BOOLEAN) THEN 1 ELSE 0 END
                  WHEN t = 'VARCHAR' THEN
                    CASE WHEN regexp_matches(trim(s), '^[+-]?[0-9]+$')
                         THEN TRY_CAST(trim(s) AS BIGINT) END
             END AS k
      FROM kv)
    SELECT event_id, k, k % 10 AS k_mod
    FROM typed ORDER BY event_id
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark 4's VARIANT type:
    ``parse_json`` once into a VARIANT column, then typed
    ``variant_get`` path extraction — the open-schema answer to the
    reference's JSON-string `props`/log payloads (`json_path` covers
    the classic get_json_object route; VARIANT replaces per-access
    string re-parsing with a binary-encoded parse-once value, the
    same shift Parquet VARIANT shredding standardizes).

    Scale: parse_json is a per-row kernel (codegen, no Python);
    downstream extractions read the binary variant without
    re-tokenizing — with N extractions per row the string route
    parses N times, VARIANT once. Storage-side, Spark 4 writes
    VARIANT to Parquet as typed shredded subcolumns, restoring
    pushdown over the semi-structured fields.
    """
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    # try_* pair, not parse_json/variant_get: the strict forms RAISE on
    # malformed documents and on uncastable values ("str" → 'long'),
    # which is the wrong posture for a semi-structured landing zone —
    # one bad payload in 100 TB must not kill the job (r12 shape-fuzz).
    return (e.select("event_id",
                     F.expr("try_parse_json(props)").alias("v"))
             .select("event_id",
                     F.expr("try_variant_get(v, '$.k', 'long')")
                      .alias("k"))
             .withColumn("k_mod", F.col("k") % 10)
             .orderBy("event_id"))


# ---------------------------------------------------------------------------
# ddl_sql_udf — catalog-registered SQL UDF (CREATE FUNCTION ... RETURN)
# ---------------------------------------------------------------------------

@register(
    "ddl_sql_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT) AS net_cents,
           CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      * 100) AS BIGINT) AS gross_cents
    FROM lineitem WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
)
def ddl_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 ``CREATE FUNCTION ... RETURN expr``):
    the business logic (`net_price`, `gross_price`) registers ONCE in
    the catalog as a SQL expression and every query calls it by name —
    shared pricing semantics without a Python UDF (stays in codegen)
    and without copy-pasted expressions drifting apart. The oracle
    inlines the same arithmetic, proving the function boundary is
    semantically free (reported as floor-cents — the engines' round()
    half-rules differ at exact .5 cents, the usual cross-engine trap).

    Scale: Catalyst inlines SQL UDF bodies into the caller's plan at
    analysis time — identical physical plan to hand-inlined
    expressions (whole-stage codegen, pushdown through the call), so
    the abstraction costs zero at any scale. Idempotent OR REPLACE
    registration keeps the op re-runnable in one session.
    """
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d)""")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION gross_price(
            p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d) * (1 + t)""")
    return Q(spark, sf_dir, """
        SELECT l_orderkey, l_linenumber,
               CAST(floor(net_price(l_extendedprice, l_discount) * 100)
                    AS BIGINT) AS net_cents,
               CAST(floor(gross_price(l_extendedprice, l_discount, l_tax)
                          * 100) AS BIGINT) AS gross_cents
        FROM lineitem WHERE l_orderkey < 500
        ORDER BY l_orderkey, l_linenumber
    """)
