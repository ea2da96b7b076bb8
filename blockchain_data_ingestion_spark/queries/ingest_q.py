"""Ingestion-surface operators — SURVEY.md §2.1 (sources/sinks) and the
REF projection/cast family of §2.2, realized over the fixture tables
(role mapping FIXTURES.md §B: orders ~ blocks, lineitem ~ transactions).

The true domain transform (wire JSON → blocks/transactions tables) lives in
``ingest.transform`` and is exercised by the pytest suite over generated
FIXTURES.md §A data; these registry entries express the same operator
shapes over the driver's oracle-comparable tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table as T
from ..catalog import query_sql as Q
from ..scratch import fresh_scratch_dir
from . import register

# ---------------------------------------------------------------------------
# §2.1 sources / sinks
# ---------------------------------------------------------------------------


@register(
    "src_batch_range",
    oracle="""
    SELECT o_orderkey AS block_number, o_orderdate AS block_ts, o_totalprice
    FROM orders WHERE o_orderkey BETWEEN 200 AND 1200
    """,
)
def src_batch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical batch range scan — fetch blocks start..=end
    (evm_producer.rs:58-69, sequential per-block RPC loop; config range
    lib.rs:33-34 / blockchains.toml:13-14).

    Engine form: one pushed-down BETWEEN over the landing table. The
    reference's per-block HTTP round-trip becomes a parquet row-group
    predicate; at 100 TB the range prunes partitions before any IO.
    """
    o = T(spark, sf_dir, "orders")
    return (o.filter(F.col("o_orderkey").between(200, 1200))
             .select(F.col("o_orderkey").alias("block_number"),
                     F.col("o_orderdate").alias("block_ts"),
                     "o_totalprice"))


@register(
    "src_latest_block",
    oracle="""
    SELECT max(o_orderkey) AS latest_block, max(o_orderdate) AS latest_ts,
           CAST(count(*) AS BIGINT) AS n_blocks
    FROM orders
    """,
)
def src_latest_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-block liveness lookup (trait adapters.rs:20-23, impl
    evm_adapter.rs:86-98, README.md:136-139 usage mode 3). A metadata-sized
    global aggregate: parquet footer max-stats make this near-free."""
    o = T(spark, sf_dir, "orders")
    return o.agg(F.max("o_orderkey").alias("latest_block"),
                 F.max("o_orderdate").alias("latest_ts"),
                 F.count("*").alias("n_blocks"))


@register(
    "src_config_fanout",
    oracle="""
    SELECT chain_name, CAST(count(*) AS BIGINT) AS n_rows,
           max(block_number) AS head
    FROM (
      SELECT 'ETH' AS chain_name, o_orderkey AS block_number
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT 'ARB' AS chain_name, o_orderkey AS block_number
      FROM orders WHERE o_orderkey % 2 = 1
    ) GROUP BY chain_name
    """,
)
def src_config_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-driven multi-chain fan-out → one unioned DataFrame
    (the per-chain × per-schema task loop, lib.rs:64-130; consumer fan-out
    :132-160). Each chain is a filtered source tagged with its
    ``chain_name`` discriminator; per-chain heads come from one grouped
    aggregate instead of N independent tasks."""
    o = T(spark, sf_dir, "orders")
    chains = [
        ("ETH", o.filter(F.col("o_orderkey") % 2 == 0)),
        ("ARB", o.filter(F.col("o_orderkey") % 2 == 1)),
    ]
    frames = [
        df.select(F.lit(name).alias("chain_name"),
                  F.col("o_orderkey").alias("block_number"))
        for name, df in chains
    ]
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    return union.groupBy("chain_name").agg(
        F.count("*").alias("n_rows"),
        F.max("block_number").alias("head"))


@register(
    "ddl_create_table",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def ddl_create_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent schema init: DROP IF EXISTS + CREATE (the migration
    runner, migrations/0001_initial.sql:1-40 via src/storage/db.rs:5-10).
    Realized as catalog DDL over a temp view; production form is
    ``CREATE TABLE ... USING parquet/delta PARTITIONED BY``."""
    T(spark, sf_dir, "orders").createOrReplaceTempView("_ing_orders_src")
    spark.sql("DROP VIEW IF EXISTS eng_blocks")
    spark.sql("""
        CREATE TEMP VIEW eng_blocks AS
        SELECT o_orderkey AS block_number, o_orderstatus, o_orderdate
        FROM _ing_orders_src
    """)
    return spark.sql("""
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
        FROM eng_blocks GROUP BY o_orderstatus
    """)


@register(
    "sink_parquet_delta",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM orders WHERE o_orderkey < 6000
    GROUP BY o_orderstatus
    """,
)
def sink_parquet_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar partitioned sink + read-back audit — the engine-native
    store replacing Postgres for analytics (BASELINE.json
    ``spark_approach``). Writes partitioned by the dimension column so
    downstream scans partition-prune; the oracle verifies landed rows.
    Delta (ACID/MERGE) is the production format; jars absent in v1 →
    parquet layout, same partitioning."""
    out = fresh_scratch_dir("sink_parquet", "orders")
    src = (T(spark, sf_dir, "orders")
           .filter(F.col("o_orderkey") < 6000)
           .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    # read back with the writer's schema: an empty slice writes no part
    # files, and a schema-less read of an empty directory fails instead
    # of yielding the empty audit
    landed = spark.read.schema(src.schema).parquet(out)
    return landed.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
         .alias("total_price"))


@register(
    "sink_mq_produce",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, user_id := user_id,
                               event_type := event_type,
                               ts_us := epoch_us(ts))) AS payload,
           'events-' || CAST(user_id % 4 AS VARCHAR) AS topic
    FROM events WHERE event_id < 4000
    """,
)
def sink_mq_produce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-queue producer: record → JSON envelope → keyed topic
    (serialize+send, evm_producer.rs:44-47,62-65; topic naming lib.rs:83).
    The engine's form is ``to_json(struct(...))`` + a partition-key column;
    swapping the sink to ``writeStream.format('kafka')`` is config, not
    code. Timestamps ride as unix micros to keep the envelope
    JSON-canonical across engines."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    return e.select(
        "event_id",
        F.to_json(F.struct(
            F.col("event_id"), F.col("user_id"), F.col("event_type"),
            F.unix_micros("ts").alias("ts_us")),
            {"ignoreNullFields": "false"}).alias("payload"),
        F.concat(F.lit("events-"), (F.col("user_id") % 4).cast("string"))
         .alias("topic"),
    )


@register(
    "src_mq_consume",
    oracle="""
    SELECT event_id, user_id, event_type, ts_us
    FROM (SELECT event_id AS event_id, user_id, event_type, epoch_us(ts)
            AS ts_us FROM events WHERE event_id < 4000)
    """,
)
def src_mq_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-queue consumer: serialize → deserialize round-trip
    (exclusive-subscription consume + ``msg.deserialize()``,
    pulsar.rs:24-37 / evm_consumer.rs:110-122). The produce leg feeds
    ``from_json`` with the declared schema; the oracle checks the typed
    fields survive the wire intact. Ack-after-write maps to streaming
    checkpoints (see stream_ingest_append)."""
    produced = sink_mq_produce(spark, sf_dir).select("payload")
    schema = ("event_id BIGINT, user_id BIGINT, event_type STRING, "
              "ts_us BIGINT")
    return (produced
            .select(F.from_json("payload", schema).alias("msg"))
            .select("msg.event_id", "msg.user_id", "msg.event_type",
                    "msg.ts_us"))


@register(
    "src_logs_events",
    oracle="""
    SELECT event_id AS log_index,
           md5(CAST(user_id AS VARCHAR)) AS address,
           concat_ws(',', event_type, CAST(user_id AS VARCHAR))
             AS topics_joined,
           props AS data,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS decoded_k,
           CAST(2 AS BIGINT) AS n_topics
    FROM events WHERE event_id < 5000
    """,
)
def src_logs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logs/Events entity ingestion — the entity the reference declares but
    never implements (README.md:187-196: log_index, address, topics[],
    data, decoded_event). Topics are a real ArrayType column; the map-like
    decoded_event comes from the JSON payload (get_json_object is NULL on
    malformed payloads; the oracle's json_valid guard matches — r12
    shape-fuzz)."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    topics = F.array(F.col("event_type"), F.col("user_id").cast("string"))
    return e.select(
        F.col("event_id").alias("log_index"),
        F.md5(F.col("user_id").cast("string")).alias("address"),
        F.array_join(topics, ",").alias("topics_joined"),
        F.col("props").alias("data"),
        F.get_json_object("props", "$.k").alias("decoded_k"),
        F.size(topics).cast("long").alias("n_topics"),
    )


# ---------------------------------------------------------------------------
# §2.2 REF projection / cast family (consumer-transform analogs)
# ---------------------------------------------------------------------------


@register(
    "proj_block_flatten",
    oracle="""
    SELECT o_orderkey AS block_number,
           'ETH' AS chain_name,
           md5(CAST(o_orderkey AS VARCHAR)) AS hash,
           md5(CAST(o_orderkey - 1 AS VARCHAR)) AS parent_hash,
           o_orderdate AS block_ts,
           lower(o_orderpriority) AS miner,
           CAST(floor(o_totalprice) AS BIGINT) AS gas_used,
           CAST(o_orderkey AS VARCHAR) AS difficulty
    FROM orders WHERE o_orderkey < 4000
    """,
)
def proj_block_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 14-column block-header flatten (evm_consumer.rs:64-94: accessor
    projection + renames + casts), shaped over the blocks-analog table.
    The real wire-format transform is ``ingest.transform
    .blocks_from_messages`` (pytest-verified on FIXTURES.md §A data)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    return o.select(
        F.col("o_orderkey").alias("block_number"),
        F.lit("ETH").alias("chain_name"),
        F.md5(F.col("o_orderkey").cast("string")).alias("hash"),
        F.md5((F.col("o_orderkey") - 1).cast("string")).alias("parent_hash"),
        F.col("o_orderdate").alias("block_ts"),
        F.lower("o_orderpriority").alias("miner"),
        F.floor("o_totalprice").cast("long").alias("gas_used"),
        F.col("o_orderkey").cast("string").alias("difficulty"),
    )


@register(
    "proj_tx_flatten",
    oracle="""
    SELECT l_orderkey AS block_number,
           CAST(l_linenumber AS INT) AS transaction_index,
           md5(CAST(l_orderkey AS VARCHAR) || '-' ||
               CAST(l_linenumber AS VARCHAR)) AS tx_hash,
           md5(CAST(l_suppkey AS VARCHAR)) AS from_address,
           CASE WHEN l_linenumber >= 6 THEN NULL
                ELSE md5(CAST(l_partkey AS VARCHAR)) END AS to_address,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS value,
           CAST(floor(l_quantity) AS BIGINT) AS nonce
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def proj_tx_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10-column transaction flatten (evm_consumer.rs:36-51: column
    list :40, accessors :43-50) incl. the nullable ``to_address``
    contract-creation path (schemas/evm.rs:42) and U256→string value."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    return li.select(
        F.col("l_orderkey").alias("block_number"),
        F.col("l_linenumber").cast("int").alias("transaction_index"),
        F.md5(F.concat_ws("-", "l_orderkey", "l_linenumber"))
         .alias("tx_hash"),
        F.md5(F.col("l_suppkey").cast("string")).alias("from_address"),
        F.when(F.col("l_linenumber") >= 6, F.lit(None))
         .otherwise(F.md5(F.col("l_partkey").cast("string")))
         .alias("to_address"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string")
         .alias("value"),
        F.floor("l_quantity").cast("long").alias("nonce"),
    )


@register(
    "proj_rename",
    oracle="""
    SELECT l_orderkey AS block_number, l_linenumber AS transaction_index,
           l_extendedprice AS value, l_returnflag AS status_flag
    FROM lineitem WHERE l_orderkey < 2500
    """,
)
def proj_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure rename-on-projection (hash→tx_hash, from→from_address, ... —
    SQL col names evm_consumer.rs:40 vs struct fields schemas/evm.rs:34-47).
    Zero-cost: Catalyst aliases, no data movement."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2500)
    return li.select(
        F.col("l_orderkey").alias("block_number"),
        F.col("l_linenumber").alias("transaction_index"),
        F.col("l_extendedprice").alias("value"),
        F.col("l_returnflag").alias("status_flag"),
    )


@register(
    "proj_computed_col",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS tx_count,
           len(string_split(text, ' ')) = 0 AS is_empty
    FROM documents
    """,
)
def proj_computed_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed column from an embedded collection — THE reference computed
    col: ``tx_count = len(transactions)`` (evm_consumer.rs:72-73), with the
    empty-collection flag (empty blocks are legal)."""
    d = T(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("tx_count"),
        (F.size(toks) == 0).alias("is_empty"),
    )


@register(
    "cast_numeric",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS INT) AS key_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor_long,
           make_timestamp(epoch_us(o_orderdate)) AS ts_roundtrip
    FROM orders WHERE o_orderkey < 4000
    """,
)
def cast_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric/format casts — the u64→i64 narrowing, U256→string and
    unix-secs→timestamp family (evm_consumer.rs:66-71). Double→integer
    goes through explicit ``floor`` (Spark CAST truncates, DuckDB CAST
    rounds — the engine never relies on implicit float→int semantics)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("int").alias("key_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("long").alias("price_floor_long"),
        F.timestamp_micros(F.unix_micros(
            F.col("o_orderdate").cast("timestamp")))
         .alias("ts_roundtrip"),
    )


@register(
    "null_default",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 0.0 ELSE value END
             AS value_defaulted,
           nullif(event_type, 'error') AS type_nullable,
           coalesce(nullif(event_type, 'error'), 'unknown') AS type_filled
    FROM events
    """,
)
def null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's two-faced null policy (evm_consumer.rs:45-50):
    value/gas_price/nonce are zero-defaulted (``unwrap_or_default``) while
    ``to_address`` passes NULL through — both paths reproduced, because the
    0-vs-NULL distinction is observable downstream."""
    e = T(spark, sf_dir, "events")
    nullable = F.nullif(F.col("event_type"), F.lit("error"))
    return e.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(0.0))
         .otherwise(F.col("value")).alias("value_defaulted"),
        nullable.alias("type_nullable"),
        F.coalesce(nullable, F.lit("unknown")).alias("type_filled"),
    )


# ---------------------------------------------------------------------------
# external-store sinks (REF: Postgres JDBC / declared DuckDB backend)
# ---------------------------------------------------------------------------


@register(
    "sink_jdbc_insert",
    oracle="""
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
           min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
    """,
)
def sink_jdbc_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC sink round-trip — the reference's Postgres INSERT path
    (evm_consumer.rs:36-105) re-expressed as a single vectorized
    ``df.write.jdbc`` (replacing one-transaction-per-row), against the
    embedded Derby engine that ships with Spark (no external DB in the
    container). Read-back via ``spark.read.jdbc`` verifies landed rows.

    Scale: df.write.jdbc batches per partition (``batchsize`` option);
    at 100 TB the JDBC sink is a parity/demo path only — the analytic
    store is `sink_parquet_delta`."""
    db = fresh_scratch_dir("sink_jdbc") + "/derby_db"
    url = f"jdbc:derby:{db};create=true"
    src = T(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    (src.write.mode("overwrite")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .jdbc(url, "nation_landed"))
    landed = (spark.read
              .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
              .jdbc(url, "nation_landed"))
    return landed.groupBy("n_regionkey").agg(
        F.count("*").cast("long").alias("n_nations"),
        F.min("n_name").alias("first_name"))


@register(
    "sink_duckdb",
    oracle="""
    SELECT r_regionkey, r_name, CAST(count(*) AS BIGINT) AS n
    FROM region GROUP BY r_regionkey, r_name
    """,
)
def sink_duckdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB alternative storage backend (declared README.md:5,27,41,
    never wired in the reference): Spark writes parquet, DuckDB ingests
    it into a persistent ``.duckdb`` database file, and the landed table
    is read back through Spark for verification — the full declared
    topology, realized.

    Scale: the parquet hand-off IS the scalable interface (DuckDB reads
    Spark's partitioned layout in place, zero copies); the .duckdb file
    materialization is the single-node analyst-mart endpoint."""
    import duckdb

    out = fresh_scratch_dir("sink_duckdb")
    pq, dbfile = f"{out}/region_pq", f"{out}/mart.duckdb"
    T(spark, sf_dir, "region").write.mode("overwrite").parquet(pq)
    con = duckdb.connect(dbfile)
    try:
        con.execute(
            f"CREATE OR REPLACE TABLE region_landed AS "
            f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        landed_pdf = con.execute(
            "SELECT r_regionkey, r_name FROM region_landed").fetchdf()
    finally:
        con.close()
    # explicit schema: an empty round-trip slice has nothing to infer
    # from (CANNOT_INFER_EMPTY_SCHEMA), and the source schema is the
    # contract being audited anyway
    landed = spark.createDataFrame(
        landed_pdf,
        T(spark, sf_dir, "region").select("r_regionkey", "r_name").schema)
    return landed.groupBy("r_regionkey", "r_name").agg(
        F.count("*").cast("long").alias("n"))


_LANDING_ORACLE = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total
    FROM orders WHERE o_orderkey < 30000
    GROUP BY o_orderstatus
"""

_LANDING_SCHEMA = ("o_orderkey long, o_custkey long, o_orderstatus string, "
                   "o_totalprice double")


def _landing_rows(spark: SparkSession, sf_dir: str):
    return (T(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") < 30000)
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice"))


@register("src_json_landing", oracle=_LANDING_ORACLE)
def src_json_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines landing-zone source — the reference's wire format
    (serde_json rows, evm_producer.rs:46) as files: write deterministic
    JSON lines (plus two injected corrupt lines), read back with an
    EXPLICIT schema in PERMISSIVE mode, quarantine malformed records via
    `_corrupt_record`, aggregate the valid rows. The oracle recomputes
    the expected aggregate from the source table — proving the landing
    round-trip is lossless and the corrupt lines were excluded, not
    silently parsed.

    Scale: JSON-lines scans split by file/offset like any text source;
    the explicit schema avoids Spark's double-pass inference scan, and
    PERMISSIVE + quarantine is the 100 TB posture (one bad record must
    not kill a 10k-file batch). Landing JSON is convert-once: the next
    hop is parquet (`sink_parquet_delta`) — no repeated JSON scans."""
    out = fresh_scratch_dir("json_landing")
    (_landing_rows(spark, sf_dir)
     .select(F.to_json(F.struct("*")).alias("value"))
     .write.mode("overwrite").text(f"{out}/data"))
    with open(f"{out}/data/corrupt.json", "w") as f:
        f.write('this is not json\n{"o_orderkey": 1, "o_custkey":\n')
    landed = (spark.read
              .schema(_LANDING_SCHEMA + ", _corrupt_record string")
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record")
              .json(f"{out}/data"))
    valid = landed.filter(F.col("_corrupt_record").isNull())
    return valid.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
         .alias("total"))


@register("src_csv_landing", oracle=_LANDING_ORACLE)
def src_csv_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV landing-zone source: header + typed explicit schema,
    PERMISSIVE mode with a `_corrupt_record` quarantine column for a
    wrong-arity injected line. Same lossless-round-trip oracle as
    `src_json_landing`.

    Scale: CSV splits by offset (no multiline), explicit schema skips
    inference; like JSON it is a convert-once landing format."""
    out = fresh_scratch_dir("csv_landing")
    (_landing_rows(spark, sf_dir)
     .write.mode("overwrite").option("header", True).csv(f"{out}/data"))
    with open(f"{out}/data/corrupt.csv", "w") as f:
        # header first: with header=True the reader consumes line 1 of
        # every file as a header, so a header-less file would have its
        # corrupt line silently eaten instead of quarantined
        f.write("o_orderkey,o_custkey,o_orderstatus,o_totalprice\n"
                "not_a_number,also_bad,P,oops\n")
    landed = (spark.read
              .schema(_LANDING_SCHEMA + ", _corrupt_record string")
              .option("header", True)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record")
              .csv(f"{out}/data"))
    valid = landed.filter(F.col("_corrupt_record").isNull())
    return valid.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
         .alias("total"))


@register("src_orc_landing", oracle=_LANDING_ORACLE)
def src_orc_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC landing-zone source — the third columnar interchange format
    next to parquet (native) and the row formats (csv/json): write the
    landing slice as ORC, read it back with an explicit schema, and
    run the shared landing aggregate so the oracle pins a lossless
    round-trip of longs, strings and doubles through the format.

    Scale: ORC is splittable columnar with predicate pushdown and
    column pruning like parquet — a scan-equivalent citizen, not a
    convert-once format; the reader path (vectorized, JVM) is the same
    class as the parquet scans the rest of the registry exercises."""
    out = fresh_scratch_dir("orc_landing")
    (_landing_rows(spark, sf_dir)
     .write.mode("overwrite").orc(f"{out}/data"))
    landed = spark.read.schema(_LANDING_SCHEMA).orc(f"{out}/data")
    return landed.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
         .alias("total"))


@register(
    "sink_merge_upsert",
    oracle="""
    WITH tgt AS (
      SELECT o_orderkey, o_orderstatus, FALSE AS from_source FROM orders
    ), src AS (
      SELECT o_orderkey, 'R' AS o_orderstatus, TRUE AS from_source
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT -o_orderkey, 'N' AS o_orderstatus, TRUE AS from_source
      FROM orders WHERE o_orderkey % 10 = 5
    ), u AS (
      SELECT * FROM tgt UNION ALL SELECT * FROM src
    )
    SELECT o_orderkey, o_orderstatus, from_source FROM u
    QUALIFY row_number()
            OVER (PARTITION BY o_orderkey ORDER BY from_source DESC) = 1
    """,
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics (the CDC landing step the reference's
    UNIQUE-constraint + at-least-once delivery gropes toward,
    evm_consumer.rs:130-133 + 0001_initial.sql:22-23): a source batch of
    10% updates (status→'R') and 5% brand-new keys (inserts) is merged
    into the target — source wins on key conflict, target rows pass
    through otherwise, new keys append.

    Engine-portable single-shuffle form: union both sides with a
    provenance flag, one ranking window per key keeps the winner
    (matched-update, not-matched-insert, and passthrough all fall out of
    the same window). Scale: this is exactly Delta's MERGE shuffle shape;
    with the target bucketed on the key (`join_bucketed` layout) the
    exchange only moves the (small) source batch, and on Delta the same
    call becomes `MERGE INTO` with file-level pruning. Idempotent: a
    re-delivered source batch yields the identical result — the
    streaming twin is `stream_exactly_once_sink`."""
    from pyspark.sql.window import Window as W

    o = T(spark, sf_dir, "orders")
    tgt = o.select("o_orderkey", "o_orderstatus",
                   F.lit(False).alias("from_source"))
    src = (o.filter(F.col("o_orderkey") % 10 == 0)
            .select("o_orderkey", F.lit("R").alias("o_orderstatus"),
                    F.lit(True).alias("from_source"))
            .unionByName(
                o.filter(F.col("o_orderkey") % 10 == 5)
                 .select((-F.col("o_orderkey")).alias("o_orderkey"),
                         F.lit("N").alias("o_orderstatus"),
                         F.lit(True).alias("from_source"))))
    w = W.partitionBy("o_orderkey").orderBy(F.desc("from_source"))
    return (tgt.unionByName(src)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn"))


# ---------------------------------------------------------------------------
# EP1 end-to-end: range → batched RPC extract → wire JSON → flat table
# ---------------------------------------------------------------------------

def _fake_rpc_fetch(batch_iter):
    """mapInPandas "RPC client": one batched call per Arrow batch.

    Deterministic stand-in for the reference's per-block HTTP
    get_block_with_txs (evm_adapter.rs:57-64; no network in this
    container — a real client would swap into this exact function,
    keeping the batching boundary). Every field derives from md5 of the
    block number so the DuckDB oracle can rebuild the expected output.
    """
    import hashlib
    import json

    import pandas as pd

    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    for pdf in batch_iter:
        payloads = []
        for n in pdf["id"]:
            n = int(n)
            dv = int(h(f"gas|{n}")[:7], 16)
            txs = [{
                "tx_hash": h(f"tx|{n}|{i}"), "block_number": n,
                "transaction_index": i,
                "from_address": h(f"from|{n}|{i}"),
                "to_address": None if i % 3 == 0 else h(f"to|{n}|{i}"),
                "value": str(dv * (i + 1)), "gas_price": str(21000 + i),
                "gas": "21000", "input": "0x", "nonce": i,
            } for i in range(dv % 4)]
            payloads.append(json.dumps({
                "block_number": n, "chain_name": "ETH",
                "hash": h(f"blk|ETH|{n}"), "parent_hash": h(f"blk|ETH|{n-1}"),
                "timestamp": 1_700_000_000 + 12 * n,
                "miner": h(f"miner|{n % 5}"), "difficulty": str(dv),
                "total_difficulty": None, "gas_used": dv % 30_000_000,
                "gas_limit": 30_000_000, "size": dv % 100_000,
                "receipts_root": None, "extra_data": None,
                "logs_bloom": None, "transactions": txs, "uncles": [],
            }))
        yield pd.DataFrame({"value": payloads})


@register(
    "src_rpc_batch_extract",
    oracle="""
    WITH r AS (SELECT unnest(range(100, 160)) AS n),
    d AS (SELECT n, CAST(('0x' || substr(md5('gas|' || n), 1, 7)) AS BIGINT)
                    AS dv
          FROM r)
    SELECT CAST(n AS BIGINT) AS block_number, 'ETH' AS chain_name,
           md5('blk|ETH|' || n) AS hash,
           md5('blk|ETH|' || (n - 1)) AS parent_hash,
           make_timestamp((1700000000 + 12 * n) * 1000000) AS block_ts,
           md5('miner|' || (n % 5)) AS miner,
           CAST(dv AS VARCHAR) AS difficulty,
           dv % 30000000 AS gas_used,
           CAST(30000000 AS BIGINT) AS gas_limit,
           dv % 100000 AS size,
           CAST(dv % 4 AS INT) AS tx_count
    FROM d
    """,
)
def src_rpc_batch_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 (historical backfill) end-to-end, SURVEY.md §3: block-number
    range → partitioned batched RPC extraction (mapInPandas — replaces
    the reference's sequential one-RPC-per-block Mutex loop,
    evm_producer.rs:58-69) → JSON wire envelope → `from_json` parse →
    flatten into the blocks analytic table (evm_consumer.rs:64-105).
    The oracle rebuilds the same deterministic payloads in SQL, so the
    entire extract→parse→transform pipeline is value-verified.

    Scale: `spark.range(start, end).repartition(p)` shards the block
    range; each partition issues BATCHED RPC calls (the real client
    drops into `_fake_rpc_fetch`'s slot); downstream is the standard
    narrow ingest transform. This is how a 100 TB backfill actually
    runs — extraction parallelism × vectorized landing writes."""
    from ..ingest.transform import blocks_from_messages, parse_block_messages

    nums = spark.range(100, 160).repartition(8)
    raw = nums.mapInPandas(_fake_rpc_fetch, schema="value string")
    flat = blocks_from_messages(parse_block_messages(raw))
    return flat.select(
        "block_number", "chain_name", "hash", "parent_hash", "block_ts",
        "miner", "difficulty", "gas_used", "gas_limit", "size", "tx_count")


@register(
    "src_rpc_tx_extract",
    oracle="""
    WITH r AS (SELECT unnest(range(100, 160)) AS n),
    d AS (SELECT n, CAST(('0x' || substr(md5('gas|' || n), 1, 7)) AS BIGINT)
                    AS dv
          FROM r),
    t AS (SELECT n, dv, unnest(range(dv % 4)) AS i FROM d)
    SELECT 'ETH' AS chain_name, CAST(n AS BIGINT) AS block_number,
           md5('tx|' || n || '|' || i) AS tx_hash,
           CAST(i AS INT) AS transaction_index,
           md5('from|' || n || '|' || i) AS from_address,
           CASE WHEN i % 3 = 0 THEN NULL
                ELSE md5('to|' || n || '|' || i) END AS to_address,
           CAST(dv * (i + 1) AS VARCHAR) AS value,
           CAST(21000 + i AS VARCHAR) AS gas_price,
           '21000' AS gas, '0x' AS input, CAST(i AS BIGINT) AS nonce
    FROM t
    """,
)
def src_rpc_tx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 transaction side: same batched extraction as
    `src_rpc_batch_extract`, flattened through
    `transactions_from_messages` (the reference's per-tx insert loop,
    evm_consumer.rs:124-126 → :36-62). Value-verifies the §1.2
    watch-list semantics end-to-end: `to_address` NULL passthrough for
    every i%3==0 tx (contract creation) vs zero-DEFAULTED value/
    gas_price/nonce — the easiest pair to get wrong (SURVEY.md §7)."""
    from ..ingest.transform import (
        parse_block_messages,
        transactions_from_messages,
    )

    nums = spark.range(100, 160).repartition(8)
    raw = nums.mapInPandas(_fake_rpc_fetch, schema="value string")
    return transactions_from_messages(parse_block_messages(raw))


@register(
    "src_parquet_partition_pruned",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents WHERE lang = 'de'
    """,
)
def src_parquet_partition_pruned(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Partition pruning end to end — the single biggest scan lever at
    100 TB and the production layout the catalog docstring promises
    (``.../table/chain_name=ETH/date=.../*.parquet``): land the corpus
    hive-partitioned by a dimension column, then scan with a literal
    partition predicate. Catalyst resolves the predicate against the
    directory listing, so non-matching partitions are never opened —
    the plan shows it in ``PartitionFilters`` (plan-asserted in
    tests/test_plans.py), I/O scales with the selected fraction, not
    the table.

    The oracle reads the same rows from the unpartitioned source — the
    layout must be a pure physical concern, invisible in values."""
    out = fresh_scratch_dir("part_landing", "documents")
    src = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars")
    src.write.mode("overwrite").partitionBy("lang").parquet(out)
    # writer's schema on the read: an empty corpus slice writes no part
    # files and schema inference would fail; partition discovery (and
    # the pruning this op exists to prove) is unaffected
    landed = spark.read.schema(src.schema).parquet(out)
    return (landed.filter(F.col("lang") == "de")
                  .select("doc_id", "lang", "source", "n_chars"))


@register(
    "src_schema_evolution",
    oracle="""
    WITH landed AS (
      SELECT o_orderkey, o_orderstatus, CAST(NULL AS VARCHAR) AS o_channel
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, 'web' AS o_channel
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_channel IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_legacy,
           CAST(sum(CASE WHEN o_channel = 'web' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_evolved
    FROM landed
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: a landing zone where newer batches
    carry an added column (`o_channel`) that older files lack.
    ``mergeSchema`` unifies the footers into one superset schema;
    legacy rows surface the new column as NULL — the additive-evolution
    contract a long-lived ingest pipeline needs (the reference pins its
    schema in DDL, migrations/0001_initial.sql, so any new field is a
    migration; here it's a read option).

    Scale: schema merge reads FOOTERS, not data — one metadata pass at
    planning; the scan itself stays columnar and pushdown-capable. On a
    Delta/iceberg table the same evolution is log metadata. Production
    note: pin `mergeSchema` per-table rather than globally — footer
    listing across 10^6 files is a driver-side planning cost.
    """
    out = fresh_scratch_dir("schema_evo")
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus")
    (orders.filter("o_orderkey % 2 = 0")
     .write.mode("overwrite").parquet(f"{out}/batch=legacy"))
    (orders.filter("o_orderkey % 2 = 1")
     .withColumn("o_channel", F.lit("web"))
     .write.mode("overwrite").parquet(f"{out}/batch=evolved"))
    landed = (spark.read.option("mergeSchema", "true")
              .parquet(f"{out}/batch=legacy", f"{out}/batch=evolved"))
    return (landed.groupBy("o_orderstatus")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum(F.expr("CASE WHEN o_channel IS NULL THEN 1 ELSE 0"
                              " END")).cast("long").alias("n_legacy"),
                 F.sum(F.expr("CASE WHEN o_channel = 'web' THEN 1 ELSE 0"
                              " END")).cast("long").alias("n_evolved"))
            .orderBy("o_orderstatus"))


@register(
    "sink_sorted_skipping",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total
    FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 2000
    """,
)
def sink_sorted_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-on-write data skipping: the fact table is written
    range-partitioned + sorted by its access key, so each output file
    (and each parquet row group inside it) covers a narrow, disjoint
    l_orderkey range; a key-range read then prunes whole files via
    min/max footer stats before decoding anything. The same lever as
    Delta ZORDER/liquid clustering, expressed with vanilla
    repartitionByRange + sortWithinPartitions.

    Scale: clustering-on-write is THE scan lever after partition
    pruning — at 100 TB a key-range query over an unclustered table
    reads every file; over this layout it reads ~(range width / file
    width) of them. The write costs one range shuffle (sampled
    boundaries, skew-resistant); reads stay ordinary pushdown scans.
    """
    out = fresh_scratch_dir("sorted_skip")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey",
                                             "l_extendedprice")
    (li.repartitionByRange(8, "l_orderkey")
       .sortWithinPartitions("l_orderkey")
       .write.mode("overwrite").parquet(f"{out}/data"))
    back = (spark.read.parquet(f"{out}/data")
            .filter("l_orderkey BETWEEN 1000 AND 2000"))
    return back.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
         .cast("double").alias("total"))


# ---------------------------------------------------------------------------
# op_zorder_layout — multi-dimensional clustering quality (Z-order curve)
# ---------------------------------------------------------------------------

#: Z-curve grid width: each dimension is scaled to an 8-bit grid
#: (data-adaptive, like a production OPTIMIZE ZORDER's range binning)
#: before interleaving, so the curve always covers the occupied key
#: domain — interleaving raw keys against a fixed absolute domain
#: degenerates to one bucket whenever keys occupy its bottom corner.
_Z_BITS = 8


def _z_interleave(x: str, y: str, bits: int = _Z_BITS) -> str:
    """Shared-text SQL for the Morton/Z-value of two ``bits``-wide
    grid coordinates: bit i of x lands at position 2i, of y at 2i+1.
    Plain & >> << + arithmetic — identical operator syntax on both
    engines and constant-folded into codegen on the Spark side."""
    # NB: << binds looser than + in SQL — every term is fully
    # parenthesized or the sum would parse as nested shifts.
    terms = []
    for i in range(bits):
        terms.append(f"(((({x} % {1 << bits}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y} % {1 << bits}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_ZORDER_SQL = f"""
    WITH mm AS (
      SELECT max(l_partkey) + 1 AS mx, max(l_suppkey) + 1 AS my
      FROM lineitem
    ),
    g AS (
      SELECT l_partkey, l_suppkey,
             CAST(floor(l_partkey * {1 << _Z_BITS}.0
                        / (SELECT mx FROM mm)) AS BIGINT) AS gx,
             CAST(floor(l_suppkey * {1 << _Z_BITS}.0
                        / (SELECT my FROM mm)) AS BIGINT) AS gy
      FROM lineitem
    ),
    z AS (
      SELECT l_partkey, l_suppkey,
             {_z_interleave("gx", "gy")} AS zval
      FROM g
    )
    SELECT CAST(zval >> {2 * _Z_BITS - 8} AS BIGINT) AS z_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(l_partkey) AS BIGINT) AS pk_min,
           CAST(max(l_partkey) AS BIGINT) AS pk_max,
           CAST(min(l_suppkey) AS BIGINT) AS sk_min,
           CAST(max(l_suppkey) AS BIGINT) AS sk_max
    FROM z GROUP BY zval >> {2 * _Z_BITS - 8}
    ORDER BY z_bucket
"""


@register("op_zorder_layout", oracle=_ZORDER_SQL)
def op_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering manifest: interleave the low
    8 bits of two join keys, bucket rows by Z-value prefix, and emit
    per-bucket min/max ranges for BOTH dimensions — the file-level
    statistics a Z-ordered write (Delta/Iceberg OPTIMIZE ZORDER) would
    produce, proving that one layout keeps range-skippability on two
    columns at once where `sink_sorted_skipping`'s single-column sort
    gives one tight and one full-span range per file.

    Scale: the Z-value is pure constant-folded integer arithmetic in
    codegen (no UDF), the manifest is one two-phase aggregate over 256
    buckets, and the same expression used as a write-time
    `repartitionByRange(zval)` key IS the production Z-order write —
    this op is the read-side proof of that layout's skipping bound:
    a bucket keeps the top 4 bits of EACH dimension fixed, so both
    raw ranges are ≤ 2^(_Z_BITS-4) — 1/16th of the domain per bucket
    on both columns at once (pinned by
    tests/test_operators.py::test_zorder_buckets_bound_both_dimensions).
    """
    return Q(spark, sf_dir, _ZORDER_SQL)


# ---------------------------------------------------------------------------
# sink_partition_overwrite_dynamic — in-place partition replacement
# ---------------------------------------------------------------------------

@register(
    "sink_partition_overwrite_dynamic",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total
    FROM (
      SELECT o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey < 20000 AND o_orderstatus <> 'F'
      UNION ALL
      SELECT o_orderstatus, o_totalprice * 2 FROM orders
      WHERE o_orderkey < 20000 AND o_orderstatus = 'F'
    ) GROUP BY o_orderstatus
    """,
)
def sink_partition_overwrite_dynamic(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the reprocess-one-day sink: a
    second write that carries only partition F replaces ONLY partition
    F, leaving sibling partitions untouched (static overwrite mode
    would wipe the whole table first — the classic
    lost-everything-but-today incident). The audit re-reads the table:
    F rows carry the doubled reprocessed price, O/P rows survive from
    the first write.

    Scale: this is how a 100 TB partitioned store does idempotent
    backfill — rewrite the affected partitions' files, never touch the
    rest, no read-modify-write of the table. (Format caveat: on plain
    parquet the swap is not transactional — a reader racing the
    commit can see partition F mid-replace; Delta/Iceberg make the
    same write pattern atomic via snapshot metadata, which is why the
    production format is Delta while the write CALLS stay identical —
    same caveat class as `sink_parquet_delta`.)
    """
    out = fresh_scratch_dir("sink_dyn_overwrite", "orders")
    base = (T(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") < 20000)
            .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    redo = (base.filter(F.col("o_orderstatus") == "F")
            .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    (redo.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("o_orderstatus").parquet(out))
    landed = spark.read.schema(base.schema).parquet(out)
    return landed.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
         .alias("total"))


# ---------------------------------------------------------------------------
# udtf_python_split — Spark 4 Python UDTF (the imperative table function)
# ---------------------------------------------------------------------------

@register(
    "udtf_python_split",
    oracle="""
    WITH ranges AS (
      SELECT o_orderstatus, min(o_orderkey) AS lo, max(o_orderkey) AS hi
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, CAST(i AS BIGINT) AS task_id,
           lo + i * 5000 AS task_start,
           least(lo + i * 5000 + 4999, hi) AS task_end
    FROM ranges, LATERAL (
      SELECT unnest(generate_series(
        0, CAST(floor((hi - lo) / 5000.0) AS BIGINT))) AS i)
    ORDER BY o_orderstatus, task_id
    """,
)
def udtf_python_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF — the *imperative* table-function extension
    point (`@udtf` class, arbitrary per-row Python yielding rows):
    split each status's block-key range into fixed-width fetch tasks,
    exactly the reference producer's work partitioning
    (evm_producer.rs:58-69 walks start..=end; here the walk becomes a
    task manifest). `udtf_expand` shows the PREFERRED form for
    SQL-expressible expansion (JVM explode, no Python); this key
    demonstrates the API for logic that genuinely needs imperative
    code, and its oracle proves this particular expansion didn't.

    Scale: the UDTF runs once per *range row* (one per status —
    metadata-sized input), so the Python hop is off the fact path; the
    emitted manifest is what a 1000-executor backfill would distribute.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="task_id bigint, task_start bigint, task_end bigint")
    class SplitRange:
        def eval(self, lo, hi, chunk):
            i, s = 0, lo
            while s <= hi:
                yield i, s, min(s + chunk - 1, hi)
                i, s = i + 1, s + chunk

    spark.udtf.register("split_range", SplitRange)
    T(spark, sf_dir, "orders").createOrReplaceTempView("_udtf_orders")
    return spark.sql("""
        WITH ranges AS (
          SELECT o_orderstatus, min(o_orderkey) AS lo,
                 max(o_orderkey) AS hi
          FROM _udtf_orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, t.task_id, t.task_start, t.task_end
        FROM ranges r, LATERAL split_range(r.lo, r.hi, 5000L) t
        ORDER BY o_orderstatus, task_id
    """)


@register(
    "src_binary_media",
    oracle="""
    SELECT doc_id, CAST(strlen(text) + 1 AS BIGINT) AS size_bytes,
           md5(text || chr(10)) AS content_md5
    FROM documents WHERE doc_id < 50
    ORDER BY doc_id
    """,
)
def src_binary_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media source via Spark's ``binaryFile`` format —
    the ingestion front door for image/audio corpora (one file per
    asset, content as a BINARY column, no decode at scan time). The op
    round-trips real files: payloads land as one file per document
    (executor-side ``partitionBy`` text write — no driver loop), the
    ``binaryFile`` reader loads (path, length, content), the asset id
    is parsed from the partition path, and the oracle recomputes each
    asset's exact size and md5 from the source table — byte-lossless
    or the hashes scream. (Text payloads stand in for media bytes; a
    real corpus drops the write half and points the reader at the
    asset store.)

    Scale: binaryFile lists files in parallel and maps one file per
    row (files ≤ ``spark.sql.files.maxPartitionBytes`` batch together);
    content bytes stream scan-side — the standard pairing is this
    source → `op_multimodal_meta`/`op_image_ahash` decode. The
    small-files tax is real at 10^9 assets: production front-ends this
    with tar/parquet asset packing, which is exactly `sink_parquet`
    over this op's output schema."""
    from ..scratch import fresh_scratch_dir

    out = fresh_scratch_dir("binary_media")
    (T(spark, sf_dir, "documents")
     .filter(F.col("doc_id") < 50)
     .select("doc_id", "text")
     .repartition("doc_id")
     .write.mode("overwrite").partitionBy("doc_id").text(f"{out}/assets"))
    # load the landing ROOT (not a doc_id=* glob): an empty corpus
    # writes only _SUCCESS, and a glob with zero matches is
    # PATH_NOT_FOUND — the pathGlobFilter keeps the scan total.
    raw = (spark.read.format("binaryFile")
           .option("recursiveFileLookup", "true")
           .option("pathGlobFilter", "part-*")
           .load(f"{out}/assets"))
    return (raw.select(
                F.regexp_extract("path", r"doc_id=(\d+)", 1).cast("long")
                 .alias("doc_id"),
                F.col("length").cast("long").alias("size_bytes"),
                F.md5("content").alias("content_md5"))
               .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# sink_write_audit_publish — the WAP (write-audit-publish) gate
# ---------------------------------------------------------------------------

_WAP_ORACLE = """
    WITH mx AS (SELECT max(o_orderkey) + 1 AS m FROM orders),
    base AS (
      SELECT o_orderkey, o_totalprice AS p
      FROM orders WHERE o_orderkey % 10 < 8),
    a AS (
      SELECT o_orderkey + (SELECT m FROM mx) AS k, o_totalprice AS p
      FROM orders WHERE o_orderkey % 10 = 8),
    b AS (
      SELECT o_orderkey + 2 * (SELECT m FROM mx) AS k,
             CASE WHEN o_orderkey % 3 = 0 THEN -o_totalprice
                  ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey % 10 = 9),
    n0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(coalesce(sum(CASE WHEN p <= 0 THEN 1 ELSE 0 END),
                                0) AS BIGINT) AS v
           FROM base),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(coalesce(sum(CASE WHEN p <= 0 THEN 1 ELSE 0 END),
                                0) AS BIGINT) AS v
           FROM a),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(coalesce(sum(CASE WHEN p <= 0 THEN 1 ELSE 0 END),
                                0) AS BIGINT) AS v
           FROM b),
    pub AS (
      -- published totals derive from the SAME audit verdicts the
      -- engine computes (v = 0 publishes), for EVERY batch including
      -- the baseline — the r12 shape-fuzz planted non-positive totals
      -- into the baseline residue class and the hardcoded
      -- baseline-always-publishes row diverged (the engine rightly
      -- quarantined it)
      SELECT CASE WHEN (SELECT v FROM n0) = 0
                  THEN (SELECT n FROM n0) ELSE 0 END AS after_0),
    puba AS (
      SELECT (SELECT after_0 FROM pub)
               + CASE WHEN (SELECT v FROM na) = 0
                      THEN (SELECT n FROM na) ELSE 0 END AS after_a)
    SELECT 'baseline' AS batch, (SELECT n FROM n0) AS n_rows,
           (SELECT v FROM n0) AS n_violations,
           (SELECT v FROM n0) = 0 AS published,
           (SELECT after_0 FROM pub) AS total_after
    UNION ALL
    SELECT 'batch_a', (SELECT n FROM na), (SELECT v FROM na),
           (SELECT v FROM na) = 0, (SELECT after_a FROM puba)
    UNION ALL
    SELECT 'batch_b', (SELECT n FROM nb), (SELECT v FROM nb),
           (SELECT v FROM nb) = 0,
           (SELECT after_a FROM puba)
             + CASE WHEN (SELECT v FROM nb) = 0
                    THEN (SELECT n FROM nb) ELSE 0 END
    ORDER BY batch
"""


@register("sink_write_audit_publish", oracle=_WAP_ORACLE)
def sink_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write–Audit–Publish: every batch lands in a STAGING directory,
    an audit query gates it (contract here: no null keys, strictly
    positive totals — `op_contract_check`'s rule shape), and only a
    passing batch is appended to the published table; a failing batch
    stays quarantined in staging and the published table never sees a
    bad row. The test story: a clean baseline and a clean batch A
    publish; batch B — deterministically poisoned with non-positive
    totals on every third key — is REJECTED, and the read-back of the
    published directory proves exactly baseline + A landed. This is
    the production pattern behind every "audit before swap" lake
    deployment (Iceberg's WAP branch workflow, Delta's staged MERGE):
    what the audit owns is the BLAST RADIUS — reject the batch, not
    the table.

    Determinism: the batches derive from order-key residues with key
    offsets (no randomness); audits are exact counts; the oracle
    re-derives the same three verdict rows declaratively.

    Scale: audits are two-phase aggregates over the STAGED batch only
    (never the published table); publish is an append write whose
    cost is the batch, not the table; the read-back count is one
    metadata-friendly parquet count. No fact row ever crosses the
    driver — only the per-batch audit scalars (# driver-ok below)."""
    out = fresh_scratch_dir("wap")
    pub, stg = f"{out}/published", f"{out}/staging"
    o = T(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey") + 1).collect()[0][0]  # driver-ok: 1-row key-space scalar
    mx = mx if mx is not None else 1
    # the published TABLE exists before any batch lands (0 rows): if
    # the very first batch fails its audit, the read-back must report
    # an empty table, not PATH_NOT_FOUND (r12 shape-fuzz — a poisoned
    # baseline crashed the verification read)
    (spark.createDataFrame([], "k long, p double")
     .write.mode("overwrite").parquet(pub))

    def audit_and_publish(batch: DataFrame, name: str) -> tuple:
        batch.write.mode("overwrite").parquet(f"{stg}/{name}")
        staged = spark.read.parquet(f"{stg}/{name}")
        nrows, nviol = staged.agg(
            F.count("*").cast("long"),
            F.sum(F.when(F.col("k").isNull() | (F.col("p") <= 0), 1)
                  .otherwise(0)).cast("long")).collect()[0]  # driver-ok: 2 audit scalars per batch
        ok = (nviol or 0) == 0
        if ok:
            staged.write.mode("append").parquet(pub)
        return int(nrows), int(nviol or 0), ok

    base = (o.filter(F.col("o_orderkey") % 10 < 8)
            .select(F.col("o_orderkey").alias("k"),
                    F.col("o_totalprice").alias("p")))
    a = (o.filter(F.col("o_orderkey") % 10 == 8)
         .select((F.col("o_orderkey") + F.lit(mx)).alias("k"),
                 F.col("o_totalprice").alias("p")))
    b = (o.filter(F.col("o_orderkey") % 10 == 9)
         .select((F.col("o_orderkey") + F.lit(2 * mx)).alias("k"),
                 F.when(F.col("o_orderkey") % 3 == 0,
                        -F.col("o_totalprice"))
                 .otherwise(F.col("o_totalprice")).alias("p")))

    rows = []
    totals = []
    for name, batch in (("baseline", base), ("batch_a", a),
                        ("batch_b", b)):
        n, v, ok = audit_and_publish(batch, name)
        published_n = spark.read.parquet(pub).count()  # driver-ok: read-back verification scalar
        rows.append((name, n, v, ok))
        totals.append(published_n)
    from pyspark.sql.types import (BooleanType, LongType, StringType,
                                   StructField, StructType)
    schema = StructType([
        StructField("batch", StringType()),
        StructField("n_rows", LongType()),
        StructField("n_violations", LongType()),
        StructField("published", BooleanType()),
        StructField("total_after", LongType()),
    ])
    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], t) for r, t in zip(rows, totals)],
        schema).orderBy("batch")


# ---------------------------------------------------------------------------
# op_reorg_audit — chain-reorganization detection + retraction list
# ---------------------------------------------------------------------------

#: deterministic synthetic chain over the order-key space (the
#: repo's md5 hash-chain idiom, ingest_q landing synthesis): every
#: 97th height gains a competing sibling block, and each sibling gets
#: one CHILD at the next height — so when canonical selection goes
#: against the sibling, that child becomes an orphan. Both predicate
#: arms (fork wins / fork loses) are live because md5(n) vs
#: md5(n||'f') wins lexicographically ~half the time each.
_REORG_SQL = """
    WITH ks AS (SELECT DISTINCT o_orderkey AS n FROM orders),
    blocks AS (
      SELECT n AS number, md5(CAST(n AS {STR})) AS hash,
             md5(CAST(n - 1 AS {STR})) AS parent_hash
      FROM ks
      UNION ALL
      SELECT n AS number, md5(CAST(n AS {STR}) || 'f') AS hash,
             md5(CAST(n - 1 AS {STR})) AS parent_hash
      FROM ks WHERE n % 97 = 0
      UNION ALL
      SELECT n + 1 AS number,
             md5(CAST(n + 1 AS {STR}) || 'c') AS hash,
             md5(CAST(n AS {STR}) || 'f') AS parent_hash
      FROM ks WHERE n % 97 = 0),
    canon AS (
      SELECT number, min(hash) AS canonical_hash
      FROM blocks GROUP BY number),
    forked AS (
      SELECT b.number, b.hash, 'forked_out' AS reason
      FROM blocks b JOIN canon c ON c.number = b.number
      WHERE b.hash <> c.canonical_hash),
    orphaned AS (
      SELECT b.number, b.hash, 'orphaned' AS reason
      FROM blocks b
      JOIN canon c ON c.number = b.number
      LEFT JOIN canon p ON p.number = b.number - 1
      WHERE b.hash = c.canonical_hash
        AND p.number IS NOT NULL
        AND b.parent_hash <> p.canonical_hash
        AND b.parent_hash <> md5(CAST(b.number - 1 AS {STR})))
    SELECT number, hash, reason FROM forked
    UNION ALL
    SELECT number, hash, reason FROM orphaned
    ORDER BY number, hash LIMIT 200
"""


@register("op_reorg_audit",
          oracle=_REORG_SQL.replace("{STR}", "VARCHAR"))
def op_reorg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-reorganization audit: given a block table where some
    heights carry COMPETING blocks (the synthetic chain plants a
    sibling at every 97th height plus one child building on each
    sibling), pick the canonical block per height (deterministic
    min-hash — the stand-in for heaviest-chain selection), and emit
    the RETRACTION LIST a reorg-aware ingest must act on: blocks
    forked out at their own height, and canonical-at-their-height
    blocks ORPHANED because their parent lost at height−1 (a parent
    that is neither the canonical hash nor the straight-chain hash).
    This is the operator the reference explicitly cannot express
    (SURVEY §1.3: UNIQUE(number) + at-least-once delivery ⇒ reorgs
    are not representable) — the engine exceeds it: landing stays
    append-only and the audit computes what to retract, the
    `sink_merge_upsert` / WAP keys downstream apply it.

    Determinism: the whole chain is md5-synthesized (engine-identical
    strings), canonical selection is min(hash), both fork outcomes are
    live (~half the planted siblings win), ordering is total.

    Scale: one distinct over the key space, a height-grain min
    aggregate (fork width ≤2 bounds every group), and self-joins on
    the HEIGHT key (uniform, dense) — no window wider than a height,
    no driver-side chain walk; the retraction list is
    TakeOrderedAndProject."""
    return Q(spark, sf_dir, _REORG_SQL.replace("{STR}", "STRING"))


# ---------------------------------------------------------------------------
# src_text_landing — raw line-delimited text corpus ingestion (r11)
# ---------------------------------------------------------------------------

_TEXT_LANDING_ORACLE = """
    SELECT coalesce(source, '') AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(coalesce(n_chars, -1)) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split(coalesce(text, ''), ' ')))
             AS BIGINT) AS total_tokens
    FROM documents GROUP BY coalesce(source, '') ORDER BY source
"""


@register("src_text_landing", oracle=_TEXT_LANDING_ORACLE)
def src_text_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-TEXT landing-zone source — the format every web-scrape /
    log-dump corpus actually arrives in (one record per line, no
    schema, no types): the documents table is serialized to
    tab-delimited UTF-8 lines, landed back through `spark.read.text`
    (the schema-less whole-line reader — the missing sibling of the
    csv/json/orc landing keys), re-parsed with JVM string splits, and
    rolled up per source. The oracle aggregates the ORIGINAL table, so
    the round trip must lose no document, no character, and no token
    to pass — the byte-integrity contract raw-text pipelines usually
    only assume.

    Tab is safe as the delimiter here because the corpus text is
    single-line space-tokenized (documents.text carries no tabs or
    newlines — the writer would need escaping otherwise, which is
    exactly why production corpora graduate to parquet after one
    pass; this key models the pass itself). NULL columns are
    coalesced to sentinels on BOTH sides — concat_ws drops null
    arguments, which would silently shift the tab layout.

    Scale: .text() splits by line offset exactly like CSV (parallel
    scan, no inference); the parse is two codegen'd string splits; the
    rollup is a |sources|-row two-phase aggregate. One corpus write +
    one corpus scan, both distributed."""
    out = fresh_scratch_dir("text_landing")
    docs = T(spark, sf_dir, "documents")
    # concat_ws silently DROPS null arguments, which would shift every
    # later field over by one tab — coalesce each column first (and the
    # oracle applies the identical coalesce semantics) so a null
    # text/source/n_chars round-trips to a stable sentinel instead of
    # silently corrupting the record layout (r11 review pass 1)
    (docs.select(F.concat_ws(
        "\t", F.col("doc_id").cast("string"),
        F.coalesce(F.col("source"), F.lit("")),
        F.coalesce(F.col("n_chars").cast("string"), F.lit("-1")),
        F.coalesce(F.col("text"), F.lit(""))).alias("value"))
     .write.mode("overwrite").text(f"{out}/data"))
    landed = spark.read.text(f"{out}/data")
    parsed = landed.select(
        F.split_part(F.col("value"), F.lit("\t"), F.lit(2))
         .alias("source"),
        F.split_part(F.col("value"), F.lit("\t"), F.lit(3))
         .cast("long").alias("n_chars"),
        F.split_part(F.col("value"), F.lit("\t"), F.lit(4))
         .alias("text"))
    return (parsed.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.sum(F.size(F.split(F.col("text"), " ")))
                  .cast("long").alias("total_tokens"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# op_at_least_once_reconcile — duplicate-delivery classification (r11)
# ---------------------------------------------------------------------------

def _alo_sql(hex_expr: str) -> str:
    """Twins differ in the md5-hex-prefix→int spelling (the repo's
    deterministic-sampling idiom)."""
    return f"""
    WITH h AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             {hex_expr} % 40 AS slot
      FROM events),
    delivered AS (
      SELECT event_id, event_type, cents FROM h
      UNION ALL   -- replayed slice: ~5 % redeliveries (slot 0 or 20)
      SELECT event_id, event_type,
             CASE WHEN slot = 20 THEN cents + 1 ELSE cents END AS cents
      FROM h WHERE slot = 0 OR slot = 20),
    g AS (
      SELECT event_type, event_id,
             CAST(count(*) AS BIGINT) AS n_copies,
             CAST(count(DISTINCT cents) AS BIGINT) AS n_payloads
      FROM delivered GROUP BY event_type, event_id)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_ids,
           CAST(sum(CASE WHEN n_copies = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean,
           CAST(sum(CASE WHEN n_copies > 1 AND n_payloads = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_retry_dup,
           CAST(sum(CASE WHEN n_payloads > 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_conflict
    FROM g GROUP BY event_type ORDER BY event_type
"""


_ALO_SPARK_SQL = _alo_sql(
    "cast(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) "
    "as bigint)")
_ALO_DUCK_SQL = _alo_sql(
    "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT)")


@register("op_at_least_once_reconcile", oracle=_ALO_DUCK_SQL)
def op_at_least_once_reconcile(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """At-least-once delivery reconciliation: a landing that receives
    redeliveries (every MQ consumer's reality — the reference's
    Pulsar consumer acks AFTER write, so crash-replay duplicates are
    by design) is classified per event id into clean / retry-dup
    (same payload redelivered — safe to drop) / CONFLICT (same id,
    DIFFERENT payload — an upstream bug or tamper that a blind
    dedup-by-id would silently paper over). The replay slice is
    planted deterministically (md5(id) mod 40: slot 0 = faithful
    retry, slot 20 = corrupted retry), so both duplicate classes are
    live at every SF and the classifier's output is exact.

    This is the audit that must run BEFORE `stream_dedup` /
    `sink_merge_upsert` pick a survivor: dropping a conflicting
    duplicate is data loss, dropping a faithful one is hygiene.

    Determinism: md5-hex-prefix planting idiom, exact integer cents
    payload comparison, exact counts.

    Scale: the planted union doubles ~5 % of the fact; the reconcile
    is one (type, id)-keyed two-phase aggregate (count + distinct
    payload count — Spark plans the multi-distinct with Expand over
    the duplicate-grain rows only after partial aggregation) and a
    |types|-row rollup. No joins, no windows."""
    return Q(spark, sf_dir, _ALO_SPARK_SQL)


@register("src_jsonl_gz_landing", oracle=_LANDING_ORACLE)
def src_jsonl_gz_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GZIP-compressed JSONL landing — the format most API exports and
    log shippers actually deliver (one JSON object per line,
    .json.gz): write the landing slice gzip-compressed, read it back
    with an explicit schema, run the shared landing aggregate. Same
    lossless round-trip oracle as `src_json_landing`.

    THE scale caveat this key exists to document: gzip is NOT
    splittable — each .json.gz file is one task no matter its size,
    so a 100 TB drop of ten 10 TB gzip files runs on ten cores
    total. The writer side controls the cure (many small files:
    repartition before write — here the write inherits the input's
    parallelism); on the read side prefer zstd/bzip2 (splittable
    codecs) or convert-once to parquet, which is what every other
    landing key models. Reading works unchanged either way — the
    codec is file-extension-dispatched.

    Scale: read parallelism = file count (NOT bytes) under gzip —
    documented, not hidden; the aggregate after the scan is the
    shared two-phase landing rollup."""
    out = fresh_scratch_dir("jsonl_gz_landing")
    (_landing_rows(spark, sf_dir)
     .write.mode("overwrite").option("compression", "gzip")
     .json(f"{out}/data"))
    landed = spark.read.schema(_LANDING_SCHEMA).json(f"{out}/data")
    return landed.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
         .alias("total"))
