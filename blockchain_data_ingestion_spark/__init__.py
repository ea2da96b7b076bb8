"""blockchain_data_ingestion_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference blockchain ETL pipeline (bluecagz/blockchain-data-ingestion),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
columnar Parquet at rest, Structured Streaming for unbounded sources, and
Arrow-vectorized Pandas UDFs only where built-ins cannot express semantics.

Layout
------
- ``session``    : tuned SparkSession builder (UTC, AQE, Arrow).
- ``catalog``    : table loaders / temp-view registration over parquet dirs.
- ``schemas``    : fixed StructType declarations for the domain entities
                   (blocks / transactions / logs / wire messages), mirroring
                   the reference's statically-declared schemas
                   (reference: src/streams/schemas/evm.rs:9-47,
                   migrations/0001_initial.sql:6-40).
- ``numeric``    : determinism helpers so floating-point aggregates hash
                   identically across Spark and the DuckDB oracle.
- ``operators/`` : relational building blocks Spark lacks natively
                   (as-of join, range join, top-k per group, dedup family,
                   similarity search).
- ``ingest/``    : the ingestion transform layer (flatten nested block JSON
                   into flat analytic tables) + deterministic domain fixtures.
- ``streaming/`` : Structured Streaming jobs (append ingest, watermark dedup,
                   tumbling/sliding/session windows, foreachBatch sinks).
- ``queries/``   : the operator registry — one entry per SURVEY.md §2 key,
                   each a (PySpark callable, DuckDB oracle SQL) pair.
"""

__version__ = "0.1.0"
