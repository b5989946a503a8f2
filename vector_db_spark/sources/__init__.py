"""Custom Spark data sources (Python DataSource API, Spark 4).

The reference ingests and serves rows over ad-hoc HTTP endpoints
(reference api/app.py:119-160 ingest, app.py:165-233 query) and persists
through hand-rolled memmap/SQLite layers (reference storage.py:135-454).
This package re-expresses that *connector seam* the idiomatic Spark-4 way:
``pyspark.sql.datasource`` sources/sinks that plug straight into
``spark.read.format(...)`` / ``readStream`` / ``write`` and therefore get
Spark's planning, task retry, and exactly-once streaming-offset machinery
for free instead of a bespoke service protocol.

- :mod:`vector_db_spark.sources.jsonl` — ``vdb_jsonl``: batch reader with
  typed filter pushdown + an atomic rename-on-commit writer for the JSONL
  shard layout produced by :mod:`vector_db_spark.operators.export`.
- :mod:`vector_db_spark.sources.replay` — ``vdb_replay``: a streaming
  source that replays a Parquet table as deterministic micro-batch rows
  with row-index offsets (the reference's record-at-a-time ingest loop,
  reference api/app.py:119-160, as a checkpointable stream).

Scale posture: Python data sources are the EXTENSION seam, not the
analytics hot path — bulk scans stay on the native vectorized Parquet
reader. Parallelism comes from one InputPartition per shard file / row
slice (executor-parallel, Arrow-batched); the driver touches only
metadata (file lists, Parquet footers).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

def ensure_registered(spark: SparkSession) -> None:
    """Register all custom data sources on this session (idempotent).

    Registration is re-run unconditionally: ``dataSource.register`` is
    idempotent (latest registration wins), and caching by ``id(spark)``
    is unsound — a garbage-collected session's id can be reused by a new
    session object, which would then silently skip registration and fail
    later with DATA_SOURCE_NOT_FOUND.
    """
    from vector_db_spark.sources.jsonl import JsonlShardDataSource
    from vector_db_spark.sources.replay import ParquetReplayDataSource

    # runtime-settable; without it Spark REFUSES a reader that implements
    # pushFilters (DATA_SOURCE_PUSHDOWN_DISABLED) — set here so the
    # sources work on any caller's session, not just session.get_spark()
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    for cls in (JsonlShardDataSource, ParquetReplayDataSource):
        spark.dataSource.register(cls)
