"""Bucketed (co-located) fact-fact joins.

At 100 TB the dominant cost of a fact×fact equi-join is shuffling BOTH
sides on the key. Pre-bucketing each table on the join key
(``bucketBy(n, key) + sortBy(key) + saveAsTable``) persists a
hash-clustered layout Catalyst recognizes: a SortMergeJoin over two tables
bucketed the same way reads matching buckets 1:1 with **zero Exchange**,
and a downstream aggregation keyed by (a superset of) the bucket key reuses
the same partitioning — the whole join+agg pipeline runs shuffle-free.
The plan shape is pinned in tests/test_plans.py.

Sizing at cluster scale: ``n_buckets ≈ table_bytes / 128 MB``, the same
number on both tables (Spark requires equal bucket counts to co-locate;
one side may also be a multiple). The writer repartitions by the bucket
expression first so each bucket lands in ONE file — the layout that lets
the reader treat each bucket as a single sorted split.

The reference has no notion of physical co-location (single-process numpy
scans); this is pure Spark-scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``key`` as a
    catalog table. One file per bucket: the pre-write ``repartition`` on the
    key means each task holds exactly one bucket's rows.

    Overwrite is made idempotent ACROSS sessions: a managed table's
    location can survive on disk after the catalog (in-memory derby here)
    forgot it, and ``saveAsTable`` then fails with
    LOCATION_ALREADY_EXISTS — so the stale location is removed first when
    the catalog has no such table."""
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
    w = (
        df.repartition(n_buckets, F.col(key))
        .write.mode(mode)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables. The ``merge`` hint pins
    SortMergeJoin (a broadcast would hide the co-location win this operator
    exists to demonstrate); with matching bucket specs the plan has no
    Exchange on either side."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on, how)


def joins_without_exchange(joined: DataFrame) -> bool:
    """True iff the physical plan contains no Exchange — the
    co-located-join success criterion, as a programmatic check (the
    test-suite pin in tests/test_plans.py asserts the same on the
    registered query)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
