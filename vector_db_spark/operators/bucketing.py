"""Bucketed tables: the pre-shuffled join layout for 100 TB fact tables.

A join between two large tables shuffles BOTH sides on the key — at
corpus scale that shuffle (not the scan) is the bottleneck, and it
repeats on every join. Spark's answer is bucketing (`bucketBy` +
`saveAsTable`): each side is written pre-hash-partitioned into the same
number of buckets on the join key, the catalog records the layout, and a
sort-merge join between co-bucketed tables runs with NO Exchange on
either side — the shuffle is paid once at write time and amortized over
every subsequent join, the same trade the IVF index makes for vector
search (partition once, probe forever).

This module wraps the write (bucket count + sort order + external path)
and the plan assertion; `bucketed_join_audit` drives it end to end and
the test pins the Exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as a bucketed, in-bucket-sorted external table. The
    catalog entry is what lets the planner elide the join exchange; the
    files live at ``path`` (plain Parquet, readable without the catalog,
    just without the layout guarantee)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def joins_without_exchange(joined: DataFrame) -> bool:
    """True iff the physical plan contains no shuffle Exchange — the
    co-located-join success criterion. (BroadcastExchange would also
    defeat the demonstration; callers force a sort-merge join with
    ``hint("merge")``.)"""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Sort-merge join of two co-bucketed catalog tables. The merge hint
    pins the strategy so the plan's Exchange-freeness is a property of
    the LAYOUT, not of a broadcast threshold."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[key_l] == right[key_r])
