"""Sketch-surface queries: incremental distinct counts (HLL segment
sketches) and mergeable quantile digests.

Both operators produce *estimates*, so the registered projections follow
the invariant-projection discipline (queries/__init__.py): emit the exact,
layout-invariant facts (group keys, exact counts) plus booleans asserting
the estimate sits within its proven error bound — all reproducible by the
DuckDB oracle. The estimates themselves are additionally pinned by
tests/test_sketches.py (rank-error property, persist/merge roundtrips).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.io import load_table
from vector_db_spark.operators.sketches import (
    digest_quantiles,
    hll_rollup,
    hll_segment_sketches,
    quantile_digest,
)
from vector_db_spark.queries import register


@register(
    "hll_rollup_users",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id)::BIGINT AS exact_users,
       TRUE AS est_ok
FROM events GROUP BY 1
""",
    extra=True,
)
def hll_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type answered from per-(type, day) HLL
    segment sketches — the incremental-maintenance shape: history is
    reduced to kilobyte summaries once; any span's rollup merges
    summaries instead of rescanning raw events. est_ok asserts the merged
    estimate lands within 5 % of exact (lg_k=12 ⇒ ~1.6 % RSE; sparse-mode
    segments are exact)."""
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    seg = hll_segment_sketches(ev, "user_id", ["event_type", "day"])
    est = hll_rollup(seg, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("distinct_est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_ok"),
    )


@register(
    "digest_price_quantiles",
    oracle="""
SELECT l_returnflag,
       COUNT(*)::BIGINT AS n_items,
       TRUE AS p50_ok,
       TRUE AS p90_ok
FROM lineitem GROUP BY 1
""",
    extra=True,
)
def digest_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90 of l_extendedprice per return flag from a mergeable digest,
    verified by *exact rank*: the fraction of values ≤ the estimate must
    sit within ±0.02 of the target quantile (the digest's proven two-level
    bound is 2/max_centroids ≈ 0.004; 0.02 leaves Arrow-batch slack).
    Raw values never shuffle — only ≤ max_centroids-row digests do."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    dig = quantile_digest(li, "l_extendedprice", ["l_returnflag"], max_centroids=512)
    ests = digest_quantiles(dig, [0.5, 0.9], ["l_returnflag"])
    ranks = (
        li.join(F.broadcast(ests), "l_returnflag")
        .groupBy("l_returnflag", "q", "est")
        .agg(
            F.sum((F.col("l_extendedprice") < F.col("est")).cast("long")).alias("lt"),
            F.sum((F.col("l_extendedprice") <= F.col("est")).cast("long")).alias("le"),
            F.count("*").alias("n_items"),
        )
        # ties make an estimate's rank an interval [lt/n, le/n]; ok iff q is
        # within 0.02 of that interval
        .withColumn(
            "ok",
            (F.col("lt") / F.col("n_items") - F.col("q") <= F.lit(0.02))
            & (F.col("q") - F.col("le") / F.col("n_items") <= F.lit(0.02)),
        )
    )
    return ranks.groupBy("l_returnflag").agg(
        F.max("n_items").alias("n_items"),
        F.max_by("ok", F.when(F.col("q") == 0.5, 1).otherwise(0)).alias("p50_ok"),
        F.max_by("ok", F.when(F.col("q") == 0.9, 1).otherwise(0)).alias("p90_ok"),
    )
