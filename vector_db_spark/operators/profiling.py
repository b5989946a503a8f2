"""Shuffle-key profiling: the pre-flight diagnostics a 100 TB job runs
BEFORE committing to a partitioning strategy.

Every skew mitigation in this engine (AQE skew-join splits, knn_graph
salt rounds, salted two-stage aggregation) needs a number: *how* skewed
is the key? ``key_skew_report`` answers with one O(1)-output job — a
keyed count (map-side partial agg) reduced to scalar statistics plus a
concrete ``salt_hint`` (how many sub-splits bring the hottest key down
to the average load). Cheap enough to run on a sample or a full corpus;
the output is a single row regardless of input size.

The reference has no profiling surface (its only statistic is IVF
cluster sizes, reference ivf.py:207-215 — itself a skew report for one
hardcoded key); this generalizes it to any shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, key: str) -> DataFrame:
    """One-row skew diagnostics for ``key``:

    ``(n_keys, total_rows, max_cnt, top_key, skew_ratio, salt_hint)``

    - ``skew_ratio`` = hottest key's count / mean count per key (1.0 ⇒
      perfectly uniform; the ratio a shuffle partition of this key would
      be oversized by).
    - ``salt_hint`` = ⌈skew_ratio⌉ — the salt fan-out that levels the
      hottest key to average load (what knn_graph's salt rounds and the
      salted-aggregation pattern take as input).
    - ``top_key`` = the largest key value achieving ``max_cnt``
      (deterministic under count ties).

    Two tiny jobs: the keyed count (map-side partials, one shuffle on
    ``key``) and a 1-row broadcast join to resolve ``top_key`` — output
    is O(1) rows at any input scale."""
    counts = df.groupBy(F.col(key).alias("__k")).agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = (
        counts.join(F.broadcast(stats.select("max_cnt")), counts.cnt == F.col("max_cnt"))
        .agg(F.max("__k").alias("top_key"))
    )
    mean = F.col("total_rows") / F.col("n_keys")
    return (
        stats.join(F.broadcast(top))
        .select(
            "n_keys",
            "total_rows",
            "max_cnt",
            "top_key",
            F.round(F.col("max_cnt") / mean, 6).alias("skew_ratio"),
            F.ceil(F.col("max_cnt") / mean).alias("salt_hint"),
        )
    )
