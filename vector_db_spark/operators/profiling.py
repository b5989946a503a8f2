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


def join_size_estimate(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str | None = None
) -> DataFrame:
    """Pre-flight equi-join sizing WITHOUT running the join:

    ``(est_rows, n_shared_keys, max_key_rows, top_key)``

    For an equi-join the output cardinality is exactly
    ``Σ_k cnt_left(k) · cnt_right(k)`` — computing it costs two keyed
    counts plus a join of *distinct-key count tables* (vastly smaller than
    the join itself), so a pipeline can know, before shuffling 100 TB,
    whether a join explodes (many-to-many key) and which key dominates —
    ``max_key_rows`` is the single-key output volume AQE's skew handling
    must absorb, the companion number to :func:`key_skew_report`'s input-
    side salt_hint. Deterministic: ``top_key`` ties resolve to the largest
    key."""
    right_key = right_key or left_key
    cl = left.groupBy(F.col(left_key).alias("__k")).agg(F.count("*").alias("ca"))
    cr = right.groupBy(F.col(right_key).alias("__k")).agg(F.count("*").alias("cb"))
    prod = cl.join(cr, "__k").select("__k", (F.col("ca") * F.col("cb")).alias("rows"))
    stats = prod.agg(
        F.sum("rows").alias("est_rows"),
        F.count("*").alias("n_shared_keys"),
        F.max("rows").alias("max_key_rows"),
    )
    top = (
        prod.join(F.broadcast(stats.select("max_key_rows")), prod.rows == F.col("max_key_rows"))
        .agg(F.max("__k").alias("top_key"))
    )
    return stats.join(F.broadcast(top))
