"""Heavy hitters (frequent items) without a full-vocabulary shuffle — the
two-pass Misra-Gries + exact-verify pattern.

North-star extension: corpus-frequency questions ("which tokens/domains/
fingerprints exceed 0.1% of the stream?") are constant companions of
dedup and curation, and the naive ``groupBy(item) HAVING count >= t``
shuffles the *entire* item stream — at 100 TB that is the biggest
aggregation in the pipeline for an answer that is a handful of rows.

The scale-correct shape:

1. **Candidates** — each partition runs a Misra-Gries summary with
   ``k = ceil(1/threshold_frac)`` counters (an Arrow-batched kernel with a
   plain dict; O(k) memory per task). MG guarantees any item with
   partition frequency > n_p/(k+1) survives the partition's summary, and
   by averaging any *globally* heavy item (freq > n/(k+1)) must be
   partition-heavy somewhere — so the union of survivors is a superset of
   the true heavy hitters. Candidate volume is ≤ partitions × k rows,
   independent of corpus size.
2. **Exact verify** — one aggregation of the item stream *semi-joined
   down to candidates* (broadcast: candidates are tiny), then the exact
   threshold filter. Output = exactly the true heavy hitters with exact
   counts — approximation is confined to the pruning stage, so the
   result is oracle-checkable value-for-value against naive SQL.

The `threshold` is a count (callers derive it from a fraction and the
known/counted stream size); keeping it explicit makes the contract
engine-reproducible.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_spark.io import ensure_parallelism


def _mg_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries survivors, unioned and deduplicated."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mergeable-summaries form (Agarwal et al., PODS'12): each Arrow
        # batch contributes its exact value_counts (a zero-error summary);
        # merging subtracts the (k+1)-th largest count and drops ≤0 —
        # keeps ≤ k counters with total error ≤ n_partition/(k+1)
        counters: dict = {}
        for pdf in batches:
            for x, c in pdf[col].value_counts().items():
                counters[x] = counters.get(x, 0) + int(c)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                counters = {x: c - m for x, c in counters.items() if c > m}
        yield pd.DataFrame({col: list(counters.keys())})

    return items.mapInPandas(kernel, f"{col} string").distinct()


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    threshold: int,
    k: int | None = None,
) -> DataFrame:
    """(item, cnt) for every value of ``col`` occurring at least
    ``threshold`` times — exact output, Misra-Gries-pruned plan.

    ``k`` (candidate summary width) defaults to the tightest width whose
    superset guarantee covers the threshold assuming the stream is no
    longer than ``threshold * k`` items; pass it explicitly as
    ``ceil(n / threshold)`` when the stream size n is known. A ``k``
    that is too small can only *miss* true heavy hitters (never emit
    false ones — the verify pass is exact), so tests pin the guarantee."""
    items = ensure_parallelism(df).select(F.col(col).cast("string").alias(col))
    if k is None:
        k = 2048
    cand = _mg_candidates(items, col, k)
    exact = (
        items.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
    return exact.select(F.col(col).alias("item"), "cnt")
