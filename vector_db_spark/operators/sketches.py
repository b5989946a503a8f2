"""Mergeable, persistable sketches: HLL distinct-count state and
deterministic quantile digests.

North-star extension (the reference's only "statistics" surface is IVF
cluster counts, reference ivf.py:207-215): a 100 TB training-data pipeline
asks distinct-count and quantile questions over *rolling spans* of an
append-only corpus ("distinct users this week", "p99 doc length this
month"). Recomputing those from raw rows rescans history every time; the
scale-correct shape is **incremental sketch maintenance**:

1. **Segment sketches** — each ingest segment (day, shard, batch) reduces
   to a kilobyte summary once: an HLL sketch per group for distinct
   counts (Spark's built-in DataSketches HLL — ``hll_sketch_agg``), a
   bounded centroid digest per group for quantiles. One aggregation over
   the new segment only; persisted as an ordinary Parquet table.
2. **Merge at question time** — any span's answer is a merge of its
   segments' summaries (``hll_union_agg`` / centroid re-compression).
   The merge input is O(segments × groups) kilobyte rows — independent
   of corpus row count. History is never rescanned.

The quantile digest is a deterministic equi-rank centroid summary (the
mergeable-summaries pattern of Agarwal et al., PODS'12 — same family as
the Misra-Gries stage in operators/heavyhitters.py): values sorted, then
bucketed by mid-rank into ≤ ``max_centroids`` weighted means. Each
compression moves any value's rank by at most W/max_centroids (W = total
weight compressed), so a build → merge pipeline (two levels) answers any
quantile within rank error ≤ 2/max_centroids of exact — the bound
``tests/test_sketches.py`` pins. Estimates depend on partition layout
(partial digests form per input split), but the *rank-error guarantee*
is layout-invariant, so registered queries project layout-invariant
facts (exact group keys/counts + within-bound booleans) the DuckDB
oracle reproduces exactly.

Everything here is one map-side pass plus a digest-row shuffle: raw
values never shuffle, nothing collects to the driver.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- HLL distinct-count state ------------------------------------------------


def hll_segment_sketches(
    df: DataFrame,
    col: str,
    by: Sequence[str],
    *,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch row per ``by`` group: ``(*by, hll: binary)``.

    Run once per ingest segment and append to a sketch table (plain
    Parquet — the sketch is just a binary column). ``lg_k=12`` ⇒ 4 KiB
    registers, ~1.6 % relative standard error at large cardinalities and
    exact counts in the sparse regime."""
    return df.groupBy(*by).agg(F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("hll"))


def hll_rollup(sketches: DataFrame, by: Sequence[str]) -> DataFrame:
    """Merge segment sketches down to ``by`` and estimate:
    ``(*by, distinct_est: bigint)``. Input is summary rows, never raw
    data — a week/month/all-time rollup costs the same tiny job."""
    return sketches.groupBy(*by).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est")
    )


# --- deterministic quantile digest -------------------------------------------


def _compress(vals: np.ndarray, wts: np.ndarray, max_c: int) -> tuple[np.ndarray, np.ndarray]:
    """Equi-rank re-compression of a weighted value multiset (deterministic:
    stable sort, fixed bucket rule). Bucket = floor(mid_rank/W * max_c)."""
    order = np.argsort(vals, kind="mergesort")
    v, w = vals[order], wts[order]
    if len(v) <= max_c:
        return v, w
    total = w.sum()
    mid = np.cumsum(w) - w / 2.0
    bucket = np.minimum((mid / total * max_c).astype(np.int64), max_c - 1)
    wsum = np.bincount(bucket, weights=w, minlength=max_c)
    vsum = np.bincount(bucket, weights=v * w, minlength=max_c)
    keep = wsum > 0
    return vsum[keep] / wsum[keep], wsum[keep]


def quantile_digest(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    *,
    max_centroids: int = 512,
) -> DataFrame:
    """Mergeable quantile digest per ``by`` group:
    ``(*by, means: array<double>, weights: array<double>)``.

    Two-phase mergeable-summaries plan: a map-only Arrow kernel digests
    each input split per group (raw values never cross the network), then
    one aggregation of digest rows per group re-compresses. The shuffle
    volume is O(splits × groups × max_centroids) doubles."""
    by = list(by)
    key_fields = ", ".join(
        f"`{c}` {t}" for c, t in df.select(*by, col).dtypes if c != col
    )
    schema = (key_fields + ", " if key_fields else "") + (
        "means array<double>, weights array<double>"
    )
    narrow = df.select(*by, F.col(col).cast("double").alias(col)).na.drop(subset=[col])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out: dict[str, list] = {c: [] for c in by}
            out["means"], out["weights"] = [], []
            groups = pdf.groupby(by, sort=False) if by else [((), pdf)]
            for key, g in groups:
                if by and not isinstance(key, tuple):
                    key = (key,)
                v = g[col].to_numpy(dtype=np.float64)
                m, w = _compress(v, np.ones_like(v), max_centroids)
                for c, kv in zip(by, key):
                    out[c].append(kv)
                out["means"].append(m)
                out["weights"].append(w)
            yield pd.DataFrame(out)

    partials = narrow.mapInPandas(partial, schema)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["weights"]])
        m, wm = _compress(v, w, max_centroids)
        row = {c: [k] for c, k in zip(by, key)}
        row["means"], row["weights"] = [m], [wm]
        return pd.DataFrame(row)

    if by:
        return partials.groupBy(*by).applyInPandas(merge, schema)
    return partials.groupBy().applyInPandas(lambda key, pdf: merge((), pdf), schema)


def merge_digests(digests: DataFrame, by: Sequence[str], *, max_centroids: int = 512) -> DataFrame:
    """Roll digest rows (e.g. one per day) up to ``by`` — same re-compression
    the build's merge phase uses, so error adds one level (≤ 1/max_centroids
    rank shift). Input is summary rows only."""
    by = list(by)
    key_fields = ", ".join(f"`{c}` {t}" for c, t in digests.select(*by).dtypes)
    schema = (key_fields + ", " if key_fields else "") + (
        "means array<double>, weights array<double>"
    )

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["weights"]])
        m, wm = _compress(v, w, max_centroids)
        row = {c: [k] for c, k in zip(by, key)}
        row["means"], row["weights"] = [m], [wm]
        return pd.DataFrame(row)

    if by:
        return digests.groupBy(*by).applyInPandas(merge, schema)
    return digests.groupBy().applyInPandas(lambda key, pdf: merge((), pdf), schema)


def digest_quantiles(
    digest: DataFrame, qs: Sequence[float], by: Sequence[str] = ()
) -> DataFrame:
    """Quantile estimates from a digest: ``(*by, q: double, est: double)``.

    Pure JVM plan (explode → running-sum window → per-q argmin); the digest
    is already ≤ max_centroids rows per group, so the window is bounded.
    Estimate = mean of the first centroid whose cumulative weight reaches
    q × total (a valid answer within the digest's rank-error bound)."""
    from pyspark.sql import Window

    by = list(by)
    e = digest.select(
        *by, F.posexplode(F.arrays_zip("means", "weights")).alias("i", "mw")
    ).select(
        *by,
        F.col("i"),
        F.col("mw.means").alias("mean"),
        F.col("mw.weights").alias("weight"),
    )
    win = Window.partitionBy(*by).orderBy("i") if by else Window.orderBy("i")
    tot = Window.partitionBy(*by) if by else Window.partitionBy()
    e = e.withColumn("cum", F.sum("weight").over(win)).withColumn(
        "total", F.sum("weight").over(tot)
    )
    qdf = digest.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    hit = e.join(F.broadcast(qdf)).filter(F.col("cum") >= F.col("q") * F.col("total"))
    return hit.groupBy(*by, "q").agg(F.min_by("mean", "i").alias("est"))
