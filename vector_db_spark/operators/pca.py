"""Distributed PCA over an embedding column — dimensionality reduction for
embedding pipelines (index build on reduced vectors, matryoshka-style
storage cuts, whitening before clustering).

North-star extension (the reference stores embeddings verbatim,
``/root/reference/src/vector_db/storage.py``; it has no linear-algebra
surface). The classic scale decomposition:

* **Fit = one pass of map-side moment partials.** Each Arrow batch
  contributes ``(n, Σx, ΣxxT)``; partials are re-aggregated once per
  shard (32-way) so the driver reduce sees a bounded, partition-count-
  independent number of rows, each ``d² + d + 1`` doubles. The d×d
  eigendecomposition happens on the driver — for embedding dims (64-4096)
  that is microseconds-to-seconds and is *not* the scale axis; rows are.
* **Transform = one Arrow-batched BLAS matmul** ``(X - mean) @ W.T`` per
  batch (the same kernel shape as ``similarity.hyperplane_lsh_buckets``),
  broadcast mean/components, zero shuffle.

Determinism: moments are mathematically order-independent; float
summation order varies by partition layout, but ``numpy.linalg.eigh`` on
the reduced covariance plus a fixed sign convention (largest-|loading|
component positive) yields stable components for any non-degenerate
spectrum; tests pin fit-vs-numpy-exact agreement on the fixture corpus.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_spark.io import ensure_parallelism

_N_REDUCE_SHARDS = 32


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (m, d) rows = principal axes, orthonormal
    explained_var: np.ndarray  # (m,) eigenvalues, descending
    total_var: float  # trace of the covariance

    @property
    def explained_var_ratio(self) -> np.ndarray:
        return self.explained_var / self.total_var

    def transform(
        self, df: DataFrame, vec_col: str = "embedding", out_col: str = "reduced"
    ) -> DataFrame:
        """Project ``vec_col`` onto the principal axes: broadcast
        mean/components into an Arrow-batched matmul; map-only plan."""
        mean, comps = self.mean, self.components
        out_fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        schema = f"{out_fields}, {out_col} array<float>"

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                    Y = (X - mean) @ comps.T
                    pdf = pdf.assign(**{out_col: list(Y.astype(np.float32))})
                else:
                    pdf = pdf.assign(**{out_col: pd.Series([], dtype=object)})
                yield pdf

        return df.mapInPandas(kernel, schema)


def _moment_partials(df: DataFrame, vec_col: str) -> pd.DataFrame:
    """Two-level reduction of ``(n, Σx, flat ΣxxT)``: per-Arrow-batch
    partials, re-summed per hash shard so the driver collect is bounded by
    ``_N_REDUCE_SHARDS`` rows regardless of input partition count."""
    schema = "shard int, n long, s array<double>, g array<double>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "shard": [int(X[0].sum() * 1e6) % _N_REDUCE_SHARDS],
                    "n": [len(X)],
                    "s": [X.sum(axis=0)],
                    "g": [(X.T @ X).ravel()],
                }
            )

    def reduce_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "shard": [pdf["shard"].iloc[0]],
                "n": [pdf["n"].sum()],
                "s": [np.sum(np.array(pdf["s"].tolist()), axis=0)],
                "g": [np.sum(np.array(pdf["g"].tolist()), axis=0)],
            }
        )

    partials = ensure_parallelism(df).select(vec_col).mapInPandas(partial, schema)
    reduced = partials.groupBy("shard").applyInPandas(reduce_shard, schema)
    return reduced.toPandas()


def fit_pca(df: DataFrame, vec_col: str = "embedding", m: int = 8) -> PCAModel:
    """Exact (non-sampled) PCA fit over every row of ``df``: one
    distributed pass for the moments, driver-side ``eigh`` of the d×d
    covariance (population normalization, matching ``var_pop``)."""
    parts = _moment_partials(df, vec_col)
    if not len(parts):
        raise ValueError("fit_pca: empty input")
    n = int(parts["n"].sum())
    s = np.sum(np.array(parts["s"].tolist()), axis=0)
    g = np.sum(np.array(parts["g"].tolist()), axis=0)
    d = s.shape[0]
    if not 1 <= m <= d:
        raise ValueError(f"fit_pca: m={m} out of range for dim {d}")
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:m]
    comps = evecs[:, order].T  # (m, d)
    # sign convention: the largest-|loading| coordinate of each axis is
    # positive, so components don't flip between equivalent fits
    flips = np.sign(comps[np.arange(m), np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    return PCAModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_var=np.maximum(evals[order], 0.0),
        total_var=float(np.trace(cov)),
    )
