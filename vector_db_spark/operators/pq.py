"""Product Quantization: train / encode / decode / ADC search.

Re-expresses the reference's PQ component (``/root/reference/src/vector_db/
inference/pq.py``) Spark-first:

| reference | here |
|---|---|
| ``_chunk_embeddings``: reshape (N,D)→(m,N,D/m) (pq.py:48-62) | ``slice(embedding, c*sub+1, sub)`` column expressions — no data movement |
| ``_compute_centroids``: per-chunk k-means, ProcessPoolExecutor (pq.py:64-75) | bounded-sample numpy fits per subspace over ONE collected sample (operators.kmeans), or ``trainer="ml"``: one ``pyspark.ml`` KMeans fit per subspace from a driver thread pool — each fit cluster-parallel |
| ``_find_nearest_centroid`` / ``_compress_embedding``: argmin encode (pq.py:77-89) | Arrow-batched pandas UDF over a broadcast (m,k,sub) codebook tensor — one vectorized pass, no shuffle |
| codes ``int64[N, chunks]`` (pq.py:82-89) | ``codes array<int>`` column |
| codebook list of (k,sub) arrays (pq.py:37, 98-100) | Parquet table (chunk_idx, code, centroid) — broadcastable, engine-readable |

Plus ADC (asymmetric distance) search, the natural follow-on the reference
lacks: per query build an (m,k) lookup table of subspace distances, then a
corpus pass scores each code word by m table gathers — the scan reads only
the (tiny) code column, never the raw vectors.

Validation mirrors pq.py:39-46: dimension must divide evenly into chunks.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from vector_db_spark.operators.topk import top_k_per_group


class PQModel:
    """A trained PQ codebook set persisted at ``<path>/codebooks``."""

    def __init__(self, spark: SparkSession, path: str, *, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col

    @property
    def codebooks_path(self) -> str:
        return os.path.join(self.path, "codebooks")

    def codebooks(self) -> DataFrame:
        return self.spark.read.parquet(self.codebooks_path)

    def _codebook_tensor(self) -> np.ndarray:
        """(m, k, sub) float64 tensor — the only thing ever collected."""
        rows = self.codebooks().collect()
        m = max(r.chunk_idx for r in rows) + 1
        k = max(r.code for r in rows) + 1
        sub = len(rows[0].centroid)
        t = np.zeros((m, k, sub), dtype=np.float64)
        for r in rows:
            t[r.chunk_idx, r.code] = r.centroid
        return t

    # -- train (reference pq.py:64-75, 91-108) --------------------------------

    @classmethod
    def train(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        path: str,
        *,
        n_chunks: int = 8,
        k: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_iter: int = 20,
        seed: int = 42,
        trainer: str = "sample",
    ) -> "PQModel":
        dim = len(corpus.select(vec_col).first()[0])
        if dim % n_chunks != 0:
            raise ValueError(
                f"embedding dim {dim} not divisible into {n_chunks} chunks"
            )
        sub = dim // n_chunks
        if trainer == "sample":
            # one bounded sample collect feeds every subspace fit (the
            # reference's ProcessPoolExecutor parallelism collapses into
            # m in-driver numpy fits on slices of the same array); encode /
            # search stay fully distributed against the broadcast tensor
            from vector_db_spark.operators.kmeans import collect_sample, kmeans_fit

            x = collect_sample(corpus, vec_col, seed=seed)
            all_rows = [
                (c, int(code), [float(v) for v in center])
                for c in range(n_chunks)
                for code, center in enumerate(
                    kmeans_fit(x[:, c * sub : (c + 1) * sub], k, max_iter=max_iter, seed=seed + c)
                )
            ]
        elif trainer == "ml":
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector

            vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("v")).cache()
            vecs.count()

            def fit_chunk(c: int) -> list[tuple[int, int, list[float]]]:
                feat = vecs.select(
                    array_to_vector(F.slice("v", c * sub + 1, sub)).alias("__features")
                )
                model = KMeans(k=k, maxIter=max_iter, seed=seed + c, featuresCol="__features").fit(feat)
                return [
                    (c, int(code), [float(x) for x in center])
                    for code, center in enumerate(model.clusterCenters())
                ]

            # the reference's process-parallel codebook training (pq.py:64-75):
            # concurrent Spark jobs from driver threads, each fit cluster-parallel
            # (overlap_map: pinned-thread-safe property inheritance, ADVICE r9)
            from vector_db_spark.parallel import overlap_map

            all_rows = [
                row
                for rows in overlap_map(fit_chunk, range(n_chunks), max_workers=4)
                for row in rows
            ]
            vecs.unpersist()
        else:
            raise ValueError(f"unknown trainer {trainer!r} (use 'sample' or 'ml')")
        import pyarrow as pa

        from vector_db_spark.io import write_small_parquet

        write_small_parquet(
            os.path.join(path, "codebooks"),
            pa.table(
                {
                    "chunk_idx": pa.array([r[0] for r in all_rows], pa.int32()),
                    "code": pa.array([r[1] for r in all_rows], pa.int32()),
                    "centroid": pa.array([r[2] for r in all_rows], pa.list_(pa.float64())),
                }
            ),
        )
        return cls(spark, path, id_col=id_col, vec_col=vec_col)

    # -- encode (reference pq.py:77-89) ---------------------------------------

    def encode(self, df: DataFrame) -> DataFrame:
        """Add a ``codes array<int>`` column: per-chunk nearest-centroid.
        One Arrow pass with the broadcast codebook tensor; no shuffle."""
        tensor = self._codebook_tensor()
        m, k, sub = tensor.shape
        bc = self.spark.sparkContext.broadcast(tensor)
        id_col, vec_col = self.id_col, self.vec_col

        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            t = bc.value  # (m, k, sub)
            for pdf in batches:
                if pdf.empty:
                    continue
                x = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (n, d)
                n = x.shape[0]
                chunks = x.reshape(n, t.shape[0], t.shape[2])  # (n, m, sub)
                # (n, m, k) squared distances per subspace, then argmin
                d2 = ((chunks[:, :, None, :] - t[None, :, :, :]) ** 2).sum(axis=3)
                codes = d2.argmin(axis=2).astype(np.int32)  # (n, m)
                yield pd.DataFrame({id_col: pdf[id_col].values, "codes": list(codes)})

        return df.select(id_col, vec_col).mapInPandas(
            enc, f"{id_col} long, codes array<int>"
        )

    # -- decode: approximate reconstruction -----------------------------------

    def decode(self, codes_df: DataFrame) -> DataFrame:
        """Reconstruct the quantized vector (codebook lookup + concat)."""
        tensor = self._codebook_tensor()
        bc = self.spark.sparkContext.broadcast(tensor)
        id_col = self.id_col

        def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            t = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
                recon = t[np.arange(t.shape[0])[None, :], codes]  # (n, m, sub)
                recon = recon.reshape(codes.shape[0], -1).astype(np.float32)
                yield pd.DataFrame({id_col: pdf[id_col].values, "decoded": list(recon)})

        return codes_df.mapInPandas(dec, f"{id_col} long, decoded array<float>")

    # -- ADC search -------------------------------------------------------------

    def adc_search(
        self,
        queries: DataFrame,
        codes_df: DataFrame,
        top_k: int = 5,
        *,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        round_to: int | None = 6,
        max_batch_queries: int = 10_000,
    ) -> DataFrame:
        """Asymmetric-distance k-NN over PQ codes: per query an (m,k) LUT of
        subspace squared distances, then each corpus row costs m gathers —
        the scan touches only ids+codes (m*4 bytes/vector instead of dim*4),
        which is the point of PQ at 100 TB.

        The query side is expected serving-shaped (it is collected and its
        LUTs broadcast), and that assumption is enforced: the collect is
        bounded at ``max_batch_queries + 1`` rows (one probe job, reused
        as the fast path's fetch); past the bound the search routes to
        :meth:`_adc_search_join` — LUTs computed distributed per query
        row, distances via a JVM-side gather join — so a corpus-shaped
        query table degrades to a longer distributed job instead of
        OOMing the driver."""
        qrows = (
            queries.select(query_id_col, query_vec_col)
            .limit(max_batch_queries + 1)
            .collect()
        )
        if len(qrows) > max_batch_queries:
            return self._adc_search_join(
                queries,
                codes_df,
                top_k,
                query_id_col=query_id_col,
                query_vec_col=query_vec_col,
                round_to=round_to,
            )
        if not qrows:
            return codes_df.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, dist double"
            )
        tensor = self._codebook_tensor()
        m, k, sub = tensor.shape
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        qmat = np.array([r[1] for r in qrows], dtype=np.float64).reshape(-1, m, sub)
        # (q, m, k) lookup tables
        luts = ((qmat[:, :, None, :] - tensor[None, :, :, :]) ** 2).sum(axis=3)
        bc = self.spark.sparkContext.broadcast((qids, luts))
        id_col = self.id_col
        kk = top_k

        rt = round_to

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from vector_db_spark.operators.knn import _partial_topk

            ids, tables = bc.value  # (q,), (q, m, k)
            for pdf in batches:
                if pdf.empty:
                    continue
                codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
                cids = pdf[id_col].to_numpy(dtype=np.int64)
                # dists[n, q] = sum_m tables[q, m, codes[n, m]]
                gathered = tables[:, np.arange(codes.shape[1])[None, :], codes]  # (q, n, m)
                dists = np.sqrt(gathered.sum(axis=2)).T  # (n, q)
                # select under the final (rounded dist, id) order — an
                # unrounded cut can lose a boundary tie that wins globally
                idx, dists = _partial_topk(dists, cids, kk, rt)
                take = idx.shape[0]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(ids[None, :], take, axis=0).ravel(),
                        "neighbor_id": cids[idx].ravel(),
                        "dist": np.take_along_axis(dists, idx, axis=0).ravel(),
                    }
                )

        scored = codes_df.select(id_col, "codes").mapInPandas(
            score, "query_id long, neighbor_id long, dist double"
        )
        if round_to is not None:
            scored = scored.withColumn("dist", F.round("dist", round_to))
        return top_k_per_group(
            scored, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], top_k
        )

    def _adc_search_join(
        self,
        queries: DataFrame,
        codes_df: DataFrame,
        top_k: int,
        *,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        round_to: int | None = 6,
    ) -> DataFrame:
        """Fully distributed ADC: the per-query (m·k) LUT is computed by a
        vectorized Pandas UDF *on the query table* (one Arrow batch per
        partition — never collected), and the corpus scan gathers
        ``Σ_j lut[j·k + codes[j]]`` with a JVM-side ``aggregate`` over the
        flat LUT array. The query×corpus pairing is a plain join with no
        broadcast hint, so Catalyst/AQE pick the physical strategy — this
        is the big-query-side shape the collected-LUT fast path cannot
        serve."""
        tensor = self._codebook_tensor()
        m, k, sub = tensor.shape
        bc = self.spark.sparkContext.broadcast(tensor)

        @pandas_udf("array<double>")
        def lut_flat(vecs: pd.Series) -> pd.Series:
            t = bc.value  # (m, k, sub)
            q = np.array(vecs.tolist(), dtype=np.float64).reshape(len(vecs), m, sub)
            luts = ((q[:, :, None, :] - t[None, :, :, :]) ** 2).sum(axis=3)  # (n, m, k)
            return pd.Series(list(luts.reshape(len(vecs), m * k)))

        qside = queries.select(
            F.col(query_id_col).alias("query_id"),
            lut_flat(F.col(query_vec_col)).alias("__lut"),
        )
        dist2 = F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.col("__lut"), (j * F.lit(k) + F.element_at(F.col("codes"), j + 1) + 1).cast("int")
            ),
        )
        scored = (
            codes_df.select(F.col(self.id_col).alias("neighbor_id"), "codes")
            .crossJoin(qside)
            .select("query_id", "neighbor_id", F.sqrt(dist2).alias("dist"))
        )
        if round_to is not None:
            scored = scored.withColumn("dist", F.round("dist", round_to))
        return top_k_per_group(
            scored, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], top_k
        )
