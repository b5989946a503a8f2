"""IVFPQ: coarse IVF probing + residual Product Quantization + ADC scan.

The reference ships IVF (``/root/reference/src/vector_db/indexing/ivf.py``)
and PQ (``/root/reference/src/vector_db/inference/pq.py``) as *separate*
components and never composes them. This module delivers the composition
those two components exist for — the FAISS-style IVFADC pipeline that is
the standard way to search billions of vectors:

1. **build**: coarse k-means (bounded-sample trainer, operators.kmeans) →
   distributed nearest-centroid assignment → per-vector **residual**
   ``x − centroid(x)`` → per-subspace codebooks trained on residual samples
   → one Arrow pass encodes every vector to ``m`` byte-ish codes → codes
   written ``partitionBy(cluster_id)``.
2. **search**: rank centroids per query (broadcast k×dim join) → probe the
   ``n_probe`` nearest partitions (dynamic partition pruning — the scan
   reads only probed clusters, and only the ids+codes columns: m×4 bytes
   per vector instead of dim×4) → per-(query, cluster) ADC lookup table
   over the *residual* query → partial top-k inside each Arrow batch →
   global exact top-k → optional **re-rank**: join the top ``refine×k``
   candidates back to the raw corpus for exact distances.

Why residuals: within a probed cluster, vectors share their centroid, so
quantizing ``x − c`` spends the whole codebook budget on the local
neighborhood — the precision trick from Jégou et al., "Product Quantization
for Nearest Neighbor Search" (TPAMI 2011), §IV.A (IVFADC).

At 100 TB: the only driver-side state is (k×dim centroids) + (m×k×sub
codebooks); training samples are capped; encode/search are single Arrow
passes over partition-pruned scans; the re-rank join touches refine×k rows
per query.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.functions.distance import euclidean
from vector_db_spark.io import write_clustered, write_small_parquet
from vector_db_spark.operators.ivf import assign_to_centroids
from vector_db_spark.operators.kmeans import (
    DEFAULT_SAMPLE_CAP,
    collect_sample,
    kmeans_fit,
)
from vector_db_spark.operators.topk import top_k_per_group


class IVFPQIndex:
    """Persisted layout under ``path``:

    - ``centroids/``  (cluster_id int, centroid array<double>) — coarse.
    - ``codebooks/``  (chunk_idx int, code int, centroid array<double>) —
      residual-space, ``m × k_codes`` rows.
    - ``codes/``      (vec_id long, codes array<int>) partitioned by
      ``cluster_id`` — the compressed corpus, the only thing ADC scans.
    - ``corpus/``     (vec_id long, embedding, cluster_id) partitioned by
      ``cluster_id`` — raw vectors, touched only by the re-rank join.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "centroids"))

    def codebooks(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "codebooks"))

    def codes(self) -> DataFrame:
        self._assert_no_pending_swap("codes")
        return self.spark.read.parquet(os.path.join(self.path, "codes"))

    def corpus(self) -> DataFrame:
        self._assert_no_pending_swap("corpus")
        return self.spark.read.parquet(os.path.join(self.path, "corpus"))

    def _assert_no_pending_swap(self, sub: str) -> None:
        # a committed-but-unfinished delete swap can have clusters missing
        # from the live layout; reading through it would be silently wrong
        from vector_db_spark.operators.staging import assert_no_pending_swap

        assert_no_pending_swap(
            self.spark, os.path.join(self.path, sub), self._SWAP_TMPS
        )

    # -- driver-side model tensors (k×dim + m×k×sub — small by definition) ----

    def _centroid_matrix(self) -> np.ndarray:
        rows = sorted(self.centroids().collect(), key=lambda r: r.cluster_id)
        return np.array([r.centroid for r in rows], dtype=np.float64)

    def _codebook_tensor(self) -> np.ndarray:
        rows = self.codebooks().collect()
        m = max(r.chunk_idx for r in rows) + 1
        k = max(r.code for r in rows) + 1
        t = np.zeros((m, k, len(rows[0].centroid)), dtype=np.float64)
        for r in rows:
            t[r.chunk_idx, r.code] = r.centroid
        return t

    # -- lifecycle: incremental add / partition-targeted delete ----------------

    def _encode(self, assigned: DataFrame) -> DataFrame:
        """(id, vec, cluster_id) → (id, codes, cluster_id): residual-encode
        against the persisted model in one Arrow pass (the same kernel the
        build uses; broadcast state is k×dim + m×k×sub)."""
        bc = self.spark.sparkContext.broadcast(
            (self._centroid_matrix(), self._codebook_tensor())
        )
        id_col, vec_col = self.id_col, self.vec_col

        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cents, t = bc.value
            m, _, s = t.shape
            for pdf in batches:
                if pdf.empty:
                    continue
                v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                cid = pdf["cluster_id"].to_numpy(dtype=np.int64)
                r = (v - cents[cid]).reshape(len(pdf), m, s)
                codes = (
                    ((r[:, :, None, :] - t[None, :, :, :]) ** 2)
                    .sum(axis=3)
                    .argmin(axis=2)
                    .astype(np.int32)
                )
                yield pd.DataFrame(
                    {id_col: pdf[id_col].values, "codes": list(codes), "cluster_id": cid}
                )

        return assigned.mapInPandas(enc, f"{id_col} long, codes array<int>, cluster_id int")

    def add(self, new_vectors: DataFrame) -> None:
        """Incremental add (mirrors ``IVFIndex.add``; reference
        ivf.py:87-117): coarse-assign, append to the partitioned corpus,
        residual-encode the same rows, append to the codes table. Cold
        partitions are never touched; the codebooks are NOT retrained
        (FAISS semantics — retrain by rebuilding when drift matters)."""

        assigned = assign_to_centroids(
            new_vectors.select(self.id_col, self.vec_col),
            self.centroids().select("cluster_id", "centroid"),
            id_col=self.id_col,
            vec_col=self.vec_col,
        ).select(self.id_col, self.vec_col, "cluster_id")
        assigned = assigned.cache()  # feeds both writes; tiny (one add batch)
        write_clustered(assigned, os.path.join(self.path, "corpus"), mode="append")
        write_clustered(
            self._encode(assigned), os.path.join(self.path, "codes"), mode="append"
        )
        assigned.unpersist()

    _SWAP_TMPS = (".tmp-delete",)

    def recover(self) -> dict:
        """Complete (or discard) any interrupted staged delete swap as a
        PAIR. The corpus plan is the pair's single commit point (see
        :meth:`delete` for the ordering that makes this sound): if the
        corpus staging dir carries a plan, BOTH swaps are driven forward
        (the codes plan was durably written earlier, so it exists); if
        not, both staging dirs are discarded — a codes plan without a
        corpus plan never touched a live table and must not be replayed
        alone, or the pair would diverge."""
        from vector_db_spark.operators.staging import (
            _hadoop_fs,
            execute_swap,
            read_swap_plan,
            recover_staged,
        )

        corpus_table = os.path.join(self.path, "corpus")
        codes_table = os.path.join(self.path, "codes")
        out: dict[str, str] = {}
        for suffix in self._SWAP_TMPS:
            corpus_tmp = corpus_table.rstrip("/") + suffix
            codes_tmp = codes_table.rstrip("/") + suffix
            if read_swap_plan(self.spark, corpus_tmp) is not None:
                # pair committed: drive both forward (idempotent)
                execute_swap(self.spark, codes_table, codes_tmp)
                execute_swap(self.spark, corpus_table, corpus_tmp)
                out[f"corpus{suffix}"] = out[f"codes{suffix}"] = "completed"
            else:
                # No corpus plan. A PLANNED codes tmp here is one of two
                # states, disambiguated by whether a corpus STAGING dir
                # exists: under the pair protocol delete() stages BOTH
                # tmps before writing either plan, so corpus-tmp-present
                # means pre-commit pair staging (discard both); corpus-
                # tmp-ABSENT can only be the legacy per-table protocol
                # (its corpus half had already fully swapped and removed
                # its tmp) — that codes plan is COMMITTED legacy work
                # and must be driven forward, whether or not execution
                # started (old-cluster_id= dirs inside the tmp are the
                # only copies of retired live data; deleting them
                # destroys clusters the corpus still has).
                jpath, fs = _hadoop_fs(self.spark, codes_tmp)
                if fs.exists(jpath(codes_tmp)):
                    has_plan = read_swap_plan(self.spark, codes_tmp) is not None
                    legacy_committed = has_plan and not fs.exists(
                        jpath(corpus_tmp)
                    )
                    if legacy_committed:
                        execute_swap(self.spark, codes_table, codes_tmp)
                        out[f"codes{suffix}"] = "completed"
                    else:
                        fs.delete(jpath(codes_tmp), True)
                        out[f"codes{suffix}"] = "discarded"
                got = recover_staged(self.spark, corpus_table, (suffix,))
                out.update({f"corpus{k}": v for k, v in got.items()})
        return out

    def delete(self, ids: list[int]) -> None:
        """Partition-targeted delete across BOTH tables (corpus + codes)
        via the staged-swap protocol (operators/staging.py) — same contract
        as ``IVFIndex.delete``: cold clusters untouched, fully-emptied
        cluster directories retired (not left stale), and a crash at any
        point either never touched a live table or replays forward through
        :meth:`recover` — live data is never deleted before its
        replacement is in place.

        Pair atomicity: BOTH tables are staged before either plan is
        written; the codes plan lands first and the corpus plan is the
        pair's commit point. A crash before the corpus plan → both
        stagings discarded (old pair intact); after → :meth:`recover`
        replays both forward. The two tables can never settle on
        different sides of the delete."""
        from vector_db_spark.operators.staging import execute_swap, write_swap_plan

        self.recover()
        affected = (
            self.codes()
            .filter(F.col(self.id_col).isin(ids))
            .select("cluster_id")
            .distinct()
            .collect()
        )
        clusters = [r.cluster_id for r in affected]
        if not clusters:
            return
        tables = {}
        for sub, df in (("corpus", self.corpus()), ("codes", self.codes())):
            table = os.path.join(self.path, sub)
            remaining = df.filter(
                F.col("cluster_id").isin(clusters) & ~F.col(self.id_col).isin(ids)
            )
            tmp = table.rstrip("/") + ".tmp-delete"
            write_clustered(remaining, tmp)
            tables[sub] = (table, tmp)
        write_swap_plan(self.spark, tables["codes"][1], clusters, [])
        write_swap_plan(self.spark, tables["corpus"][1], clusters, [])  # commit
        execute_swap(self.spark, *tables["codes"])
        execute_swap(self.spark, *tables["corpus"])

    # -- build ----------------------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        path: str,
        *,
        k_coarse: int = 16,
        n_chunks: int = 8,
        k_codes: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_iter: int = 20,
        seed: int = 42,
        sample_cap: int = DEFAULT_SAMPLE_CAP,
    ) -> "IVFPQIndex":

        dim = len(corpus.select(vec_col).first()[0])
        if dim % n_chunks != 0:
            raise ValueError(f"dim {dim} not divisible into {n_chunks} chunks")
        sub = dim // n_chunks

        # 1. coarse quantizer on a bounded sample (one collect, capped)
        x = collect_sample(corpus, vec_col, sample_cap, seed)
        centers = kmeans_fit(x, k_coarse, max_iter=max_iter, seed=seed)

        # 2. residual codebooks: the SAME sample re-used — assign each
        #    sampled vector to its center, train per-subspace k-means on the
        #    residuals (no second scan of the corpus)
        d2 = ((x[:, None, :].astype(np.float64) - centers[None, :, :]) ** 2).sum(axis=2)
        resid = x.astype(np.float64) - centers[d2.argmin(axis=1)]
        # codebook fits need ~256 training points per centroid (the FAISS
        # heuristic) — cap the per-subspace sample so driver-side training
        # stays O(k_codes), not O(corpus sample)
        cap = 256 * k_codes
        if resid.shape[0] > cap:
            pick = np.random.default_rng(seed).choice(resid.shape[0], cap, replace=False)
            resid = resid[pick]
        tensor = np.stack(
            [
                kmeans_fit(
                    resid[:, c * sub : (c + 1) * sub].astype(np.float32),
                    k_codes,
                    max_iter=max_iter,
                    seed=seed + 1 + c,
                    n_init=2,
                )
                for c in range(n_chunks)
            ]
        )  # (m, k_codes, sub)

        # 3. distributed assign + write raw corpus partitioned by cluster
        centroid_rows = [(int(i), [float(v) for v in c]) for i, c in enumerate(centers)]
        assigned = assign_to_centroids(
            corpus.select(id_col, vec_col), centroid_rows, id_col=id_col, vec_col=vec_col
        )
        write_clustered(assigned, os.path.join(path, "corpus"))

        # 4. residual-encode in ONE Arrow pass over the just-written corpus
        #    (reading it back avoids recomputing the assignment lineage)
        bc = spark.sparkContext.broadcast((centers, tensor))
        raw = spark.read.parquet(os.path.join(path, "corpus"))

        def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cents, t = bc.value
            m, k, s = t.shape
            for pdf in batches:
                if pdf.empty:
                    continue
                v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                cid = pdf["cluster_id"].to_numpy(dtype=np.int64)
                r = (v - cents[cid]).reshape(len(pdf), m, s)  # residual chunks
                codes = (
                    ((r[:, :, None, :] - t[None, :, :, :]) ** 2)
                    .sum(axis=3)
                    .argmin(axis=2)
                    .astype(np.int32)
                )
                yield pd.DataFrame(
                    {id_col: pdf[id_col].values, "codes": list(codes), "cluster_id": cid}
                )

        write_clustered(
            raw.mapInPandas(enc, f"{id_col} long, codes array<int>, cluster_id int"),
            os.path.join(path, "codes"),
        )

        # 5. model state as engine-readable Parquet (no pickle — reference
        #    pickles at ivf.py:217-229 / implicit in pq)
        write_small_parquet(
            os.path.join(path, "centroids"),
            pa.table(
                {
                    "cluster_id": pa.array(range(len(centers)), pa.int32()),
                    "centroid": pa.array(
                        [[float(v) for v in c] for c in centers], pa.list_(pa.float64())
                    ),
                }
            ),
        )
        write_small_parquet(
            os.path.join(path, "codebooks"),
            pa.table(
                {
                    "chunk_idx": pa.array(
                        [c for c in range(n_chunks) for _ in range(k_codes)], pa.int32()
                    ),
                    "code": pa.array(
                        [i for _ in range(n_chunks) for i in range(k_codes)], pa.int32()
                    ),
                    "centroid": pa.array(
                        [
                            [float(v) for v in tensor[c, i]]
                            for c in range(n_chunks)
                            for i in range(k_codes)
                        ],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
        )
        return cls(spark, path, id_col=id_col, vec_col=vec_col)

    # -- search ---------------------------------------------------------------

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        *,
        refine: int | None = 4,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        round_to: int | None = 6,
        max_broadcast_queries: int = 10_000,
    ) -> DataFrame:
        """ADC n_probe search; with ``refine`` set, the ADC pass returns
        ``refine × k`` candidates per query and a raw-vector join re-ranks
        them exactly (distances then match brute force on the recalled set).

        The probe-side broadcast hint is guarded: past
        ``max_broadcast_queries`` query rows the probe join runs un-hinted
        (the per-batch (query, cluster) grouping in the ADC kernel is
        partition-layout-independent — partial per-batch cuts are fixed by
        the global top-k), so a corpus-shaped query table degrades to a
        shuffle join instead of a broadcast blow-up."""
        fetch = k * refine if refine else k
        probes = top_k_per_group(
            queries.crossJoin(F.broadcast(self.centroids())).withColumn(
                "__cdist", euclidean(query_vec_col, "centroid")
            ),
            [query_id_col],
            [F.col("__cdist").asc(), F.col("cluster_id").asc()],
            n_probe,
        ).select(query_id_col, query_vec_col, "cluster_id")

        bc = self.spark.sparkContext.broadcast(
            (self._centroid_matrix(), self._codebook_tensor())
        )
        id_col, qid, qvec, kk = self.id_col, query_id_col, query_vec_col, fetch

        # broadcast the (tiny) probe table into every codes partition —
        # no shuffle of the codes side; DPP prunes unprobed clusters.
        # Guarded: a corpus-shaped query table joins un-hinted instead.
        small = (
            queries.limit(max_broadcast_queries + 1).count() <= max_broadcast_queries
        )
        cand = (F.broadcast(probes) if small else probes).join(self.codes(), "cluster_id")

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cents, t = bc.value
            m, kcodes, s = t.shape
            rng = np.arange(m)
            for pdf in batches:
                if pdf.empty:
                    continue
                # one LUT per (query, cluster) group: residual q − c
                for (q, cid), g in pdf.groupby([qid, "cluster_id"], sort=False):
                    qv = np.asarray(g[qvec].iloc[0], dtype=np.float64)
                    r = (qv - cents[cid]).reshape(m, s)
                    lut = ((r[:, None, :] - t) ** 2).sum(axis=2)  # (m, kcodes)
                    codes = np.array(g["codes"].tolist(), dtype=np.int64)  # (n, m)
                    d = np.sqrt(lut[rng[None, :], codes].sum(axis=1))  # (n,)
                    take = min(kk, d.shape[0])
                    idx = np.argpartition(d, take - 1)[:take]
                    yield pd.DataFrame(
                        {
                            "query_id": np.full(take, q, dtype=np.int64),
                            "neighbor_id": g[id_col].to_numpy(dtype=np.int64)[idx],
                            "dist": d[idx],
                        }
                    )

        scored = cand.mapInPandas(score, "query_id long, neighbor_id long, dist double")
        adc_top = top_k_per_group(
            scored, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], fetch
        ).drop("rank")

        if not refine:
            out = adc_top
            if round_to is not None:
                out = out.withColumn("dist", F.round("dist", round_to))
            return top_k_per_group(
                out, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
            )

        # exact re-rank: refine×k candidate rows per query — broadcast the
        # (tiny) candidate list so the raw corpus is streamed, never
        # shuffled, and its scan can prune on the candidates' clusters
        qside = queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
        )
        exact = (
            self.corpus()
            .select(F.col(self.id_col).alias("neighbor_id"), self.vec_col)
            .join(F.broadcast(adc_top.select("query_id", "neighbor_id")), "neighbor_id")
            .join(F.broadcast(qside), "query_id")
            .select(
                "query_id",
                "neighbor_id",
                euclidean("__qv", self.vec_col).alias("dist"),
            )
        )
        if round_to is not None:
            exact = exact.withColumn("dist", F.round("dist", round_to))
        return top_k_per_group(
            exact, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
        )
