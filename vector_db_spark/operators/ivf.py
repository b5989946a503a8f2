"""IVF (inverted-file) approximate nearest-neighbor index.

Re-expresses the reference's IVF component (``/root/reference/src/vector_db/
indexing/ivf.py``) Spark-first:

| reference                                   | here |
|---------------------------------------------|------|
| ``build_index``: scipy ``kmeans2`` + Python inverted lists (ivf.py:49-85) | bounded-sample k-means++/Lloyd (operators.kmeans; ``trainer="ml"`` for a fully-distributed ``pyspark.ml`` fit) + distributed broadcast-argmin assignment; "inverted list" = the corpus written ``partitionBy("cluster_id")`` — probing a cluster IS partition pruning |
| ``add``: argmin over centroids, append to list (ivf.py:87-117) | broadcast-centroid argmin join → append to the partitioned table |
| ``delete``: remove id from all lists (ivf.py:119-136) | dynamic partition overwrite of only the affected clusters |
| ``search``: rank centroids, scan n_probe lists, exact top-k (ivf.py:138-199) | probe ranking via broadcast centroid join → semi-join on ``cluster_id`` (partition pruning) → exact distance → windowed top-k |
| pickle persistence (ivf.py:217-241)         | Parquet centroid table + partitioned corpus; "loading" is ``spark.read`` |

Scale posture (SURVEY.md §7): only the k×dim centroid table is ever
broadcast/collected; the corpus is never collected; hot-cluster skew is
handled by AQE (skew-join enabled in the session factory). HNSW itself is
deliberately not ported — a sequential mutable-graph build is anti-Spark
(SURVEY.md §2.3 V5); IVF delivers the same capability (tunable-recall ANN)
as a data-parallel plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_spark.functions.distance import METRICS, euclidean
from vector_db_spark.io import write_clustered  # noqa: F401  (re-export: index writers use it)
from vector_db_spark.operators.topk import top_k_per_group

# k-means needs ~this many training points per centroid to place it on
# signal rather than noise — shared by derive_k's floor and build()'s
# sample-cap guard so the two can never drift apart
MIN_POINTS_PER_CLUSTER = 39


def assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment (reference ivf.py:109-110 argmin).

    The centroid table is k×dim — small by definition — so it is inlined
    as a literal array of (dist, cluster_id) structs and the argmin becomes
    ``array_min`` per row: a pure map-side expression, ZERO shuffle. At
    100 TB this is the difference between a narrow stage and shuffling the
    whole corpus through a window. Ties break on lowest cluster_id via
    struct ordering, identical to the former (dist, cluster_id) sort.

    For very large codebooks (k×dim beyond sane codegen size) it falls back
    to the broadcast-join + min_by form — still one shuffle-free broadcast
    join plus a groupBy on the (narrow) id.

    ``centroids`` may be the (cluster_id, centroid) table or a plain
    ``[(cluster_id, centroid), ...]`` list — the build path already holds
    the centers in memory and skips a pointless DataFrame round-trip."""
    if isinstance(centroids, DataFrame):
        rows = centroids.select("cluster_id", "centroid").collect()  # k×dim only
        rows = [(int(r.cluster_id), list(r.centroid)) for r in rows]
    else:
        rows = [(int(c), list(v)) for c, v in centroids]

    if sum(len(v) for _, v in rows) <= 65536:
        # one F.expr over a generated SQL string: a single py4j call no
        # matter how many centroids (building k Column trees of lambda
        # expressions costs seconds of driver round-trips)
        def dist_sql(center) -> str:
            arr = "array(" + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in center) + ")"
            d = (
                f"sqrt(aggregate(zip_with(CAST(`{vec_col}` AS array<double>), {arr}, "
                "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v))"
            )
            return f"round({d}, {round_to})" if round_to is not None else d

        structs = ",".join(
            f"named_struct('dist', {dist_sql(v)}, 'cluster_id', {c})" for c, v in rows
        )
        return df.withColumn(
            "cluster_id", F.expr(f"array_min(array({structs})).cluster_id")
        )

    if not isinstance(centroids, DataFrame):
        centroids = df.sparkSession.createDataFrame(
            rows, "cluster_id int, centroid array<double>"
        )
    dist = euclidean(vec_col, "centroid")
    if round_to is not None:
        dist = F.round(dist, round_to)
    scored = df.crossJoin(F.broadcast(centroids)).withColumn("__dist", dist)
    w = Window.partitionBy(id_col).orderBy(F.col("__dist").asc(), F.col("cluster_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__dist", "centroid")
    )


class IVFIndex:
    """A persisted IVF index: ``<path>/centroids`` (cluster_id, centroid)
    and ``<path>/corpus`` partitioned by ``cluster_id``."""

    def __init__(self, spark: SparkSession, path: str, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col

    # -- paths ----------------------------------------------------------------

    @property
    def centroids_path(self) -> str:
        return os.path.join(self.path, "centroids")

    @property
    def corpus_path(self) -> str:
        return os.path.join(self.path, "corpus")

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self.centroids_path)

    def corpus(self) -> DataFrame:
        # a committed-but-unfinished maintenance swap can have clusters
        # missing from the live layout; reading through it would be
        # silently wrong, not slow (two cheap fs.exists in the common case)
        self._assert_no_pending_swap()
        return self.spark.read.parquet(self.corpus_path)

    # -- build (reference ivf.py:49-85) ---------------------------------------

    @staticmethod
    def derive_k(n: int, *, min_points_per_cluster: int = MIN_POINTS_PER_CLUSTER, sqrt_factor: float = 4.0) -> int:
        """Corpus-derived cluster count — the IVF twin of
        ``similarity.derive_lsh_geometry`` (round-6 self-deriving-knob
        policy): ``k ≈ 4·√n`` (the FAISS IVF guidance: per-probe scan
        volume n/k then shrinks as √n while the broadcast centroid table
        stays k×dim ≈ kilobytes), floored so every centroid keeps at
        least ~``min_points_per_cluster`` training points (below that
        k-means places centroids on noise). Pure scalar math; callers
        that need the oracle-pinned fixture geometry keep passing k
        explicitly."""
        import math

        if n <= 0:
            return 1
        return max(1, min(n // min_points_per_cluster, int(round(sqrt_factor * math.sqrt(n)))))

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        k: int | None,
        path: str,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        max_iter: int = 20,
        seed: int = 42,
        trainer: str = "sample",
    ) -> "IVFIndex":
        """Quantizer fit → distributed assign → write corpus partitioned by
        cluster, plus the centroid table.

        ``k=None`` derives the cluster count from one corpus count via
        :meth:`derive_k` — geometry follows the corpus, like the LSH
        near-dup path.

        ``trainer="sample"`` (default): k-means++/Lloyd on a bounded random
        sample (operators.kmeans) — the FAISS-style scale design; only the
        capped sample and the k×dim centers ever land on the driver, and
        assignment is a broadcast-argmin over the full corpus.
        ``trainer="ml"``: fully-distributed ``pyspark.ml`` KMeans for when
        training must see more rows than the driver can sample.
        """
        if k is None:
            k = cls.derive_k(corpus.count())
        if trainer == "sample":
            from vector_db_spark.operators.kmeans import (
                DEFAULT_SAMPLE_CAP,
                train_centroids,
            )

            # the sample must keep ~39 training points per centroid (the
            # derive_k floor) or large-k fits place centroids on noise —
            # grow the cap with k; driver cost stays k·39·dim doubles
            cents = train_centroids(
                corpus, vec_col, k, max_iter=max_iter, seed=seed,
                sample_cap=max(DEFAULT_SAMPLE_CAP, MIN_POINTS_PER_CLUSTER * k),
            )
            centers = [(int(i), c) for i, c in enumerate(cents)]
            assigned = assign_to_centroids(
                corpus.select(id_col, vec_col), centers,
                id_col=id_col, vec_col=vec_col,
            )
        elif trainer == "ml":
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector

            feat = corpus.select(
                F.col(id_col),
                F.col(vec_col),
                array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features"),
            )
            model = KMeans(k=k, maxIter=max_iter, seed=seed, featuresCol="__features").fit(feat)
            assigned = (
                model.transform(feat)
                .select(id_col, vec_col, F.col("prediction").alias("cluster_id"))
            )
            centers = [
                (int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
            ]
        else:
            raise ValueError(f"unknown trainer {trainer!r} (use 'sample' or 'ml')")
        # O(k) files, not tasks × k — see write_clustered; parallelism
        # scales with k so a derived-k build keeps its writers busy
        n_shuffle = max(
            int(assigned.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")),
            min(k, 2048),
        )
        write_clustered(
            assigned, os.path.join(path, "corpus"), num_partitions=n_shuffle
        )
        import pyarrow as pa

        from vector_db_spark.io import write_small_parquet

        write_small_parquet(
            os.path.join(path, "centroids"),
            pa.table(
                {
                    "cluster_id": pa.array([c for c, _ in centers], pa.int32()),
                    "centroid": pa.array([v for _, v in centers], pa.list_(pa.float64())),
                }
            ),
        )
        return cls(spark, path, id_col=id_col, vec_col=vec_col)

    # -- incremental add (reference ivf.py:87-117) -----------------------------

    def assign(self, vectors: DataFrame) -> DataFrame:
        """Nearest-centroid assignment (ivf.py:109-110's numpy argmin)."""
        return assign_to_centroids(
            vectors, self.centroids(), id_col=self.id_col, vec_col=self.vec_col
        )

    def add(self, new_vectors: DataFrame) -> None:
        write_clustered(
            self.assign(new_vectors).select(self.id_col, self.vec_col, "cluster_id"),
            self.corpus_path,
            mode="append",
        )

    # -- delete (reference ivf.py:119-136) -------------------------------------

    # -- staged-swap protocol (operators/staging.py, shared with IVFPQ) ---------

    _SWAP_TMPS = (".tmp-delete", ".tmp-refresh")

    def recover(self) -> dict:
        """Complete (or discard) any interrupted staged maintenance swap
        (see operators/staging.py for the protocol). Called automatically
        at the start of :meth:`delete`/:meth:`refresh`; :meth:`corpus`
        RAISES while a planned swap is pending — a crashed swap can leave
        clusters missing from the live layout, and a read that silently
        skipped them would be wrong, not slow. Idempotent; safe anytime."""
        from vector_db_spark.operators.staging import recover_staged

        return recover_staged(self.spark, self.corpus_path, self._SWAP_TMPS)

    def _assert_no_pending_swap(self) -> None:
        from vector_db_spark.operators.staging import assert_no_pending_swap

        assert_no_pending_swap(self.spark, self.corpus_path, self._SWAP_TMPS)

    def delete(self, ids: list[int]) -> None:
        """Rewrite only the partitions that contain the deleted ids — never
        touches cold clusters. The rewrite is staged through a tmp dir and
        committed via the staged-swap protocol above, so (a) the job never
        overwrites files it is still reading, (b) a cluster whose every
        vector is deleted has its partition directory *retired* (dynamic
        partition overwrite would silently leave the stale files — deleted
        ids would stay searchable), and (c) a crash at ANY point either
        never touched the live corpus (pre-plan: staging is discarded) or
        is completed forward by :meth:`recover` — live data is never
        deleted before its replacement is in place."""
        self.recover()
        corpus = self.corpus()
        affected = (
            corpus.filter(F.col(self.id_col).isin(ids))
            .select("cluster_id")
            .distinct()
            .collect()
        )
        clusters = [r.cluster_id for r in affected]
        if not clusters:
            return
        remaining = corpus.filter(
            F.col("cluster_id").isin(clusters) & ~F.col(self.id_col).isin(ids)
        )
        tmp = self.corpus_path.rstrip("/") + ".tmp-delete"
        write_clustered(remaining, tmp)
        from vector_db_spark.operators.staging import execute_swap, write_swap_plan

        write_swap_plan(self.spark, tmp, clusters, [])
        execute_swap(self.spark, self.corpus_path, tmp)

    # -- maintenance: centroid-drift refresh ------------------------------------

    def refresh(self, *, reassign_threshold: float | None = None) -> dict:
        """Centroid-drift maintenance for a long-lived index: incremental
        adds are assigned against centroids frozen at build time (the
        reference behaves identically — ivf.py:87-117 never retrains), so
        cluster means drift away from the stored quantizer and probe
        pruning degrades. One refresh:

        1. recompute every cluster's true mean — ONE aggregation with
           per-dimension ``avg`` columns (map-side partial combine; never
           a posexplode, which would blow the pre-shuffle stream up dim×);
           only k×dim aggregates reach the driver;
        2. rewrite the centroid table (empty clusters keep their center);
        3. optionally (``reassign_threshold``) re-assign the members of
           clusters whose centroid moved more than the threshold against
           the FULL refreshed codebook, moving migrants between partitions
           with the same staged per-partition swap as :meth:`delete`.

        Deliberately incremental: vectors in un-drifted clusters are not
        revisited (their reassignment could only be triggered by someone
        else's drift, a second-order effect); a full Lloyd pass is
        ``build`` again. Returns ``{"max_shift", "drifted", "moved"}``.
        """
        import numpy as np

        self.recover()
        cent_rows = self.centroids().select("cluster_id", "centroid").collect()
        old = {int(r.cluster_id): np.asarray(r.centroid, dtype=np.float64) for r in cent_rows}
        dim = len(next(iter(old.values())))

        corpus = self.corpus()
        mean_rows = (
            corpus.groupBy("cluster_id")
            .agg(*[F.avg(F.col(self.vec_col)[i]).alias(f"m{i}") for i in range(dim)])
            .collect()
        )  # k×dim only
        new = dict(old)
        for r in mean_rows:
            new[int(r.cluster_id)] = np.array([r[f"m{i}"] for i in range(dim)])
        shifts = {c: float(np.linalg.norm(new[c] - old[c])) for c in old}
        max_shift = max(shifts.values(), default=0.0)

        import pyarrow as pa

        from vector_db_spark.io import write_small_parquet

        centers = sorted((c, [float(x) for x in v]) for c, v in new.items())
        write_small_parquet(
            self.centroids_path,
            pa.table(
                {
                    "cluster_id": pa.array([c for c, _ in centers], pa.int32()),
                    "centroid": pa.array([v for _, v in centers], pa.list_(pa.float64())),
                }
            ),
        )

        moved = 0
        drifted = (
            sorted(c for c, s in shifts.items() if s > reassign_threshold)
            if reassign_threshold is not None
            else []
        )
        if drifted:
            affected = corpus.filter(F.col("cluster_id").isin(drifted)).select(
                self.id_col,
                self.vec_col,
                F.col("cluster_id").alias("__old_cluster"),
            )
            reassigned = assign_to_centroids(
                affected.drop("cluster_id"),
                centers,
                id_col=self.id_col,
                vec_col=self.vec_col,
            ).localCheckpoint(eager=True)  # assignments must not recompute
            # after the partition dirs below start swapping out underneath
            moved = reassigned.filter(
                F.col("cluster_id") != F.col("__old_cluster")
            ).count()
            reassigned = reassigned.drop("__old_cluster")
            # ONE staged write holds both halves of the mutation — the
            # drifted clusters' surviving rows (swap: replace dirs) AND the
            # migrating rows under their new non-drifted cluster ids (move:
            # file-renames into existing dirs; the two cluster-id sets are
            # disjoint by construction). The old shape appended movers to
            # the live corpus BEFORE the swap removed them from the drifted
            # dirs, so a crash in between duplicated every mover — and a
            # rerun tripled them. Under the plan protocol a crash either
            # never touched the corpus or replays to exactly-once renames.
            tmp = self.corpus_path.rstrip("/") + ".tmp-refresh"
            write_clustered(reassigned, tmp)
            mover_clusters = [
                int(r.cluster_id)
                for r in reassigned.select("cluster_id")
                .distinct()
                .filter(~F.col("cluster_id").isin(drifted))
                .collect()
            ]
            from vector_db_spark.operators.staging import (
                execute_swap,
                write_swap_plan,
            )

            write_swap_plan(self.spark, tmp, drifted, mover_clusters)
            execute_swap(self.spark, self.corpus_path, tmp)
        return {"max_shift": max_shift, "drifted": drifted, "moved": moved}

    # -- maintenance: hot-cluster split ------------------------------------------

    def split_cluster(self, cluster_id: int, n_sub: int = 2, *, max_iter: int = 10, seed: int = 42) -> dict:
        """Mega-cluster mitigation as a first-class operator (SCALE.md
        "what would break first" #1): re-cluster ONE oversized cluster into
        ``n_sub`` sub-clusters, touching nothing else.

        Natural k-means skew concentrates mass in a few clusters; every
        downstream per-cluster kernel (knn_graph, hnsw_export, SemDeDup)
        and every probe of the hot partition pays for it. AQE splits the
        *join tasks* at read time, but the partition itself stays fat on
        disk. This fixes the layout:

        1. scan only the hot partition (partition-pruned read);
        2. fit ``n_sub`` sub-centroids on a bounded sample of its members
           (operators.kmeans — driver sees ≤ capped-sample rows);
        3. broadcast-argmin assignment to FRESH cluster ids (old max+1…),
           so stale references to the retired id can never alias a
           half-rewritten partition;
        4. stage the sub-partitions to a tmp dir and swap via the
           FileSystem API (same protocol as :meth:`delete`), removing the
           retired partition dir;
        5. rewrite the centroid table: retired row out, ``n_sub`` rows in.

        Search semantics are preserved exactly under exhaustive probing
        (probe-all ≡ brute force before and after — pinned in
        tests/test_ivf.py); at fixed ``n_probe`` the finer quantizer can
        only tighten the probed region around the split.

        Returns ``{"retired", "new_clusters", "sizes"}``."""
        if n_sub < 2:
            raise ValueError("n_sub must be >= 2")
        from vector_db_spark.operators.kmeans import train_centroids

        cent_rows = self.centroids().select("cluster_id", "centroid").collect()
        if cluster_id not in {int(r.cluster_id) for r in cent_rows}:
            raise ValueError(f"unknown cluster_id {cluster_id}")
        next_id = max(int(r.cluster_id) for r in cent_rows) + 1
        members = self.corpus().filter(F.col("cluster_id") == cluster_id)
        n_members = members.count()
        if n_members < n_sub:
            raise ValueError(
                f"cluster {cluster_id} has {n_members} members, cannot split into {n_sub}"
            )

        subs = train_centroids(
            members.select(self.vec_col), self.vec_col, n_sub, max_iter=max_iter, seed=seed
        )
        centers = [(next_id + i, list(c)) for i, c in enumerate(subs)]
        assigned = assign_to_centroids(
            members.select(self.id_col, self.vec_col).drop("cluster_id"),
            centers,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )

        tmp = self.corpus_path.rstrip("/") + ".tmp-split"
        write_clustered(
            assigned.select(self.id_col, self.vec_col, "cluster_id"), tmp
        )
        jpath = self.spark._jvm.org.apache.hadoop.fs.Path
        fs = jpath(self.corpus_path).getFileSystem(self.spark._jsc.hadoopConfiguration())
        # crash-safety ordering: rename the NEW partitions in first (fresh
        # ids cannot collide with existing dirs), then rewrite the centroid
        # table, and delete the retired partition LAST — every intermediate
        # state is readable (worst case the retired cluster's vectors are
        # briefly duplicated under old+new ids, never missing; a crash
        # before the centroid rewrite leaves the old index fully intact)
        for c, _ in centers:
            src = jpath(os.path.join(tmp, f"cluster_id={c}"))
            if fs.exists(src):  # a sub-centroid can end up empty on tiny clusters
                fs.rename(src, jpath(os.path.join(self.corpus_path, f"cluster_id={c}")))

        import pyarrow as pa

        from vector_db_spark.io import write_small_parquet

        kept = [
            (int(r.cluster_id), [float(x) for x in r.centroid])
            for r in cent_rows
            if int(r.cluster_id) != cluster_id
        ]
        all_centers = sorted(kept + [(c, [float(x) for x in v]) for c, v in centers])
        write_small_parquet(
            self.centroids_path,
            pa.table(
                {
                    "cluster_id": pa.array([c for c, _ in all_centers], pa.int32()),
                    "centroid": pa.array([v for _, v in all_centers], pa.list_(pa.float64())),
                }
            ),
        )
        fs.delete(jpath(os.path.join(self.corpus_path, f"cluster_id={cluster_id}")), True)
        fs.delete(jpath(tmp), True)
        sizes = {
            int(r.cluster_id): int(r.cluster_size)
            for r in self.cluster_sizes()
            .filter(F.col("cluster_id").isin([c for c, _ in centers]))
            .collect()
        }
        return {
            "retired": cluster_id,
            "new_clusters": [c for c, _ in centers],
            "sizes": sizes,
        }

    # -- search (reference ivf.py:138-199) --------------------------------------

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 10,
        *,
        metric: str = "euclidean",
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        round_to: int | None = 6,
        allowed_ids: DataFrame | None = None,
        max_broadcast_queries: int = 10_000,
    ) -> DataFrame:
        """n_probe search: rank centroids per query (ivf.py:170-171's argsort
        as a windowed top-n_probe over the broadcast centroid join), then an
        equi-join on ``cluster_id`` against the partitioned corpus — Catalyst
        turns the tiny probe side into dynamic partition pruning, the
        distributed form of "only scan the probed inverted lists"
        (ivf.py:174-178) — then exact distances and a per-query top-k.

        ``allowed_ids`` (one column named like ``id_col``) pre-filters the
        candidate set — metadata-filtered search (reference F2,
        app.py:184-199) as a semi-join BEFORE distances and top-k, so a
        filtered search still returns k results when k matches exist.

        The probe-side broadcast hint is guarded like the batch-kNN
        collect: past ``max_broadcast_queries`` query rows the probe join
        runs un-hinted (shuffle on ``cluster_id``, the standard
        co-partition exchange against the cluster-partitioned corpus)
        instead of shipping a corpus-shaped probe table to every task."""
        if metric not in METRICS:
            raise ValueError(f"unknown metric {metric!r}; choose from {sorted(METRICS)}")
        # probe ranking uses the SAME metric as final scoring: a euclidean
        # probe under metric="dot" would aim at the L2-nearest centroids
        # while the max-inner-product neighbors live in large-norm clusters
        # far away in L2 — deterministically missing the true top-k
        # whenever n_probe < n_clusters (for "cosine" the registered path
        # normalizes first, where the two orders coincide; this guards the
        # direct-API caller on raw vectors). Ranking ascending by
        # METRICS[metric] is nearest-under-that-metric by construction
        # (dot is registered negated).
        probes = top_k_per_group(
            queries.crossJoin(F.broadcast(self.centroids())).withColumn(
                "__cdist", METRICS[metric](F.col(query_vec_col), F.col("centroid"))
            ),
            [query_id_col],
            [F.col("__cdist").asc(), F.col("cluster_id").asc()],
            n_probe,
        ).select(query_id_col, query_vec_col, "cluster_id")

        corpus = self.corpus()
        if allowed_ids is not None:
            corpus = corpus.join(allowed_ids, self.id_col, "left_semi")
        small = (
            queries.limit(max_broadcast_queries + 1).count() <= max_broadcast_queries
        )
        cand = (F.broadcast(probes) if small else probes).join(corpus, "cluster_id")
        scored = cand.select(
            F.col(query_id_col).alias("query_id"),
            F.col(self.id_col).alias("neighbor_id"),
            METRICS[metric](F.col(query_vec_col), F.col(self.vec_col)).alias("dist"),
        )
        if round_to is not None:
            scored = scored.withColumn("dist", F.round("dist", round_to))
        return top_k_per_group(
            scored, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
        )

    # -- stats (reference ivf.py:201-215) ----------------------------------------

    def cluster_sizes(self) -> DataFrame:
        return self.corpus().groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))

    def stats(self) -> DataFrame:
        sizes = self.cluster_sizes()
        return sizes.agg(
            F.count("*").alias("n_clusters"),
            F.min("cluster_size").alias("min_size"),
            F.max("cluster_size").alias("max_size"),
            (F.sum("cluster_size").cast("double") / F.count("*")).alias("avg_size"),
            F.sum("cluster_size").alias("total_vectors"),
        )
