"""Exact k-NN search as a similarity join.

Reference behavior: a query is embedded, optionally metadata-filtered, then
matched against every candidate with an exact distance and sorted
(brute-force inner loops at ``/root/reference/src/vector_db/indexing/
ivf.py:174-198``; one-query-per-HTTP-call at ``api/app.py:165-233``). Here a
*table* of queries joins a *table* of corpus vectors — the batch/similarity-
join form (SURVEY.md §2.3 V2/V15).

Two physical strategies, same results:

- ``impl="sql"``: broadcast the (small) query side, cross-join the corpus,
  native-SQL distance, windowed top-k. Entirely JVM-side; the plan is
  BroadcastNestedLoopJoin → WholeStageCodegen distance → shuffle of
  (n_queries x corpus) rows for the per-query window. Exact and
  oracle-checkable, but the window shuffle carries every scored pair.
- ``impl="batch"``: the 100 TB path. Queries are broadcast to executors as a
  numpy matrix; a ``mapInPandas`` kernel scores each corpus Arrow batch
  against all queries vectorized (BLAS) and emits only the per-batch top-k
  per query, so the shuffle carries at most ``k * n_queries * n_batches``
  rows into the final exact top-k — a map-side partial top-k, the same idea
  as Spark's TakeOrderedAndProject but per query group.

Distances are rounded (default 6 dp) and ties broken by neighbor id, making
the result set deterministic and engine-independent.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_spark.functions.distance import METRICS
from vector_db_spark.operators.topk import top_k_per_group

_BATCH_SCHEMA = "query_id long, neighbor_id long, dist double"


def _numpy_distances(metric: str, corpus: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """(n_corpus, n_queries) distance matrix in float64.

    Euclidean uses the explicit difference form (not the ``a^2+b^2-2ab``
    expansion) so values agree with the sequential-fold SQL expression to
    well under the output rounding.
    """
    if metric in ("euclidean", "sqeuclidean"):
        # chunk queries to bound the (n, q, d) intermediate
        out = np.empty((corpus.shape[0], queries.shape[0]), dtype=np.float64)
        step = max(1, int(4e7 // (corpus.shape[0] * corpus.shape[1] + 1)))
        for s in range(0, queries.shape[0], step):
            diff = corpus[:, None, :] - queries[None, s : s + step, :]
            out[:, s : s + step] = np.einsum("nqd,nqd->nq", diff, diff)
        return out if metric == "sqeuclidean" else np.sqrt(out)
    if metric == "cosine":
        cn = np.linalg.norm(corpus, axis=1, keepdims=True)
        qn = np.linalg.norm(queries, axis=1, keepdims=True)
        return 1.0 - (corpus @ queries.T) / (cn * qn.T)
    if metric == "dot":
        return -(corpus @ queries.T)
    raise ValueError(f"unknown metric {metric!r}")


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    metric: str = "euclidean",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "batch",
    round_to: int | None = 6,
    max_batch_queries: int = 10_000,
) -> DataFrame:
    """Exact k nearest corpus rows per query row.

    Returns columns ``(query_id, neighbor_id, dist, rank)``. The corpus
    side is never collected and may be arbitrarily large. The query side
    is *expected* to be the small (serving-shaped) side, but that
    assumption is enforced, not trusted: ``impl="batch"`` first counts
    the query table and, past ``max_batch_queries`` rows, routes to the
    distributed join path WITHOUT a broadcast hint (Catalyst/AQE pick
    the strategy) — a corpus-shaped query side degrades to a longer
    distributed job instead of silently OOMing the driver collect.
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; choose from {sorted(METRICS)}")
    if impl not in ("batch", "sql"):
        raise ValueError(f"unknown impl {impl!r}")
    # Guard probe, shaped per impl: the batch path needs the rows anyway,
    # so its probe IS the fetch (collect at most max+1 rows — no second
    # evaluation of the query-side lineage). The sql path never needs the
    # vectors on the driver, so it probes with a limit(max+1).count() —
    # the same trick ivf/ivfpq use — instead of shipping full embeddings
    # it would immediately discard. Oversized query tables route to the
    # un-hinted distributed join for EITHER impl (the sql path's broadcast
    # hint is just as much a blow-up as the collect).
    if impl == "batch":
        qrows = (
            queries.select(query_id_col, query_vec_col)
            .limit(max_batch_queries + 1)
            .collect()
        )
        small = len(qrows) <= max_batch_queries
        if not small:
            impl = "sql"  # query side too big to collect: stay distributed
    else:
        qrows = None
        small = (
            queries.select(query_id_col).limit(max_batch_queries + 1).count()
            <= max_batch_queries
        )
    if impl == "sql":
        qside = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qv"),
        )
        if small:
            qside = F.broadcast(qside)
        scored = corpus.crossJoin(qside).select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            METRICS[metric](F.col("__qv"), F.col(vec_col)).alias("dist"),
        )
    else:
        scored = _batch_score(
            qrows, corpus, k,
            metric=metric,
            id_col=id_col, vec_col=vec_col, round_to=round_to,
        )

    if round_to is not None:
        # no-op for impl="batch" (kernel already rounds before selecting),
        # kept so both impls share one output expression
        scored = scored.withColumn("dist", F.round("dist", round_to))
    return top_k_per_group(
        scored, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
    )


def _partial_topk(
    dists: np.ndarray, cids: np.ndarray, k: int, round_to: int | None
) -> tuple[np.ndarray, np.ndarray]:
    """Per-query top-k within one batch under the FINAL ordering
    (rounded dist, neighbor id) — ``(idx (k, q), rounded dists (n, q))``.

    Rounding must happen *before* selection: an unrounded argpartition can
    cut a candidate that ties at the boundary after rounding yet wins the
    id tiebreak globally, making the result depend on partition layout.
    lexsort keys are (secondary=id, primary=dist) per numpy convention."""
    if round_to is not None:
        dists = np.round(dists, round_to)
    n, nq = dists.shape
    kk = min(k, n)
    # vectorized O(n) cut across ALL queries at once; per-query work below
    # touches only the kk-row cut (plus, rarely, boundary ties)
    part = np.argpartition(dists, kk - 1, axis=0)[:kk]  # (kk, q), ties arbitrary
    thresh = np.take_along_axis(dists, part, axis=0).max(axis=0)  # (q,)
    n_le = (dists <= thresh[None, :]).sum(axis=0)  # candidates per query
    idx = np.empty((kk, nq), dtype=np.int64)
    for q in range(nq):
        if n_le[q] == kk:
            cand = part[:, q]  # the cut IS the exact candidate set
        else:
            # distance ties straddle the cut boundary: widen to every tie so
            # an id-tiebreak winner below the cut is never dropped
            cand = np.flatnonzero(dists[:, q] <= thresh[q])
        order = np.lexsort((cids[cand], dists[cand, q]))[:kk]
        idx[:, q] = cand[order]
    return idx, dists


def _batch_score(
    qrows: list,
    corpus: DataFrame,
    k: int,
    *,
    metric: str,
    id_col: str,
    vec_col: str,
    round_to: int | None = 6,
) -> DataFrame:
    """Map-side scored + partially-top-k'd (query, neighbor, dist) triples.
    ``qrows`` is the already-collected (id, vec) query side — knn_join's
    size guard did the bounded fetch."""
    if not qrows:
        return corpus.sparkSession.createDataFrame([], _BATCH_SCHEMA)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, qmat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            cvecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            dists = _numpy_distances(metric, cvecs, mat)  # (n, q)
            idx, dists = _partial_topk(dists, cids, k, round_to)
            kk = idx.shape[0]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids[None, :], kk, axis=0).ravel(),
                    "neighbor_id": cids[idx].ravel(),
                    "dist": np.take_along_axis(dists, idx, axis=0).ravel(),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, _BATCH_SCHEMA)


def knn_self(
    corpus: DataFrame,
    k: int = 5,
    *,
    n_queries: int = 20,
    metric: str = "euclidean",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "batch",
) -> DataFrame:
    """k-NN of the first ``n_queries`` corpus vectors (by id) against the
    whole corpus — the flagship self-join query (SURVEY.md §7 Phase 0)."""
    queries = (
        corpus.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
        .filter(F.col("query_id") < n_queries)
    )
    return knn_join(
        queries, corpus, k, metric=metric, id_col=id_col, vec_col=vec_col, impl=impl
    )


def adaptive_filtered_knn(
    queries: DataFrame,
    index,
    k: int = 5,
    *,
    allowed_ids: DataFrame,
    n_probe: int = 10,
    exact_threshold: int = 100_000,
    metric: str = "euclidean",
) -> DataFrame:
    """Selectivity-adaptive filtered search — the pre-filter/post-filter
    planning decision every production vector store makes, as a library
    function over an :class:`~vector_db_spark.operators.ivf.IVFIndex`.

    A filtered ANN search has two regimes:

    - **selective filter** (few matching ids): probe-pruned IVF search is
      WRONG here, not just slow — the k true neighbors among the survivors
      may all live outside the probed clusters, so recall collapses as
      selectivity rises. Brute-force over the surviving rows is both exact
      and cheap (the survivor set is small).
    - **broad filter**: brute force re-scores nearly the whole corpus;
      probe-pruned IVF with the filter as a pre-join
      (``IVFIndex.search(allowed_ids=...)``) keeps the scan sublinear at
      ANN-grade recall.

    The regime is picked from the actual survivor count — one cheap
    aggregate over the (already narrow) id column, the same runtime
    statistic AQE re-plans on. ``exact_threshold`` is per-cluster-budget
    shaped: survivors ≤ threshold cost one bounded batch-kernel pass.
    Both branches emit identical schemas with rounded-distance/id-tiebreak
    determinism, so the choice never changes *what* is returned for the
    selective regime, only how.
    """
    n_allowed = allowed_ids.count()  # narrow column, cheap aggregate
    if n_allowed <= exact_threshold:
        corpus = index.corpus().join(
            F.broadcast(allowed_ids) if n_allowed <= 1_000_000 else allowed_ids,
            index.id_col,
            "left_semi",
        )
        return knn_join(
            queries,
            corpus,
            k,
            metric=metric,
            id_col=index.id_col,
            vec_col=index.vec_col,
            impl="batch",
        )
    return index.search(
        queries, k, n_probe, metric=metric, allowed_ids=allowed_ids
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    *,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    query_label_col: str = "query_label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int | None = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per query,
    the k nearest corpus vectors whose label DIFFERS from the query's —
    the near-but-wrong examples a bi-encoder trains against.

    Same physical shape as ``knn_join(impl="sql")`` with the label
    disequality folded into the broadcast join condition: the corpus
    streams map-side against broadcast queries, the mismatch filter runs
    inside codegen before any distance math, and only per-query top-k
    rows reach the window. At deployment scale the corpus side is the
    IVF/LSH candidate set rather than the full scan — the mining rule
    (filter ≠ label, then top-k) is identical.

    Returns ``(query_id, neighbor_id, neighbor_label, dist, rank)``.
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; choose from {sorted(METRICS)}")
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qv"),
            F.col(query_label_col).alias("__ql"),
        )
    )
    scored = (
        corpus.crossJoin(q)
        .filter(F.col(label_col) != F.col("__ql"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("neighbor_label"),
            METRICS[metric](F.col("__qv"), F.col(vec_col)).alias("dist"),
        )
    )
    if round_to is not None:
        scored = scored.withColumn("dist", F.round("dist", round_to))
    return top_k_per_group(
        scored, ["query_id"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
    )
