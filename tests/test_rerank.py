"""MMR rerank: step-by-step numpy reference, degenerate λ, determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vector_db_spark.operators.rerank import mmr_rerank


def _cands_df(spark, query_id, ids, rel, vecs):
    rows = [
        (query_id, int(i), float(r), [float(x) for x in v])
        for i, r, v in zip(ids, rel, vecs)
    ]
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rel double, embedding array<float>"
    )


def _ref_mmr(ids, rel, vecs, k, lam):
    """Independent greedy reference (no shared code with the operator)."""
    V = np.asarray(vecs, dtype=np.float64)
    U = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    sims = U @ U.T
    rel = np.asarray(rel, dtype=np.float64)
    ids = np.asarray(ids, dtype=np.int64)
    picked, red = [], np.zeros(len(ids))
    avail = set(range(len(ids)))
    for _ in range(min(k, len(ids))):
        score = np.round(lam * rel - (1 - lam) * red, 9)
        best, best_key = None, None
        for j in sorted(avail):
            key = (-score[j], ids[j])
            if best_key is None or key < best_key:
                best, best_key = j, key
        picked.append(best)
        avail.discard(best)
        red = np.maximum(red, np.round(sims[:, best], 9))
    return [int(ids[j]) for j in picked]


def test_mmr_matches_reference_trace(spark):
    rng = np.random.default_rng(5)
    ids = list(range(100, 115))
    vecs = rng.standard_normal((15, 8))
    rel = rng.uniform(0, 1, 15)
    df = _cands_df(spark, 1, ids, rel, vecs)
    for lam in (0.3, 0.7):
        got = [
            r.neighbor_id
            for r in mmr_rerank(df, 6, lam=lam).orderBy("mmr_rank").collect()
        ]
        assert got == _ref_mmr(ids, rel, vecs, 6, lam), f"lam={lam}"


def test_lambda_one_is_pure_relevance_order(spark):
    rng = np.random.default_rng(9)
    ids = list(range(10))
    rel = [0.1 * i for i in range(10)]
    df = _cands_df(spark, 7, ids, rel, rng.standard_normal((10, 4)))
    got = [r.neighbor_id for r in mmr_rerank(df, 4, lam=1.0).orderBy("mmr_rank").collect()]
    assert got == [9, 8, 7, 6]


def test_diversification_prefers_novelty(spark):
    """Two near-identical top-relevance docs: with λ=0.5 the second pick
    must skip the clone of pick 1 in favor of an orthogonal doc."""
    vecs = [[1.0, 0.0], [0.999, 0.01], [0.0, 1.0]]
    rel = [1.0, 0.99, 0.5]
    df = _cands_df(spark, 2, [0, 1, 2], rel, vecs)
    got = [r.neighbor_id for r in mmr_rerank(df, 3, lam=0.5).orderBy("mmr_rank").collect()]
    assert got == [0, 2, 1]


def test_k_exceeding_candidates_and_multiqueries(spark):
    rng = np.random.default_rng(2)
    a = _cands_df(spark, 1, [1, 2], [0.5, 0.9], rng.standard_normal((2, 4)))
    b = _cands_df(spark, 2, [3, 4, 5], [0.1, 0.2, 0.3], rng.standard_normal((3, 4)))
    out = mmr_rerank(a.unionByName(b), 10, lam=0.6)
    counts = {r.query_id: r["count"] for r in out.groupBy("query_id").count().collect()}
    assert counts == {1: 2, 2: 3}
    ranks = [r.mmr_rank for r in out.filter(F.col("query_id") == 2).orderBy("mmr_rank").collect()]
    assert ranks == [1, 2, 3]


def test_mmr_empty_candidates(spark):
    df = spark.createDataFrame(
        [], "query_id long, neighbor_id long, rel double, embedding array<float>"
    )
    assert mmr_rerank(df, 5).count() == 0
