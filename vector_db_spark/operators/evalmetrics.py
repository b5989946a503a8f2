"""Retrieval-quality metrics — recall@k, MRR@k, nDCG@k as DataFrame
aggregations: the evaluation half of a retrieval engine (the reference
eyeballs recall in its integration tests,
``/root/reference/tests/integration/test_search_api.py``; production
search ships metric pipelines).

Spark shape: one equi-join of the result list against the graded
relevance judgments on ``(query_id, neighbor_id)`` (both sides are k-row
lists per query — the join is output-sized, never corpus-sized), one
``groupBy(query_id)`` for the per-query metrics, optionally one more row
for the macro average. All math is native expressions; per-query metric
values are rounded so cross-engine float summation (≤ k terms) stays
inside the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    *,
    round_to: int = 6,
) -> DataFrame:
    """(query_id, n_results, recall_k, mrr_k, ndcg_k).

    ``results``: (query_id, neighbor_id, rank) with rank 1..k.
    ``qrels``: (query_id, neighbor_id, rel) graded relevance, rel > 0.

    Definitions (the standard ones): recall@k = fraction of judged items
    retrieved (denominator ``min(k, |qrels_q|)``); MRR@k = 1/rank of the
    first relevant result (0 when none); nDCG@k with
    ``DCG = Σ rel_i / log2(rank_i + 1)`` against the ideal ordering of
    the judgments."""
    r = results.select("query_id", "neighbor_id", "rank").filter(
        F.col("rank") <= k
    )
    g = qrels.select("query_id", "neighbor_id", "rel").filter(F.col("rel") > 0)
    joined = r.join(g, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce("rel", F.lit(0.0)).cast("double").alias("rel"),
    )
    per_q = joined.groupBy("query_id").agg(
        F.count("*").alias("n_results"),
        F.sum((F.col("rel") > 0).cast("long")).alias("n_hit"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel_rank"),
        F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"),
    )
    ideal = (
        g.withColumn(
            "irank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("rel").desc(), "neighbor_id"
                )
            ),
        )
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(F.col("rel") / F.log2(F.col("irank") + 1)).alias("idcg"),
            F.count("*").alias("n_judged"),
        )
    )
    return (
        per_q.join(ideal, "query_id", "left")
        .select(
            "query_id",
            "n_results",
            F.round(
                F.col("n_hit") / F.least(F.lit(k), F.coalesce("n_judged", F.lit(k))),
                round_to,
            ).alias("recall_k"),
            F.round(
                F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0)), round_to
            ).alias("mrr_k"),
            F.round(
                F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)), round_to
            ).alias("ndcg_k"),
        )
    )


def truncation_overlap(
    corpus: DataFrame,
    *,
    k: int = 10,
    d_trunc: int = 16,
    n_queries: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style truncation audit: per query, the overlap@k between
    exact k-NN under the full embedding and under its first ``d_trunc``
    dimensions — ``(query_id, overlap_cnt, overlap_frac)``.

    The operational question behind MRL-trained embeddings (Kusupati et
    al., NeurIPS'22): how much retrieval quality survives storing/searching
    a prefix of each vector (4× fewer bytes at d/4)? High overlap ⇒ the
    prefix index can serve first-pass retrieval with full-dim re-rank —
    exactly the two-stage shape operators/binquant.py uses for sign bits.

    Both k-NN runs use the partial-top-k batch kernel (operators/knn.py);
    the truncated side slices map-side, so its scan moves d_trunc/d of
    the bytes. Deterministic end-to-end (rounded-distance + id
    tie-breaks) ⇒ exact-oracle-checkable in SQL."""
    from vector_db_spark.operators.knn import knn_self

    full = knn_self(corpus, k, n_queries=n_queries, id_col=id_col, vec_col=vec_col)
    trunc = knn_self(
        corpus.withColumn(vec_col, F.slice(vec_col, 1, d_trunc)),
        k,
        n_queries=n_queries,
        id_col=id_col,
        vec_col=vec_col,
    )
    inter = (
        full.select("query_id", "neighbor_id")
        .join(trunc.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("overlap_cnt"))
    )
    qids = full.select("query_id").distinct()
    return qids.join(inter, "query_id", "left").select(
        "query_id",
        F.coalesce("overlap_cnt", F.lit(0)).alias("overlap_cnt"),
        F.round(F.coalesce("overlap_cnt", F.lit(0)) / F.lit(float(k)), 6).alias(
            "overlap_frac"
        ),
    )
