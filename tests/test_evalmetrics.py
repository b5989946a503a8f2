"""retrieval_metrics (operators/evalmetrics.py) vs hand-computed values."""

from __future__ import annotations

import math


def test_metrics_hand_checked(spark):
    from vector_db_spark.operators.evalmetrics import retrieval_metrics

    # q1: results [10, 11, 12]; judged {10: rel 3, 12: rel 1, 99: rel 2}
    # q2: results [20, 21, 22]; nothing judged among them
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2), (2, 22, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 3.0), (1, 12, 1.0), (1, 99, 2.0), (2, 77, 1.0)],
        "query_id long, neighbor_id long, rel double",
    )
    got = {r["query_id"]: r.asDict() for r in
           retrieval_metrics(results, qrels, 3).collect()}
    # q1: hits 2 of min(3, 3 judged) → recall 2/3; first rel at rank 1 → MRR 1
    assert got[1]["recall_k"] == round(2 / 3, 6)
    assert got[1]["mrr_k"] == 1.0
    dcg = 3.0 / math.log2(2) + 0.0 / math.log2(3) + 1.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert got[1]["ndcg_k"] == round(dcg / idcg, 6)
    # q2: no hits → all zeros
    assert got[2]["recall_k"] == 0.0 and got[2]["mrr_k"] == 0.0
    assert got[2]["ndcg_k"] == 0.0


def test_perfect_results_score_one(spark):
    from vector_db_spark.operators.evalmetrics import retrieval_metrics

    results = spark.createDataFrame(
        [(1, i, i) for i in range(1, 6)], "query_id long, neighbor_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, i, float(6 - i)) for i in range(1, 6)],
        "query_id long, neighbor_id long, rel double",
    )
    r = retrieval_metrics(results, qrels, 5).collect()[0]
    assert r["recall_k"] == 1.0 and r["mrr_k"] == 1.0 and r["ndcg_k"] == 1.0
