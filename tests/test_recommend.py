"""ALS collaborative filtering (operators/recommend.py).

Planted two-block structure: users in block A only ever buy A-items,
users in block B only B-items. A sane implicit-ALS fit must rank
within-block items above cross-block items for held-out scoring — the
unambiguous learnable signal the synthetic TPC-H tables lack.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.recommend import (
    recommend_for_users,
    score_pairs,
    train_als,
)


@pytest.fixture(scope="module")
def block_model(spark):
    rows = []
    for u in range(30):  # block A: users 0-29 buy items 0-19
        for i in range(0, 20, 2 + u % 3):
            rows.append((u, i, 3.0))
    for u in range(30, 60):  # block B: users 30-59 buy items 100-119
        for i in range(100, 120, 2 + u % 3):
            rows.append((u, i, 3.0))
    ratings = spark.createDataFrame(rows, "user int, item int, rating float")
    return train_als(ratings, rank=4, max_iter=8, seed=7), ratings


def test_recs_have_exact_arity_and_descending_scores(spark, block_model):
    model, _ = block_model
    recs = recommend_for_users(model, 4).collect()
    by_user: dict[int, list] = {}
    for r in recs:
        by_user.setdefault(r.user, []).append(r)
    assert len(by_user) == 60
    for rows in by_user.values():
        rows.sort(key=lambda r: r.rec_rank)
        assert [r.rec_rank for r in rows] == [1, 2, 3, 4]
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_block_structure_learned(spark, block_model):
    """Within-block unpurchased items must outscore cross-block items
    for (almost) every user — the planted-signal separation check."""
    model, ratings = block_model
    users = spark.range(60).select(F.col("id").cast("int").alias("user"))
    a_items = spark.createDataFrame([(i,) for i in range(0, 20)], "item int")
    b_items = spark.createDataFrame([(i,) for i in range(100, 120)], "item int")
    grid = users.crossJoin(a_items.union(b_items)).join(
        ratings.select("user", "item"), ["user", "item"], "left_anti"
    )
    scored = score_pairs(model, grid).withColumn(
        "within",
        ((F.col("user") < 30) & (F.col("item") < 100))
        | ((F.col("user") >= 30) & (F.col("item") >= 100)),
    )
    means = {
        r.within: r.m
        for r in scored.groupBy("within").agg(F.avg("score").alias("m")).collect()
    }
    assert means[True] > means[False] + 0.2


def test_top_recs_stay_within_block(spark, block_model):
    model, _ = block_model
    recs = recommend_for_users(model, 3)
    cross = recs.filter(
        ((F.col("user") < 30) & (F.col("item") >= 100))
        | ((F.col("user") >= 30) & (F.col("item") < 100))
    ).count()
    assert cross / (60 * 3) < 0.1  # <10% of top-3 slots leak across blocks
