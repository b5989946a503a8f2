"""Collaborative-filtering recommendations (pyspark.ml ALS, implicit).

The engine's co-purchase surface so far is neighborhood-based (wedge
joins: `knn_graph.link_prediction*`, association rules, PPR expansion).
ALS is the model-based complement — the classic distributed
matrix-factorization workload (Hu/Koren/Volinsky '08 implicit
formulation), and Spark's canonical "only-on-a-cluster" ML algorithm:
each iteration alternates closed-form least-squares solves over users
then items, shuffling factor blocks instead of ratings.

Scale posture: training cost per iteration is O(nnz·rank²) flops over
block-partitioned factors (Spark ML's DSGD-style blocking); the rating
matrix is built with ONE groupBy over the purchase fact table. Serving
(`recommend_for_users`) is the model's own blocked cross-product top-k,
never a corpus×corpus join.

Determinism: fixed seed makes runs reproducible on a fixed layout, but
factor values move in the last float bits with partitioning, so (as
with k-means / LogisticRegression elsewhere in this repo) driver-facing
audits emit arity/ordering/separation FACTS with margin, never raw
scores. tests/test_recommend.py trains on a planted two-block corpus
where the learnable structure is unambiguous and pins real separation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_ratings(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """(user, item, rating): implicit strength = line count per
    (customer, part) — one join + one map-side-combinable groupBy over
    the fact table."""
    return (
        lineitem.select("l_orderkey", "l_partkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item"))
        .agg(F.count("*").cast("float").alias("rating"))
    )


def train_als(
    ratings: DataFrame,
    *,
    rank: int = 8,
    max_iter: int = 5,
    reg: float = 0.1,
    alpha: float = 10.0,
    seed: int = 42,
):
    """Fit implicit-feedback ALS. Returns the fitted model."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        alpha=alpha,
        implicitPrefs=True,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        seed=seed,
        coldStartStrategy="drop",
    )
    return als.fit(ratings)


def recommend_for_users(model, n_recs: int) -> DataFrame:
    """(user, item, rec_rank, score): the model's blocked top-k per user,
    exploded to rows with an explicit 1-based rank (scores strictly
    ordered within a user by construction)."""
    recs = model.recommendForAllUsers(n_recs)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user",
        F.col("rec.item").alias("item"),
        (F.col("pos") + 1).alias("rec_rank"),
        F.col("rec.rating").alias("score"),
    )


def score_pairs(model, pairs: DataFrame) -> DataFrame:
    """(user, item, score) for explicit candidate pairs — the model's
    transform (factor dot products), used by audits to compare predicted
    affinity of purchased vs never-purchased pairs."""
    return (
        model.transform(pairs.select("user", "item"))
        .select("user", "item", F.col("prediction").alias("score"))
    )
