"""Vector distance expressions as native Spark SQL higher-order functions.

The reference computes euclidean distance with numpy
(``/root/reference/src/vector_db/util/distance.py:3-4``) one pair at a time.
Here each distance is a Column expression built from ``zip_with`` +
``aggregate`` — it runs JVM-side inside whole-stage codegen, so the hot
k-NN path never crosses the Python boundary (SURVEY.md §4 "distance
performance"). Arrays are cast to double first so results are reproducible
and comparable against a DuckDB oracle computing on DOUBLE[].

A vectorized numpy path for the same metrics lives in
``vector_db_spark.operators.knn`` (mapInPandas batch kernel); both paths
agree to double-precision rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def euclidean_squared(a: Column | str, b: Column | str) -> Column:
    """``sum((a_i - b_i)^2)`` — a left fold in array order, matching the
    sequential summation a SQL oracle performs."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column | str, b: Column | str) -> Column:
    """L2 distance — reference util/distance.py:3-4 (np.linalg.norm(v1-v2))."""
    return F.sqrt(euclidean_squared(a, b))


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


METRICS = {
    "euclidean": euclidean,
    "sqeuclidean": euclidean_squared,
    "cosine": cosine_distance,
    "dot": lambda a, b: -dot_product(a, b),  # larger dot = closer → negate for ORDER BY asc
}
