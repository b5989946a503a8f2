from vector_db_spark.functions.distance import (  # noqa: F401
    cosine_similarity,
    dot_product,
    euclidean,
    euclidean_squared,
    l2_norm,
)
