"""Vector-search queries (SURVEY.md §2.3) over the ``embeddings`` fixture.

The flagship: exact brute-force k-NN of the first N corpus vectors against
the whole corpus — the reference's search semantics (ivf.py:174-198 exact
inner loop; api/app.py:165-233 entry point) in batch similarity-join form.
Registered twice, once per physical strategy, both hash-checked against the
same DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.io import load_table
from vector_db_spark.operators.knn import knn_join, knn_self
from vector_db_spark.queries import register

N_QUERIES = 20
TOP_K = 10

_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_distance(q.qv, c.embedding::DOUBLE[]), 6) AS dist
  FROM q CROSS JOIN embeddings c
), r AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
  FROM d
)
SELECT query_id, neighbor_id, dist, rank::INTEGER AS rank
FROM r WHERE rank <= {TOP_K}
"""


@register("knn_exact_batch", oracle=_KNN_ORACLE)
def knn_exact_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force k-NN, mapInPandas batch kernel (the 100 TB strategy)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_self(emb, TOP_K, n_queries=N_QUERIES, impl="batch")


@register("knn_exact_sql", extra=True, oracle=_KNN_ORACLE)
def knn_exact_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force k-NN, pure DataFrame ops (native higher-order distance).
    Same oracle as the batch variant — kept as the locally-tested alternate
    physical strategy (and the bench cross-check) outside the driver's
    50-query budget."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_self(emb, TOP_K, n_queries=N_QUERIES, impl="sql")


_KNN_FILTERED_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_distance(q.qv, c.embedding::DOUBLE[]), 6) AS dist
  FROM q CROSS JOIN embeddings c WHERE c.label = 3
), r AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
  FROM d
)
SELECT query_id, neighbor_id, dist, rank::INTEGER AS rank
FROM r WHERE rank <= {TOP_K}
"""


@register("knn_filtered", oracle=_KNN_FILTERED_ORACLE)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered k-NN (reference F1+F2: filter_by_metadata at
    services/storage_service.py:106-128 wired into search at
    api/app.py:184-199). The filter is an ordinary Catalyst predicate pushed
    to the Parquet scan *before* the join — strictly better than the
    reference's post-hoc id-set check during graph traversal."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .filter(F.col("query_id") < N_QUERIES)
    )
    corpus = emb.filter(F.col("label") == 3)
    return knn_join(queries, corpus, TOP_K, impl="batch")


@register("knn_cosine", extra=True, oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), d AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(1.0 - list_cosine_similarity(q.qv, c.embedding::DOUBLE[]), 6) AS dist
  FROM q CROSS JOIN embeddings c
), r AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
  FROM d
)
SELECT query_id, neighbor_id, dist, rank::INTEGER AS rank
FROM r WHERE rank <= {TOP_K}
""")
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-distance k-NN (batch kernel)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_self(emb, TOP_K, n_queries=N_QUERIES, metric="cosine", impl="batch")


_SQ8_N_QUERIES = 10

# the SQ8 pipeline end-to-end in SQL: per-dim affine ranges, uint8 encode,
# asymmetric decode-in-the-distance search — deterministic double math, so
# the whole compression+search path hash-matches, not just its output shape
_SQ8_ORACLE = f"""
WITH stats AS (
  SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
            MAX(CAST(embedding[i] AS DOUBLE)) AS mx
  FROM embeddings, range(1, 65) t(i)
  GROUP BY i
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_SQ8_N_QUERIES}
), d AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(sqrt(SUM(pow(
           q.qv[s.i] - (s.mn + floor(
             CASE WHEN s.mx > s.mn THEN
               LEAST(GREATEST((CAST(c.embedding[s.i] AS DOUBLE) - s.mn)
                              / (s.mx - s.mn), 0.0), 1.0)
             ELSE 0.0 END * 255.0 + 0.5
           ) * (s.mx - s.mn) / 255.0), 2))), 6) AS dist
  FROM q CROSS JOIN embeddings c CROSS JOIN stats s
  GROUP BY q.query_id, c.vec_id
), r AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
  FROM d
)
SELECT query_id, neighbor_id, dist, rank::INTEGER AS rank
FROM r WHERE rank <= {TOP_K}
"""


@register("sq8_search", extra=True, oracle=_SQ8_ORACLE)
def sq8_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized search (operators/squant.py): train per-dim
    ranges (one dim-row aggregation), encode the corpus to uint8 codes (4×
    smaller scan), search asymmetrically with the decode fused into the
    codegen'd distance. The quantization error this introduces vs exact
    k-NN is bounded in tests/test_squant.py."""
    from vector_db_spark.operators.squant import sq_encode, sq_search, sq_train

    emb = load_table(spark, sf_dir, "embeddings")
    model = sq_train(emb)
    codes = sq_encode(emb, model)
    queries = emb.filter(F.col("vec_id") < _SQ8_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sq_search(codes, queries, model, TOP_K)
