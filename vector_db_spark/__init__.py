"""spark-vector-engine: a PySpark-native analytics engine with the query and
data-processing capabilities of the ``GProgrammer1/Vector-DB`` reference.

The reference (see SURVEY.md) is a single-table vector database: documents with
embeddings, metadata filtering, exact + approximate (HNSW/IVF) k-NN search,
product quantization, k-means clustering, and cluster statistics. This package
re-expresses that capability surface — plus the LLM-data-pipeline operators a
100 TB training-data pipeline needs — as an idiomatic Spark DataFrame library:

- ``vector_db_spark.functions.distance`` — vector distance expressions
  (native Spark SQL higher-order functions, JVM-side / codegen'd).
- ``vector_db_spark.operators.knn`` — exact brute-force k-NN joins
  (reference: ivf.py:174-198 inner loops) at any scale.
- ``vector_db_spark.operators.ivf`` — IVF ANN index: k-means build,
  cluster-partitioned storage, n_probe probe-pruned search
  (reference: src/vector_db/indexing/ivf.py).
- ``vector_db_spark.operators.pq`` — product quantization
  (reference: src/vector_db/inference/pq.py).
- ``vector_db_spark.operators.dedup`` — exact / MinHash-LSH / SimHash /
  n-gram-Jaccard / embedding-cosine dedup (north-star extensions).
- ``vector_db_spark.storage`` — the Node-table CRUD surface
  (reference: src/vector_db/storage.py) on Parquet.
- ``vector_db_spark.streaming`` — Structured Streaming ingest, the
  reference's POST /embed path (api/app.py:119-160) as micro-batches.
"""

__version__ = "0.1.0"
