"""SQ8 scalar quantization: encode invariants, quantization-error bound
vs exact k-NN, and the constant-dimension edge case."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_spark.io import load_table
from vector_db_spark.operators.knn import knn_join
from vector_db_spark.operators.squant import sq_encode, sq_search, sq_train


def test_codes_in_range_and_compact(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    model = sq_train(emb)
    codes = sq_encode(emb, model)
    assert dict(codes.dtypes)["codes"] == "array<smallint>"
    stats = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("d"),
    ).first()
    assert stats.lo >= 0 and stats.hi <= 255
    assert stats.d == model.dim
    # per-dim extremes must hit the code range ends (ranges are trained
    # from this very corpus)
    assert stats.lo == 0 and stats.hi == 255


def test_sq8_recall_vs_exact(spark, sf_smoke):
    """64-dim SQ8 on the fixture corpus: top-10 overlap with exact k-NN
    must stay high — quantization error is ~span/512 per dim."""
    emb = load_table(spark, sf_smoke, "embeddings")
    model = sq_train(emb)
    codes = sq_encode(emb, model)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = sq_search(codes, queries, model, 10)
    exact = knn_join(queries, emb, 10, impl="sql")
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.9


def test_constant_dimension_roundtrip(spark):
    rows = [(i, [float(i), 7.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = sq_train(df)
    assert model.mins[1] == model.maxs[1] == 7.0
    codes = sq_encode(df, model)
    decoded = codes.select(
        "vec_id", model.decode_expr("codes").alias("dec")
    ).orderBy("vec_id").collect()
    # constant dim decodes back exactly; varying dim within 1/510 of span
    assert all(r.dec[1] == 7.0 for r in decoded)
    span = 3.0
    assert all(abs(r.dec[0] - float(r.vec_id)) <= span / 510 + 1e-12 for r in decoded)
