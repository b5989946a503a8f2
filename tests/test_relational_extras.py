"""Tests for the approximate-aggregate surface and the remote-embed client
shape (E3) with an injected transport."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vector_db_spark.functions.embedding import remote_embed
from vector_db_spark.io import load_table
from vector_db_spark.queries import QUERIES


def test_approx_aggregates_near_exact(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    exact_parts = li.select("l_partkey").distinct().count()
    exact_orders = li.select("l_orderkey").distinct().count()
    row = QUERIES["approx_stats"](spark, sf_smoke).collect()[0]
    # HLL++ default rsd is 5%; allow 3 sigma
    assert abs(row.approx_parts - exact_parts) / exact_parts < 0.15
    assert abs(row.approx_orders - exact_orders) / exact_orders < 0.15
    exact_median = li.approxQuantile("l_extendedprice", [0.5], 0.0)[0]
    assert abs(row.approx_median_price - exact_median) / exact_median < 0.05
    q25, q75 = row.qty_quartiles
    assert q25 <= q75


def test_remote_embed_with_injected_transport(spark):
    """The client batches requests per partition and attaches vectors; the
    fake transport records call shapes (no network in this environment)."""
    calls = []

    def fake_transport(url, texts):
        calls.append((url, len(texts)))
        return [[float(len(t)), 0.0] for t in texts]

    df = spark.createDataFrame(
        [(i, "x" * (i + 1)) for i in range(10)], "doc_id long, text string"
    ).coalesce(1)
    out = remote_embed(
        df, "text", endpoint="http://embed.svc/embed/batch",
        dim=2, batch_size=4, transport=fake_transport,
    ).collect()
    got = {r.doc_id: r.embedding for r in out}
    assert got[4] == [5.0, 0.0]  # length-derived fake vector
    assert len(got) == 10
