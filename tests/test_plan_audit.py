"""Tests for the plan-audit lint (vector_db_spark.plans) and the
selectivity-adaptive filtered k-NN strategy pick."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_db_spark.io import load_table
from vector_db_spark.plans import assert_scales, audit_plan


def codes(findings):
    return {f.code for f in findings}


def test_audit_flags_cartesian_product(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = emb.crossJoin(emb.withColumnRenamed("vec_id", "b"))
        fs = audit_plan(df)
        assert "cartesian-product" in codes(fs)
        with pytest.raises(AssertionError, match="cartesian-product"):
            assert_scales(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_audit_flags_row_python_udf(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    slow = F.udf(lambda s: len(s or ""), "int")  # row-at-a-time on purpose
    df = docs.select(slow("text").alias("n"))
    assert "row-python-udf" in codes(audit_plan(df))
    with pytest.raises(AssertionError, match="row-python-udf"):
        assert_scales(df)


def test_audit_flags_unpartitioned_window_but_not_grouped(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    global_w = ev.withColumn("rn", F.row_number().over(Window.orderBy("ts", "event_id")))
    assert "unpartitioned-window" in codes(audit_plan(global_w))
    per_user = ev.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("ts"))
    )
    assert "unpartitioned-window" not in codes(audit_plan(per_user))


def test_registered_scale_paths_have_no_errors(spark, sf_smoke):
    """The headline scale-path queries audit clean: batch knn (Arrow, not
    row-Python) and radius search (deliberate bounded nested-loop)."""
    from vector_db_spark.queries import all_queries

    Q = all_queries()
    for name in (
        "knn_exact_batch",
        "doc_repetition",
        "near_dup_jaccard",
        # round-3 additions: repeated spans / SemDeDup are corpus-scale
        # cleaning passes — no cartesian, no row-Python allowed
        "repeated_spans",
        "semdedup_prune",
        "chunk_manifest",
    ):
        assert_scales(Q[name](spark, sf_smoke))
    radius = Q["radius_search"](spark, sf_smoke)
    fs = audit_plan(radius)
    assert not [f for f in fs if f.severity == "error"]
    assert "nested-loop-join" in codes(fs)  # present, but warn-grade


def test_adaptive_filtered_knn_picks_the_right_regime(spark, sf_smoke, tmp_path):
    """Selective filter: probe-pruned IVF is a recall trap (survivors live
    outside the probed clusters → empty/short results); the adaptive
    strategy must fall back to exact search over the survivors. Broad
    filter: adaptive must delegate to the probe-pruned IVF path."""
    from vector_db_spark.operators.ivf import IVFIndex
    from vector_db_spark.operators.knn import adaptive_filtered_knn, knn_join

    emb = load_table(spark, sf_smoke, "embeddings")
    idx = IVFIndex.build(spark, emb, 8, str(tmp_path / "ivf"))

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = idx.corpus()
    own = corpus.filter(F.col("vec_id") == 0).select("cluster_id").first()[0]
    # survivors: 30 ids from OTHER clusters only — n_probe=1 probes the
    # query's own cluster, which contains none of them
    allowed = (
        corpus.filter(F.col("cluster_id") != own).select("vec_id").limit(30)
    ).cache()
    assert allowed.count() == 30

    trap = idx.search(q, k=5, n_probe=1, allowed_ids=allowed)
    assert trap.count() < 5  # the recall trap is real

    got = adaptive_filtered_knn(q, idx, 5, allowed_ids=allowed, n_probe=1)
    want = knn_join(q, emb.join(allowed, "vec_id", "left_semi"), 5)
    assert got.count() == 5
    assert [tuple(r) for r in got.orderBy("rank").collect()] == [
        tuple(r) for r in want.orderBy("rank").collect()
    ]

    # broad regime: threshold forces the IVF branch; results match a
    # direct index search with the same filter
    all_ids = corpus.select("vec_id")
    via_adaptive = adaptive_filtered_knn(
        q, idx, 5, allowed_ids=all_ids, n_probe=4, exact_threshold=1
    )
    via_index = idx.search(q, k=5, n_probe=4, allowed_ids=all_ids)
    assert [tuple(r) for r in via_adaptive.orderBy("rank").collect()] == [
        tuple(r) for r in via_index.orderBy("rank").collect()
    ]


# --- registry-wide sweep -------------------------------------------------------

# deliberate exceptions, each argued at the definition site:
#   embedding_near_dup_brute — the O(n²) recall oracle, never a pipeline path
_AUDIT_ALLOW = {
    "embedding_near_dup_brute": ("cartesian-product", "nested-loop-join"),
}


def test_no_scale_errors_in_any_driver_query(spark, sf_smoke):
    """Every driver-tier query's physical plan must be free of
    error-severity scale findings (CartesianProduct, row-at-a-time Python
    UDFs) — the lint, applied to the whole driver contract."""
    from vector_db_spark.plans import audit_plan
    from vector_db_spark.queries import QUERIES

    bad = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_smoke)
        findings = [
            f
            for f in audit_plan(df, allow=_AUDIT_ALLOW.get(name, ()))
            if f.severity == "error"
        ]
        if findings:
            bad[name] = [(f.code, f.detail) for f in findings]
    assert not bad, bad


def test_no_scale_errors_in_extra_tier(spark, sf_smoke):
    """The extra tier under the same lint — with the deliberate,
    documented exceptions allow-listed per query."""
    from vector_db_spark.plans import audit_plan
    from vector_db_spark.queries import EXTRA_QUERIES

    bad = {}
    for name, fn in EXTRA_QUERIES.items():
        df = fn(spark, sf_smoke)
        findings = [
            f
            for f in audit_plan(df, allow=_AUDIT_ALLOW.get(name, ()))
            if f.severity == "error"
        ]
        if findings:
            bad[name] = [(f.code, f.detail) for f in findings]
    assert not bad, bad
