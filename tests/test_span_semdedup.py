"""Planted-case tests: cross-doc repeated spans and SemDeDup pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_spark.operators.dedup import (
    ngram_position_table,
    repeated_ngram_spans,
    semantic_dedup,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_planted_shared_span_detected(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = one n-gram
    docs = _docs(
        spark,
        [
            f"unique one two three {shared} tail tokens here now",
            f"other prefix words go {shared} and a different ending",
            "completely unrelated text with no overlap at all whatsoever",
        ],
    )
    out = {r.doc_id: r for r in repeated_ngram_spans(docs, n=8, min_docs=2).collect()}
    assert out[0].n_spans == 1 and out[1].n_spans == 1
    assert out[0].n_rep_starts == 1  # exactly the shared 8-gram start
    assert out[2].n_spans == 0 and out[2].rep_token_frac == 0.0
    # one 8-gram span covers 8 tokens
    assert out[0].rep_token_frac == round(8 / out[0].n_tokens, 6)


def test_overlapping_starts_merge_into_one_span(spark):
    # two identical docs: every position is a repeated start, one span
    text = " ".join(f"w{i}" for i in range(20))
    docs = _docs(spark, [text, text])
    out = {r.doc_id: r for r in repeated_ngram_spans(docs, n=8, min_docs=2).collect()}
    for r in out.values():
        assert r.n_rep_starts == 13  # 20-8+1 starts
        assert r.n_spans == 1
        assert r.rep_token_frac == 1.0


def test_within_doc_repeat_alone_is_not_flagged(spark):
    # the same 8-gram twice in ONE doc only: min_docs=2 counts distinct docs
    block = "a b c d e f g h"
    docs = _docs(spark, [f"{block} x y z {block}", "totally different words here now ok fine"])
    out = {r.doc_id: r for r in repeated_ngram_spans(docs, n=8, min_docs=2).collect()}
    assert out[0].n_spans == 0


def test_short_doc_yields_no_grams(spark):
    docs = _docs(spark, ["one two three", "one two three"])
    assert ngram_position_table(docs, n=8).count() == 0
    out = repeated_ngram_spans(docs, n=8).collect()
    assert all(r.n_spans == 0 for r in out)


def test_blank_doc_reports_zero_repetition(spark):
    """Blank/whitespace-only text has n_tokens == 0: rep_token_frac must be
    0.0 — not NULL-skipped-to-1.0 (non-ANSI) or DIVIDE_BY_ZERO (ANSI), the
    r6 ADVICE divide-by-zero edge — matching the DuckDB oracle's CASE."""
    docs = _docs(spark, ["", "   ", "real words repeated here real words repeated here ok"])
    out = {r.doc_id: r for r in repeated_ngram_spans(docs, n=8, min_docs=2).collect()}
    for blank_id in (0, 1):
        assert out[blank_id].n_tokens == 0
        assert out[blank_id].rep_token_frac == 0.0
        assert out[blank_id].n_spans == 0


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cluster_id int"
    )


def test_semdedup_prunes_clone_keeps_first(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    clone = [0.999, 0.001, 0.0, 0.0]
    ortho = [0.0, 1.0, 0.0, 0.0]
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _vecs(spark, [(1, v, 0), (2, clone, 0), (3, ortho, 0)]), threshold=0.95
        ).collect()
    }
    assert out[1].pruned is False  # lowest id survives
    assert out[2].pruned is True and out[2].max_sim_lower >= 0.99
    assert out[3].pruned is False


def test_semdedup_cluster_blocking_prevents_cross_cluster_prune(spark):
    v = [1.0, 0.0]
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _vecs(spark, [(1, v, 0), (2, v, 1)]), threshold=0.9
        ).collect()
    }
    # identical vectors but different clusters: both survive (the SemDeDup
    # contract — recall is bounded by clustering quality)
    assert out[1].pruned is False and out[2].pruned is False
    assert out[2].max_sim_lower == -1.0


def test_hard_negatives_excludes_own_label_and_fills_k(spark):
    import numpy as np

    from vector_db_spark.operators.knn import hard_negatives

    rng = np.random.default_rng(4)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)], i % 3) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    out = hard_negatives(queries, emb, 5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 5
        assert all(r.neighbor_label != q % 3 for r in rs)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="metric"):
        hard_negatives(queries, emb, 5, metric="nope")
