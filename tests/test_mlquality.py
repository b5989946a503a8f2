"""ML-backed doc classifier (operators/mlquality.py): genuine learning on
a planted bilingual corpus, hash-split determinism, and feature hygiene."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from vector_db_spark.functions.text import LANG_STOPWORDS
from vector_db_spark.operators.mlquality import (
    doc_feature_frame,
    hash_split,
    train_doc_classifier,
)


def _bilingual_docs(spark, n=240, seed=11):
    """Texts whose language IS text-derived: English docs draw heavily
    from the en stopword list, 'German' docs from the de list, both mixed
    with shared filler — separable on the f_sw_* rate features."""
    rng = random.Random(seed)
    filler = ["data", "table", "row", "value", "query", "fast", "slow"]
    rows = []
    for i in range(n):
        en = i % 2 == 0
        sw = LANG_STOPWORDS["en" if en else "de"]
        words = [
            rng.choice(sw) if rng.random() < 0.4 else rng.choice(filler)
            for _ in range(rng.randint(20, 60))
        ]
        rows.append((i, " ".join(words), "en" if en else "de"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_learns_planted_language(spark):
    docs = _bilingual_docs(spark)
    a = train_doc_classifier(docs, F.col("lang") == "en")
    assert a.n_train + a.n_test == 240
    assert a.test_acc >= 0.95, a
    assert a.test_auc >= 0.98, a


def test_hash_split_deterministic_and_sized(spark):
    docs = _bilingual_docs(spark, n=200)
    s1 = {r["doc_id"]: r["is_test"] for r in hash_split(docs).collect()}
    s2 = {
        r["doc_id"]: r["is_test"]
        for r in hash_split(docs.repartition(7)).collect()
    }
    assert s1 == s2
    frac = sum(s1.values()) / len(s1)
    assert 0.1 < frac < 0.3  # ~0.2 with binomial noise


def test_feature_frame_is_shuffle_free(spark):
    from tests.test_plans import plan_of

    docs = _bilingual_docs(spark, n=20)
    plan = plan_of(doc_feature_frame(docs, F.col("lang") == "en"))
    assert "Exchange" not in plan


def test_features_exclude_raw_length(spark):
    docs = _bilingual_docs(spark, n=10)
    cols = doc_feature_frame(docs, F.lit(True)).columns
    assert "n_chars" not in cols and "f_n_chars" not in cols


# --- isotonic calibration ----------------------------------------------------


def test_calibrate_matches_hand_pav(spark):
    """PAV on a known violation: scores [.1,.2,.3,.4] with labels
    [0,1,0,1] — the .2/.3 pair violates monotonicity and pools to 0.5."""
    from vector_db_spark.operators.mlquality import calibrate_scores

    df = spark.createDataFrame(
        [(0.1, 0.0), (0.2, 1.0), (0.3, 0.0), (0.4, 1.0)],
        "raw double, label double",
    )
    out, audit = calibrate_scores(df, score_col="raw")
    got = {r.raw: r.calibrated_prob for r in out.collect()}
    assert got[0.1] == pytest.approx(0.0)
    assert got[0.2] == pytest.approx(0.5)
    assert got[0.3] == pytest.approx(0.5)
    assert got[0.4] == pytest.approx(1.0)
    assert audit.is_monotone and audit.calibrated_brier <= audit.raw_brier + 1e-9


def test_calibrate_improves_miscalibrated_scores(spark):
    """Systematically over-confident scores: raw = 0.9 for a class that is
    only 50% positive. Calibration must pull probabilities toward the
    empirical rate and beat the raw Brier score clearly."""
    from vector_db_spark.operators.mlquality import calibrate_scores

    rows = [(0.9 + (i % 10) * 1e-3, float(i % 2)) for i in range(200)]
    rows += [(0.05 + (i % 10) * 1e-3, 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "raw double, label double")
    out, audit = calibrate_scores(df, score_col="raw")
    assert audit.is_monotone
    assert audit.calibrated_brier < audit.raw_brier * 0.8
    hi = out.filter(F.col("raw") >= 0.9).agg(F.avg("calibrated_prob")).collect()[0][0]
    assert abs(hi - 0.5) < 0.05  # pulled to the empirical positive rate
