"""q-gram-blocked fuzzy self-join (operators/fuzzyjoin.py) vs brute-force
levenshtein: exactness on adversarial corpora (repeated-gram words, short
strings, the zero-shared-gram trap), k=1 and k=2, and the plan shape."""

from __future__ import annotations

import itertools

from vector_db_spark.operators.fuzzyjoin import fuzzy_self_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(vals, k):
    return {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(sorted(set(vals)), 2)
        if _lev(a, b) <= k
    }


WORDS = [
    "ab", "cb", "acb",            # the zero-shared-gram short trap
    "aaa", "aaaa", "aab",         # repeated-gram strings
    "kitten", "sitten", "mitten", "sitting",
    "spark", "sparc", "shark", "stark",
    "src0", "src1", "src10", "src19", "src2",
    "x", "y", "xy",               # single chars (no grams at q=2)
    "deduplication", "dedupliction", "deduplicatoin",
]


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "s string")


def test_exact_vs_brute_k1(spark):
    got = {
        (r["a"], r["b"], r["dist"])
        for r in fuzzy_self_join(_df(spark, WORDS), "s", max_dist=1).collect()
    }
    assert got == _brute(WORDS, 1)
    assert ("ab", "acb", 1) in got  # the gram filter alone would miss this


def test_exact_vs_brute_k2(spark):
    got = {
        (r["a"], r["b"], r["dist"])
        for r in fuzzy_self_join(_df(spark, WORDS), "s", max_dist=2).collect()
    }
    assert got == _brute(WORDS, 2)


def test_duplicates_and_empties_ignored(spark):
    vals = ["spark", "spark", "", "sparc", ""]
    got = {
        (r["a"], r["b"])
        for r in fuzzy_self_join(_df(spark, vals), "s", max_dist=1).collect()
    }
    assert got == {("sparc", "spark")}


def test_no_cartesian_in_gram_path(spark):
    from tests.test_plans import plan_of

    # the gram-join branch must be an equi-join (the bounded short pool is
    # allowed its broadcast nested loop — its side is small by definition)
    big_words = [f"word{i:03d}" for i in range(50)]
    plan = plan_of(fuzzy_self_join(_df(spark, big_words), "s", max_dist=1))
    assert "CartesianProduct" not in plan
