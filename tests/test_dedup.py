

def test_prefix_filter_jaccard_is_exact_vs_brute_force(spark, sf_smoke):
    """Prefix filtering must be COMPLETE (no pair above threshold
    missed) and exact (same scores as the all-pairs computation)."""
    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
        shingle_table,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(120)
    sh = shingle_table(docs)
    fast = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(sh, threshold=0.3).collect()
    }
    sets = {}
    for r in sh.collect():
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    ids = sorted(sets)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter) if inter else 0.0
            if j >= 0.3:
                brute[(a, b)] = round(j, 6)
    assert fast == brute and len(brute) > 0


def test_prefix_filter_prefix_is_actually_short(spark, sf_smoke):
    """The candidate join must run on prefixes, not whole sets: at
    θ=0.8 the prefix is ~20% of each set, so the exploded prefix table
    must be well under half the full set table."""
    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import shingle_table

    docs = load_table(spark, sf_smoke, "documents").limit(200)
    sh = shingle_table(docs)
    n_full = sh.count()
    from pyspark.sql import functions as F

    ranked = (
        sh.join(sh.groupBy("shingle").agg(F.count("*").alias("__df")), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
    )
    expected_prefix = ranked.select(
        F.sum(F.col("sz") - F.ceil(0.8 * F.col("sz")).cast("int") + 1)
    ).collect()[0][0]
    assert expected_prefix < 0.5 * n_full


def test_containment_pairs_exact_vs_brute_force(spark, sf_smoke):
    """One-sided prefix filtering must be COMPLETE for the directional
    containment |A∩B|/|A| ≥ θ — every qualifying ordered pair found,
    scores exact."""
    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import containment_pairs, shingle_table

    docs = load_table(spark, sf_smoke, "documents").limit(120)
    sh = shingle_table(docs)
    fast = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(sh, threshold=0.6).collect()
    }
    sets = {}
    for r in sh.collect():
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    brute = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if round(c, 6) >= 0.6:
                brute[(a, b)] = round(c, 6)
    assert fast == brute and len(brute) > 0


def test_containment_is_directional(spark):
    """A tiny doc fully inside a big one: containment(a→b)=1 but b→a is
    far below threshold — exactly the asymmetry Jaccard hides."""
    from vector_db_spark.operators.dedup import containment_pairs

    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"tok{i} tok{i+1} filler{i}" for i in range(12))
    docs = spark.createDataFrame([(1, small), (2, big)], ["doc_id", "text"])
    from vector_db_spark.operators.dedup import shingle_table

    out = {(r.doc_a, r.doc_b): r.containment
           for r in containment_pairs(shingle_table(docs), threshold=0.9).collect()}
    assert out == {(1, 2): 1.0}
