

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


def test_prefix_filter_float_boundary_pairs_not_missed(spark):
    """θ whose double repr creeps past exact products (0.55·20 =
    11.000000000000002) must not shorten the prefix or trip the size
    pre-cut: |A|=11 ⊂ |B|=20 has J = 11/20 = 0.55 exactly and MUST
    surface. Planted so A's sole shared prefix token sits at the boundary
    position the old float ceil cut off."""
    from vector_db_spark.operators.dedup import prefix_filter_jaccard_pairs

    a_items = [f"s{i:02d}" for i in range(11)]
    b_items = a_items + [f"only_b{i}" for i in range(9)]
    rows = [(1, s) for s in a_items] + [(2, s) for s in b_items]
    # pad the df landscape so rare-first ordering is deterministic
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(sh, threshold=0.55).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)] == 0.55


def test_containment_float_boundary_pair_not_missed(spark):
    """Same boundary for the one-sided filter: |A|=20 with exactly 11
    items inside B at θ=0.55 (containment = 0.55 exactly) must surface in
    the A→B direction."""
    from vector_db_spark.operators.dedup import containment_pairs

    shared = [f"sh{i:02d}" for i in range(11)]
    a_only = [f"ao{i}" for i in range(9)]
    b_only = [f"bo{i}" for i in range(5)]
    rows = [(1, s) for s in shared + a_only] + [(2, s) for s in shared + b_only]
    items = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(items, threshold=0.55).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)] == 0.55


def test_band_keys_rejects_degenerate_band_count(spark):
    """n_bands that does not divide the signature width (or exceeds it)
    must raise in-execution, not silently band the same first cell."""
    import pytest
    from pyspark.sql import functions as F

    from vector_db_spark.operators.dedup import band_keys

    wide = spark.createDataFrame(
        [(1, [f"h{i}" for i in range(8)])], "doc_id long, sig array<string>"
    )
    with pytest.raises(Exception, match="must divide the signature width"):
        band_keys(wide, n_bands=16).collect()
    with pytest.raises(Exception, match="must divide the signature width"):
        band_keys(wide, n_bands=3).collect()
    assert band_keys(wide, n_bands=4).count() == 4


def test_dedup_retain_best_rejects_string_ids(spark):
    import pytest

    from vector_db_spark.operators.dedup import dedup_retain_best

    df = spark.createDataFrame(
        [("url-a", "some text here"), ("url-b", "some text here")],
        "doc_id string, text string",
    )
    with pytest.raises(ValueError, match="integral column"):
        dedup_retain_best(df)


def test_prefix_filter_large_set_no_int32_overflow(spark):
    """r6 ADVICE (high): t_lo(θ)·|S| was int32×int32 — a doc with more than
    ~2^31/t_lo distinct items (>2684 at θ=0.8) raised ARITHMETIC_OVERFLOW
    under Spark 4's ANSI default (and wrapped __plen negative on non-ANSI,
    crashing F.slice / breaking the zero-miss guarantee). 3000-item twin
    docs must simply pair at J=1.0."""
    from vector_db_spark.operators.dedup import (
        containment_pairs,
        prefix_filter_jaccard_pairs,
    )

    items = [f"tok{i:05d}" for i in range(3000)]
    rows = [(1, s) for s in items] + [(2, s) for s in items]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(sh, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(sh, threshold=0.8).collect()
    }
    assert cont == {(1, 2): 1.0, (2, 1): 1.0}


def test_embedding_decontaminate_flags_planted_leak(spark, sf_smoke):
    """A corpus vector that IS a benchmark vector (cosine 1.0) must be
    flagged; an orthogonal one must not; every corpus row reports exactly
    one max_benchmark_sim."""
    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import embedding_decontaminate

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    bench = emb.filter(F.col("vec_id") < 5)
    # corpus: 20 clean rows + one exact copy of benchmark vector 0
    leak = bench.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 777_000).alias("vec_id"), "embedding"
    )
    corpus = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 25)).unionByName(
        leak
    )
    out = {r.vec_id: r for r in embedding_decontaminate(
        corpus, bench, threshold=0.99
    ).collect()}
    assert len(out) == 21
    assert out[777_000].contaminated and out[777_000].max_benchmark_sim == 1.0
    assert all(
        not r.contaminated for vid, r in out.items() if vid != 777_000
    )


def test_embedding_decontaminate_blocked_catches_exact_leak(spark, sf_smoke):
    """Blocked decontamination: an exact benchmark copy (cos 1.0 shares
    every bucket) MUST collide and flag; blocked similarities are a subset
    of the exact form's (blocking never invents candidates)."""
    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import (
        embedding_decontaminate,
        embedding_decontaminate_blocked,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    bench = emb.filter(F.col("vec_id") < 5)
    leak = bench.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 777_000).alias("vec_id"), "embedding"
    )
    corpus = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 25)).unionByName(
        leak
    )
    exact = {r.vec_id: r.max_benchmark_sim for r in embedding_decontaminate(
        corpus, bench, threshold=0.99
    ).collect()}
    blocked = {r.vec_id: r for r in embedding_decontaminate_blocked(
        corpus, bench, threshold=0.99, corpus_count=21
    ).collect()}
    assert blocked[777_000].contaminated
    assert blocked[777_000].max_benchmark_sim == 1.0
    # subset law: every blocked similarity equals the exact max only when
    # the max candidate collided; it can never EXCEED the exact max
    for vid, r in blocked.items():
        assert r.max_benchmark_sim <= exact[vid]


def test_embedding_decontaminate_empty_benchmark_keeps_contract(spark, sf_smoke):
    """An EMPTY benchmark (upstream filter matched nothing) must still
    yield one row per corpus vector — max sim NULL, contaminated false —
    so a keep-clean pipeline keeps the corpus instead of dropping it."""
    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import embedding_decontaminate

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    out = embedding_decontaminate(emb.limit(20), emb.filter(F.lit(False))).collect()
    assert len(out) == 20
    assert all(not r.contaminated and r.max_benchmark_sim is None for r in out)


def test_embedding_decontaminate_pair_budget_guard(spark, sf_smoke):
    """pair_budget prices corpus x |benchmark| BEFORE scoring: over budget
    raises naming the bill and the blocked alternative; within budget the
    call proceeds normally."""
    import pytest
    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import embedding_decontaminate

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    corpus, bench = emb.limit(30), emb.limit(10)
    with pytest.raises(ValueError, match="pair_budget|blocked"):
        embedding_decontaminate(corpus, bench, pair_budget=100)
    assert embedding_decontaminate(corpus, bench, pair_budget=1000).count() == 30


def test_registered_decontaminate_row_carries_budget(spark, sf_smoke, monkeypatch):
    """The DRIVER-CHECKED exact decontamination row runs the preflight
    itself (VERDICT r7 item 2 closure — the triangles template): the
    audit facts ride every row, and shrinking the module budget below
    the fixture's bill makes the registered query RAISE, proving the
    guard is in the artifact, not just the operator."""
    import pytest

    from vector_db_spark.queries import all_queries
    from vector_db_spark.queries import curation as cur

    q = all_queries()["embedding_decontaminate"]
    rows = q(spark, sf_smoke).collect()
    assert rows and all(r.within_budget for r in rows)
    bill = rows[0].pair_bill
    assert bill > 0 and all(r.pair_bill == bill for r in rows)
    monkeypatch.setattr(cur, "_EDECON_PAIR_BUDGET", bill - 1)
    with pytest.raises(ValueError, match="pair_budget|blocked"):
        q(spark, sf_smoke)


def test_embedding_decontaminate_multi_attributes_and_contracts(spark, sf_smoke):
    """Per-suite attribution from one pass: a corpus copy of a suite-A
    vector flags against A (cos 1.0) but not B; every corpus id reports
    one row per suite, INCLUDING an empty suite (all-clean rows, the
    keep-the-corpus contract); the pair budget prices corpus x SUM of
    suites and raises naming the bill."""
    import pytest
    from pyspark.sql import functions as F

    from vector_db_spark.io import load_table
    from vector_db_spark.operators.dedup import embedding_decontaminate_multi

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    suite_a = emb.filter(F.col("vec_id") < 5)
    suite_b = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 8))
    leak = suite_a.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 777_000).alias("vec_id"), "embedding"
    )
    corpus = emb.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 20)
    ).unionByName(leak)
    suites = {
        "a": suite_a,
        "b": suite_b,
        "empty": suite_a.filter(F.lit(False)),
    }
    rows = embedding_decontaminate_multi(
        corpus, suites, threshold=0.99
    ).collect()
    got = {(r.vec_id, r.suite): r for r in rows}
    assert len(rows) == 13 * 3  # every corpus id x every suite, once
    assert got[(777_000, "a")].contaminated
    assert got[(777_000, "a")].max_benchmark_sim == 1.0
    assert not got[(777_000, "b")].contaminated
    e = got[(777_000, "empty")]
    assert e.max_benchmark_sim is None and not e.contaminated
    assert not any(
        r.contaminated for (vid, _), r in got.items() if vid != 777_000
    )

    with pytest.raises(ValueError, match="cosine evaluations"):
        embedding_decontaminate_multi(
            corpus, {"a": suite_a, "b": suite_b}, pair_budget=10
        )
