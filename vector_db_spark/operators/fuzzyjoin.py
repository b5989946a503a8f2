"""Edit-distance fuzzy self-join — typo/variant detection over a string
column (vocabulary cleanup, entity-name dedup) without the all-pairs
levenshtein scan.

North-star extension (the reference has no string-similarity surface).
Blocking is the q-gram filter (Gravano et al., VLDB'01): one edit
operation destroys at most ``q`` of a string's ``L - q + 1`` positional
q-grams, so ``ed(a, b) <= k`` implies the pair shares at least
``max(|a|, |b|) - q + 1 - k·q`` positional grams. Whenever that bound is
positive — i.e. ``max(|a|, |b|) >= q·(k + 1)`` — the pair must share at
least one gram, so a **gram equi-join is a complete candidate filter**
for all but the shortest strings; those (bounded-length distinct strings
over a finite alphabet — a small pool by nature) are paired directly
within a length window. An exact native ``levenshtein(..., threshold)``
verify runs last: approximation lives only in the pruning, the output is
exactly the true ≤ k pairs — oracle-checkable against brute force.

Scale posture: gram explode is map-side (×(L-q+1) rows); the candidate
join keys on the gram — never a theta-join or corpus×corpus crossJoin;
join volume is Σ_g df(g)² like every signature scheme in this repo (cut
ubiquitous grams with ``max_gram_df`` at an explicit completeness cost —
the same knob as winnowing's df-cut; default keeps the filter exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_spark.io import ensure_parallelism

Q = 2  # bigram signatures


def _grams(col: str, q: int = Q):
    """Distinct q-grams of ``col`` — native substring arithmetic."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({col}) - {q - 1}, 0)), "
            f"i -> substring({col}, i, {q}))"
        )
    )


def fuzzy_self_join(
    df: DataFrame,
    col: str = "word",
    *,
    max_dist: int = 1,
    max_gram_df: int | None = None,
) -> DataFrame:
    """(a, b, dist): all unordered pairs of distinct values of ``col``
    within edit distance ``max_dist`` (``a < b`` lexicographically).
    Exact output; q-gram-blocked plan (see module docstring)."""
    k, q = max_dist, Q
    base = (
        ensure_parallelism(df)
        .select(F.col(col).cast("string").alias("s"))
        .filter(F.length("s") > 0)
        .distinct()
        .localCheckpoint(eager=True)
    )
    # strings below the pigeonhole bound can share zero grams yet be close
    # ("ab"/"cb"): pair the bounded short pool directly
    short_bound = q * (k + 1) - 1
    short = base.filter(F.length("s") <= short_bound)
    short_pairs = (
        short.alias("l")
        .join(
            F.broadcast(short.alias("r")),
            (F.col("l.s") < F.col("r.s"))
            & (F.abs(F.length("l.s") - F.length("r.s")) <= k),
        )
        .select(F.col("l.s").alias("a"), F.col("r.s").alias("b"))
    )
    grams = base.select(
        "s", F.length("s").alias("len"), F.explode(_grams("s", q)).alias("g")
    )
    if max_gram_df is not None:
        df_cut = grams.groupBy("g").agg(F.count("*").alias("df"))
        grams = grams.join(
            F.broadcast(df_cut.filter(F.col("df") <= max_gram_df).select("g")), "g"
        )
    gram_pairs = (
        grams.alias("l")
        .join(
            grams.alias("r"),
            (F.col("l.g") == F.col("r.g"))
            & (F.col("l.s") < F.col("r.s"))
            & (F.abs(F.col("l.len") - F.col("r.len")) <= k),
        )
        .select(F.col("l.s").alias("a"), F.col("r.s").alias("b"))
        .distinct()
    )
    cand = gram_pairs.union(short_pairs).distinct()
    return (
        cand.withColumn("dist", F.levenshtein("a", "b", k))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= k))
        .select("a", "b", "dist")
    )
