"""Probabilistic record linkage (Fellegi-Sunter) — blocked candidate
generation + log-likelihood agreement scoring.

Entity resolution across two record tables without a shared key is the
structured-data twin of document near-dup: the reference engine's users
do it today by embedding records and thresholding cosine; the classical,
auditable method is Fellegi-Sunter (JASA '69): per-field agreement
weights ``log2(m/u)`` (m = P(agree | match), u = P(agree | non-match))
summed over the comparison vector, thresholded.

Spark shape — never a cross join:

1. **Multi-pass blocking**: candidates are the UNION of equi-joins on
   each blocking key (name-prefix pass catches phone typos, phone-prefix
   pass catches name typos — standard complementary blocking), deduped
   on the id pair. Candidate volume is Σ_k Σ_v block_k(v)², the quantity
   `profiling.key_skew_report` pre-flights; a hot block is salted or
   dropped, never widened to the full cross product.
2. **Scoring**: one codegen CASE per field — exact equality or a native
   ``levenshtein(a, b) <= d`` bound (Spark and DuckDB agree on
   levenshtein) — summing caller-supplied weight literals rounded to
   6 dp. No UDF anywhere.

Weights are INPUTS here (from labeled pairs or EM in a real deployment);
deterministic literals keep the operator engine-exact and oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agreement_score(
    exact_fields: dict[str, tuple[float, float]],
    fuzzy_fields: dict[str, tuple[float, float, int]],
) -> Column:
    """Σ per-field weights: w_agree on agreement else w_disagree; fuzzy
    fields agree within a levenshtein bound."""
    total = F.lit(0.0)
    for f, (wa, wd) in sorted(exact_fields.items()):
        agree = F.col(f"__a_{f}") == F.col(f"__b_{f}")
        total = total + F.when(agree, F.lit(wa)).otherwise(F.lit(wd))
    for f, (wa, wd, dist) in sorted(fuzzy_fields.items()):
        agree = F.levenshtein(F.col(f"__a_{f}"), F.col(f"__b_{f}")) <= dist
        total = total + F.when(agree, F.lit(wa)).otherwise(F.lit(wd))
    return F.round(total, 6)


def record_linkage(
    a: DataFrame,
    b: DataFrame,
    *,
    id_col: str,
    block_keys: list[Column | str] | None = None,
    block_exprs: list[tuple[Column, Column]] | None = None,
    exact_fields: dict[str, tuple[float, float]] | None = None,
    fuzzy_fields: dict[str, tuple[float, float, int]] | None = None,
    threshold: float,
) -> DataFrame:
    """Link records of ``a`` to records of ``b``: blocked candidates →
    Fellegi-Sunter agreement score → ``(id_a, id_b, score, is_match)``.

    ``block_exprs`` is a list of ``(expr_on_a, expr_on_b)`` blocking-key
    pairs; a candidate pair must share AT LEAST ONE key (union of the
    per-key equi-joins, deduplicated on the id pair — multi-pass
    blocking). ``exact_fields`` maps a column to ``(w_agree,
    w_disagree)``; ``fuzzy_fields`` to ``(w_agree, w_disagree,
    max_levenshtein)``. Weights are log2(m/u)-style literals; ``score ≥
    threshold`` sets ``is_match``.

    Every emitted pair carries its score (match AND near-miss rows are
    returned for clerical-review band analysis); filter on ``is_match``
    for the decision view."""
    exact_fields = exact_fields or {}
    fuzzy_fields = fuzzy_fields or {}
    if block_keys is not None and block_exprs is not None:
        raise ValueError(
            "pass block_keys OR block_exprs, not both — silently preferring "
            "one would drop the other's blocking passes (false non-matches)"
        )
    if block_keys is not None:
        block_exprs = [
            (F.col(k) if isinstance(k, str) else k,) * 2 for k in block_keys
        ]
    if not block_exprs:
        raise ValueError("at least one blocking key required (never a cross join)")

    fields = sorted(set(exact_fields) | set(fuzzy_fields))

    # bare ids ride the blocking joins (the prefix-filter idiom: never
    # shuffle payload columns through candidate generation); fields
    # attach once, after the pair dedup
    cand = None
    for ea, eb in block_exprs:
        left = a.select(F.col(id_col).alias("id_a"), ea.cast("string").alias("__bk"))
        right = b.select(F.col(id_col).alias("id_b"), eb.cast("string").alias("__bk"))
        pairs = left.join(right, "__bk").select("id_a", "id_b")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()

    aa = a.select(
        F.col(id_col).alias("id_a"), *[F.col(f).alias(f"__a_{f}") for f in fields]
    )
    bb = b.select(
        F.col(id_col).alias("id_b"), *[F.col(f).alias(f"__b_{f}") for f in fields]
    )
    scored = (
        cand.join(aa, "id_a")
        .join(bb, "id_b")
        .select(
            "id_a",
            "id_b",
            _agreement_score(exact_fields, fuzzy_fields).alias("score"),
        )
    )
    return scored.withColumn("is_match", F.col("score") >= threshold)
