"""Greedy maximum-coverage subset selection (submodular curation).

"Pick the k documents that together cover the most distinct n-grams" is
the facility-location / max-coverage primitive behind diverse-exemplar
selection for labeling budgets, eval-set construction, and dedup-aware
corpus summarization. Greedy is the canonical algorithm: at each step
take the element with the largest MARGINAL gain; Nemhauser et al. '78
guarantees the result is within (1 − 1/e) of the optimal k-subset, and
for max-coverage no polynomial algorithm can beat that bound.

Spark shape: the (id, element) incidence table is computed once and
cached; each of the k rounds is one semi-join (elements already covered
by picks), one anti-join + keyed count (marginal gain per candidate),
and one TakeOrdered(1) — the driver holds exactly k picked rows.
Deterministic: ties break on (gain desc, id asc), so the DuckDB oracle
reproduces the pick sequence exactly via k chained CTE stages.

At 100 TB the exact greedy's k full passes become the bottleneck; the
production variant implemented here is **stochastic-greedy**
(Mirzasoleiman et al. AAAI'15, "Lazier Than Lazy Greedy"): each round
evaluates marginal gains over a ⌈n/k·ln(1/ε)⌉-element candidate sample
instead of the full corpus, for a 1 − 1/e − ε expected-coverage
guarantee at a factor-k smaller per-round join. Sampling is
deterministic (order by md5(id|salt|round)), so the pick sequence is a
pure function of the data that a SQL oracle replays exactly. The exact
form is the correctness baseline the stochastic variant is measured
against (tests/test_curation.py pins the coverage ratio on a planted
family and exact decision agreement with a single-node replay).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FP = 1_000_000_000


def stochastic_sample_size(n: int, k: int, eps: float) -> int:
    """⌈n·ln(1/ε)/k⌉ in exact fixed-point integer arithmetic (ln(1/ε)
    scaled by 1e9), so Spark and the SQL oracle compute the identical
    sample size with no float-boundary divergence."""
    c_fp = int(round(math.log(1.0 / eps) * _FP))
    return -(-(n * c_fp) // (k * _FP))


def greedy_max_coverage(
    incidence: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    elem_col: str = "g",
) -> list[tuple[int, int, int]]:
    """Greedy max-coverage over a distinct ``(id, element)`` incidence
    table. Returns ``[(rank, id, marginal_new_coverage), ...]`` —
    exactly k rows on the driver (or fewer if coverage is exhausted:
    a zero-gain pick is never made)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    inc = incidence.select(id_col, elem_col).distinct().cache()
    inc.count()  # materialize once; every round reuses it
    picks: list[tuple[int, int, int]] = []
    try:
        for rank in range(1, k + 1):
            picked_ids = [p[1] for p in picks]
            cand = inc.filter(~F.col(id_col).isin(picked_ids)) if picked_ids else inc
            if picked_ids:
                covered = (
                    inc.filter(F.col(id_col).isin(picked_ids))
                    .select(elem_col)
                    .distinct()
                )
                cand = cand.join(covered, elem_col, "left_anti")
            top = (
                cand.groupBy(id_col)
                .agg(F.count("*").alias("new_cov"))
                .orderBy(F.col("new_cov").desc(), F.col(id_col).asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            picks.append((rank, top[0][0], top[0][1]))
    finally:
        inc.unpersist()
    return picks


def stochastic_greedy_max_coverage(
    incidence: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    elem_col: str = "g",
    eps: float = 0.1,
    salt: str = "sg-v1",
) -> list[tuple[int, int, int]]:
    """Stochastic-greedy max-coverage (Mirzasoleiman et al. AAAI'15):
    round r evaluates marginal gains over only the
    ``s = ⌈n·ln(1/ε)/k⌉`` unpicked ids with the smallest
    ``md5(id|salt|r)`` — a deterministic stand-in for the uniform
    sample, fresh per round — and picks the sample's argmax
    (gain desc, id asc). Expected coverage ≥ (1 − 1/e − ε)·OPT while
    each round's gain aggregation runs over the SAMPLE's incidence
    rows, not the corpus's: at 100 TB this is the difference between
    k full passes and k passes over ln(1/ε)/k of the data — total work
    ~n·ln(1/ε) rows instead of k·n.

    A round whose sampled candidates are all fully covered makes no
    pick (the round is consumed; the next round resamples), so the
    result can have fewer than k rows and rank gaps — semantics the
    SQL oracle replays exactly.

    Returns ``[(rank, id, marginal_new_coverage), ...]`` on the driver.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0.0 < eps < 1.0:
        raise ValueError("eps must be in (0, 1)")
    inc = incidence.select(id_col, elem_col).distinct().cache()
    inc.count()  # materialize once; every round reuses it
    ids = inc.select(id_col).distinct()
    s = stochastic_sample_size(ids.count(), k, eps)
    picks: list[tuple[int, int, int]] = []
    try:
        for rnd in range(1, k + 1):
            picked_ids = [p[1] for p in picks]
            cand_ids = ids.filter(~F.col(id_col).isin(picked_ids)) if picked_ids else ids
            # TakeOrderedAndProject over bare ids (never the incidence):
            # the per-round "random" sample, reproducible cross-engine
            sample = cand_ids.orderBy(
                F.md5(
                    F.concat_ws(
                        "|", F.col(id_col).cast("string"), F.lit(salt), F.lit(rnd)
                    )
                ),
                F.col(id_col),
            ).limit(s)
            cand = inc.join(sample, id_col, "left_semi")
            if picked_ids:
                covered = (
                    inc.filter(F.col(id_col).isin(picked_ids))
                    .select(elem_col)
                    .distinct()
                )
                cand = cand.join(covered, elem_col, "left_anti")
            top = (
                cand.groupBy(id_col)
                .agg(F.count("*").alias("new_cov"))
                .orderBy(F.col("new_cov").desc(), F.col(id_col).asc())
                .limit(1)
                .collect()
            )
            if not top:
                continue  # sample exhausted; next round draws fresh ids
            picks.append((rnd, top[0][0], top[0][1]))
    finally:
        inc.unpersist()
    return picks
