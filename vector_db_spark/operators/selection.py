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
production variants are lazy-greedy (priority-queue bound reuse) and
stochastic-greedy (Mirzasoleiman et al. '15: each round samples
n/k·ln(1/ε) candidates for a 1 − 1/e − ε guarantee) — both keep the
same per-round join shape on a smaller candidate side. The exact form
here is the correctness baseline those variants are measured against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
