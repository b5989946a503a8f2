"""Top-k selection.

Reference: sort-and-slice at ivf.py:191-195 / hnsw.py:365-369 and the O(n)
``argpartition`` helper (util/math.py:3-5). Spark equivalents:

- global top-k: ``ORDER BY ... LIMIT k`` plans as ``TakeOrderedAndProject``
  (already O(n) with per-partition partial top-k — the argpartition trick is
  built into the physical operator).
- per-group top-k (one k-NN result list per query): window ``row_number``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the k best rows per group, with a 1-based ``rank`` column.

    ``order_by`` must be a deterministic total order (include a unique
    tiebreaker column) — otherwise results are non-reproducible across runs
    and against an oracle.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_k_global(df: DataFrame, order_by: Sequence[str | Column], k: int) -> DataFrame:
    """Global top-k: planner emits TakeOrderedAndProject (no full sort)."""
    return df.orderBy(*order_by).limit(k)
