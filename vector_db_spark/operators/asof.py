"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the right row with the greatest
``right_time <= left_time`` per key ("most recent state as of then") — the
backbone of feature-store lookups and point-in-time-correct training data.

Implementation is the scalable union trick, NOT a per-key pandas merge:
tag both sides, union, sort within key by (time, side-tag), and carry the
right-side values forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window. One shuffle on the key, no per-group
collection, no Python. Window sort order ends with the right side's
``tiebreak_cols`` so equal-timestamp right rows resolve deterministically
(the max tiebreak wins) — required for engine-exact reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Left rows + ``asof_time`` (matched right_time) + ``value_cols``
    from the matched right row; nulls when no right row precedes."""
    tiebreak_cols = tiebreak_cols or []
    lcols = [c for c in left.columns if c not in (on, left_time)]
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}") for c in tiebreak_cols],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak_cols],
    )
    order = [F.col("__t").asc(), F.col("__side").asc()] + [
        F.col(f"__tb_{c}").asc_nulls_first() for c in tiebreak_cols
    ]
    w = Window.partitionBy("__k").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = l.unionByName(r).select(
        "*",
        F.last("__rt", ignorenulls=True).over(w).alias("asof_time"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        F.col("__k").alias(on),
        F.col("__t").alias(left_time),
        *lcols,
        "asof_time",
        *[F.col(f"asof_{c}") for c in value_cols],
    )
