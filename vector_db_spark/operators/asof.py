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


def as_of_join_directional(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """pandas.merge_asof-parity as-of join: ``direction`` in
    {"backward", "forward", "nearest"} with an optional match tolerance.

    - backward — greatest ``right_time <= left_time`` (delegates to
      :func:`as_of_join`, same carry-forward plan);
    - forward — smallest ``right_time >= left_time``: the mirrored
      window (first-following over ``[current, unbounded following]``,
      left rows ordered before equal-timestamp right rows so >= holds);
    - nearest — both passes, keep the smaller |Δt|, ties to backward
      (the pandas rule).

    ``tolerance_seconds`` nulls out matches farther than the bound —
    applied AFTER direction resolution, exactly like pandas. Every
    variant is the same one-shuffle union+window shape; nearest costs a
    second window over the same partitioning (no extra shuffle: the
    union is partitioned once by key)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    tiebreak_cols = tiebreak_cols or []

    def tol_filter(df: DataFrame) -> DataFrame:
        if tolerance_seconds is None:
            return df
        far = (
            F.abs(
                F.col(left_time).cast("double") - F.col("asof_time").cast("double")
            )
            > tolerance_seconds
        )
        out = df
        for c in ["asof_time"] + [f"asof_{c}" for c in value_cols]:
            out = out.withColumn(c, F.when(far, F.lit(None)).otherwise(F.col(c)))
        return out

    if direction == "backward":
        return tol_filter(
            as_of_join(
                left,
                right,
                on=on,
                left_time=left_time,
                right_time=right_time,
                value_cols=value_cols,
                tiebreak_cols=tiebreak_cols,
            )
        )

    lcols = [c for c in left.columns if c not in (on, left_time)]
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
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
    u = l.unionByName(r)
    # forward window: left (side 1) sorts BEFORE right at equal t via side
    # desc, so an equal-timestamp right row is inside [current, following]
    # equal-t right-row ties: tiebreaks desc so first() picks the max —
    # the same winner backward's last()-over-asc rule selects
    wf = Window.partitionBy("__k").orderBy(
        F.col("__t").asc(),
        F.col("__side").desc(),
        *[F.col(f"__tb_{c}").desc_nulls_last() for c in tiebreak_cols],
    ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    fwd = u.select(
        "*",
        F.first("__rt", ignorenulls=True).over(wf).alias("fwd_time"),
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(wf).alias(f"fwd_{c}")
            for c in value_cols
        ],
    )
    if direction == "forward":
        out = fwd.filter(F.col("__side") == 1).select(
            F.col("__k").alias(on),
            F.col("__t").alias(left_time),
            *lcols,
            F.col("fwd_time").alias("asof_time"),
            *[F.col(f"fwd_{c}").alias(f"asof_{c}") for c in value_cols],
        )
        return tol_filter(out)

    # nearest: backward window over the SAME union/partitioning
    wb = Window.partitionBy("__k").orderBy(
        F.col("__t").asc(),
        F.col("__side").asc(),
        *[F.col(f"__tb_{c}").asc_nulls_first() for c in tiebreak_cols],
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    both = fwd.select(
        "*",
        F.last("__rt", ignorenulls=True).over(wb).alias("bwd_time"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"bwd_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__side") == 1)
    lt = F.col("__t").cast("double")
    d_b = lt - F.col("bwd_time").cast("double")
    d_f = F.col("fwd_time").cast("double") - lt
    use_bwd = F.col("fwd_time").isNull() | (
        F.col("bwd_time").isNotNull() & (d_b <= d_f)
    )
    out = both.select(
        F.col("__k").alias(on),
        F.col("__t").alias(left_time),
        *lcols,
        F.when(use_bwd, F.col("bwd_time")).otherwise(F.col("fwd_time")).alias("asof_time"),
        *[
            F.when(use_bwd, F.col(f"bwd_{c}"))
            .otherwise(F.col(f"fwd_{c}"))
            .alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return tol_filter(out)


def interval_join(
    probes: DataFrame,
    intervals: DataFrame,
    *,
    keys: list[str],
    probe_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Interval (range-containment) join — each probe row pairs with every
    interval of the same key that contains its timestamp
    (``start <= ts <= end``, both inclusive). The temporal sibling of
    :func:`as_of_join`: sessions-containing-events, promo-window
    attribution, SLA-window matching.

    Spark's native plan for a range predicate without an equality key is a
    broadcast-nested-loop; this implementation makes it an EQUI-join by
    time bucketing (the standard overlap-join decomposition): probes land
    in ``floor(unix_micros/width)`` buckets map-side, each interval
    explodes into the buckets it spans, and the join runs on
    ``keys + bucket`` with the exact containment predicate re-applied
    after. Each probe is in exactly one bucket, so no dedup step is
    needed. Shuffle volume: |probes| + Σ interval spans/width — the
    ``bucket_seconds`` knob trades explosion factor against bucket
    population (pick ~ the median interval length). ``max_span_buckets``
    refuses degenerate intervals that would explode unboundedly (a skew
    guard, same stance as knn_graph.MAX_GROUP).

    Non-key column names must be disjoint between the two inputs."""
    width = bucket_seconds * 1_000_000
    too_wide = intervals.filter(
        (F.unix_micros(F.col(end_col)) - F.unix_micros(F.col(start_col)))
        > max_span_buckets * width
    )
    if too_wide.limit(1).count():
        raise ValueError(
            f"interval span exceeds max_span_buckets={max_span_buckets} "
            f"buckets of {bucket_seconds}s; raise bucket_seconds or cut the row"
        )
    def _bucket(c: str):
        # floor division (not cast-truncation: negative pre-1970 instants
        # must round DOWN); micros fit a double's 53-bit mantissa exactly
        return F.floor(F.unix_micros(F.col(c)) / width).cast("long")

    pb = probes.withColumn("__b", _bucket(probe_ts))
    iv = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "__b", F.explode(F.sequence(_bucket(start_col), _bucket(end_col)))
    )
    return (
        pb.join(iv, [*keys, "__b"])
        .filter(
            (F.col(probe_ts) >= F.col(start_col))
            & (F.col(probe_ts) <= F.col(end_col))
        )
        .drop("__b")
    )
