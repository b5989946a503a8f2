"""SCD type-2 merge — upsert with history: instead of overwriting a
changed row (``NodeTable.upsert``, reference storage.py semantics), close
the old version with an end-timestamp and append the new one, keeping the
full attribute timeline queryable (the warehouse-standard
slowly-changing-dimension pattern; the scale-grade form of "update").

Spark shape: ONE equi-join of the open-version slice against the update
batch on the business key (the update side is a batch — broadcastable in
the common case; AQE decides), then three branch projections of that one
joined frame (rows to close, versions to insert, rows untouched) unioned
back. No window over the corpus, no per-key iteration; cost is one
shuffle of the dimension's open slice + the batch.

Determinism: change detection is column equality (null-safe), timestamps
come from the update rows (never wall clock), so a merge is a pure
function of its inputs — the DuckDB oracle reproduces the whole history
table value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_TS = "2200-01-01 00:00:00"  # open-version sentinel (must stay
# inside the pandas/Arrow ns-timestamp range, max 2262 — 9999-12-31 overflows
# every toPandas boundary incl. the correctness driver)


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    id_col: str,
    attr_cols: list[str],
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Merge an update batch into an SCD2 history table.

    ``current`` carries ``id_col, *attr_cols, valid_from, valid_to``
    (open versions have ``valid_to = OPEN_TS``); ``updates`` carries
    ``id_col, *attr_cols, ts_col`` with AT MOST ONE row per key (collapse
    the batch first — e.g. latest-per-key with a deterministic tiebreak).

    Rules: a key absent from ``updates`` is untouched; an update with
    identical attributes is a no-op; a changed update closes the open
    version at the update timestamp and opens a new one from it; a new
    key opens its first version. Closed history rows are never touched —
    at scale, partition the table on ``valid_to = OPEN_TS`` vs closed so
    the merge only rewrites the open slice (the same partition-targeted
    rewrite argument as IVFIndex.delete)."""
    open_rows = current.filter(F.col(valid_to) == OPEN_TS)
    closed_rows = current.filter(F.col(valid_to) != OPEN_TS)
    u = updates.select(
        F.col(id_col),
        *[F.col(c).alias(f"__u_{c}") for c in attr_cols],
        F.col(ts_col).alias("__u_ts"),
    )
    j = open_rows.join(u, id_col, "full_outer")
    changed = F.col("__u_ts").isNotNull() & (
        F.col(valid_from).isNull()  # brand-new key
        | ~F.struct(*[F.col(c) for c in attr_cols]).eqNullSafe(
            F.struct(*[F.col(f"__u_{c}") for c in attr_cols])
        )
    )
    keep_open = j.filter(~changed & F.col(valid_from).isNotNull()).select(
        id_col, *attr_cols, valid_from, valid_to
    )
    close_old = j.filter(changed & F.col(valid_from).isNotNull()).select(
        id_col,
        *attr_cols,
        valid_from,
        F.col("__u_ts").cast("timestamp").alias(valid_to),
    )
    open_new = j.filter(changed).select(
        id_col,
        *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
        F.col("__u_ts").cast("timestamp").alias(valid_from),
        F.lit(OPEN_TS).cast("timestamp").alias(valid_to),
    )
    return closed_rows.unionByName(keep_open).unionByName(close_old).unionByName(
        open_new
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """(op, *keys, ...columns): CDC-style diff of two table versions —
    ``I`` rows exist only in ``new``, ``D`` only in ``old``, ``U`` exist
    in both with any non-key column changed (null-safe comparison).
    Unchanged rows are omitted.

    One full-outer equi-join on the key (the minimal shuffle a diff can
    have), change detection as a null-safe struct comparison inside
    codegen. Emitted values are the NEW side for I/U and the old side
    for D, so the diff is directly apply-able as a changeset."""
    val_cols = [c for c in new.columns if c not in keys]
    # explicit presence markers: a row may legitimately hold NULL value
    # columns, so presence must not be inferred from them
    o = old.select(
        *keys, F.lit(True).alias("__o_p"),
        *[F.col(c).alias(f"__o_{c}") for c in val_cols],
    )
    n = new.select(
        *keys, F.lit(True).alias("__n_p"),
        *[F.col(c).alias(f"__n_{c}") for c in val_cols],
    )
    j = o.join(n, keys, "full_outer")
    in_old = F.coalesce(F.col("__o_p"), F.lit(False))
    in_new = F.coalesce(F.col("__n_p"), F.lit(False))
    changed = ~F.struct(*[F.col(f"__o_{c}") for c in val_cols]).eqNullSafe(
        F.struct(*[F.col(f"__n_{c}") for c in val_cols])
    )
    op = (
        F.when(in_old & ~in_new, F.lit("D"))
        .when(~in_old & in_new, F.lit("I"))
        .when(changed, F.lit("U"))
    )
    out_vals = [
        F.when(F.col("__op") == "D", F.col(f"__o_{c}"))
        .otherwise(F.col(f"__n_{c}"))
        .alias(c)
        for c in val_cols
    ]
    return (
        j.withColumn("__op", op)
        .filter(F.col("__op").isNotNull())
        .select(F.col("__op").alias("op"), *keys, *out_vals)
    )
