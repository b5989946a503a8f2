"""Multi-dimensional data layout: Z-order (Morton-curve) file clustering.

At 100 TB a table is pruned at read time by parquet min/max statistics —
but a linear sort order only gives tight stats on its prefix column. A
query filtering on the SECOND dimension (events by user when the table is
laid out by time, or by time when laid out by user) touches every file.
Interleaving the bits of both rank-scaled keys (the Z-order / Morton
curve) gives every file a tight bounding box in BOTH dimensions, so
either predicate skips most files — the same layout optimization Delta
Lake's ``OPTIMIZE ZORDER BY`` performs, built here from native
expressions only (constant-unrolled shift/mask chains, fully inside
whole-stage codegen; no UDF).

Scale posture: one ``min/max`` aggregation to scale the keys, then ONE
range shuffle (``repartitionByRange`` on the z-value) + in-partition
sort — identical cost to a plain global sort, which a layout rewrite
pays anyway. Affine min/max scaling (not exact rank) keeps it one-pass;
heavily skewed keys get coarser boxes — for those, pre-bin with
``ntile``-style quantiles at a higher one-off cost (documented
trade-off, same as Delta's default).

The reference has no layout surface (single mmap file); pure Spark-scale
north-star extension. Locality win is pinned in tests/test_layout.py:
a range predicate on EITHER dimension touches a small fraction of
z-ordered files vs ~all files of a linearly-sorted layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension → 32-bit z-values: plenty to separate
# file-granularity boxes (2^16 distinct cells per axis ≫ file count).
_BITS = 16

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(x: Column) -> Column:
    """Insert a zero between consecutive bits of a 16-bit value (the
    classic magic-mask spreading network), giving the even bit positions
    of a 32-bit word. Constant-unrolled — codegen sees plain shifts."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int = _BITS) -> Column:
    """Affine-map a numeric column onto [0, 2^bits) as a long."""
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (1 << bits)).cast("long"), top.cast("long"))


def zorder_value(
    df: DataFrame, col_a: str, col_b: str, *, bits: int = _BITS
) -> DataFrame:
    """Adds ``__z``: the Morton interleave of the two min/max-scaled keys.
    The min/max agg is one tiny job; its four scalars enter the plan as
    literals (crossJoin of a 1-row aggregate — broadcast, no shuffle)."""
    bounds = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    d = df.crossJoin(F.broadcast(bounds))
    za = _scale_to_bits(F.col(col_a), F.col("__amin"), F.col("__amax"), bits)
    zb = _scale_to_bits(F.col(col_b), F.col("__bmin"), F.col("__bmax"), bits)
    z = _spread_bits(za).bitwiseOR(F.shiftleft(_spread_bits(zb), 1))
    return d.withColumn("__z", z).drop("__amin", "__amax", "__bmin", "__bmax")


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 16,
    bits: int = _BITS,
) -> None:
    """Rewrite ``df`` clustered along the Z-curve of (col_a, col_b).

    Files are the **bit-aligned Morton boxes**: each output file holds one
    value of the top ``log2(n_files)`` z-bits, so a file's bounding box in
    either dimension is exact, not a sampled approximation. (An earlier
    version used ``repartitionByRange(n_files, "__z")``; the range
    partitioner equalizes row counts from a per-RDD-seeded sample, so file
    boundaries landed mid-box and a selective second-dimension predicate
    leaked into ~2× more files, nondeterministically.) The bucket is
    materialized as a partition directory, which additionally gives
    catalog-level pruning on ``__zb`` itself; rows are z-sorted within
    each file so row-group stats stay tight. ``n_files`` is rounded down
    to a power of two to keep boxes aligned."""
    prefix_bits = max((n_files).bit_length() - 1, 0)
    (
        zorder_value(df, col_a, col_b, bits=bits)
        .withColumn("__zb", F.shiftright(F.col("__z"), 2 * bits - prefix_bits))
        .repartition(F.col("__zb"))
        .sortWithinPartitions("__zb", "__z")
        .drop("__z")
        .write.mode("overwrite")
        .partitionBy("__zb")
        .parquet(path)
    )


def files_touched(df: DataFrame) -> int:
    """How many distinct files contributed rows to ``df`` — the locality
    metric for layout tests (post-pruning, a clustered layout concentrates
    a selective predicate's rows in few files)."""
    return df.select(F.input_file_name()).distinct().count()
