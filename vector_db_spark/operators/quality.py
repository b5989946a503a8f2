"""Data-contract expectations — dbt-test/Great-Expectations-style checks
as DataFrame plans: primary-key uniqueness, null rates, referential
integrity, value ranges — each check one aggregation or anti-join, all
unioned into a single audit report.

North-star extension (the reference validates per-row dimension/type at
the API boundary, ``/root/reference/src/vector_db/storage.py`` — a
table-level contract is what a 100 TB pipeline runs nightly instead).

Each check returns ``(check, table, violations, ok)``; the report is the
union of independent single-row aggregates, so Spark runs the checks as
parallel jobs sharing scans where Catalyst can. Violations are exact
counts — the audit is oracle-checkable, not a sampled guess.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report_row(df: DataFrame, check: str, table: str, violations: Column) -> DataFrame:
    return df.agg(violations.cast("long").alias("violations")).select(
        F.lit(check).alias("check"),
        F.lit(table).alias("table_name"),
        "violations",
        (F.col("violations") == 0).alias("ok"),
    )


def expect_unique(df: DataFrame, cols: list[str], table: str) -> DataFrame:
    """Violations = rows beyond the first per key (0 ⇔ key is unique)."""
    dupes = df.groupBy(*cols).agg(F.count("*").alias("c")).filter(F.col("c") > 1)
    return _report_row(
        dupes, f"unique({','.join(cols)})", table, F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
    )


def expect_not_null(df: DataFrame, col: str, table: str) -> DataFrame:
    return _report_row(
        df, f"not_null({col})", table, F.sum(F.col(col).isNull().cast("long"))
    )


def expect_in_range(
    df: DataFrame, col: str, lo: float, hi: float, table: str
) -> DataFrame:
    bad = (F.col(col) < lo) | (F.col(col) > hi)
    return _report_row(
        df, f"range({col},[{lo},{hi}])", table, F.sum(bad.cast("long"))
    )


def expect_foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str,
    table: str
) -> DataFrame:
    """Violations = child rows whose key has no parent (left-anti count).
    The parent key side reduces to its distinct keys first — at scale the
    anti-join keys on the FK and the distinct parent side broadcasts when
    dimension-sized."""
    orphans = child.select(F.col(child_col)).join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )
    return _report_row(
        orphans, f"fk({child_col}->{parent_col})", table, F.count("*")
    )


def expectation_report(checks: list[DataFrame]) -> DataFrame:
    """Union the individual check rows into one audit table."""
    return reduce(lambda a, b: a.unionByName(b), checks)
