"""Local replica of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle SQL side-by-side on the same parquet fixtures,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from vector_db_spark.io import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v: Any) -> Any:
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    # numeric cells carry a TYPE-CLASS TAG: the driver hashes repr(), so a
    # Spark BIGINT 250 vs a DuckDB DOUBLE 250.0 is a driver hash MISMATCH
    # even though 250 == 250.0 — the local gate must be exactly as strict
    # (the round-7 jl_projection_audit / cms_join_size lesson).
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return ("f", "nan" if math.isnan(f) else f)
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def assert_parity(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query") -> None:
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    g, w = _canon(got), _canon(want)
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not bad, f"{name}: {len(bad)}/{len(g)} rows differ; first 3: {bad[:3]}"
