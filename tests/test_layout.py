"""Z-order layout: locality in BOTH dimensions, correctness preserved."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_spark.io import load_table
from vector_db_spark.operators.layout import files_touched, zorder_value, zorder_write

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, sf_smoke, tmp_path_factory):
    """events written two ways: linear (sorted by ts) and z-ordered on
    (epoch seconds, user_id)."""
    base = tmp_path_factory.mktemp("layout")
    ev = load_table(spark, sf_smoke, "events").withColumn(
        "ts_sec", F.unix_timestamp("ts").cast("long")
    )
    linear = str(base / "linear")
    zordered = str(base / "zorder")
    (
        ev.repartitionByRange(N_FILES, "ts_sec")
        .sortWithinPartitions("ts_sec")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder_write(ev, zordered, "ts_sec", "user_id", n_files=N_FILES)
    return spark, linear, zordered, ev


def test_zorder_preserves_rows(layouts):
    spark, _, zordered, ev = layouts
    zdf = spark.read.parquet(zordered)
    assert zdf.count() == ev.count()
    a = sorted(r.event_id for r in ev.select("event_id").collect())
    b = sorted(r.event_id for r in zdf.select("event_id").collect())
    assert a == b


def test_zorder_prunes_second_dimension(layouts):
    """A selective user_id range touches ~all linear files (user is random
    within every time-sorted file) but a small fraction of z-ordered
    files — the whole point of multi-dim clustering."""
    spark, linear, zordered, _ = layouts
    pred = F.col("user_id").between(10, 19)
    lin = files_touched(spark.read.parquet(linear).filter(pred))
    zed = files_touched(spark.read.parquet(zordered).filter(pred))
    assert lin >= N_FILES * 0.75, f"linear layout unexpectedly clustered: {lin}"
    assert zed <= lin / 2, f"z-order gave no user-dim locality: {zed} vs {lin}"


def test_zorder_keeps_first_dimension_locality(layouts):
    """The time dimension must STILL prune after z-ordering (the curve
    trades a little prefix locality for cross-dim locality, not all)."""
    spark, _, zordered, ev = layouts
    lo, hi = ev.agg(F.min("ts_sec"), F.max("ts_sec")).first()
    cut = lo + (hi - lo) // 10
    zed = files_touched(
        spark.read.parquet(zordered).filter(F.col("ts_sec") <= cut)
    )
    assert zed <= N_FILES * 0.75, f"time predicate reads ~everything: {zed}"


def test_zorder_value_deterministic_and_bounded(layouts):
    spark, _, _, ev = layouts
    z1 = zorder_value(ev, "ts_sec", "user_id").select("event_id", "__z")
    z2 = zorder_value(ev, "ts_sec", "user_id").select("event_id", "__z")
    p1 = {r["event_id"]: r["__z"] for r in z1.collect()}
    p2 = {r["event_id"]: r["__z"] for r in z2.collect()}
    assert p1 == p2
    assert all(0 <= v < (1 << 32) for v in p1.values())
