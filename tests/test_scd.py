"""SCD2 merge (operators/scd.py): versioning rules on literal fixtures —
change/new/no-op/absent keys, closed-history immutability, and merge
idempotence."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vector_db_spark.operators.scd import OPEN_TS, scd2_merge

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 6, 1)
OPEN = datetime.datetime.fromisoformat(OPEN_TS)
SCHEMA = "id long, attr string, valid_from timestamp, valid_to timestamp"


def _cur(spark):
    rows = [
        (1, "a", T0, OPEN),        # will change
        (2, "b", T0, OPEN),        # same attr in update → no-op
        (3, "c", T0, OPEN),        # absent from updates → untouched
        (1, "old", datetime.datetime(2023, 1, 1), T0),  # closed history
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _upd(spark):
    rows = [(1, "a2", T1), (2, "b", T1), (9, "fresh", T1)]
    return spark.createDataFrame(rows, "id long, attr string, ts timestamp")


def test_scd2_versioning_rules(spark):
    got = {
        (r["id"], r["valid_from"]): r
        for r in scd2_merge(_cur(spark), _upd(spark), "id", ["attr"], "ts").collect()
    }
    assert len(got) == 6
    # key 1: closed old history untouched; open version closed at T1; new open
    assert got[(1, datetime.datetime(2023, 1, 1))]["valid_to"] == T0
    assert got[(1, T0)]["valid_to"] == T1 and got[(1, T0)]["attr"] == "a"
    assert got[(1, T1)]["attr"] == "a2" and got[(1, T1)]["valid_to"] == OPEN
    # key 2: identical attr → untouched open row, no new version
    assert got[(2, T0)]["valid_to"] == OPEN
    assert (2, T1) not in got
    # key 3: untouched
    assert got[(3, T0)]["valid_to"] == OPEN
    # key 9: first version opens at its update time
    assert got[(9, T1)]["attr"] == "fresh" and got[(9, T1)]["valid_to"] == OPEN


def test_scd2_merge_is_idempotent(spark):
    once = scd2_merge(_cur(spark), _upd(spark), "id", ["attr"], "ts")
    twice = scd2_merge(once, _upd(spark), "id", ["attr"], "ts")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_open_rows_unique_per_key(spark):
    merged = scd2_merge(_cur(spark), _upd(spark), "id", ["attr"], "ts")
    opens = (
        merged.filter(F.col("valid_to") == OPEN)
        .groupBy("id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert opens == 0


def test_snapshot_diff_ops_and_null_handling(spark):
    from vector_db_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b2", None), (4, None, 4.0)],
        "id long, s string, v double",
    )
    got = {(r["op"], r["id"]): r.asDict() for r in
           snapshot_diff(old, new, ["id"]).collect()}
    assert set(got) == {("U", 2), ("D", 3), ("I", 4)}  # id 1 unchanged
    assert got[("U", 2)]["s"] == "b2" and got[("U", 2)]["v"] is None
    assert got[("D", 3)]["v"] == 3.0       # deletes carry the old values
    assert got[("I", 4)]["s"] is None      # null value column on insert ok
