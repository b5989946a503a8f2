"""as_of_join semantics on a controlled micro-fixture: inclusive boundary,
no-match nulls, latest-wins, deterministic tie resolution."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vector_db_spark.operators.asof import as_of_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10 00:00:00"), "before_any"),
            (1, _ts("2024-01-20 00:00:00"), "exact_boundary"),
            (1, _ts("2024-01-25 00:00:00"), "after_two"),
            (2, _ts("2024-01-05 00:00:00"), "other_key"),
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-15 00:00:00"), 100.0),
            (1, _ts("2024-01-20 00:00:00"), 200.0),  # tie pair: same time,
            (1, _ts("2024-01-20 00:00:00"), 250.0),  # max value must win
            (9, _ts("2024-01-01 00:00:00"), 999.0),
        ],
        "k long, rt timestamp, price double",
    )
    out = {
        r.tag: r
        for r in as_of_join(
            left, right,
            on="k", left_time="t", right_time="rt",
            value_cols=["price"], tiebreak_cols=["price"],
        ).collect()
    }
    assert out["before_any"].asof_time is None and out["before_any"].asof_price is None
    # boundary is inclusive (right_time <= left_time)
    assert out["exact_boundary"].asof_time == _ts("2024-01-20 00:00:00")
    assert out["exact_boundary"].asof_price == 250.0  # deterministic tie: max
    assert out["after_two"].asof_price == 250.0  # latest, not just any earlier
    assert out["other_key"].asof_price is None  # key 2 has no right rows


# --- directional variants (pandas.merge_asof parity) --------------------------


def _mk(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 25.0, "b"), (2, 5.0, "c")],
        "k long, t double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8.0, 100.0), (1, 20.0, 200.0), (1, 30.0, 300.0)],
        "k long, rt double, val double",
    )
    return left, right


def test_forward_picks_next(spark):
    from vector_db_spark.operators.asof import as_of_join_directional

    left, right = _mk(spark)
    out = {
        r.tag: (r.asof_time, r.asof_val)
        for r in as_of_join_directional(
            left, right, on="k", left_time="t", right_time="rt",
            value_cols=["val"], direction="forward",
        ).collect()
    }
    assert out["a"] == (20.0, 200.0)  # next at/after 10
    assert out["b"] == (30.0, 300.0)
    assert out["c"] == (None, None)  # key 2 has no right rows


def test_nearest_tie_prefers_backward(spark):
    from vector_db_spark.operators.asof import as_of_join_directional

    left = spark.createDataFrame([(1, 10.0, "x")], "k long, t double, tag string")
    right = spark.createDataFrame(
        [(1, 8.0, 1.0), (1, 12.0, 2.0)], "k long, rt double, val double"
    )
    (r,) = as_of_join_directional(
        left, right, on="k", left_time="t", right_time="rt",
        value_cols=["val"], direction="nearest",
    ).collect()
    assert (r.asof_time, r.asof_val) == (8.0, 1.0)  # |Δ|=2 both ways → backward


def test_tolerance_nulls_far_matches(spark):
    from vector_db_spark.operators.asof import as_of_join_directional

    left, right = _mk(spark)
    out = {
        r.tag: r.asof_time
        for r in as_of_join_directional(
            left, right, on="k", left_time="t", right_time="rt",
            value_cols=["val"], direction="backward", tolerance_seconds=3.0,
        ).collect()
    }
    assert out["a"] == 8.0  # Δ=2 within tolerance
    assert out["b"] is None  # nearest backward is 20, Δ=5 > 3


def test_directional_rejects_bad_direction(spark):
    import pytest as _pytest

    from vector_db_spark.operators.asof import as_of_join_directional

    left, right = _mk(spark)
    with _pytest.raises(ValueError):
        as_of_join_directional(
            left, right, on="k", left_time="t", right_time="rt",
            value_cols=["val"], direction="sideways",
        )


# --- interval (range-containment) join ----------------------------------------


def test_interval_join_exact_containment(spark):
    from vector_db_spark.operators.asof import interval_join

    probes = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00.000001"), (1, "2024-01-01 12:00:00"),
         (1, "2024-01-01 13:00:00.5"), (2, "2024-01-01 10:30:00")],
        "k long, ts string",
    ).selectExpr("k", "cast(ts as timestamp) ts")
    iv = spark.createDataFrame(
        [(1, "iv1", "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
         (1, "iv2", "2024-01-01 11:30:00", "2024-01-01 14:00:00"),
         (2, "iv3", "2024-01-01 00:00:00", "2024-01-01 09:00:00")],
        "k long, name string, start string, end string",
    ).selectExpr("k", "name", "cast(start as timestamp) start", "cast(end as timestamp) end")
    got = sorted(
        (r.ts.isoformat(), r.name)
        for r in interval_join(probes, iv, keys=["k"], bucket_seconds=1800).collect()
    )
    # boundary timestamps are INCLUSIVE on both ends; sub-second probes
    # route through the same bucket function as the interval explosion
    assert got == [
        ("2024-01-01T10:00:00.000001", "iv1"),
        ("2024-01-01T12:00:00", "iv1"),
        ("2024-01-01T12:00:00", "iv2"),
        ("2024-01-01T13:00:00.500000", "iv2"),
    ]


def test_interval_join_layout_invariant(spark, sf_smoke):
    """Bucketed decomposition must equal the naive range join exactly."""
    from vector_db_spark.io import load_table
    from vector_db_spark.operators.asof import interval_join

    ev = load_table(spark, sf_smoke, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("end"),
    )
    o = ev.filter(F.col("event_type") != "purchase").select("user_id", "ts")
    fast = interval_join(o, p, keys=["user_id"], bucket_seconds=600)
    naive = o.join(p, "user_id").filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    )
    a = sorted((r.pid, r.ts) for r in fast.select("pid", "ts").collect())
    b = sorted((r.pid, r.ts) for r in naive.select("pid", "ts").collect())
    assert a == b and len(a) > 0


def test_interval_join_refuses_degenerate_span(spark):
    import pytest as _pytest

    from vector_db_spark.operators.asof import interval_join

    probes = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts string"
    ).selectExpr("k", "cast(ts as timestamp) ts")
    iv = spark.createDataFrame(
        [(1, "1970-01-01 00:00:00", "2024-01-01 00:00:00")],
        "k long, start string, end string",
    ).selectExpr("k", "cast(start as timestamp) start", "cast(end as timestamp) end")
    with _pytest.raises(ValueError, match="max_span_buckets"):
        interval_join(probes, iv, keys=["k"], bucket_seconds=60, max_span_buckets=100)


def test_interval_join_inverted_interval_drops(spark):
    from vector_db_spark.operators.asof import interval_join

    probes = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts string"
    ).selectExpr("k", "cast(ts as timestamp) ts")
    iv = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00", "2024-01-01 10:00:00")],
        "k long, start string, end string",
    ).selectExpr("k", "cast(start as timestamp) start", "cast(end as timestamp) end")
    assert interval_join(probes, iv, keys=["k"]).count() == 0
