"""as_of_join semantics on a controlled micro-fixture: inclusive boundary,
no-match nulls, latest-wins, deterministic tie resolution."""

from __future__ import annotations

import datetime as dt

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
