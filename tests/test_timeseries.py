"""Unit pins for the time-series surface (operators/timeseries.py):
OHLC rollup tie-breaks, resample gap-fill semantics, truncated-EWMA
arithmetic, and MAD outlier flags."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.timeseries import (
    ewma,
    mad_outliers,
    ohlc_bars,
    resample_ffill,
)


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


# --- ohlc_bars ---------------------------------------------------------------


def test_ohlc_open_close_high_low(spark):
    df = _events(
        spark,
        [
            (1, _ts(1, 1), 7, 10.0),
            (2, _ts(1, 5), 7, 40.0),
            (3, _ts(1, 9), 7, 5.0),
            (4, _ts(1, 23), 7, 20.0),
            (5, _ts(2, 0), 7, 99.0),  # next day bucket
        ],
    )
    bars = {
        r.bucket_ts: r
        for r in ohlc_bars(df, key="user_id", step="1 day").collect()
    }
    b1 = bars[_ts(1)]
    assert (b1.open, b1.high, b1.low, b1.close, b1.n_obs, b1.total) == (
        10.0, 40.0, 5.0, 20.0, 4, 75.0,
    )
    b2 = bars[_ts(2)]
    assert (b2.open, b2.close, b2.n_obs) == (99.0, 99.0, 1)


def test_ohlc_equal_ts_ties_break_by_id(spark):
    # two rows at the identical timestamp: open must be the lower event_id,
    # close the higher — on any partitioning
    df = _events(
        spark,
        [(10, _ts(1, 3), 7, 111.0), (9, _ts(1, 3), 7, 222.0)],
    ).repartition(4)
    (bar,) = ohlc_bars(df, key="user_id", step="1 day").collect()
    assert bar.open == 222.0 and bar.close == 111.0  # id 9 first, id 10 last


# --- resample_ffill ----------------------------------------------------------


def test_resample_fills_gaps_forward(spark):
    df = _events(
        spark,
        [
            (1, _ts(1, 5), 7, 10.0),
            (2, _ts(4, 5), 7, 40.0),  # days 2,3 are gaps
        ],
    )
    rows = sorted(
        resample_ffill(df, key="user_id", step_hours=24).collect(),
        key=lambda r: r.bucket_ts,
    )
    assert [r.bucket_ts.day for r in rows] == [1, 2, 3, 4]
    assert [r.value_ffill for r in rows] == [10.0, 10.0, 10.0, 40.0]
    assert [r.is_observed for r in rows] == [True, False, False, True]


def test_resample_last_obs_in_bucket_wins(spark):
    df = _events(
        spark,
        [(1, _ts(1, 2), 7, 10.0), (2, _ts(1, 22), 7, 30.0)],
    )
    (row,) = resample_ffill(df, key="user_id", step_hours=24).collect()
    assert row.value_ffill == 30.0 and row.is_observed


def test_resample_grid_is_per_key(spark):
    # key 8 observed only on day 5: its grid must not start at key 7's day 1
    df = _events(
        spark,
        [(1, _ts(1), 7, 1.0), (2, _ts(3), 7, 3.0), (3, _ts(5), 8, 5.0)],
    )
    out = resample_ffill(df, key="user_id", step_hours=24)
    per_key = {r.user_id for r in out.filter(F.col("user_id") == 8).collect()}
    assert out.filter(F.col("user_id") == 8).count() == 1
    assert out.filter(F.col("user_id") == 7).count() == 3
    assert per_key == {8}


# --- ewma --------------------------------------------------------------------


def test_ewma_head_and_weights(spark):
    df = _events(
        spark,
        [(1, _ts(1), 7, 10.0), (2, _ts(2), 7, 20.0), (3, _ts(3), 7, 40.0)],
    )
    rows = {r.event_id: r.ewma_value for r in ewma(df, alpha=0.5, k_lags=8).collect()}
    assert rows[1] == 10.0  # head: no lags, renormalized to the value itself
    assert rows[2] == pytest.approx((20.0 + 0.5 * 10.0) / 1.5, abs=1e-6)
    assert rows[3] == pytest.approx(
        (40.0 + 0.5 * 20.0 + 0.25 * 10.0) / 1.75, abs=1e-6
    )


def test_ewma_truncates_at_k_lags(spark):
    # with k_lags=1 only the immediate predecessor contributes
    df = _events(
        spark,
        [(1, _ts(1), 7, 100.0), (2, _ts(2), 7, 10.0), (3, _ts(3), 7, 10.0)],
    )
    rows = {r.event_id: r.ewma_value for r in ewma(df, alpha=0.5, k_lags=1).collect()}
    assert rows[3] == pytest.approx(10.0, abs=1e-6)  # 100.0 is beyond the horizon


def test_ewma_partition_invariant(spark):
    df = _events(
        spark,
        [(i, _ts(1 + i % 28, i % 24), i % 3, float(i * 7 % 101)) for i in range(120)],
    )
    a = sorted(ewma(df.coalesce(1)).collect())
    b = sorted(ewma(df.repartition(16)).collect())
    assert a == b


# --- mad_outliers ------------------------------------------------------------


def test_mad_outliers_hand_computed(spark):
    # values 1..9 plus an outlier 1000: med=5.5, MAD=2.5 -> cut at 3.5*1.4826*2.5≈12.97
    rows = [(i, _ts(1), 7, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = _events(spark, rows).withColumn("event_type", F.lit("t"))
    out = mad_outliers(df, group="event_type", value="value", z_cut=3.5)
    flagged = [r.value for r in out.filter("is_outlier").collect()]
    assert flagged == [1000.0]
    (r,) = out.limit(1).collect()
    assert r.med == pytest.approx(5.5) and r.mad == pytest.approx(2.5)


def test_mad_zero_flags_nothing(spark):
    # constant group: MAD=0 — must not flag everything
    rows = [(i, _ts(1), 7, 5.0) for i in range(6)] + [(9, _ts(1), 7, 5.000001)]
    df = _events(spark, rows).withColumn("event_type", F.lit("t"))
    out = mad_outliers(df, group="event_type", value="value")
    assert out.filter("is_outlier").count() == 0


# --- time_weighted_avg -------------------------------------------------------


def test_twa_hand_computed(spark):
    from vector_db_spark.operators.timeseries import time_weighted_avg

    # value 10 holds 1h, value 30 holds 3h, final 99 holds nothing
    df = _events(
        spark,
        [(1, _ts(1, 0), 7, 10.0), (2, _ts(1, 1), 7, 30.0), (3, _ts(1, 4), 7, 99.0)],
    )
    (r,) = time_weighted_avg(df, key="user_id").collect()
    assert float(r.twa_value) == pytest.approx((10 * 1 + 30 * 3) / 4)
    assert r.n_obs == 3 and float(r.span_seconds) == pytest.approx(4 * 3600)


def test_twa_single_observation_falls_back_to_value(spark):
    from vector_db_spark.operators.timeseries import time_weighted_avg

    df = _events(spark, [(1, _ts(1), 7, 42.0)])
    (r,) = time_weighted_avg(df, key="user_id").collect()
    assert float(r.twa_value) == 42.0 and float(r.span_seconds) == 0.0


def test_twa_burst_does_not_skew(spark):
    from vector_db_spark.operators.timeseries import time_weighted_avg

    # 100 rapid samples of value 1000 in one minute, then value 1.0 held a day:
    # plain mean ~990, TWA ~1.7
    rows = [(i, datetime(2024, 1, 1, 0, 0, i % 60, i), 7, 1000.0) for i in range(100)]
    rows.append((100, datetime(2024, 1, 1, 0, 2), 7, 1.0))
    rows.append((101, datetime(2024, 1, 2, 0, 2), 7, 1.0))
    df = _events(spark, rows)
    (r,) = time_weighted_avg(df, key="user_id").collect()
    assert float(r.twa_value) < 5.0


# --- counter_rate ------------------------------------------------------------


def test_counter_rate_monotonic(spark):
    from vector_db_spark.operators.timeseries import counter_rate

    df = _events(
        spark,
        [(1, _ts(1, 0), 7, 100.0), (2, _ts(1, 1), 7, 150.0), (3, _ts(1, 2), 7, 175.0)],
    )
    (r,) = counter_rate(df, key="user_id").collect()
    assert float(r.total_increase) == 75.0 and r.n_resets == 0
    assert float(r.rate_per_sec) == pytest.approx(75.0 / 7200)


def test_counter_rate_reset_counts_post_reset_level(spark):
    from vector_db_spark.operators.timeseries import counter_rate

    # 100 -> 150 (+50), restart to 20 (+20), -> 50 (+30): total 100, 1 reset
    df = _events(
        spark,
        [
            (1, _ts(1, 0), 7, 100.0),
            (2, _ts(1, 1), 7, 150.0),
            (3, _ts(1, 2), 7, 20.0),
            (4, _ts(1, 3), 7, 50.0),
        ],
    )
    (r,) = counter_rate(df, key="user_id").collect()
    assert float(r.total_increase) == 100.0 and r.n_resets == 1


def test_counter_rate_single_row_is_zero(spark):
    from vector_db_spark.operators.timeseries import counter_rate

    df = _events(spark, [(1, _ts(1), 7, 5.0)])
    (r,) = counter_rate(df, key="user_id").collect()
    assert float(r.total_increase) == 0.0 and float(r.rate_per_sec) == 0.0


# --- rolling_time_stats ------------------------------------------------------


def test_rolling_range_frame_boundaries(spark):
    from vector_db_spark.operators.timeseries import rolling_time_stats

    # 3-day window: day 5 sees days 2..5 (boundary-inclusive), not day 1
    df = _events(
        spark,
        [(i, _ts(d), 7, float(d)) for i, d in enumerate([1, 2, 5])],
    )
    out = {r.value: (r.n_window, r.sum_window) for r in
           rolling_time_stats(df, key="user_id", window_seconds=3 * 86400).collect()}
    assert out[1.0] == (1, 1.0)
    assert out[2.0] == (2, 3.0)       # day 1 within [day-1 - 3d]? 2-3=−1 ≤ 1 ✓
    assert out[5.0] == (2, 7.0)       # days 2 and 5; day 1 is outside 3d


def test_rolling_same_timestamp_shares_frame(spark):
    from vector_db_spark.operators.timeseries import rolling_time_stats

    df = _events(spark, [(1, _ts(1), 7, 10.0), (2, _ts(1), 7, 20.0)])
    rows = rolling_time_stats(df, key="user_id", window_seconds=60).collect()
    # RANGE semantics: peers at the same order value share the frame
    assert all(r.n_window == 2 and r.sum_window == 30.0 for r in rows)


def test_lagged_crosscorr_detects_exact_shift(spark):
    """B is A shifted by exactly 2 hours: corr(lag=2) must be 1.0 and
    strictly dominate every other lag; the grid zero-fills gaps."""
    import datetime

    from vector_db_spark.operators.timeseries import lagged_cross_correlation

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # A counts per hour h: pattern [3,1,4,1,5,9,2,6]; B = same, 2h later
    pattern = [3, 1, 4, 1, 5, 9, 2, 6]
    for h, n in enumerate(pattern):
        for _ in range(n):
            eid += 1
            rows.append((eid, base + datetime.timedelta(hours=h), 1, "click", 1.0))
        for _ in range(n):
            eid += 1
            rows.append((eid, base + datetime.timedelta(hours=h + 2), 1, "purchase", 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.lag: r.corr for r in lagged_cross_correlation(df, max_lag=4).collect()}
    assert out[2] == 1.0
    assert all(out[l] < 1.0 for l in out if l != 2)


def test_cusum_closed_form_equals_recursion(spark):
    """S_t = P_t - min(0, running_min P) must equal the textbook
    recursion S_t = max(0, S_{t-1} + d_t) — including resets to zero —
    on a planted series with a level shift."""
    import datetime

    from vector_db_spark.operators.timeseries import cusum_changepoints

    t0 = datetime.datetime(2024, 1, 1)
    # 12 baseline-ish hours then a level shift; one event row per count
    # trailing hour has an event so the data-driven grid covers the
    # full series (empty hours beyond max(ts) don't exist to the engine)
    xs = [2, 1, 3, 2, 1, 2, 3, 1, 2, 2, 1, 2, 9, 8, 10, 9, 0, 1]
    rows = []
    eid = 0
    for h, x in enumerate(xs):
        for _ in range(x):
            rows.append((eid, t0 + datetime.timedelta(hours=h, minutes=1), "a"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    b, mult = 12, 3
    out = {
        r.window_start: r.cusum_scaled
        for r in cusum_changepoints(
            df, baseline_buckets=b, threshold_mult=mult
        ).collect()
    }

    sb = sum(xs[:b])
    s, want = 0, {}
    for h, x in enumerate(xs):
        s = max(0, s + 4 * b * x - 5 * sb)
        if s > mult * sb:
            want[t0 + datetime.timedelta(hours=h)] = s
    assert out == want
    assert want  # the planted shift must actually alarm
    # and the alarm hours start at the shift, not inside the baseline
    assert min(want) >= t0 + datetime.timedelta(hours=b)


def test_mann_kendall_sen_hand_computed(spark):
    """Known series: strictly increasing → S = C(n,2), slope exact;
    plus a flat series → S = 0, slope 0."""
    import datetime

    from vector_db_spark.operators.timeseries import trend_mann_kendall_sen

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h, x in enumerate([1, 2, 3, 4]):  # series "up": x = h+1 per hour
        for _ in range(x):
            rows.append((eid, t0 + datetime.timedelta(hours=h), "up")); eid += 1
    for h in range(4):  # series "flat": 2 events every hour
        for _ in range(2):
            rows.append((eid, t0 + datetime.timedelta(hours=h), "flat")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {r.event_type: (r.mk_s, r.n_pairs, r.sen_slope) for r in
           trend_mann_kendall_sen(df).collect()}
    assert got["up"] == (6, 6, 1.0)     # all 6 pairs increasing, unit slope
    assert got["flat"] == (0, 6, 0.0)


def test_mann_kendall_even_pair_median(spark):
    """Even pair count: Sen slope = mean of the two middle-ranked
    slopes — the deterministic interpolation both engines share."""
    import datetime

    from vector_db_spark.operators.timeseries import trend_mann_kendall_sen

    t0 = datetime.datetime(2024, 1, 1)
    xs = [1, 3, 2, 5]  # slopes: 2,.5,4/3,-1,1,3 -> sorted middle two: 1, 4/3
    rows = []
    eid = 0
    for h, x in enumerate(xs):
        for _ in range(x):
            rows.append((eid, t0 + datetime.timedelta(hours=h), "a")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    r = trend_mann_kendall_sen(df).collect()[0]
    assert r.n_pairs == 6
    assert abs(r.sen_slope - round((1.0 + round(4 / 3, 6)) / 2, 6)) < 1e-9


def test_decayed_key_scores_bucketed_halving(spark):
    """Weights are exact powers of two of the epoch index: events in the
    newest 24h epoch weigh 1, the previous epoch 1/2, etc.; the scaled
    integer is the exact sum."""
    from datetime import datetime

    from vector_db_spark.operators.timeseries import decayed_key_scores

    rows = [
        ("a", datetime(2026, 1, 10, 12, 0, 0)),   # age 0      -> b=0, w=1
        ("a", datetime(2026, 1, 9, 13, 0, 0)),    # age 23h    -> b=0, w=1
        ("a", datetime(2026, 1, 8, 12, 0, 0)),    # age 48h    -> b=2, w=1/4
        ("b", datetime(2026, 1, 10, 12, 0, 0)),   # b=0
        ("b", datetime(2025, 1, 10, 12, 0, 0)),   # age 365d -> b capped 30
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r.k: r for r in decayed_key_scores(df, key="k", ts="ts").collect()}
    s = 2**30
    assert got["a"].decayed_fp == 2 * s + s // 4
    assert got["a"].n_events == 3
    assert got["a"].decayed_score == round((2 + 0.25), 9)
    assert got["b"].decayed_fp == s + 1  # capped epoch contributes 2^0
    assert got["b"].decayed_score == round(1 + 1 / s, 9)
