"""Time rollup (operators/rollup.py): merged rollup+tail must equal the
direct aggregation over all raw rows (partials are mergeable monoids)."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.rollup import build_time_rollup, merged_rollup


def _events(spark, n=500):
    return spark.range(n).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 137).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 3)).alias("event_type"),
        (F.col("id") % 97 / 7.0).alias("value"),
    )


def _as_dict(df):
    return {
        (r["bucket_start"], r["key"]): (
            r["n"],
            round(r["sum_value"], 6),
            round(r["min_value"], 6),
            round(r["max_value"], 6),
        )
        for r in df.collect()
    }


def test_merged_rollup_equals_direct(spark):
    ev = _events(spark)
    cutoff = "2024-01-01 10:00:00"
    rollup = build_time_rollup(ev.filter(F.col("ts") < cutoff))
    tail = ev.filter(F.col("ts") >= cutoff)
    merged = merged_rollup(rollup, tail)
    direct = build_time_rollup(ev)
    assert _as_dict(merged) == _as_dict(direct)


def test_merged_rollup_with_empty_tail(spark):
    ev = _events(spark, n=100)
    rollup = build_time_rollup(ev)
    empty = ev.filter(F.lit(False))
    assert _as_dict(merged_rollup(rollup, empty)) == _as_dict(build_time_rollup(ev))


def test_rollup_cutoff_inside_bucket_merges_partials(spark):
    # cutoff mid-bucket: both sides contribute partials to the same bucket
    ev = _events(spark, n=200)
    cutoff = "2024-01-01 01:30:00"
    rollup = build_time_rollup(ev.filter(F.col("ts") < cutoff))
    merged = merged_rollup(rollup, ev.filter(F.col("ts") >= cutoff))
    assert _as_dict(merged) == _as_dict(build_time_rollup(ev))


def test_funnel_counts_ordering_semantics(spark):
    from valentinus_spark.operators.funnel import funnel_counts

    rows = [
        # user 1: full ordered funnel
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: click BEFORE first view -> stops at view
        (2, "click", 5), (2, "view", 10),
        # user 3: view then purchase (no click) -> stops at view
        (3, "view", 10), (3, "purchase", 20),
        # user 4: view, click, but purchase before click -> stops at click
        (4, "view", 10), (4, "purchase", 15), (4, "click", 20),
        # user 5: second view before click counts from FIRST view
        (5, "view", 10), (5, "view", 50), (5, "click", 30), (5, "purchase", 40),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    got = {
        r["step_no"]: (r["step"], r["n_users"])
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: ("view", 5), 2: ("click", 3), 3: ("purchase", 2)}


def test_cohort_retention_offsets(spark):
    from valentinus_spark.operators.funnel import cohort_retention

    day = 86_400_000_000
    rows = [
        (1, 0 * day), (1, 1 * day), (1, 1 * day + 5),  # day 1 twice: one row
        (2, 0 * day), (2, 2 * day),
        (3, 1 * day),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


# ----------------------------------------------------------- debounce


from valentinus_spark.operators.funnel import debounce_events  # noqa: E402


def test_debounce_keeps_island_starts(spark):
    rows = [
        (1, 0), (1, 5), (1, 9),      # island 1 (gaps <= 10)
        (1, 100), (1, 105),          # island 2
        (2, 0), (2, 50),             # user 2: two islands at gap 10
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_us long")
    out = sorted(
        (r["user_id"], r["ts_us"])
        for r in debounce_events(df, ["user_id"], "ts_us", gap=10).collect()
    )
    assert out == [(1, 0), (1, 100), (2, 0), (2, 50)]


def test_debounce_chain_semantics(spark):
    # consecutive events each 8 apart with gap=10: only the first
    # survives (session semantics), even though e3 is 16 from e1
    df = spark.createDataFrame(
        [(1, 0), (1, 8), (1, 16), (1, 24)], "user_id int, ts_us long"
    )
    out = debounce_events(df, ["user_id"], "ts_us", gap=10).collect()
    assert [(r["ts_us"]) for r in out] == [0]


def test_resample_ffill_grid_and_fill(spark):
    """Key 1: samples at t=105 (v=1.0) and t=430 (v=7.0) on a 100-tick
    grid -> ticks 100..400; tick 100 carries the in-interval sample
    (105), ticks 200/300 forward-fill it, and tick 400's interval
    [400,500) contains the 430 sample. Key 2: single sample, single
    tick."""
    from valentinus_spark.operators.rollup import resample_ffill

    rows = [(1, 105, 1.0), (1, 430, 7.0), (2, 250, 5.0)]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    got = {
        (r["k"], r["tick_us"]): r["value"]
        for r in resample_ffill(df, "k", "ts", "v", 100).collect()
    }
    assert got == {
        (1, 100): 1.0,
        (1, 200): 1.0,
        (1, 300): 1.0,
        (1, 400): 7.0,
        (2, 200): 5.0,
    }


def test_resample_ffill_on_tick_sample_fills_its_tick(spark):
    """A sample exactly on a tick boundary belongs to THAT tick's
    interval; within-interval the last (and on equal ts the larger)
    value wins."""
    from valentinus_spark.operators.rollup import resample_ffill

    rows = [(1, 200, 3.0), (1, 250, 4.0), (1, 250, 9.0), (1, 310, 6.0)]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    got = {
        r["tick_us"]: r["value"]
        for r in resample_ffill(df, "k", "ts", "v", 100).collect()
    }
    assert got == {200: 9.0, 300: 6.0}


def test_trailing_anomaly_flags_spike_not_baseline(spark):
    """Stable series then a spike: the spike's z against its trailing
    window is huge; the stable rows and the warm-up rows (< min_obs) stay
    unflagged; the row AFTER the spike is judged against a window that
    now contains the spike (contaminated variance) — still unflagged."""
    from valentinus_spark.operators.rollup import trailing_anomaly

    rows = [(i, 1, f"2024-01-01 00:{i:02d}:00", float(10 + (i % 2))) for i in range(10)]
    rows.append((10, 1, "2024-01-01 00:10:00", 100.0))
    rows.append((11, 1, "2024-01-01 00:11:00", 10.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_id"]: r for r in trailing_anomaly(ev, window=20).collect()}
    assert got[10]["is_anomaly"] and got[10]["trail_z"] > 3.0
    assert not any(got[i]["is_anomaly"] for i in range(10))
    assert not got[11]["is_anomaly"]
    # warm-up rows below min_obs score exactly 0
    assert got[1]["trail_z"] == 0.0 and got[4]["n_obs"] == 4


def test_trailing_anomaly_constant_series_never_divides_by_zero(spark):
    """A constant series has zero trailing variance at every row — the
    guard must return z=0 everywhere instead of raising under ANSI."""
    from valentinus_spark.operators.rollup import trailing_anomaly

    ev = spark.createDataFrame(
        [(i, 1, f"2024-01-01 00:{i:02d}:00", 5.0) for i in range(8)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = trailing_anomaly(ev).collect()
    assert all(r["trail_z"] == 0.0 and not r["is_anomaly"] for r in out)


def test_acf_hand_computed_period_two(spark):
    """Daily counts [2,4,2,4,2,4]: mean 3, deviations ±1, denom 6.
    lag1 products sum to -5 -> acf -5/6; lag2 -> 4/6."""
    from valentinus_spark.operators import acf_profile

    rows = []
    for day, cnt in enumerate([2, 4, 2, 4, 2, 4]):
        for i in range(cnt):
            rows.append((f"2024-01-{day + 1:02d} 0{i}:00:00",))
    df = spark.createDataFrame(rows, ["s"]).select(
        F.col("s").cast("timestamp").alias("ts")
    )
    out = {r.lag: r for r in acf_profile(df, max_lag=3).collect()}
    assert out[1].n_pairs == 5 and out[2].n_pairs == 4
    assert out[1].acf == pytest.approx(-5 / 6, abs=1e-6)
    assert out[2].acf == pytest.approx(4 / 6, abs=1e-6)
    assert out[3].acf == pytest.approx(-3 / 6, abs=1e-6)


def test_acf_constant_series_and_long_lag_null(spark):
    from valentinus_spark.operators import acf_profile

    rows = [(f"2024-02-0{d} 00:00:00",) for d in range(1, 5)]
    df = spark.createDataFrame(rows, ["s"]).select(
        F.col("s").cast("timestamp").alias("ts")
    )
    out = {r.lag: r for r in acf_profile(df, max_lag=6).collect()}
    # constant series (1/day): zero variance -> NULL acf at every lag
    assert all(out[k].acf is None for k in out)
    # lags past the series length have zero pairs
    assert out[5].n_pairs == 0 and out[6].n_pairs == 0


def test_session_paths_hand_computed(spark):
    """User 1: one session view>click>purchase (events 10 min apart),
    then a 2-hour gap starts a new session view>view. User 2: single
    view. Top paths count sessions, not events; ties order by path."""
    from valentinus_spark.operators import session_paths

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:10:00", "click"),
        (3, 1, "2024-01-01 10:20:00", "purchase"),
        (4, 1, "2024-01-01 13:00:00", "view"),
        (5, 1, "2024-01-01 13:05:00", "view"),
        (6, 2, "2024-01-01 09:00:00", "view"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "s", "event_type"]).select(
        "event_id", "user_id", F.col("s").cast("timestamp").alias("ts"), "event_type"
    )
    out = {r.path: r.n_sessions for r in session_paths(df).collect()}
    assert out == {"view>click>purchase": 1, "view>view": 1, "view": 1}


def test_session_paths_truncation_and_tiebreak(spark):
    from valentinus_spark.operators import session_paths

    # 7 events in one session, max_steps=3 keeps the first three; two
    # same-timestamp events order by event_id (a < b deterministic)
    rows = [(i, 1, "2024-01-01 10:00:00", t) for i, t in
            [(1, "a"), (2, "b")]] + [
        (i, 1, f"2024-01-01 10:{i:02d}:00", "c") for i in range(3, 8)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "s", "event_type"]).select(
        "event_id", "user_id", F.col("s").cast("timestamp").alias("ts"), "event_type"
    )
    out = session_paths(df, max_steps=3).collect()
    assert len(out) == 1 and out[0].path == "a>b>c" and out[0].n_sessions == 1


def test_cusum_detects_planted_mean_shift(spark):
    """20 days at mean 10, then 10 days at mean 13: CUSUM+ must cross
    h on the shifted segment while no single day is extreme; the
    pre-shift segment must stay quiet. Values replayed in python."""
    from valentinus_spark.operators import cusum_changepoint

    rows = []
    for day in range(1, 31):
        base = 10.0 if day <= 20 else 13.0
        wobble = 0.3 * (day % 3)  # baseline variance so sigma > 0
        for i in range(4):
            rows.append((f"2024-07-{day:02d} 0{i}:00:00", base + wobble + (i - 1.5)))
    df = spark.createDataFrame(rows, ["s", "value"]).select(
        F.col("s").cast("timestamp").alias("ts"), "value"
    )
    out = cusum_changepoint(df, k=0.5, h=3.0, baseline_days=20).collect()
    assert len(out) == 30
    assert not any(r.alarm for r in out[:20])
    assert any(r.alarm for r in out[20:])
    # python replay of the fold over the emitted z series
    sp = sm = 0.0
    for r in out:
        sp = max(0.0, sp + r.z - 0.5)
        sm = max(0.0, sm - r.z - 0.5)
        assert r.cusum_pos == pytest.approx(round(sp, 6), abs=1e-9)
        assert r.cusum_neg == pytest.approx(round(sm, 6), abs=1e-9)


def test_cusum_constant_series_never_alarms(spark):
    from valentinus_spark.operators import cusum_changepoint

    rows = [(f"2024-08-{d:02d} 00:00:00", 5.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, ["s", "value"]).select(
        F.col("s").cast("timestamp").alias("ts"), "value"
    )
    out = cusum_changepoint(df).collect()
    assert all(r.z == 0.0 and not r.alarm for r in out)
    assert all(r.cusum_pos == 0.0 and r.cusum_neg == 0.0 for r in out)


def test_mann_kendall_planted_monotone_and_flat(spark):
    """A strictly increasing daily series must give S = n(n-1)/2,
    tau = 1, small p; a constant series gives S = 0 with var 0 and NULL
    inference (all pairs tie)."""
    import datetime

    from valentinus_spark.operators import mann_kendall_trend

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=d), float(d + 1))
        for d in range(10)
    ]
    ev = spark.createDataFrame(rows, ["ts", "value"])
    r = mann_kendall_trend(ev).collect()[0]
    assert r.n_days == 10 and r.s_stat == 45 and r.tau == 1.0
    assert r.p_value is not None and r.p_value < 0.01

    flat = spark.createDataFrame(
        [(base + datetime.timedelta(days=d), 5.0) for d in range(10)],
        ["ts", "value"],
    )
    rf = mann_kendall_trend(flat).collect()[0]
    assert rf.s_stat == 0 and rf.var_s == 0.0 and rf.z is None


def test_mann_kendall_matches_scipy_style_replica(spark):
    """S, var (with ties), z against a direct python replay on a mixed
    series with duplicate daily means."""
    import datetime
    import math

    from valentinus_spark.operators import mann_kendall_trend

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    base = datetime.datetime(2024, 3, 1)
    ev = spark.createDataFrame(
        [(base + datetime.timedelta(days=d), x) for d, x in enumerate(xs)],
        ["ts", "value"],
    )
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values())
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    r = mann_kendall_trend(ev).collect()[0]
    assert r.s_stat == s
    assert r.var_s == pytest.approx(var, abs=1e-6)
    assert r.z == pytest.approx(z, abs=1e-6)
    assert r.tau == pytest.approx(s / (n * (n - 1) / 2), abs=1e-6)


def test_theil_sen_recovers_planted_line_with_outliers(spark):
    """y = 2t + 1 with two wildly corrupted days: the median slope must
    stay 2.0 and the intercept 1.0 (OLS would be dragged far off)."""
    import datetime

    from valentinus_spark.operators import theil_sen_trend

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(15):
        y = 2.0 * d + 1.0
        if d in (4, 11):
            y += 500.0  # corrupted feed days
        rows.append((base + datetime.timedelta(days=d), y))
    r = theil_sen_trend(spark.createDataFrame(rows, ["ts", "value"])).collect()[0]
    assert r.n_days == 15 and r.n_pairs == 105
    assert r.slope == pytest.approx(2.0, abs=1e-6)
    assert r.intercept == pytest.approx(1.0, abs=1.0)  # medians shift slightly with outliers


def test_theil_sen_even_pair_count_uses_both_middles(spark):
    """4 days -> 6 pairs (even): the slope must be the MEAN of the two
    middle slopes, not just the upper one (the floor-rank convention)."""
    import datetime

    from valentinus_spark.operators import theil_sen_trend

    base = datetime.datetime(2024, 1, 1)
    xs = [0.0, 1.0, 3.0, 6.0]
    rows = [(base + datetime.timedelta(days=d), x) for d, x in enumerate(xs)]
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(4)
        for j in range(i + 1, 4)
    )
    want = (slopes[2] + slopes[3]) / 2.0
    r = theil_sen_trend(spark.createDataFrame(rows, ["ts", "value"])).collect()[0]
    assert r.slope == pytest.approx(want, abs=1e-6)


def test_page_hinkley_flags_planted_mean_shift(spark):
    """30 flat days then 10 days shifted +5: PH+ must alarm after the
    shift and never before; the decrease side stays quiet."""
    import datetime

    from valentinus_spark.operators import page_hinkley

    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=d), 10.0) for d in range(30)]
    rows += [
        (base + datetime.timedelta(days=30 + d), 15.0) for d in range(10)
    ]
    out = page_hinkley(
        spark.createDataFrame(rows, ["ts", "value"]), delta=0.1, lam=3.0
    ).collect()
    by_day = {r.day.day + (r.day.month - 1) * 31: r for r in out}
    pre = [r for r in out if r.day < datetime.date(2024, 1, 31)]
    post = [r for r in out if r.day >= datetime.date(2024, 2, 2)]
    assert not any(r.alarm for r in pre)
    assert any(r.alarm for r in post)
    assert all(r.ph_dec < 3.0 for r in out)  # no downward drift


def test_holt_forecast_exact_on_linear_series(spark):
    """On an exactly linear series Holt's level+trend is exact: every
    one-step forecast equals the actual (abs_err 0)."""
    import datetime

    from valentinus_spark.operators import holt_linear_forecast

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=d), 3.0 + 2.0 * d) for d in range(12)
    ]
    out = holt_linear_forecast(
        spark.createDataFrame(rows, ["ts", "value"]), alpha=0.3, beta=0.1
    ).collect()
    assert len(out) == 11
    assert all(r.abs_err == pytest.approx(0.0, abs=1e-6) for r in out)
    assert out[3].forecast == pytest.approx(3.0 + 2.0 * 4, abs=1e-6)


def test_holt_forecast_matches_python_replica(spark):
    """Bit-level replay of the fold on a noisy series."""
    import datetime

    from valentinus_spark.operators import holt_linear_forecast

    xs = [5.0, 7.0, 6.5, 9.0, 8.0, 12.0, 11.5, 13.0]
    base = datetime.datetime(2024, 5, 1)
    rows = [(base + datetime.timedelta(days=d), x) for d, x in enumerate(xs)]
    aa, bb = 0.3, 0.1
    level, trend = xs[0], xs[1] - xs[0]
    want = []
    for t in range(1, len(xs)):
        f = level + trend
        x = xs[t]
        nl = aa * x + (1.0 - aa) * (level + trend)
        trend = bb * (nl - level) + (1.0 - bb) * trend
        level = nl
        want.append((round(f, 6), round(abs(x - f), 6)))
    out = holt_linear_forecast(
        spark.createDataFrame(rows, ["ts", "value"]), alpha=aa, beta=bb
    ).collect()
    got = [(r.forecast, r.abs_err) for r in out]
    assert got == [(pytest.approx(a, abs=1e-9), pytest.approx(b, abs=1e-9)) for a, b in want]


def test_ewma_chart_flags_shift_and_warms_up(spark):
    """Flat 25 days then +4 shift: limits widen monotonically toward
    the asymptote during warm-up, no alarms pre-shift, alarm fires
    post-shift; EWMA values match a python replica."""
    import datetime
    import math

    from valentinus_spark.operators import ewma_chart

    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=d), 10.0 + (d % 2) * 0.2) for d in range(25)]
    rows += [(base + datetime.timedelta(days=25 + d), 14.0) for d in range(8)]
    out = ewma_chart(
        spark.createDataFrame(rows, ["ts", "value"]), lam=0.2, L=3.0
    ).collect()
    widths = [r.ucl - r.lcl for r in out]
    assert all(widths[i] <= widths[i + 1] + 1e-9 for i in range(10))
    pre = [r for r in out if r.day < datetime.date(2024, 1, 26)]
    post = [r for r in out if r.day >= datetime.date(2024, 1, 28)]
    assert not any(r.alarm for r in pre)
    assert any(r.alarm for r in post)
    # replica of the fold on the 9-dp daily means
    xs = [round(x, 9) for _, x in rows]
    mu = round(sum(xs) / len(xs), 9)
    var = sum(x * x for x in xs) / len(xs) - (sum(xs) / len(xs)) ** 2
    e = mu
    for i, x in enumerate(xs):
        e = 0.2 * x + 0.8 * e
        assert out[i].ewma == pytest.approx(e, abs=1e-5)


def test_seasonal_decompose_recovers_planted_weekly_pattern(spark):
    """x = 0.5*t + weekly pattern: the recovered seasonal component
    must match the re-centered pattern and the remainder must be ~0
    (classical decomposition is exact for linear trend + pure
    seasonality)."""
    import datetime

    from valentinus_spark.operators import seasonal_decompose

    pattern = [3.0, -1.0, 0.0, 2.0, -2.0, -1.5, -0.5]
    mean_p = sum(pattern) / 7.0
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=d), 0.5 * d + pattern[d % 7])
        for d in range(35)
    ]
    out = seasonal_decompose(
        spark.createDataFrame(rows, ["ts", "value"]), period=7
    ).collect()
    assert len(out) == 35
    assert out[0].trend is None and out[2].trend is None
    assert out[3].trend is not None and out[-4].trend is not None
    for r in out:
        d = (r.day - datetime.date(2024, 1, 1)).days
        assert r.seasonal == pytest.approx(pattern[d % 7] - mean_p, abs=1e-4)
        if r.remainder is not None:
            assert r.remainder == pytest.approx(0.0, abs=1e-4)


def test_ljung_box_white_noise_small_seasonal_large(spark):
    """A strongly weekly series must blow up Q; Q composes acf_profile
    exactly (python replay from the acf rows)."""
    import datetime

    from valentinus_spark.operators import acf_profile, ljung_box

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(120):
        n = 20 if d % 7 == 0 else 2
        rows += [(base + datetime.timedelta(days=d),)] * n
    df = spark.createDataFrame(rows, ["ts"])
    r = ljung_box(df, max_lag=10).collect()[0]
    assert (r.n_days, r.max_lag, r.dof) == (120, 10, 10)

    acf = {a.lag: a for a in acf_profile(df, max_lag=10).collect()}
    q = 120 * 122 * sum(
        round(acf[k].acf * acf[k].acf / acf[k].n_pairs, 12)
        for k in range(1, 11)
    )
    assert r.q_stat == pytest.approx(round(q, 6), abs=1e-4)
    assert r.q_stat > 100  # weekly structure is unmissable


def test_ljung_box_constant_series_null(spark):
    import datetime

    from valentinus_spark.operators import ljung_box

    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=d),) for d in range(30)]
    df = spark.createDataFrame(rows, ["ts"])
    r = ljung_box(df, max_lag=5).collect()[0]
    assert r.q_stat is None  # constant daily volume -> acf undefined


def test_seasonal_mk_weekly_cycle_no_trend(spark):
    """A pure weekly cycle (no trend): seasonal MK compares only
    same-weekday days, which are all EQUAL here -> S = 0 and the tie
    correction zeroes the variance (z NULL by contract). Adding tiny
    trendless jitter keeps S small and p insignificant."""
    import datetime

    from valentinus_spark.operators import seasonal_mann_kendall

    base = datetime.datetime(2024, 1, 1)
    cyc = [10.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    rows = [
        (base + datetime.timedelta(days=d), cyc[d % 7]) for d in range(70)
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    r = seasonal_mann_kendall(df).collect()[0]
    assert (r.n_days, r.n_seasons) == (70, 7)
    assert r.s_stat == 0
    assert r.z is None  # all within-season values tie -> Var = 0

    jit = [
        (
            base + datetime.timedelta(days=d),
            cyc[d % 7] + 0.01 * ((d * 13) % 7 - 3),
        )
        for d in range(70)
    ]
    r2 = seasonal_mann_kendall(
        spark.createDataFrame(jit, ["ts", "value"])
    ).collect()[0]
    assert r2.p_value is None or r2.p_value > 0.05


def test_seasonal_mk_detects_trend_under_cycle(spark):
    """Weekly cycle + monotone drift: within each weekday the series
    strictly increases, so S = sum over seasons of (n_g choose 2)."""
    import datetime

    from valentinus_spark.operators import seasonal_mann_kendall

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(70):
        v = [10.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0][d % 7] + 0.1 * d
        rows.append((base + datetime.timedelta(days=d), v))
    df = spark.createDataFrame(rows, ["ts", "value"])
    r = seasonal_mann_kendall(df).collect()[0]
    assert r.s_stat == 7 * (10 * 9 // 2)
    assert r.z > 3 and r.p_value < 0.01


def test_holt_winters_perfect_weekly_series_zero_error(spark):
    """A perfectly periodic series: the simple init nails level=x_7,
    trend=0, seasonals exact, so EVERY one-step forecast is exact
    (abs_err == 0 throughout)."""
    import datetime

    from valentinus_spark.operators import holt_winters_forecast

    base = datetime.datetime(2024, 1, 1)
    cyc = [10.0, 2.0, 3.0, 4.0, 5.0, 6.0, 10.0]  # x_7 = x_1 -> trend 0
    rows = [
        (base + datetime.timedelta(days=d), cyc[d % 7]) for d in range(35)
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = holt_winters_forecast(df, period=7).collect()
    assert len(out) == 28  # forecasts start at day 8
    assert all(r.abs_err == pytest.approx(0.0, abs=1e-9) for r in out)


def test_holt_winters_python_replica(spark):
    """Bit-replay of the fold on an arbitrary series."""
    import datetime

    from valentinus_spark.operators import holt_winters_forecast

    base = datetime.datetime(2024, 3, 1)
    xs = [5.0, 8.0, 6.0, 9.0, 7.0, 11.0, 6.5, 7.2, 9.9, 6.1, 10.4, 8.8]
    rows = [(base + datetime.timedelta(days=d), xs[d]) for d in range(len(xs))]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = holt_winters_forecast(df, period=7).collect()

    m, aa, bb, gg = 7, 0.3, 0.1, 0.2
    level = xs[m - 1]
    trend = (xs[m - 1] - xs[0]) / (m - 1.0)
    seas = [xs[j] - level for j in range(m)]
    want = []
    for t in range(m, len(xs)):
        ph = t % m
        f = level + trend + seas[ph]
        x = xs[t]
        nl = aa * (x - seas[ph]) + 0.7 * (level + trend)
        nt = bb * (nl - level) + 0.9 * trend
        seas[ph] = gg * (x - nl) + 0.8 * seas[ph]
        level, trend = nl, nt
        want.append(round(f, 6))
    assert [r.forecast for r in out] == pytest.approx(want, abs=1e-9)


def test_holt_winters_too_short_empty(spark):
    import datetime

    from valentinus_spark.operators import holt_winters_forecast

    base = datetime.datetime(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=d), float(d)) for d in range(7)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    assert holt_winters_forecast(df, period=7).count() == 0


def test_conformal_interval_coverage_on_exchangeable_errors(spark):
    """Errors drawn from the same fixed cycle in both halves: q_hat is
    the 90% calibration order statistic and test coverage lands at the
    exact fraction of test errors <= q_hat (python replay)."""
    import datetime
    import math

    from valentinus_spark.operators import conformal_interval_eval

    base = datetime.date(2024, 1, 1)
    errs = [round(0.1 * ((i * 7) % 10 + 1), 6) for i in range(40)]
    rows = [
        (base + datetime.timedelta(days=i), errs[i]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["day", "abs_err"])
    r = conformal_interval_eval(df, "day", "abs_err", alpha=0.1).collect()[0]
    n_cal = 20
    k = math.ceil((n_cal + 1) * 0.9)
    q = sorted(errs[:n_cal])[k - 1]
    cov = sum(1 for e in errs[n_cal:] if e <= q) / 20
    assert (r.n_cal, r.n_test) == (20, 20)
    assert r.q_hat == pytest.approx(q, abs=1e-9)
    assert r.coverage == pytest.approx(round(cov, 6), abs=1e-9)


def test_conformal_interval_alpha_too_small_null(spark):
    """alpha so small the rank exceeds n_cal: q_hat undefined -> NULLs."""
    import datetime

    from valentinus_spark.operators import conformal_interval_eval

    base = datetime.date(2024, 1, 1)
    rows = [(base + datetime.timedelta(days=i), 1.0) for i in range(6)]
    df = spark.createDataFrame(rows, ["day", "abs_err"])
    r = conformal_interval_eval(df, "day", "abs_err", alpha=0.01).collect()[0]
    assert r.q_hat is None and r.coverage is None
