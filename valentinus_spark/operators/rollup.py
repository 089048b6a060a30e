"""Time-bucketed rollups (hypertable-style continuous aggregates).

The warehouse pattern behind "dashboard reads must not rescan 100 TB of
raw events": periodically materialize per-(bucket, key) partial
aggregates, then serve queries by MERGING the materialized partials with
a fresh aggregation of only the raw tail past the rollup's high-water
mark. Correct because the partials chosen here (count, sum, min, max)
are commutative monoids — re-aggregating partials equals aggregating raw
rows, which is exactly what the driver-contract oracle checks.

Scale shape: the rollup build is one windowed groupBy over the raw
range (map-side combine applies); the merged read touches only
|buckets × keys| rollup rows + the raw tail. Persist rollups partitioned
by bucket date so reads prune to the queried time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_AGGS = ("n", "sum_value", "min_value", "max_value")


def build_time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    grain: str = "1 hour",
) -> DataFrame:
    """Materializable partial aggregates per (time bucket, key):
    (bucket_start, key, n, sum/min/max of value). Persist the result
    (e.g. ``.write.partitionBy(to_date(bucket_start))``) and append new
    buckets incrementally as the watermark advances."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), grain)["start"].alias("bucket_start"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def merged_rollup(
    rollup: DataFrame,
    raw_tail: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    grain: str = "1 hour",
) -> DataFrame:
    """Serve the full time range: union the materialized rollup with a
    fresh rollup of the raw tail, then merge partials per (bucket, key).
    ``raw_tail`` must start exactly at the rollup's high-water mark (no
    overlap, no gap) — the caller owns that bookkeeping, typically via a
    watermark column stored with the rollup."""
    tail = build_time_rollup(raw_tail, ts_col, key_col, value_col, grain)
    return (
        rollup.select("bucket_start", "key", *ROLLUP_AGGS)
        .unionByName(tail.select("bucket_start", "key", *ROLLUP_AGGS))
        .groupBy("bucket_start", "key")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_us: int,
) -> DataFrame:
    """Regularize an irregular per-key time series: one row per key per
    ``interval_us`` tick between the key's first and last observation,
    carrying the last observed value at-or-before the tick
    (forward-fill). The resample+ffill step every downstream window
    model (moving averages, per-tick diffs, grid joins across series)
    assumes, done once as a declared transform instead of per-consumer.

    Ticks are aligned to the global epoch grid (floor(ts/interval)), so
    different keys' grids line up — joining two resampled series needs
    no further alignment. Within a tick the LAST observation wins, ties
    on equal ts resolved by the larger value for determinism.

    Output: (key_col, tick_us, value) with tick_us the grid timestamp.

    Scale shape: per-key span agg (combinable) → row-local sequence()
    explode materializes each key's grid (output-sized, bounded by
    span/interval — the consumer's own output; no cross-key blowup) →
    ONE window shuffle on key (grid rows + observations union-sorted,
    running last via ignoreNulls). Sparse-then-long-silent keys cost
    grid rows, which is inherent to the contract — pick interval_us per
    use, don't resample a years-idle key at millisecond grain."""
    from pyspark.sql import Window

    obs = events.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_v"),
    )
    spans = obs.groupBy("_k").agg(
        F.floor(F.min("_ts") / interval_us).alias("_t0"),
        F.floor(F.max("_ts") / interval_us).alias("_t1"),
    )
    # each grid row SORTS at its interval's end ((tick+1)·interval) and
    # BEFORE any observation at that exact instant, so the running last
    # picks up everything inside [tick, tick+interval) — pandas
    # resample().last().ffill() semantics
    grid = spans.select(
        "_k",
        F.explode(F.sequence(F.col("_t0"), F.col("_t1"))).alias("_tick"),
    ).select(
        "_k",
        F.col("_tick").alias("_tick"),
        ((F.col("_tick") + 1) * interval_us).alias("_sort_ts"),
        F.lit(None).cast(obs.schema["_v"].dataType).alias("_v"),
        F.lit(1).alias("_is_grid"),
    )
    merged = obs.select(
        "_k",
        F.lit(None).cast("long").alias("_tick"),
        F.col("_ts").alias("_sort_ts"),
        "_v",
        F.lit(0).alias("_is_grid"),
    ).unionByName(grid)
    w = (
        Window.partitionBy("_k")
        .orderBy("_sort_ts", F.desc("_is_grid"), "_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn("_fv", F.last("_v", ignorenulls=True).over(w))
    return filled.where(F.col("_is_grid") == 1).select(
        F.col("_k").alias(key_col),
        (F.col("_tick") * interval_us).alias("tick_us"),
        F.col("_fv").alias("value"),
    )


def trailing_anomaly(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    window: int = 20,
    min_obs: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window anomaly scores: each observation's z-score against
    the mean/std of its key's PREVIOUS ``window`` observations (the
    current row never sees itself — no self-masking). The streaming-shaped
    outlier monitor for metrics pipelines: "this user's value is 3σ off
    their own recent behavior", robust to global drift because every key
    is its own baseline.

    Adds ``n_obs`` (trailing count), ``trail_z`` (0.0 until ``min_obs``
    observations exist or when the trailing variance is ~0), and
    ``is_anomaly`` (|z| > threshold).

    Cross-engine determinism: values are cast to DECIMAL(18,6) before
    the window sums (window aggregation associativity differs between
    engines in the last ulp — the segment-tree vs re-scan problem), so
    sum and sum-of-squares are exact; the variance/z arithmetic then runs
    in one pinned double expression, rounded to 4.

    Scale shape: ONE window pass partitioned by key and ordered by
    (ts, tiebreak) — a single shuffle on the key, per-partition sort,
    O(1) state per row (rows-frame running sums). Hot keys pay an
    in-partition sort, the inherent cost of per-key ordered scans."""
    from pyspark.sql import Window

    if min_obs < 2:
        raise ValueError(f"min_obs must be >= 2 (variance needs it), got {min_obs}")
    # try_cast: ANSI cast(double AS decimal) already NULLs NaN but
    # RAISES on finite values past the decimal's range (|v| >= 1e12
    # here); try_cast folds both into the same excluded-from-sums
    # NULL class and is bit-identical for every in-range value
    v = F.col(value_col).try_cast("decimal(18,6)")
    # pin the window exchange's width explicitly (REPARTITION_BY_NUM —
    # AQE may not coalesce it): the per-row window arithmetic is
    # expensive relative to the row bytes, and AQE's size-based
    # coalescing otherwise funnels the whole pass through 2 tasks at
    # bench scale (stage profile: ~6 s of executor time on 2 tasks).
    # Width = max(cores, shuffle.partitions) so a real cluster's higher
    # shuffle setting is never reduced; the exchange itself was always
    # required by the window, only its width is pinned.
    spark = events.sparkSession
    par = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    events = events.repartition(par, key_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(-window, -1)
    )
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean_d = s.cast("double") / n
    var_d = (s2.cast("double") - s.cast("double") * s.cast("double") / n) / (n - 1)
    z = F.round(
        (F.col(value_col).try_cast("decimal(18,6)").cast("double") - mean_d)
        / F.sqrt(var_d),
        4,
    )
    # nested whens, NOT a single `&`: CASE branches evaluate lazily, so
    # var_d's (n-1) divisor and z's sqrt divisor are only reached when
    # their guards hold (ANSI mode errors on divide-by-zero otherwise)
    z_guarded = F.when(
        n >= min_obs, F.when(var_d > 1e-9, z).otherwise(F.lit(0.0))
    ).otherwise(F.lit(0.0))
    return (
        events.withColumn("n_obs", n)
        .withColumn("trail_z", z_guarded)
        .withColumn("is_anomaly", F.abs(F.col("trail_z")) > F.lit(threshold))
    )


def decayed_popularity(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str | None = None,
    half_life_days: int = 7,
) -> DataFrame:
    """Exponential time-decay popularity: per key,

        score = Σ_events value · 2^(−age_days / half_life)

    — the freshness-weighted aggregate behind trending-content ranking
    and recency-weighted sampling (yesterday's signal counts double
    last week's at half_life=7). ``value_col=None`` scores pure event
    counts. The reference time is the corpus max event DATE
    (data-derived, so the metric is reproducible from the table alone).

    Determinism contract: age buckets are integer DAYS (datediff —
    exact), the per-day decay weight is rounded to 12 decimals before
    use, and per-day value sums accumulate in DECIMAL(28,2) — so the
    only float work is ≤ max_age terms per key in the final fold, and
    the result replays bit-stable in ANSI SQL (same pin-the-
    accumulation pattern as pagerank's 9-decimal rounds).

    Returns (``key_col``, ``n_events``, ``decayed_score``) rounded to
    4, ordered by score desc then key.

    Scale shape: ONE (key, day) aggregate — map-side combined, key
    space |keys| × retention-days — then a key-sized fold; the
    reference date is a broadcast single-row aggregate. No windows, no
    per-event float math surviving the shuffle.
    """
    # try_cast: out-of-range finite doubles join NaN in the
    # excluded-NULL class instead of an ANSI raise (in-range identical)
    val = F.lit(1).cast("decimal(28,2)") if value_col is None else F.col(
        value_col
    ).try_cast("decimal(28,2)")
    base = events.select(
        F.col(key_col).alias("_k"), F.to_date(ts_col).alias("_d"), val.alias("_v")
    )
    daily = base.groupBy("_k", "_d").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_sv")
    )
    return decayed_popularity_from_daily(daily, key_col, half_life_days)


def decayed_popularity_from_daily(
    daily: DataFrame,
    key_col: str,
    half_life_days: int = 7,
) -> DataFrame:
    """Decay fold over an ALREADY-MATERIALIZED (``_k``, ``_d``, ``_n``,
    ``_sv``) daily table — the shared tail of :func:`decayed_popularity`
    and its streaming twin (streaming maintains the daily table as
    incremental state; the fold runs identically over either source, so
    the batch oracle gates the stream)."""
    ref = daily.agg(F.max("_d").alias("_ref"))
    aged = daily.crossJoin(F.broadcast(ref)).select(
        "_k",
        "_n",
        "_sv",
        F.datediff(F.col("_ref"), F.col("_d")).alias("_age"),
    )
    w = F.round(
        F.exp(-(F.log(F.lit(2.0)) / half_life_days) * F.col("_age")), 12
    )
    return (
        aged.groupBy("_k")
        .agg(
            F.sum("_n").alias("n_events"),
            F.round(F.sum(F.col("_sv").cast("double") * w), 4).alias(
                "decayed_score"
            ),
        )
        .select(F.col("_k").alias(key_col), "n_events", "decayed_score")
        .orderBy(F.desc("decayed_score"), key_col)
    )


def seasonal_naive_eval(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    season: int = 7,
    holdout_days: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast baseline + error report: predict each of
    the last ``holdout_days`` daily counts per key as the count
    ``season`` days earlier, and score MAE / RMSE / sMAPE against the
    actuals. This is THE baseline any fancy traffic/volume forecaster
    must beat — if a model can't beat copy-last-week, ship copy-last-
    week. Run it per ingest feed to catch weekly-seasonality breaks
    (a feed whose sMAPE jumps stopped being week-shaped).

    Missing days count 0 on both sides (a silent feed is data, not
    absence of data). Returns one row per key: (``key_col``,
    ``n_scored``, ``mae``, ``rmse``, ``smape``) rounded to 6, ordered
    by key; sMAPE terms with both sides 0 contribute 0.

    Scale shape: one (key, day) count aggregate (map-side combined,
    the only corpus-sized shuffle); the dense day grid is a
    broadcast-joined sequence spine (keys × days rows, tiny), the lag
    is one group-keyed window over that spine, and the error fold is
    key-sized. Exact integer counts end to end; floats only in the
    final error ratios.
    """
    from pyspark.sql import Window

    base = events.select(
        F.col(key_col).alias("_k"), F.to_date(ts_col).alias("_d")
    )
    daily = base.groupBy("_k", "_d").agg(F.count(F.lit(1)).alias("_n"))
    bounds = base.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    # dense (key, day) spine so missing days are explicit zeros
    keys = daily.select("_k").distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "_k", F.explode(F.sequence("_lo", "_hi")).alias("_d"), "_hi"
    )
    dense = spine.join(daily, ["_k", "_d"], "left").select(
        "_k",
        "_d",
        "_hi",
        F.coalesce("_n", F.lit(0)).alias("_n"),
    )
    w = Window.partitionBy("_k").orderBy("_d")
    scored = dense.select(
        "_k",
        "_d",
        "_hi",
        "_n",
        F.lag("_n", season).over(w).alias("_pred"),
    ).filter(
        F.col("_pred").isNotNull()
        & (F.datediff("_hi", "_d") < holdout_days)
    )
    err = F.col("_n").cast("double") - F.col("_pred").cast("double")
    denom = (F.col("_n") + F.col("_pred")).cast("double")
    smape_term = F.when(denom > 0, 2.0 * F.abs(err) / denom).otherwise(0.0)
    return (
        scored.groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.round(F.avg(F.abs(err)), 6).alias("mae"),
            F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
            F.round(F.avg(smape_term), 6).alias("smape"),
        )
        .select(F.col("_k").alias(key_col), "n_scored", "mae", "rmse", "smape")
        .orderBy(key_col)
    )


def acf_profile(
    events: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation function of the DAILY event volume at lags
    1..``max_lag`` — the seasonality fingerprint behind
    :func:`seasonal_naive_eval`'s season choice and
    :func:`trailing_anomaly`'s window choice (a 7-day spike in the ACF
    says the series is week-shaped; a flat ACF says trailing means are
    safe):

        r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²

    over the dense zero-filled day spine (missing days are real zeros,
    same stance as seasonal_naive_eval). Returns one row per lag:
    (``lag``, ``n_pairs``, ``acf``) rounded to 6, ordered by lag; acf
    NULL when the series is constant (zero variance) or shorter than
    the lag.

    Cross-engine determinism: x̄ is an exact-integer-sum / count double
    (identical in any engine); deviations round to 6 dp and the
    numerator/denominator accumulate as exact DECIMAL products — no
    float-sum order anywhere.

    Scale shape: ONE corpus-sized aggregate (daily counts, map-side
    combined); everything after runs on the day-spine (thousands of
    rows for years of data) — the lag alignment is a broadcast-sized
    equi-join of the spine against itself shifted by each lag, keyed on
    date, no window over raw data.
    """
    base = events.select(F.to_date(ts_col).alias("_d"))
    daily = base.groupBy("_d").agg(F.count(F.lit(1)).alias("_n"))
    bounds = base.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    spine = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    dense = spine.join(daily, "_d", "left").select(
        "_d", F.coalesce("_n", F.lit(0)).cast("bigint").alias("_x")
    )
    stats = dense.agg(
        F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_cnt")
    )
    # 18,6 keeps the product within Spark's 38-precision cap
    # (24,6 squared would exceed it and silently lose exactness)
    dec = "decimal(18,6)"
    dev = dense.crossJoin(F.broadcast(stats)).select(
        "_d",
        F.round(
            F.col("_x").cast("double")
            - F.col("_s").cast("double") / F.col("_cnt").cast("double"),
            6,
        )
        .cast(dec)
        .alias("_e"),
        "_cnt",
    )
    denom = dev.agg(
        F.sum(F.col("_e") * F.col("_e")).alias("_den"),
        F.first("_cnt").alias("_cnt"),
    )
    lags = dev.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    shifted = lags.crossJoin(dev.select(F.col("_d").alias("_dl"), F.col("_e").alias("_el")))
    pairs = (
        dev.join(
            shifted,
            F.expr("date_add(_dl, lag)") == F.col("_d"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("_e") * F.col("_el")).alias("_num"),
        )
    )
    return (
        lags.join(pairs, "lag", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            "lag",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.round(
                F.when(
                    (F.col("_den") > 0) & F.col("_num").isNotNull(),
                    F.col("_num").cast("double") / F.col("_den").cast("double"),
                ),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    k: float = 0.5,
    h: float = 5.0,
    baseline_days: int | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point monitor (Page 1954) over the DAILY
    mean of ``value_col`` — the classic sequential detector for slow
    mean drifts that per-day z-score alarms (trailing_anomaly) miss
    because no single day is extreme:

        z_d  = (x_d − μ) / σ            (standardized daily mean)
        S⁺_d = max(0, S⁺_{d−1} + z_d − k)
        S⁻_d = max(0, S⁻_{d−1} − z_d − k)     alarm when either > h

    k is the slack (in σ units; detects shifts > 2k), h the decision
    interval. μ/σ come from the first ``baseline_days`` days (the
    textbook in-control reference period) or, when None, the whole
    series — the retrospective form, where a shifted tail also pulls μ
    and the PRE-shift segment drifts the opposite CUSUM side (expected;
    use a baseline for prospective monitoring). Returns one row per
    day: (``day``, ``z``, ``cusum_pos``, ``cusum_neg``, ``alarm``),
    values rounded to 6, ordered by day.

    The recurrence is inherently sequential, so the fold runs as ONE
    Arrow-batched applyInPandas over the DAY SERIES — bounded by
    #days (monitoring granularity), never corpus rows; everything
    corpus-sized is the one (day) aggregate before it. Determinism:
    daily means and μ/σ are DECIMAL-summed and 9-dp-pinned, and the
    float recurrence performs the identical IEEE op sequence in both
    engines, so the DuckDB recursive-CTE replay is bit-for-bit.
    """
    import pandas as pd

    # try_cast: values past the (19,4) grid (|v| >= 1e15) and NaN both
    # quantize to NULL (excluded from the day sum) instead of an ANSI
    # raise; in-range values are bit-identical to cast
    dec = F.col(value_col).try_cast("decimal(19,4)").cast("decimal(38,8)")
    daily = events.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.round(
            F.sum(dec).cast("double") / F.count(F.lit(1)).cast("double"), 9
        ).alias("_x")
    )
    ref = daily
    if baseline_days is not None:
        lo = daily.agg(F.min("day").alias("_lo"))
        ref = daily.crossJoin(F.broadcast(lo)).filter(
            F.datediff("day", "_lo") < baseline_days
        )
    # (18,9)^2 = (37,18) stays under Spark's 38-digit cap, so the square
    # is EXACT; (20,9)^2 would be adjusted to (38,15), truncating three
    # decimal digits the oracle's native DECIMAL(38,18) product keeps.
    xs = F.col("_x").try_cast("decimal(18,9)")
    stats = ref.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xs).cast("double").alias("_s"),
        F.sum((xs * xs).cast("decimal(38,18)")).cast("double").alias("_ss"),
    )
    mu = F.round(F.col("_s") / F.col("_n"), 9)
    sig = F.round(
        F.sqrt(F.col("_ss") / F.col("_n") - (F.col("_s") / F.col("_n")) * (F.col("_s") / F.col("_n"))),
        9,
    )
    zs = (
        daily.crossJoin(F.broadcast(stats))
        .select(
            "day",
            F.when(sig > 0, F.round((F.col("_x") - mu) / sig, 9))
            .otherwise(0.0)
            .alias("z"),
        )
    )
    kk, hh = float(k), float(h)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        sp = sm = 0.0
        pos, neg = [], []
        for z in pdf["z"]:
            sp = max(0.0, sp + z - kk)
            sm = max(0.0, sm - z - kk)
            pos.append(sp)
            neg.append(sm)
        pdf["cusum_pos"] = pos
        pdf["cusum_neg"] = neg
        return pdf[["day", "z", "cusum_pos", "cusum_neg"]]

    folded = (
        zs.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(fold, schema="day date, z double, cusum_pos double, cusum_neg double")
    )
    return folded.select(
        "day",
        "z",
        F.round("cusum_pos", 6).alias("cusum_pos"),
        F.round("cusum_neg", 6).alias("cusum_neg"),
        (
            (F.round("cusum_pos", 6) > hh) | (F.round("cusum_neg", 6) > hh)
        ).alias("alarm"),
    ).orderBy("day")


def _daily_mean(events: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """(day, _x) daily means of ``value_col`` with the cusum discipline:
    DECIMAL(38,8)-exact daily sums (order-free), one double division,
    9-dp pin — the shared deterministic input for every day-series
    monitor below."""
    # try_cast: values past the (19,4) grid (|v| >= 1e15) and NaN both
    # quantize to NULL (excluded from the day sum) instead of an ANSI
    # raise; in-range values are bit-identical to cast
    dec = F.col(value_col).try_cast("decimal(19,4)").cast("decimal(38,8)")
    return events.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.round(
            F.sum(dec).cast("double") / F.count(F.lit(1)).cast("double"), 9
        ).alias("_x")
    )


def mann_kendall_trend(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Mann-Kendall monotonic-trend test (Mann 1945, Kendall 1975) over
    the daily mean of ``value_col`` — the standard non-parametric "is
    this series drifting" gate (no normality or linearity assumption;
    robust to the heavy-tailed event values a z-test chokes on). The
    reference engine has no statistics at all (SURVEY.md §2.4) — this is
    training-pipeline monitoring surface next to cusum_changepoint.

        S    = Σ_{i<j} sign(x_j − x_i)           (exact integer)
        varS = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (tie-corrected)
        z    = (S∓1)/√varS,  p = 2·(1−Φ(|z|)),  τ = S / (n(n−1)/2)

    Returns ONE row: (``n_days``, ``s_stat``, ``var_s``, ``z``,
    ``p_value``, ``tau``) — z/p NULL when n < 2 or varS = 0.

    Determinism: sign comparisons run on DECIMAL(18,9) copies of the
    9-dp-pinned daily means (exact, no float subtraction), S and the
    tie term are integers, and the only floats are the final √/Φ —
    replayed by the identical A&S 26.2.17 polynomial in the oracle.

    Scale shape: the corpus-sized work is the one daily-mean aggregate;
    the pair join is day-granularity (n² over #days — monitoring
    cadence, ~130k pairs for a year of minutes-level data).
    """
    from valentinus_spark.operators.experiment import two_sided_p

    d = _daily_mean(events, ts_col, value_col).select(
        "day", F.col("_x").try_cast("decimal(18,9)").alias("_v")
    )
    a = d.select(F.col("day").alias("_da"), F.col("_v").alias("_va"))
    b = d.select(F.col("day").alias("_db"), F.col("_v").alias("_vb"))
    s = (
        a.join(b, F.col("_da") < F.col("_db"))
        .agg(
            F.sum(
                F.when(F.col("_vb") > F.col("_va"), 1)
                .when(F.col("_vb") < F.col("_va"), -1)
                .otherwise(0)
            ).alias("s_stat"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .select(F.coalesce("s_stat", F.lit(0)).alias("s_stat"), "n_pairs")
    )
    nn = d.agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        d.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
                ),
                F.lit(0),
            ).alias("_tie")
        )
    )
    j = nn.crossJoin(s).crossJoin(ties)
    n = F.col("n_days").cast("double")
    var_s = (
        n * (n - 1.0) * (2.0 * n + 5.0) - F.col("_tie").cast("double")
    ) / 18.0
    ss = F.col("s_stat").cast("double")
    z = F.when(
        (F.col("n_days") >= 2) & (var_s > 0),
        F.when(ss > 0, (ss - 1.0) / F.sqrt(var_s))
        .when(ss < 0, (ss + 1.0) / F.sqrt(var_s))
        .otherwise(0.0),
    )
    tau = F.when(
        F.col("n_days") >= 2,
        ss / (n * (n - 1.0) / 2.0),
    )
    return j.select(
        "n_days",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
        F.round(tau, 6).alias("tau"),
    )


def theil_sen_trend(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Theil-Sen slope estimator (Theil 1950, Sen 1968) over the daily
    mean series — the robust companion to mann_kendall_trend: the
    MEDIAN of all pairwise slopes tolerates up to ~29% outlier days
    where OLS (event_did-style fits) is dragged by a single bad feed
    day. Returns ONE row: (``n_days``, ``n_pairs``, ``slope``,
    ``intercept``) rounded to 6 — slope per day, intercept the median
    of (x_i − slope·t_i) (t = days since the first day), the standard
    robust-line pairing.

    Determinism: pairwise slopes are (exact DECIMAL difference of the
    9-dp daily means) / (exact integer day gap), 9-dp-pinned; the
    median picks rank ⌊(c+1)/2⌋ and ⌊c/2⌋+1 of the ROUNDED slopes
    (ordered slope, then day pair — both engines cut the same ranks)
    and averages them, so odd counts are exact and even counts share
    one IEEE add/divide. Residual median mirrors the same convention.

    Scale shape: identical to mann_kendall_trend — one corpus-sized
    daily aggregate, then day-granularity pair work.
    """
    from pyspark.sql import Window

    d0 = _daily_mean(events, ts_col, value_col)
    lo = d0.agg(F.min("day").alias("_lo"))
    d = d0.crossJoin(F.broadcast(lo)).select(
        F.datediff("day", "_lo").cast("long").alias("_t"),
        F.col("_x").try_cast("decimal(18,9)").alias("_v"),
    )
    a = d.select(F.col("_t").alias("_ta"), F.col("_v").alias("_va"))
    b = d.select(F.col("_t").alias("_tb"), F.col("_v").alias("_vb"))
    slopes = (
        a.join(b, F.col("_ta") < F.col("_tb"))
        .select(
            "_ta",
            "_tb",
            F.round(
                (F.col("_vb") - F.col("_va")).cast("double")
                / (F.col("_tb") - F.col("_ta")).cast("double"),
                9,
            ).alias("_s"),
        )
    )
    w = Window.orderBy("_s", "_ta", "_tb")
    ranked = slopes.withColumn("_rn", F.row_number().over(w))
    cnt = slopes.agg(F.count(F.lit(1)).alias("n_pairs"))
    med = (
        ranked.crossJoin(F.broadcast(cnt))
        .filter(
            (F.col("_rn") == F.floor((F.col("n_pairs") + 1) / 2))
            | (F.col("_rn") == F.floor(F.col("n_pairs") / 2) + 1)
        )
        .agg(
            F.round(F.avg("_s"), 9).alias("slope"),
            F.max("n_pairs").alias("n_pairs"),
        )
    )
    resid = d.crossJoin(F.broadcast(med)).select(
        "n_pairs",
        "slope",
        F.round(
            F.col("_v").cast("double") - F.col("slope") * F.col("_t").cast("double"),
            9,
        ).alias("_r"),
        F.col("_t"),
    )
    wr = Window.orderBy("_r", "_t")
    nn = d.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        resid.withColumn("_rn", F.row_number().over(wr))
        .crossJoin(F.broadcast(nn))
        .filter(
            (F.col("_rn") == F.floor((F.col("n_days") + 1) / 2))
            | (F.col("_rn") == F.floor(F.col("n_days") / 2) + 1)
        )
        .agg(
            F.max("n_days").alias("n_days"),
            F.max("n_pairs").alias("n_pairs"),
            F.round(F.max("slope"), 6).alias("slope"),
            F.round(F.avg("_r"), 6).alias("intercept"),
        )
    )


def page_hinkley(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    delta: float = 0.005,
    lam: float = 3.0,
) -> DataFrame:
    """Page-Hinkley drift monitor (Page 1954; the streaming-ML standard
    per Gama et al. 2014) over the daily mean series — the
    running-mean-referenced cousin of cusum_changepoint: it needs NO
    precomputed μ/σ (the reference mean updates online), which is the
    form a forward-only monitor over an unbounded stream actually runs.

        mean_t = (x_1 + … + x_t) / t
        m⁺_t   = m⁺_{t−1} + (x_t − mean_t − δ);  PH⁺_t = m⁺_t − min_{i≤t} m⁺_i
        m⁻_t   = m⁻_{t−1} + (x_t − mean_t + δ);  PH⁻_t = max_{i≤t} m⁻_i − m⁻_t

    Alarm when either PH exceeds ``lam``. Returns one row per day:
    (``day``, ``x``, ``ph_inc``, ``ph_dec``, ``alarm``), PH values
    rounded to 6, ordered by day.

    Determinism: daily means are DECIMAL-summed and 9-dp-pinned
    (``_daily_mean``); the fold itself performs the identical IEEE op
    sequence in day order in both engines (same discipline as
    cusum_changepoint — no intra-fold rounding, outputs rounded once at
    the end), so a DuckDB recursive-CTE replay is bit-for-bit.

    Scale shape: one corpus-sized daily aggregate; the inherently
    sequential fold runs as ONE Arrow-batched applyInPandas over the
    DAY SERIES (#days rows — monitoring granularity, not row
    granularity).
    """
    import pandas as pd

    daily = _daily_mean(events, ts_col, value_col)
    dd, ll = float(delta), float(lam)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        s = 0.0
        m_inc = m_dec = 0.0
        min_inc = max_dec = 0.0
        inc, dec = [], []
        for t, x in enumerate(pdf["_x"], start=1):
            s += x
            mean = s / t
            m_inc += x - mean - dd
            m_dec += x - mean + dd
            min_inc = min(min_inc, m_inc)
            max_dec = max(max_dec, m_dec)
            inc.append(m_inc - min_inc)
            dec.append(max_dec - m_dec)
        pdf["ph_inc"] = inc
        pdf["ph_dec"] = dec
        return pdf[["day", "_x", "ph_inc", "ph_dec"]]

    folded = (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            fold, schema="day date, _x double, ph_inc double, ph_dec double"
        )
    )
    return folded.select(
        "day",
        F.col("_x").alias("x"),
        F.round("ph_inc", 6).alias("ph_inc"),
        F.round("ph_dec", 6).alias("ph_dec"),
        (
            (F.round("ph_inc", 6) > ll) | (F.round("ph_dec", 6) > ll)
        ).alias("alarm"),
    ).orderBy("day")


def holt_linear_forecast(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing (Holt 1957) over the
    daily mean series, evaluated one-step-ahead — the level+trend
    baseline that sits between seasonal_naive_eval (pure copy) and a
    real forecaster: if a model can't beat Holt, ship Holt.

        f_t = l_{t−1} + b_{t−1}                     (one-step forecast)
        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        l_1 = x_1,  b_1 = x_2 − x_1   (standard two-point init)

    Returns one row per day from the second day on: (``day``, ``x``,
    ``forecast``, ``abs_err``) rounded to 6, ordered by day (the first
    forecastable day scores x_2 against f_2 = x_1 + b_1 = x_2 only when
    the init is exact — kept, as the textbook does, so the output is a
    pure function of the series). Fewer than 2 days → empty result.

    Determinism: 9-dp daily means in, identical IEEE fold order both
    engines (cusum/page_hinkley discipline — no intra-fold rounding),
    outputs rounded once; replayed in a DuckDB recursive CTE carrying
    (l, b).

    Scale shape: one corpus-sized daily aggregate + a day-series
    applyInPandas fold, same as page_hinkley.
    """
    import pandas as pd

    daily = _daily_mean(events, ts_col, value_col)
    aa, bb = float(alpha), float(beta)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        if len(pdf) < 2:
            return pdf.iloc[0:0].assign(forecast=[], abs_err=[])[
                ["day", "_x", "forecast", "abs_err"]
            ]
        xs = list(pdf["_x"])
        level = xs[0]
        trend = xs[1] - xs[0]
        days, vals, fcs, errs = [], [], [], []
        for t in range(1, len(xs)):
            f = level + trend
            x = xs[t]
            new_level = aa * x + (1.0 - aa) * (level + trend)
            trend = bb * (new_level - level) + (1.0 - bb) * trend
            level = new_level
            days.append(pdf["day"].iloc[t])
            vals.append(x)
            fcs.append(f)
            errs.append(abs(x - f))
        return pd.DataFrame(
            {"day": days, "_x": vals, "forecast": fcs, "abs_err": errs}
        )

    folded = (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            fold, schema="day date, _x double, forecast double, abs_err double"
        )
    )
    return folded.select(
        "day",
        F.col("_x").alias("x"),
        F.round("forecast", 6).alias("forecast"),
        F.round("abs_err", 6).alias("abs_err"),
    ).orderBy("day")


def ewma_chart(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    lam: float = 0.2,
    L: float = 3.0,
) -> DataFrame:
    """EWMA control chart (Roberts 1959; the SPC standard for small
    sustained shifts) over the daily mean series: exponentially
    weighted mean vs time-varying control limits

        e_t   = λ·x_t + (1−λ)·e_{t−1},   e_0 = μ
        UCL_t = μ + L·σ·√(λ/(2−λ)·(1 − (1−λ)^{2t}))

    — the limits widen toward their asymptote as the EWMA "warms up",
    which is what makes the chart valid from day 1 (a fixed-limit
    z-chart over-alarms early). μ/σ are the retrospective full-series
    moments (cusum_changepoint's convention). Returns one row per day:
    (``day``, ``x``, ``ewma``, ``lcl``, ``ucl``, ``alarm``), rounded
    to 6, ordered by day.

    Determinism: daily means DECIMAL-summed and 9-dp-pinned; μ/σ 9-dp;
    the fold carries (e, p) where p_t = p_{t−1}·(1−λ)² — the power term
    as pure multiplication, NOT libm pow, so the recursion replays
    bit-for-bit (pow(0.8, 2t) is not guaranteed identically rounded
    across libms; a product chain is). λ-derived constants are
    computed once in Python and inlined into the oracle at full
    precision.

    Scale shape: one corpus-sized daily aggregate + a day-series
    applyInPandas fold (the cusum shape).
    """
    import pandas as pd

    daily = _daily_mean(events, ts_col, value_col)
    # retrospective mu/sigma, cusum discipline
    xs_dec = F.col("_x").try_cast("decimal(20,9)")
    stats = daily.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xs_dec).cast("double").alias("_s"),
        F.sum((xs_dec.try_cast("decimal(18,9)") * xs_dec.try_cast("decimal(18,9)")).cast("decimal(38,18)"))
        .cast("double")
        .alias("_ss"),
    )
    ms = stats.select(
        F.round(F.col("_s") / F.col("_n"), 9).alias("_mu"),
        F.round(
            F.sqrt(F.col("_ss") / F.col("_n") - (F.col("_s") / F.col("_n")) * (F.col("_s") / F.col("_n"))),
            9,
        ).alias("_sig"),
    )
    ll = float(lam)
    oml = 1.0 - ll
    oml2 = oml * oml
    lfac = ll / (2.0 - ll)
    big_l = float(L)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values("day").reset_index(drop=True)
        mu = float(pdf["_mu"].iloc[0])
        sig = float(pdf["_sig"].iloc[0])
        e, p = mu, 1.0
        ew, up, lo = [], [], []
        for x in pdf["_x"]:
            e = ll * x + oml * e
            p = p * oml2
            # math.sqrt, not **0.5: pow(x, 0.5) is not guaranteed
            # correctly rounded by every libm; sqrt is (IEEE 754), so
            # SQL SQRT replays it exactly
            half = big_l * sig * math.sqrt(lfac * (1.0 - p))
            ew.append(e)
            up.append(mu + half)
            lo.append(mu - half)
        pdf["ewma"] = ew
        pdf["ucl"] = up
        pdf["lcl"] = lo
        return pdf[["day", "_x", "ewma", "lcl", "ucl"]]

    folded = (
        daily.crossJoin(F.broadcast(ms))
        .withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            fold,
            schema="day date, _x double, ewma double, lcl double, ucl double",
        )
    )
    return folded.select(
        "day",
        F.col("_x").alias("x"),
        F.round("ewma", 6).alias("ewma"),
        F.round("lcl", 6).alias("lcl"),
        F.round("ucl", 6).alias("ucl"),
        (
            (F.round("ewma", 6) > F.round("ucl", 6))
            | (F.round("ewma", 6) < F.round("lcl", 6))
        ).alias("alarm"),
    ).orderBy("day")


def seasonal_decompose(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method every STL variant starts from) of the daily mean series:

        trend_t    = centered MA over ``period`` rows (NULL at edges)
        seasonal_w = mean of (x − trend) per weekday slot, re-centered
                     to sum to zero
        remainder  = x − trend − seasonal

    — the three-panel view that separates "traffic is growing" from
    "it's just Saturday" from "something actually happened". Returns
    one row per day: (``day``, ``x``, ``trend``, ``seasonal``,
    ``remainder``) rounded to 6 (trend/remainder NULL on the first/last
    ⌊period/2⌋ rows), ordered by day.

    Seasonal slots index by (row position mod period) over the
    day-ordered series, so a gap day shifts phase rather than breaking
    the decomposition (events tables have dense days; for sparse
    series resample first — resample_ffill).

    Determinism: the centered-MA window sums DECIMAL(18,9) values
    (window association differs between engines in the last ulp), slot
    means and the re-centering grand mean are DECIMAL-summed, and every
    intermediate is 9-dp-pinned before the final 6-dp rounding.

    Scale shape: one corpus-sized daily aggregate; the MA window, slot
    means, and output all run on the day series.
    """
    from pyspark.sql import Window

    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    half = period // 2
    daily = _daily_mean(events, ts_col, value_col)
    w_ord = Window.orderBy("day")
    wma = w_ord.rowsBetween(-half, period - half - 1)
    base = daily.select(
        "day",
        "_x",
        ((F.row_number().over(w_ord) - 1) % period).alias("_slot"),
        F.sum(F.col("_x").try_cast("decimal(18,9)")).over(wma).alias("_wsum"),
        F.count(F.lit(1)).over(wma).alias("_wn"),
    ).select(
        "day",
        "_x",
        "_slot",
        F.when(
            F.col("_wn") == period,
            F.round(F.col("_wsum").cast("double") / float(period), 9),
        ).alias("_trend"),
    )
    detr = base.withColumn(
        "_d",
        F.when(
            F.col("_trend").isNotNull(),
            F.round(F.col("_x") - F.col("_trend"), 9),
        ),
    )
    slots = detr.filter(F.col("_d").isNotNull()).groupBy("_slot").agg(
        F.round(
            F.sum(F.col("_d").try_cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("_sw")
    )
    grand = slots.agg(
        F.round(
            F.sum(F.col("_sw").try_cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("_grand")
    )
    seas = slots.crossJoin(F.broadcast(grand)).select(
        "_slot", F.round(F.col("_sw") - F.col("_grand"), 9).alias("_seas")
    )
    return (
        detr.join(F.broadcast(seas), "_slot", "left")
        .select(
            "day",
            F.col("_x").alias("x"),
            F.round("_trend", 6).alias("trend"),
            F.round("_seas", 6).alias("seasonal"),
            F.round(F.col("_d") - F.col("_seas"), 6).alias("remainder"),
        )
        .orderBy("day")
    )


def ljung_box(
    events: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 10,
) -> DataFrame:
    """Ljung-Box portmanteau test (1978) — "is there ANY
    autocorrelation in the first m lags", the one-number summary of
    :func:`acf_profile` (which it composes directly — same spine,
    same r_k):

        Q = n(n+2) Σ_{k=1..m} r_k² / (n−k)

    Q ~ χ²(m) under the white-noise null; a seasonal or trending daily
    series sends Q far past the table value. Returns ONE row:
    (``n_days``, ``max_lag``, ``q_stat``, ``dof``) — q NULL when the
    series is constant (acf undefined) or shorter than max_lag+1.

    Determinism: r_k are acf_profile's 6-dp-rounded values (exact
    DECIMAL numerators/denominator inside); each r_k²/(n−k) term is
    12-dp-rounded and DECIMAL-summed, so lag order cannot move Q; the
    final n(n+2)·Σ product is one float multiply.

    Scale shape: inherits acf_profile's — one corpus aggregate, then
    day-spine-sized joins; the Q fold is max_lag rows.
    """
    acf = acf_profile(events, ts_col=ts_col, max_lag=max_lag)
    term = F.round(
        F.col("acf") * F.col("acf") / F.col("n_pairs").cast("double"), 12
    ).cast("decimal(28,12)")
    agg = acf.agg(
        F.max(
            F.when(F.col("n_pairs") > 0, F.col("n_pairs") + F.col("lag"))
        ).alias("n_days"),
        F.count(F.lit(1)).alias("max_lag"),
        F.min(F.when(F.col("acf").isNull(), 1).otherwise(0)).alias("_any_null"),
        F.min("n_pairs").alias("_min_pairs"),
        F.sum(F.when(F.col("acf").isNotNull(), term)).cast("double").alias("_s"),
    )
    nn = F.col("n_days").cast("double")
    q = F.when(
        (F.col("_any_null") == 0) & (F.col("_min_pairs") > 0),
        nn * (nn + 2.0) * F.col("_s"),
    )
    return agg.select(
        "n_days",
        "max_lag",
        F.round(q, 6).alias("q_stat"),
        F.col("max_lag").alias("dof"),
    )


def seasonal_mann_kendall(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    period_col_fn=None,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984) over the
    daily mean of ``value_col`` — :func:`mann_kendall_trend` restricted
    to WITHIN-season pair comparisons (default seasons: day-of-week),
    so a strong weekly cycle cannot masquerade as (or mask) a trend:
    Mondays are only compared with later Mondays, etc.

        S = Σ_g S_g,   Var = Σ_g varS_g (tie-corrected per season),
        z = (S∓1)/√Var

    Returns ONE row: (``n_days``, ``n_seasons``, ``s_stat``, ``var_s``,
    ``z``, ``p_value``) — z/p NULL when Var = 0.

    Determinism: the mann_kendall discipline per season — sign
    comparisons on DECIMAL(18,9) copies of 9-dp-pinned daily means,
    integer S and tie terms, floats only in the final √/Φ.

    Scale shape: same as mann_kendall_trend with the pair join keyed on
    the season (pairs = Σ_g (n_g choose 2) ≈ n²/2k instead of n²/2 —
    CHEAPER than the unrestricted test); corpus-sized work is the one
    daily-mean aggregate.
    """
    from valentinus_spark.operators.experiment import two_sided_p

    d = _daily_mean(events, ts_col, value_col).select(
        "day", F.col("_x").try_cast("decimal(18,9)").alias("_v")
    )
    season = (
        period_col_fn(F.col("day"))
        if period_col_fn is not None
        else F.dayofweek(F.col("day"))
    )
    d = d.select("day", "_v", season.alias("_g"))
    a = d.select(
        F.col("_g"), F.col("day").alias("_da"), F.col("_v").alias("_va")
    )
    b = d.select(
        F.col("_g").alias("_gb"),
        F.col("day").alias("_db"),
        F.col("_v").alias("_vb"),
    )
    s = (
        a.join(b, (F.col("_g") == F.col("_gb")) & (F.col("_da") < F.col("_db")))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("_vb") > F.col("_va"), 1)
                    .when(F.col("_vb") < F.col("_va"), -1)
                    .otherwise(0)
                ),
                F.lit(0),
            ).alias("s_stat")
        )
    )
    counts = d.groupBy("_g").agg(F.count(F.lit(1)).alias("_ng"))
    ties = (
        d.groupBy("_g", "_v")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy("_g")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
                ),
                F.lit(0),
            ).alias("_tie")
        )
    )
    pers = counts.join(ties, "_g")
    ng = F.col("_ng").cast("double")
    var_g = F.round(
        (ng * (ng - 1.0) * (2.0 * ng + 5.0) - F.col("_tie").cast("double"))
        / 18.0,
        9,
    )
    tot = pers.agg(
        F.sum("_ng").alias("n_days"),
        F.count(F.lit(1)).alias("n_seasons"),
        F.sum(var_g.cast("decimal(28,9)")).cast("double").alias("_var"),
    )
    j = tot.crossJoin(s)
    ss = F.col("s_stat").cast("double")
    z = F.when(
        F.col("_var") > 0,
        F.when(ss > 0, (ss - 1.0) / F.sqrt(F.col("_var")))
        .when(ss < 0, (ss + 1.0) / F.sqrt(F.col("_var")))
        .otherwise(0.0),
    )
    return j.select(
        "n_days",
        "n_seasons",
        "s_stat",
        F.round(F.col("_var"), 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def holt_winters_forecast(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing (Winters
    1960) over the daily mean series, one-step-ahead — the seasonal
    completion of the forecasting ladder: seasonal_naive (copy) →
    holt_linear (level+trend) → THIS (level+trend+seasonal state):

        f_t = l_{t−1} + b_{t−1} + s_{t−p}
        l_t = α(x_t − s_{t−p}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ(x_t − l_t) + (1−γ)·s_{t−p}

    Init (sum-free so the fold is bit-replayable without controlling
    any aggregate's accumulation order): l = x_p, b = (x_p − x_1)/(p−1),
    s_j = x_j − l for the first period — the "simple" init, documented
    so the oracle carries the identical recursion. Forecasts start at
    day p+1; fewer than p+1 days → empty result.

    Determinism: 9-dp daily means in, identical IEEE op order in the
    pandas fold and the DuckDB recursive CTE (which carries the
    seasonal state as a LIST column), Python-computed smoothing
    constants inlined into the SQL by repr (the holt/ewma convention);
    outputs rounded once at the end.

    Scale shape: one corpus-sized daily aggregate + a day-series
    applyInPandas fold (bounded by the spine), same as
    holt_linear_forecast.
    """
    import pandas as pd

    daily = _daily_mean(events, ts_col, value_col)
    aa, bb, gg = float(alpha), float(beta), float(gamma)
    ca, cb, cg = 1.0 - aa, 1.0 - bb, 1.0 - gg
    m = int(period)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        if len(pdf) < m + 1:
            return pdf.iloc[0:0].assign(forecast=[], abs_err=[])[
                ["day", "_x", "forecast", "abs_err"]
            ]
        xs = list(pdf["_x"])
        level = xs[m - 1]
        trend = (xs[m - 1] - xs[0]) / (m - 1.0)
        seas = [xs[j] - level for j in range(m)]
        days, vals, fcs, errs = [], [], [], []
        for t in range(m, len(xs)):
            ph = t % m
            f = level + trend + seas[ph]
            x = xs[t]
            new_level = aa * (x - seas[ph]) + ca * (level + trend)
            new_trend = bb * (new_level - level) + cb * trend
            seas[ph] = gg * (x - new_level) + cg * seas[ph]
            level, trend = new_level, new_trend
            days.append(pdf["day"].iloc[t])
            vals.append(x)
            fcs.append(f)
            errs.append(abs(x - f))
        return pd.DataFrame(
            {"day": days, "_x": vals, "forecast": fcs, "abs_err": errs}
        )

    folded = (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            fold, schema="day date, _x double, forecast double, abs_err double"
        )
    )
    return folded.select(
        "day",
        F.col("_x").alias("x"),
        F.round("forecast", 6).alias("forecast"),
        F.round("abs_err", 6).alias("abs_err"),
    ).orderBy("day")


def conformal_interval_eval(
    scored: DataFrame,
    order_col: str = "day",
    err_col: str = "abs_err",
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal one-step interval calibration (Vovk 2005;
    Papadopoulos 2002) over a forecaster's absolute errors: the first
    half of the series (by ``order_col``) is the calibration set, the
    second half the test set; the interval half-width is the standard
    conformal quantile

        q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest calibration |error|

    and the readout is empirical test coverage of ``forecast ± q̂`` —
    the distribution-free guarantee says coverage ≥ 1−α up to
    exchangeability drift, so a coverage collapse IS the drift alarm.
    Returns ONE row: (``n_cal``, ``n_test``, ``q_hat``, ``n_covered``,
    ``coverage``) — q/coverage NULL when either split is empty or the
    rank exceeds n_cal (α too small for the calibration size).

    Determinism: the split is an exact row_number threshold; q̂ is an
    exact order statistic on the (already-rounded) error grid; coverage
    is an integer ratio.

    Scale shape: the input is a forecaster's day-spine output — one
    bounded ordered window + two one-row aggregates.
    """
    import math

    from pyspark.sql import Window

    base = scored.filter(
        F.col(err_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(F.col(order_col).alias("_o"), F.col(err_col).alias("_e"))
    w = Window.orderBy("_o")
    tot = base.count()
    n_cal = tot // 2
    ranked = base.select(
        "_e", F.row_number().over(w).alias("_rn")
    )
    cal = ranked.filter(F.col("_rn") <= n_cal)
    test = ranked.filter(F.col("_rn") > n_cal)
    k = int(math.ceil((n_cal + 1) * (1.0 - float(alpha)))) if n_cal else 0
    we = Window.orderBy("_e", "_rn")
    qdf = (
        cal.select("_e", F.row_number().over(we).alias("_er"))
        .filter(F.col("_er") == k)
        .select(F.col("_e").alias("q_hat"))
    )
    stats = test.agg(F.count(F.lit(1)).alias("n_test"))
    j = stats.crossJoin(
        qdf.agg(F.max("q_hat").alias("q_hat"))
    )
    covered = (
        test.crossJoin(F.broadcast(qdf.agg(F.max("q_hat").alias("_q"))))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_q").isNotNull() & (F.col("_e") <= F.col("_q")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_covered")
        )
    )
    out = j.crossJoin(covered)
    return out.select(
        F.lit(n_cal).cast("long").alias("n_cal"),
        F.col("n_test").cast("long").alias("n_test"),
        F.round(F.col("q_hat"), 6).alias("q_hat"),
        F.col("n_covered").cast("long").alias("n_covered"),
        F.round(
            F.when(
                (F.col("n_test") > 0) & F.col("q_hat").isNotNull(),
                F.col("n_covered").cast("double")
                / F.col("n_test").cast("double"),
            ),
            6,
        ).alias("coverage"),
    )
