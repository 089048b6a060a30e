"""Event-sequence analytics: funnel conversion and cohort retention.

The reference has no event analytics at all (SURVEY.md §2.4); these are
the two standard product-analytics shapes over the events table, built
as plain aggregates/joins so Catalyst keys every shuffle on the user id
— the same partitioning end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from valentinus_spark.functions.util import ensure_parallelism

# rfm_segments: customer frames at or below this row count run the three
# global NTILE windows in one sort task; above it the two-phase
# distributed-rank device takes over. MEASURED crossover, not borrowed:
# tools/exp_rfm_crossover.py (local[32], interleaved arms) — window/device
# seconds 0.8/3.1 at 150k, 4.4/4.4 at 1M, 8.4/6.6 at 2M, 19.3/8.0 at 4M,
# 42.7/13.1 at 8M. The two shapes are bit-identical (total ordering), so
# the gate affects plan shape only, never results.
_RFM_WINDOW_ROWS = 1_000_000


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Ordered funnel: how many users performed step 1, then step 2
    STRICTLY AFTER their first step 1, then step 3 after that, … (the
    classic min-time chaining semantics). Output: (step_no, step,
    n_users), one row per step.

    Plan: per step, filter + min-aggregate keyed on the user, then an
    equi-join to the previous frontier — every shuffle in the chain is
    keyed on ``user_col``, so the exchanges reuse one partitioning. Each
    frontier is checkpointed: step k's plan would otherwise re-execute
    steps 1..k-1 once per downstream union branch."""
    if not steps:
        raise ValueError("steps must be non-empty")
    frontier: DataFrame | None = None
    per_step: list[DataFrame] = []
    ev = ensure_parallelism(events)
    for i, step in enumerate(steps):
        stage = ev.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("_t")
        )
        if frontier is None:
            frontier = stage.groupBy(user_col).agg(F.min("_t").alias("_t_prev"))
        else:
            frontier = (
                stage.join(frontier, user_col)
                .filter(F.col("_t") > F.col("_t_prev"))
                .groupBy(user_col)
                .agg(F.min("_t").alias("_t_prev"))
            )
        frontier = frontier.localCheckpoint()
        per_step.append(
            frontier.select(
                F.lit(i + 1).alias("step_no"),
                F.lit(step).alias("step"),
                F.col(user_col),
            )
        )
    out = per_step[0]
    for s in per_step[1:]:
        out = out.union(s)
    counts = out.groupBy("step_no", "step").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    # constant step spine: a step nobody reached still gets its row
    # (n_users = 0) — the funnel's cliff must be visible, not absent
    spine = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_no int, step string"
    )
    return spine.join(F.broadcast(counts), ["step_no", "step"], "left").select(
        "step_no",
        "step",
        F.coalesce("n_users", F.lit(0).cast("bigint")).alias("n_users"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    day_us: int = 86_400_000_000,
) -> DataFrame:
    """Cohort × day-offset retention: users grouped by their first active
    day, counted on each later day they return. Output: (cohort_day,
    day_offset, n_users) with day numbers as integer day indexes
    (ts div day_us) — integer division so any engine draws the same day
    boundaries.

    Plan: distinct (user, day) — a map-side-combined aggregate that
    collapses the event stream to at most users × days rows — then the
    per-user min for the cohort, a user-keyed join back, and the final
    tiny (cohort, offset) aggregate. (user, day) rows are unique, so the
    final count needs no distinct."""
    days = (
        ensure_parallelism(events)
        .select(user_col, F.expr(f"{ts_col} div {day_us}").alias("_day"))
        .distinct()
    )
    first = days.groupBy(user_col).agg(F.min("_day").alias("cohort_day"))
    return (
        days.join(first, user_col)
        .select(
            "cohort_day",
            (F.col("_day") - F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def debounce_events(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Session-gap debounce: keep only events that START a gap-island —
    rows whose predecessor (same key, ordered by ``ts_col`` then
    ``order_cols``) is more than ``gap`` time units away, plus each
    key's first event. The standard duplicate-click / retry-storm
    suppressor for event pipelines; equivalently, the first event of
    every session at this gap.

    ``ts_col`` should be an integer time column (e.g. the µs ``ts_us``
    from the events normalizer) so the gap arithmetic is exact. ONE
    shuffle keyed on the event key; the lag window reuses that
    partitioning."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    return (
        df.withColumn("_prev_ts", prev)
        .filter(
            F.col("_prev_ts").isNull() | (F.col(ts_col) - F.col("_prev_ts") > gap)
        )
        .drop("_prev_ts")
    )


def markov_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts_us",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: count (prev_state → state) steps across every key's
    timeline and normalize per source state — the behavioral-model
    summary funnels/sessionization feed on (what follows a click?), and
    the standard feature for next-event prediction baselines.

    Ordering is (ts, tiebreak) so same-timestamp events sequence
    deterministically — without the tiebreak the lag() result is
    partitioner-dependent and no oracle can replay it. Each key's FIRST
    event has no predecessor and contributes no transition.

    Columns: prev_state, state, n_transitions, p (row-normalized
    probability), ordered by (prev_state, state).

    Scale shape: ONE window shuffle keyed on ``key_col`` (the same
    partitioning sessionization uses — high-cardinality user keys, no
    single-partition window), then a map-side-combinable count to the
    |states|² aggregate and a tiny per-source normalization. p is a
    pure count ratio, so engine parity needs only the 4-dp round at the
    query edge."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    steps = (
        events.select(key_col, state_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(state_col).over(w))
        .where(F.col("_prev").isNotNull())
    )
    counts = steps.groupBy(
        F.col("_prev").alias("prev_state"), F.col(state_col).alias("state")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    totals = Window.partitionBy("prev_state")
    return (
        counts.withColumn(
            "p", F.col("n_transitions") / F.sum("n_transitions").over(totals)
        )
        .orderBy("prev_state", "state")
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) —
    the classic behavioral customer segmentation: score 5-5-5 is the
    recent-frequent-big spender, 1-1-1 is churned-and-gone. Reference
    date is the corpus max order date (data-derived, reproducible).

    Per customer: ``recency_days`` (days since last order),
    ``frequency`` (order count), ``monetary`` (exact DECIMAL amount
    sum), then NTILE(``n_tiles``) scores oriented so HIGHER = better
    (most recent / most frequent / biggest spend = n_tiles), ties
    broken by customer key so the tiling is deterministic and
    SQL-replayable. Returns (customer, recency_days, frequency,
    monetary, r_score, f_score, m_score, ``rfm``) ordered by customer.

    Scale shape: one customer-keyed aggregate (map-side combined), then
    three exact global NTILE assignments over the CUSTOMER-sized frame
    (not the order stream). Below the measured ``_RFM_WINDOW_ROWS``
    crossover the three global windows run as-is — at that size the
    whole frame is one shuffle block and the single sort task is
    cheaper than the device's fixed stage overhead (tools/
    exp_rfm_crossover.py: window 0.8 s vs device 3.1 s at 150 k rows).
    Above it, each tiling runs the two-phase distributed-rank device
    (range exchange + free per-partition index + partition-count
    offsets broadcast back, operators/_distrank.py), so no
    customer-sized table ever serializes through one task (measured:
    device 13.1 s vs window 42.7 s at 8 M rows, gap widening). Each
    ordering key is total (customer tie-break), so the closed-form
    bucket is bit-identical to the window NTILE and the gate cannot
    change results.
    """
    from valentinus_spark.operators._distrank import global_ranks, ntile_from_rank
    base = orders.groupBy(F.col(customer_col).alias("_c")).agg(
        F.max(F.to_date(date_col)).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(28,2)")).alias("monetary"),
    )
    ref = base.agg(F.max("_last").alias("_ref"))
    base = base.crossJoin(F.broadcast(ref)).select(
        "_c",
        F.datediff("_ref", "_last").alias("recency_days"),
        "frequency",
        # sums accumulate in exact DECIMAL; the output column is a
        # rounded DOUBLE (values ≪ 2^53, so the cast is lossless)
        F.round(F.col("monetary").cast("double"), 2).alias("monetary"),
    )
    # one materialization of the customer-sized frame: it feeds the
    # size gate's count, and (above the gate) each rank device
    # references its input twice (rank branch + offset branch) — the
    # three devices CHAINED would otherwise nest each other's plans
    # wholesale (229-node plan, 4-5 s measured at sf0.1 vs 1.2 s)
    base = base.localCheckpoint()
    if base.count() <= _RFM_WINDOW_ROWS:
        # small frame: one shuffle block through one sort task beats
        # the device's ~4 extra stage boundaries per tiling (measured
        # crossover ≈ 1M rows, tools/exp_rfm_crossover.py)
        w_r = Window.orderBy(F.desc("recency_days"), F.asc("_c"))
        w_f = Window.orderBy(F.asc("frequency"), F.asc("_c"))
        w_m = Window.orderBy(F.asc("monetary"), F.asc("_c"))
        scored = base.select(
            F.col("_c").alias(customer_col),
            "recency_days",
            "frequency",
            "monetary",
            F.ntile(n_tiles).over(w_r).alias("r_score"),
            F.ntile(n_tiles).over(w_f).alias("f_score"),
            F.ntile(n_tiles).over(w_m).alias("m_score"),
        )
    else:
        # big frame: three INDEPENDENT narrow device pipelines off the
        # checkpoint (their stages share no dependencies, so the
        # scheduler overlaps them), joined back on the customer key —
        # AQE broadcasts the tile tables at mid size and hash-joins
        # co-partitioned at scale
        def _tile(metric: str, order_col, out: str) -> DataFrame:
            ranked = global_ranks(
                base.select("_c", metric), [order_col, F.asc("_c")]
            )
            return ranked.select(
                "_c",
                ntile_from_rank(F.col("_rank"), F.col("_n"), n_tiles)
                .cast("int")
                .alias(out),
            )

        scored = (
            base.join(
                _tile("recency_days", F.desc("recency_days"), "r_score"), "_c"
            )
            .join(_tile("frequency", F.asc("frequency"), "f_score"), "_c")
            .join(_tile("monetary", F.asc("monetary"), "m_score"), "_c")
            .select(
                F.col("_c").alias(customer_col),
                "recency_days",
                "frequency",
                "monetary",
                "r_score",
                "f_score",
                "m_score",
            )
        )
    return scored.withColumn(
        "rfm",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    ).orderBy(customer_col)


def attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion_type: str = "purchase",
    window_days: int = 7,
) -> DataFrame:
    """Multi-touch attribution: credit each conversion's value to the
    user's preceding touchpoints inside the lookback window, under the
    three standard models at once — ``first_touch`` (discovery),
    ``last_touch`` (closer), ``linear`` (equal split) — per touch
    channel. Conversions with no in-window touch are excluded (report
    them via the funnel operators). Touches TIED on the extreme time
    each receive full first/last credit — a pure value comparison, so
    the result is partitioner-independent and SQL-replayable (no
    arbitrary tie winner to replay).

    Returns one row per channel: (``channel``, ``n_touches``,
    ``first_touch``, ``last_touch``, ``linear``) rounded to 4, ordered
    by channel.

    Scale shape: one self-equi-join on the USER key (touch × conversion
    candidates materialize per user only — the bounded-session shape),
    a per-conversion window to mark first/last and count touches, then
    a channel-sized aggregate. Credits are cast to DECIMAL(28,10)
    before summing so the totals are partition-order-exact.
    """
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_ty"),
        F.col(value_col).alias("_v"),
    )
    # same-instant conversions MERGE (value-summed): the credit window
    # partitions by (_u, _cts), so two identical conversion rows would
    # otherwise share one window and halve the linear credit
    # (hypothesis-found). Merging keeps every model's total exact:
    # k counts each touch once, and the summed value is what first/
    # last/linear distribute.
    conv = (
        base.filter(F.col("_ty") == conversion_type)
        .groupBy("_u", F.col("_ts").alias("_cts"))
        .agg(F.sum("_v").alias("_cv"))
    )
    touch = base.filter(F.col("_ty") != conversion_type).select(
        "_u", F.col("_ts").alias("_tts"), F.col("_ty").alias("channel")
    )
    joined = conv.join(touch, "_u").where(
        (F.col("_tts") < F.col("_cts"))
        & (F.col("_tts") >= F.col("_cts") - F.expr(f"INTERVAL {window_days} DAYS"))
    )
    w = Window.partitionBy("_u", "_cts")
    marked = joined.select(
        "channel",
        "_cv",
        (F.col("_tts") == F.max("_tts").over(w)).alias("_is_last"),
        (F.col("_tts") == F.min("_tts").over(w)).alias("_is_first"),
        F.count(F.lit(1)).over(w).alias("_k"),
    )
    dec = lambda c: c.cast("decimal(28,10)")  # noqa: E731
    credited = marked.select(
        "channel",
        dec(F.when(F.col("_is_first"), F.col("_cv")).otherwise(0.0)).alias("_first"),
        dec(F.when(F.col("_is_last"), F.col("_cv")).otherwise(0.0)).alias("_last"),
        dec(F.col("_cv") / F.col("_k")).alias("_lin"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("_first").cast("double"), 4).alias("first_touch"),
            F.round(F.sum("_last").cast("double"), 4).alias("last_touch"),
            F.round(F.sum("_lin").cast("double"), 4).alias("linear"),
        )
        .orderBy("channel")
    )


def kaplan_meier(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    churn_horizon_days: int = 3,
) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes — the
    right-censoring-correct churn estimate (a naive churn rate
    undercounts users who are still active at the observation edge).
    A user's duration is days between first and last event; the user
    CHURNED if their last event predates the corpus edge by more than
    ``churn_horizon_days`` (otherwise censored: still alive when
    observation ended).

        S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

    with d_i churn events at duration t_i and n_i the at-risk count
    (duration ≥ t_i, censored included until their own exit). Returns
    one row per churn-event time: (``t_days``, ``n_risk``,
    ``n_churned``, ``survival``) rounded to 6, ordered by t_days.

    Scale shape: one user-keyed aggregate (first/last event), one
    duration-keyed count aggregate, then a single ordered window over
    the DISTINCT-DURATION table (bounded by the observation span in
    days, not by users). The survival product folds as exp(Σ ln) —
    both engines accumulate in the same ascending order.
    """
    from pyspark.sql import Window

    spans = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(F.to_date(ts_col)).alias("_first"),
        F.max(F.to_date(ts_col)).alias("_last"),
    )
    edge = spans.agg(F.max("_last").alias("_edge"))
    per_user = spans.crossJoin(F.broadcast(edge)).select(
        F.datediff("_last", "_first").alias("_t"),
        (
            F.datediff("_edge", "_last") > churn_horizon_days
        ).cast("int").alias("_churned"),
    )
    per_t = per_user.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_exits"),
        F.sum("_churned").alias("_d"),
    )
    wo = Window.orderBy("_t")
    cum = per_t.select(
        "_t",
        "_d",
        (
            F.sum("_exits").over(
                wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("_exits")
        ).alias("_before"),
    ).crossJoin(F.broadcast(per_user.agg(F.count(F.lit(1)).alias("_n"))))
    risk = cum.select(
        "_t",
        "_d",
        (F.col("_n") - F.col("_before")).alias("_nrisk"),
    )
    # when the whole remaining risk set churns at once (d == n) the
    # factor is 0 and S pins to 0 from that step on — fold it as an
    # explicit zero flag rather than ln(0) (Spark NULLs it, DuckDB
    # raises, and both would poison the running sum)
    cumw = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    surv = risk.filter(F.col("_d") > 0).select(
        "_t",
        "_nrisk",
        "_d",
        F.when(
            F.sum(
                (F.col("_d") >= F.col("_nrisk")).cast("int")
            ).over(cumw)
            > 0,
            F.lit(0.0),
        )
        .otherwise(
            F.exp(
                F.sum(
                    F.when(
                        F.col("_d") < F.col("_nrisk"),
                        F.log(
                            1.0 - F.col("_d").cast("double") / F.col("_nrisk")
                        ),
                    ).otherwise(F.lit(0.0))
                ).over(cumw)
            )
        )
        .alias("_s"),
    )
    return surv.select(
        F.col("_t").alias("t_days"),
        F.col("_nrisk").alias("n_risk"),
        F.col("_d").alias("n_churned"),
        F.round("_s", 6).alias("survival"),
    ).orderBy("t_days")


def session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    gap_minutes: int = 30,
    max_steps: int = 5,
    topk: int = 25,
) -> DataFrame:
    """Top user-session paths (the Sankey / flow-analysis input): events
    sessionize on a ``gap_minutes`` inactivity gap (same rule as the
    events_sessionize query), each session becomes the '>'-joined
    sequence of its first ``max_steps`` event types, and paths are
    ranked by how many sessions follow them — the k-step generalization
    of :func:`markov_transitions`' single-step matrix.

    Returns the top ``topk`` rows (``path``, ``n_sessions``) by count
    desc then path asc. Within-session order is (ts, ``order_col``) —
    the unique tie-break makes the paths engine-deterministic when
    events share a timestamp.

    Scale shape: two user-keyed window passes (sessionize + step rank,
    both on the same partitioning — one shuffle) and one path-keyed
    count with map-side combine. No driver data, no cross-user state.
    """
    from pyspark.sql import Window

    w_user = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap = gap_minutes * 60
    flagged = events.select(
        user_col,
        ts_col,
        order_col,
        type_col,
        F.when(
            F.lag(ts_col).over(w_user).isNull()
            | (
                F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w_user)
                > gap
            ),
            1,
        )
        .otherwise(0)
        .alias("_ns"),
    )
    sess = flagged.withColumn(
        "_sid",
        F.sum("_ns").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_sess = Window.partitionBy(user_col, "_sid").orderBy(ts_col, order_col)
    stepped = sess.withColumn("_st", F.row_number().over(w_sess)).filter(
        F.col("_st") <= max_steps
    )
    paths = (
        stepped.groupBy(user_col, "_sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_st"), F.col(type_col).alias("_t")))
                    ),
                    lambda x: x["_t"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(topk)
    )


def activity_streaks(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    top_n: int = 25,
) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands readout (an "island" is a maximal run of
    consecutive active days; ``date − dense_rank`` is constant inside
    one island, so islands fall out of one GROUP BY). The engagement
    twin of :func:`cohort_retention`: retention asks "did they come
    back eventually", streaks ask "did they come back EVERY day".

    Returns the ``top_n`` users by (longest streak DESC, user ASC —
    deterministic): (``user``, ``active_days``, ``n_streaks``,
    ``longest_streak``, ``streak_start``) where streak_start is the
    first day of the (earliest, if tied) longest streak.

    Determinism: pure integer/date arithmetic; ordering tie-broken by
    start date then user id.

    Scale shape: one distinct-day aggregate, one per-user ordered
    window (users process in parallel — no global window), one island
    GROUP BY, one top-n (TakeOrdered, k-row heaps per partition).
    """
    from pyspark.sql import Window

    days = (
        events.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), F.to_date(ts_col).alias("_d"))
        .distinct()
    )
    w = Window.partitionBy("_u").orderBy("_d")
    islands = days.select(
        "_u",
        "_d",
        F.date_sub("_d", F.row_number().over(w)).alias("_anchor"),
    )
    per_island = islands.groupBy("_u", "_anchor").agg(
        F.count(F.lit(1)).alias("_len"), F.min("_d").alias("_start")
    )
    tagged = per_island.withColumn(
        "_maxlen", F.max("_len").over(Window.partitionBy("_u"))
    )
    per_user = tagged.groupBy("_u").agg(
        F.sum("_len").alias("active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("_len").alias("longest_streak"),
        F.min(
            F.when(F.col("_len") == F.col("_maxlen"), F.col("_start"))
        ).alias("streak_start"),
    )
    return (
        per_user.select(
            F.col("_u").alias("user"),
            "active_days",
            "n_streaks",
            "longest_streak",
            "streak_start",
        )
        .orderBy(F.desc("longest_streak"), F.asc("user"))
        .limit(top_n)
    )


def cohort_ltv(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    day_us: int = 86_400_000_000,
    max_offset: int = 30,
) -> DataFrame:
    """Cohort × age cumulative lifetime value: users grouped by first
    active day; each later age reports the cohort's CUMULATIVE value
    per cohort member so far — the revenue twin of
    :func:`cohort_retention` (retention asks "did they come back";
    LTV asks "what have they been worth by day k", the number an
    acquisition-spend decision compares against CAC). Output:
    (``cohort_day``, ``day_offset``, ``cohort_size``, ``cum_value``,
    ``ltv_per_user``) for offsets 0..max_offset, cumulative over a
    DENSE offset spine (quiet days carry the running value forward),
    values rounded to 2/6.

    Determinism: day indexes by integer division (the
    cohort_retention convention); daily sums and the running
    cumulative accumulate in DECIMAL; one division per row.

    Scale shape: one (user-day aggregated) corpus scan, a user-keyed
    cohort join, a (cohort, offset) aggregate, then a cumulative
    window over the COHORT-SIZED dense spine (cohorts × offsets rows).
    """
    from pyspark.sql import Window

    base = ensure_parallelism(events).select(
        user_col,
        F.expr(f"{ts_col} div {day_us}").alias("_day"),
        F.col(value_col).try_cast("decimal(18,2)").alias("_v"),
    )
    first = base.groupBy(user_col).agg(F.min("_day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    daily = (
        base.join(first, user_col)
        .select(
            "cohort_day",
            (F.col("_day") - F.col("cohort_day")).alias("day_offset"),
            "_v",
        )
        .filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.sum("_v").cast("decimal(28,2)").alias("_dv"))
    )
    spine = sizes.select(
        "cohort_day",
        "cohort_size",
        F.explode(F.sequence(F.lit(0), F.lit(int(max_offset)))).alias(
            "day_offset"
        ),
    )
    dense = spine.join(daily, ["cohort_day", "day_offset"], "left").select(
        "cohort_day",
        "day_offset",
        "cohort_size",
        F.coalesce(
            F.col("_dv"), F.lit(0).cast("decimal(28,2)")
        ).alias("_dv"),
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = dense.select(
        "cohort_day",
        "day_offset",
        "cohort_size",
        F.sum("_dv").over(w).cast("decimal(38,2)").alias("_cum"),
    )
    return out.select(
        "cohort_day",
        "day_offset",
        "cohort_size",
        F.round(F.col("_cum").cast("double"), 2).alias("cum_value"),
        F.round(
            F.col("_cum").cast("double") / F.col("cohort_size").cast("double"),
            6,
        ).alias("ltv_per_user"),
    ).orderBy("cohort_day", "day_offset")
