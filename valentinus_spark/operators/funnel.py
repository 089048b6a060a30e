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
    return out.groupBy("step_no", "step").agg(
        F.count(F.lit(1)).alias("n_users")
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
