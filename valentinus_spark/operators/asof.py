"""As-of join: attach to each left row the most recent right row (by a
time column) with the same key — the temporal-join primitive Spark lacks
as a built-in (pipelines use it to join events to slowly-changing context:
latest model version, latest user state, most recent checkpoint).

Implemented as the union + running-last-value window trick, which is the
shuffle-minimal DataFrame formulation:

    union(left ⊕ null-padded right)           ← no join at all
    window: last(right_cols ignorenulls)      ← one shuffle, keyed on `key`
            over (key, ts, side) rows-unbounded-preceding
    filter side = left

One shuffle total (the window), no row-multiplication ever — versus a
naive range join whose intermediate is |left| × |matching right|. Skewed
keys are AQE's problem here like any window; for extreme skew bucket the
time axis first.

Tie semantics: inclusive (right.ts == left.ts matches); among equal
(key, ts) the right row with the largest tie-break column wins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: Sequence[str],
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row: the latest right row with same ``key`` and
    ``right.ts <= left.ts``. Right columns come back as ``{prefix}{col}``
    (NULL when no prior right row exists). ``tie_break`` orders right rows
    within an equal (key, ts) — the largest wins."""
    tb = tie_break or value_cols[0]
    l_tagged = left.withColumn("_side", F.lit(1))
    for c in value_cols + [tb]:
        if f"_r_{c}" not in l_tagged.columns:
            l_tagged = l_tagged.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in dict.fromkeys(list(value_cols) + [tb])],
    )
    # align schemas for unionByName
    l_cols = l_tagged.columns
    r_full = r_tagged
    for c in l_cols:
        if c not in r_full.columns:
            r_full = r_full.withColumn(c, F.lit(None).cast(dict(l_tagged.dtypes)[c]))
    combined = l_tagged.unionByName(r_full.select(l_cols))

    # right rows sort BEFORE left rows at equal ts (inclusive match);
    # among equal right rows the largest tie_break lands last → wins
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col(f"_r_{tb}").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = combined
    for c in dict.fromkeys(list(value_cols) + [tb]):
        out = out.withColumn(f"{prefix}{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    keep = [c for c in left.columns] + [f"{prefix}{c}" for c in value_cols]
    return out.filter(F.col("_side") == 1).select(*keep)
