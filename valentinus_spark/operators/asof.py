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
    direction: str = "backward",
) -> DataFrame:
    """For each left row: the latest right row with same ``key`` and
    ``right.ts <= left.ts`` (``direction="backward"``, default), or the
    EARLIEST right row with ``right.ts >= left.ts``
    (``direction="forward"`` — pandas merge_asof's forward mode: "the
    next event after this one"). Right columns come back as
    ``{prefix}{col}`` (NULL when no matching right row exists).
    ``tie_break`` orders right rows within an equal (key, ts) — the
    largest wins. Forward mode is the time-mirrored window (ts ordered
    descending) — same single shuffle, no row multiplication."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tb = tie_break or value_cols[0]
    rcols = list(dict.fromkeys(list(value_cols) + [tb]))
    # carry ALL right values as ONE struct: last(struct, ignorenulls) then
    # picks every output column from the SAME (latest) right row. Per-column
    # last() would mix rows whenever the latest right row has NULL in some
    # value column (ignorenulls skips back to an older row for that column
    # only — not as-of semantics).
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    struct_type = r_tagged.schema["_r"].dataType
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(struct_type)
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
    # (the tie key only orders within _side = 0: left rows always sort
    # after right rows at equal ts regardless of their NULL tie field)
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(
            ts_order,
            F.col("_side").asc(),
            F.col("_r").getField(tb).asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = combined.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    keep = [F.col(c) for c in left.columns] + [
        F.col("_last_r").getField(c).alias(f"{prefix}{c}") for c in value_cols
    ]
    return out.filter(F.col("_side") == 1).select(*keep)
