"""Pareto-frontier (skyline) queries — "show me the options no other
row beats on every axis": cheapest-for-its-size parts, best
quality-for-cost documents, fastest-for-accuracy model configs. The
classic formulation is a quadratic NOT-EXISTS dominance self-join; for
the 2-D case this module uses the sort-based plan instead, which is one
aggregate + one bounded window — the shape that survives 100 TB.

Physical shape (``skyline_2d``): (1) one map-side-combined groupBy on
the maximize-axis keeps only each axis value's best (minimum) cost —
skyline membership is impossible for any other row, so the frame
collapses from |rows| to |distinct axis values| before anything
ordered happens; (2) one running-min window over that collapsed frame,
descending in the maximize axis, keeps exactly the rows strictly below
every larger-axis cost. No self-join, no n² candidate pairs. The
driver-gate oracle intentionally uses the quadratic NOT-EXISTS
formulation, so the window plan's equivalence is re-proven on every
run.

(The reference engine has no skyline operator; this belongs to the
large-scale training-data extension surface, next to the dedup/sampling
family — e.g. picking per-bucket "cheapest document above each quality
level" frontiers.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """2-D Pareto frontier: rows not dominated on (minimize_col ↓,
    maximize_col ↑). Row A dominates row B when A.min ≤ B.min and
    A.max ≥ B.max with at least one strict inequality; equal points do
    not dominate each other, so exact ties on BOTH axes all stay.

    Returns the skyline rows with ``keep_cols`` (default: id-free
    (maximize, minimize) pairs are deduplicated — pass keep_cols to
    retain identifying columns; all tied rows at a surviving
    (max, min) point are kept).

    Determinism: comparisons run on the input column types (use
    DECIMAL costs for exact ties); membership is set-determined, no
    float folds anywhere.

    Scale shape: groupBy(maximize) → min(minimize) collapses the
    corpus in one shuffle (map-side combined); the exclusive running
    min over the collapsed frame comes from the two-phase distributed
    device (operators/_distrank.py) — range exchange, partition-local
    window, partition-count prefix-min broadcast back — so even a
    CONTINUOUS axis (prices, scores: |distinct values| ~ |rows|) never
    serializes through one task. The final membership join back to the
    corpus is a broadcast of the frontier.
    """
    from valentinus_spark.operators._distrank import running_min_exclusive

    mn, mx = minimize_col, maximize_col
    base = df.filter(F.col(mn).isNotNull() & F.col(mx).isNotNull())
    # materialized once: the device's range exchange samples its input
    # for boundaries, which would replay the whole corpus collapse a
    # second time without the checkpoint
    best = base.groupBy(mx).agg(F.min(mn).alias("_best")).localCheckpoint()
    # running min of cost over strictly larger axis values: dominated
    # iff some larger-or-equal axis value achieves cost <= ours
    # (equality with strictly larger axis still dominates)
    frontier = (
        running_min_exclusive(best, [F.desc(mx)], "_best")
        .filter(
            F.col("_premin_best").isNull()
            | (F.col("_best") < F.col("_premin_best"))
        )
        .select(mx, F.col("_best").alias(mn))
    )
    if keep_cols is None:
        return frontier.select(mx, mn).orderBy(F.desc(mx))
    f2 = frontier.select(
        F.col(mx).alias("_fmx"), F.col(mn).alias("_fmn")
    )
    out = base.join(
        F.broadcast(f2),
        (F.col(mx) == F.col("_fmx")) & (F.col(mn) == F.col("_fmn")),
    )
    return out.select(*keep_cols, mx, mn).orderBy(F.desc(mx), *keep_cols)
