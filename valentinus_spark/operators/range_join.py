"""Range (interval) join: match point rows to interval rows that contain
them — the point-in-interval primitive behind incident attribution,
validity-window lookups, and time-bucketed feature joins.

A naive formulation is a non-equi join (`p.ts BETWEEN i.start AND i.end`),
which Spark can only execute as BroadcastNestedLoopJoin (fine when one
side is tiny, catastrophic at 100 TB). This operator rewrites it as an
EQUI-join on a derived time bucket:

    point:    bucket = floor(ts / width)                  (exactly 1 row)
    interval: explode to [floor(start/width) .. floor(end/width)]
    join on (key, bucket), then the precise BETWEEN filter

Each (point, interval) match surfaces exactly once — at the point's own
bucket — so no dedup is needed. The equi-join hash-shuffles on
(key, bucket), which also spreads a hot key across buckets (built-in
time-axis salting). Cost knob: `bucket_width` should be on the order of
the typical interval length — too small explodes intervals into many
buckets, too large makes buckets behave like the key alone.

The reference has no joins at all (SURVEY.md §2.4); this is part of the
engine's relational extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join each point row to every interval row with the same
    ``key`` and ``start <= point_ts <= end``. Returns all columns of
    ``points`` plus all non-key columns of ``intervals``. Timestamps are
    numeric (e.g. epoch micros); ``bucket_width`` is in the same unit.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn("_bucket", (F.col(point_ts) / bucket_width).cast("long"))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start) / bucket_width).cast("long"),
                (F.col(end) / bucket_width).cast("long"),
            )
        ),
    )
    overlap = [c for c in i.columns if c in p.columns and c not in (key, "_bucket")]
    i = i.select(
        [F.col(key), F.col("_bucket")]
        + [
            F.col(c).alias(f"i_{c}") if c in overlap else F.col(c)
            for c in i.columns
            if c not in (key, "_bucket")
        ]
    )
    s_col = f"i_{start}" if start in overlap else start
    e_col = f"i_{end}" if end in overlap else end
    joined = p.join(i, on=[key, "_bucket"], how="inner").filter(
        (F.col(point_ts) >= F.col(s_col)) & (F.col(point_ts) <= F.col(e_col))
    )
    return joined.drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval × interval overlap join: pairs with the same ``key`` whose
    [start, end] ranges intersect. The interval twin of :func:`range_join`
    (point-in-interval) — the primitive behind downtime attribution,
    concurrent-session analysis, and any "which windows coincided" query.

    Same equi-join rewrite: both sides explode to time buckets, the join
    runs on (key, bucket), the exact overlap predicate filters candidates.
    A pair overlapping across several buckets would surface once per
    shared bucket, so each pair is EMITTED exactly once — at the bucket
    containing the overlap's start (``greatest(starts)/width``) — which
    replaces a dropDuplicates (a second full shuffle) with a free scalar
    comparison. Right-side columns colliding with left names come back
    ``r_``-prefixed."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    l = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(left_start) / bucket_width).cast("long"),
                (F.col(left_end) / bucket_width).cast("long"),
            )
        ),
    )
    r = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(right_start) / bucket_width).cast("long"),
                (F.col(right_end) / bucket_width).cast("long"),
            )
        ),
    )
    overlap = [c for c in r.columns if c in l.columns and c not in (key, "_bucket")]
    r = r.select(
        [F.col(key), F.col("_bucket")]
        + [
            F.col(c).alias(f"r_{c}") if c in overlap else F.col(c)
            for c in r.columns
            if c not in (key, "_bucket")
        ]
    )
    rs = f"r_{right_start}" if right_start in overlap else right_start
    re_ = f"r_{right_end}" if right_end in overlap else right_end
    joined = (
        l.join(r, on=[key, "_bucket"], how="inner")
        .filter(
            (F.col(left_start) <= F.col(re_)) & (F.col(rs) <= F.col(left_end))
        )
        .filter(
            F.col("_bucket")
            == (F.greatest(F.col(left_start), F.col(rs)) / bucket_width).cast("long")
        )
    )
    return joined.drop("_bucket")
