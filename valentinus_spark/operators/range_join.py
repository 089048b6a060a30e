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


def radius_join(
    a: DataFrame,
    b: DataFrame,
    radius: float,
    a_keys: list[str],
    b_keys: list[str],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Planar radius (spatial) join: all (a, b) pairs within Euclidean
    ``radius`` — the store-near-customer / sensor-near-incident shape —
    WITHOUT a cross product: points bucket into radius-sized grid
    cells, each a-point probes its 3×3 cell neighborhood (every
    within-radius pair provably shares that neighborhood since
    |Δx|,|Δy| ≤ r), and the exact distance check runs only on
    neighborhood candidates.

    Both inputs need ``x_col``/``y_col``; ``a_keys``/``b_keys`` name
    the identity columns carried through. Returns a-keys + b-keys +
    ``dist`` (rounded 6), one row per qualifying pair, ordered by the
    keys.

    Scale shape: ONE equi-join on the (cell_x, cell_y) key after a 9×
    map-side explode of the probe side — candidates are bounded by
    9·density·r² per point instead of |a|·|b|. A pathological hot cell
    (everything at one location) degrades toward density²; salt or
    pre-aggregate coincident points upstream if the data has such an
    atom. No trig — squared-distance filter then one sqrt, so the
    join is engine-exact for grid-valued coordinates.
    """
    cell = lambda c: F.floor(F.col(c) / radius)  # noqa: E731
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    pa = a.select(
        *a_keys,
        F.col(x_col).alias("_ax"),
        F.col(y_col).alias("_ay"),
        (cell(x_col)).alias("_cx0"),
        (cell(y_col)).alias("_cy0"),
    ).select(
        *a_keys, "_ax", "_ay",
        F.explode(offs).alias("_o"),
        "_cx0", "_cy0",
    ).select(
        *a_keys, "_ax", "_ay",
        (F.col("_cx0") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy0") + F.col("_o.dy")).alias("_cy"),
    )
    pb = b.select(
        *b_keys,
        F.col(x_col).alias("_bx"),
        F.col(y_col).alias("_by"),
        cell(x_col).alias("_cx"),
        cell(y_col).alias("_cy"),
    )
    d2 = (F.col("_ax") - F.col("_bx")) ** 2 + (F.col("_ay") - F.col("_by")) ** 2
    return (
        pa.join(pb, ["_cx", "_cy"])
        .filter(d2 <= F.lit(float(radius)) ** 2)
        .select(
            *a_keys,
            *b_keys,
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
        .orderBy(*a_keys, *b_keys)
    )
