"""Skew-mitigated equi-join via key salting.

A hash join shuffles both sides on the join key; one hot key (a viral
document, a null-ish default id, a mega-customer) lands its entire
partition on one task and the stage runs at the speed of that straggler.
AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) fixes this at runtime for sort-merge joins; salting is the
explicit, plan-level fix that also works where AQE can't see the skew
(e.g. before an aggregation, or under `applyInPandas` groupings).

    fact:  salt = pmod(hash(random-ish spread col), n)   (1 row, n ways)
    dim:   explode salt = [0 .. n-1]                     (n replicas)
    join on (key, salt)

The dim side is replicated n×, so salting is for joins whose build side
is small-ish but NOT broadcastable (if it fits in a broadcast, just
broadcast — no shuffle, no skew). `salt_count` trades replication cost
against straggler spread; 8-32 covers most real skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_count: int = 16,
    how: str = "inner",
    spread: Column | None = None,
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on column ``on``, spreading each
    fact key across ``salt_count`` shuffle partitions. ``spread`` is the
    expression that distributes rows within a key (default: a hash of the
    whole fact row via ``F.hash`` over all columns). Supports inner and
    left joins (dim replicas never add rows: (key, salt) is unique)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    if salt_count < 1:
        raise ValueError("salt_count must be >= 1")
    spread = spread if spread is not None else F.hash(*[F.col(c) for c in fact.columns])
    f_salted = fact.withColumn("_salt", F.pmod(spread, F.lit(salt_count)).cast("int"))
    d_salted = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_count - 1)))
    )
    return f_salted.join(d_salted, on=[on, "_salt"], how=how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_count: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: aggregate on (keys + salt) first
    — spreading a hot key over ``salt_count`` reducers — then merge the
    partials on the true keys.

    Ordinary groupBy already does map-side partial aggregation, which
    handles MOST skew (the shuffle carries one row per key per mapper);
    the explicit two-phase form matters when partials can't combine
    map-side — high-cardinality secondary structures (collect_set,
    approximate sketches) or `applyInPandas` per-group logic — or when
    one reducer's merge work itself is the bottleneck.

    ``aggs`` maps column → one of sum/count/min/max (the mergeable
    subset; avg = sum/count at the call site)."""
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    for a in aggs.values():
        if a not in merge_fn:
            raise ValueError(f"unsupported agg {a!r} (use sum/count/min/max)")
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_count))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[first_fn[a](c).alias(f"_p_{c}_{a}") for c, a in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[a](f"_p_{c}_{a}").alias(f"{c}_{a}") for c, a in aggs.items()]
    )


def key_skew_profile(
    df: DataFrame,
    key: str,
    top_n: int = 10,
) -> DataFrame:
    """Join/agg-key skew diagnostic: the ``top_n`` heaviest keys with
    their row count, share of the table, and the ratio to a perfectly
    uniform key ("hotness"). This is the measurement you run BEFORE
    choosing between plain join / AQE skew split / salted_join — a key
    with hotness ≫ 1 is the straggler-to-be.

    One aggregation (map-side combinable count per key); the global
    count and distinct-key count come from a one-row scalar aggregate
    over that intermediate, broadcast back — NOT a grand-total window,
    which would plan as ``Exchange SinglePartition`` over the
    (distinct-keys)-sized frame and funnel exactly the high-cardinality
    key this profiler exists to diagnose through one task. The totals
    are the same sums, merely computed in the combinable aggregate."""
    per_key = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = per_key.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    enriched = per_key.crossJoin(F.broadcast(totals)).select(
        "key",
        "n_rows",
        "_total",
        "_nkeys",
    )
    return (
        enriched.select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(
                F.col("n_rows") * F.col("_nkeys") / F.col("_total"), 4
            ).alias("hotness"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
    )
