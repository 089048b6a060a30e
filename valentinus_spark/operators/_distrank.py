"""Two-phase distributed global-order primitives (guide §2.5 posture).

A global ``Window.orderBy(...)`` with no ``partitionBy`` plans as
``Exchange SinglePartition`` + Window: every row serializes through ONE
task — the canonical 100 TB scale-killer regardless of how fast it runs
at bench scale. The helpers here compute the same running totals /
global ranks with DISTRIBUTED exchanges only (the layout.py
``zorder_bucket_stats`` / profile.py ``exact_quantiles`` device, shared):

1. range-exchange on the ordering key (sampled bounds — no skew pileup);
2. per-partition work: a PARTITION-LOCAL window (running sums) or a free
   ``monotonically_increasing_id`` index (ranks — no window at all);
3. a partitions-sized offset table broadcast back. The only
   single-partition step is the exclusive prefix over PARTITION IDS —
   bounded by the partition count, never by the data.

Exactness: offsets and local sums perform the same integer/DECIMAL
additions the global window performed, merely reassociated — associative
and exact for every type callers use (BIGINT counts, bounded-scale
DECIMAL weights), so results are bit-identical to the single-partition
plan and the DuckDB oracle replays unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_totals(
    df: DataFrame,
    order_cols: list,
    sum_cols: list[str],
    with_totals: bool = False,
    with_lead: str | None = None,
) -> DataFrame:
    """Append ``_run<c>`` = running total of each ``sum_cols`` entry over
    the global ``order_cols`` order (INCLUSIVE of the current row).
    Input columns pass through; row multiset is unchanged.

    ``with_totals`` additionally appends ``_tot<c>`` — the grand total of
    each summed column attached to EVERY row (free: it rides the same
    broadcast offset join, replacing a caller-side crossJoin(agg)).

    ``with_lead=col`` appends ``_lead<col>`` — the next row's value of
    ``col`` in global order (NULL on the last row), stitched across
    partition boundaries from the offset table's per-partition minima.
    Only valid when ``col`` is the first (ascending) ordering column.

    Requirements (hold for every caller): rows are UNIQUE on
    ``order_cols`` — these are distinct-value/grid aggregates — so the
    within-partition order is total and deterministic.

    The local-sum branch and the offsets branch share ONE range
    exchange via ReuseExchange (identical canonical subtrees), so both
    see the same sampled boundaries and the same partition ids — the
    exact_quantiles / zorder_bucket_stats correctness argument, green
    across rounds under AQE on/off and the --cpus order shaker.
    """
    part = df.repartitionByRange(*order_cols).withColumn(
        "_dr_pid", F.spark_partition_id()
    )
    wloc = (
        Window.partitionBy("_dr_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_exprs = [F.sum(c).over(wloc).alias(f"_dr_loc{c}") for c in sum_cols]
    if with_lead is not None:
        wlead = Window.partitionBy("_dr_pid").orderBy(*order_cols)
        run_exprs.append(F.lead(with_lead).over(wlead).alias("_dr_locnext"))
    loc = part.select("*", *run_exprs)
    # per-partition totals: one tiny combinable aggregate over the
    # checkpointed table; the exclusive prefix runs over #partitions
    # rows, not data
    aggs = [F.sum(c).alias(f"_dr_tot{c}") for c in sum_cols]
    if with_lead is not None:
        aggs.append(F.min(with_lead).alias("_dr_minv"))
    offs = part.groupBy("_dr_pid").agg(*aggs)
    woff = Window.orderBy("_dr_pid").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    off_exprs = [
        F.coalesce(F.sum(f"_dr_tot{c}").over(woff), F.lit(0)).alias(f"_dr_off{c}")
        for c in sum_cols
    ]
    if with_totals:
        off_exprs += [
            F.sum(f"_dr_tot{c}").over(wall).alias(f"_tot{c}") for c in sum_cols
        ]
    if with_lead is not None:
        # first value of the NEXT non-empty partition — stitches lead
        # across the boundary; NULL for the globally last partition
        off_exprs.append(
            F.lead("_dr_minv").over(Window.orderBy("_dr_pid")).alias("_dr_nextmin")
        )
    offs = offs.select("_dr_pid", *off_exprs)
    out = loc.join(F.broadcast(offs), "_dr_pid")
    drop = ["_dr_pid"]
    loc_types = {f.name: f.dataType for f in loc.schema.fields}
    from pyspark.sql.types import DecimalType

    for c in sum_cols:
        a, b = F.col(f"_dr_loc{c}"), F.col(f"_dr_off{c}")
        dt = loc_types[f"_dr_loc{c}"]
        if isinstance(dt, DecimalType) and dt.precision >= 38:
            # decimal(38,s) + decimal(38,s) would drop to scale s-1
            # (precision overflow): cast the addends to precision 37 so
            # the sum keeps the window-sum type decimal(38,s) exactly.
            # Costs one decade of partial-sum headroom (1e25 vs 1e26 for
            # s=12) — far beyond any caller's bounded weights/counts.
            t = f"decimal(37,{dt.scale})"
            a, b = a.cast(t), b.cast(t)
        out = out.withColumn(f"_run{c}", a + b)
        drop += [f"_dr_loc{c}", f"_dr_off{c}"]
    if with_lead is not None:
        out = out.withColumn(
            f"_lead{with_lead}",
            F.coalesce(F.col("_dr_locnext"), F.col("_dr_nextmin")),
        )
        drop += ["_dr_locnext", "_dr_nextmin"]
    return out.drop(*drop)


def running_min_exclusive(
    df: DataFrame, order_cols: list, min_col: str
) -> DataFrame:
    """Append ``_premin<min_col>`` = MIN of ``min_col`` over all rows
    STRICTLY PRECEDING the current row in the global ``order_cols``
    order (NULL on the globally first row — the same empty-frame
    semantics as ``min().over(orderBy(...).rowsBetween(unboundedPreceding,
    -1))``, which this replaces without the data-sized
    ``Exchange SinglePartition``). MIN is associative, so splitting it
    into a partition-local exclusive running min plus an exclusive
    prefix-min over the per-partition minima (partition-count rows,
    broadcast back) is exact — ``F.least`` skips NULL operands, so the
    boundary stitch keeps the window's NULL-for-empty-frame behavior.
    Requires rows unique on ``order_cols`` (same contract as the other
    helpers)."""
    part = df.repartitionByRange(*order_cols).withColumn(
        "_dr_pid", F.spark_partition_id()
    )
    wloc = (
        Window.partitionBy("_dr_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = part.withColumn("_dr_locmin", F.min(min_col).over(wloc))
    woff = Window.orderBy("_dr_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        part.groupBy("_dr_pid")
        .agg(F.min(min_col).alias("_dr_pmin"))
        .select("_dr_pid", F.min("_dr_pmin").over(woff).alias("_dr_offmin"))
    )
    return (
        loc.join(F.broadcast(offs), "_dr_pid")
        .withColumn(
            f"_premin{min_col}", F.least("_dr_locmin", "_dr_offmin")
        )
        .drop("_dr_pid", "_dr_locmin", "_dr_offmin")
    )


def global_ranks(df: DataFrame, order_cols: list) -> DataFrame:
    """Append ``_rank`` (1-based global rank over ``order_cols``) and
    ``_n`` (total row count, on every row) without any data-sized
    window: range exchange + in-partition sort, local index free from
    ``monotonically_increasing_id`` (partition_id·2^33 + row index —
    assumes < 2^33 rows per partition, the documented mid contract),
    partition-count offsets broadcast back. Callers must pass a TOTAL
    order (unique key) so ranks are deterministic; ties in a prefix of
    the ordering are then harmless exactly when the caller's downstream
    treats tied rows identically (the zorder_bucket_stats argument).
    """
    part = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_dr_mid", F.monotonically_increasing_id())
        .withColumn("_dr_pid", F.shiftrightunsigned("_dr_mid", 33))
        .withColumn(
            "_dr_rn", F.col("_dr_mid").bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1)
        )
    )
    offsets = (
        part.groupBy("_dr_pid")
        .agg(F.count(F.lit(1)).alias("_dr_cnt"))
        .withColumn(
            "_dr_off",
            F.coalesce(
                F.sum("_dr_cnt").over(
                    Window.orderBy("_dr_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.sum("_dr_cnt").over(Window.partitionBy()))
    )
    return (
        part.join(F.broadcast(offsets.select("_dr_pid", "_dr_off", "_n")), "_dr_pid")
        .withColumn("_rank", F.col("_dr_off") + F.col("_dr_rn"))
        .drop("_dr_mid", "_dr_pid", "_dr_rn", "_dr_off")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor division of non-negative BIGINTs. Double
    division mis-floors once operands exceed 2^53; DECIMAL(38,*)
    division is exact for every representable long (≤ ~9.2e18 ≪ 1e32),
    so floor(decimal quotient) is the true ``a div b`` for all inputs."""
    return F.floor(a.cast("decimal(38,0)") / b.cast("decimal(38,0)")).cast("long")


def ntile_from_rank(rank: Column, n: Column, n_tiles: int) -> Column:
    """Closed-form NTILE(n_tiles) from a 1-based global rank over n rows
    (bit-identical to the window ntile): the first ``n % n_tiles``
    buckets hold ``n div n_tiles + 1`` rows, the rest ``n div n_tiles``.
    Exact integer arithmetic throughout (no double mis-floor past 2^53).
    When n < n_tiles the ``otherwise`` branch's divisor is 0 but is never
    evaluated — every rank then falls in the first ``n % n_tiles`` (=n)
    buckets and CASE WHEN short-circuits per row."""
    nb = F.lit(n_tiles).cast("long")
    small = _idiv(n, nb)
    big = small + F.lit(1)
    r = n % nb
    cut = r * big  # rows living in the first r (larger) buckets
    return F.when(rank <= cut, _idiv(rank - 1, big) + 1).otherwise(
        r + _idiv(rank - cut - 1, small) + 1
    )
