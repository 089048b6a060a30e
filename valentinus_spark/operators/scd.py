"""Slowly-changing-dimension maintenance (SCD type 2).

The MERGE-shaped half of a warehouse the engine was missing: apply a
batch of dimension updates to a versioned table where every key keeps its
full history as [effective_from, effective_to) intervals and the open
version has effective_to NULL. The standard shape behind customer/vendor
dimensions joined by as-of semantics downstream.

Pure relational plan — no driver loops, no UDFs:
one equi-join of the update batch to the OPEN versions (the small, hot
slice of the dimension), change detection as a null-safe attribute
comparison, then a union of four disjoint row sets. At 100 TB dimension
scale the join is keyed on the dimension key (broadcast when the update
batch is small — the common case: daily updates ≪ dimension), closed
history is touched by NOTHING (append-only), and the whole apply is one
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _attrs_differ(attrs: list[str], left: str, right: str) -> Column:
    """Null-safe "any attribute changed" predicate (<=> negated)."""
    cond = F.lit(False)
    for a in attrs:
        cond = cond | ~F.col(f"{left}.{a}").eqNullSafe(F.col(f"{right}.{a}"))
    return cond


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
) -> DataFrame:
    """Apply ``updates`` (one row per key: key + attrs) to the versioned
    ``current`` (key + attrs + effective_from + effective_to, open rows
    have effective_to NULL) as of ``ts``. Returns the new snapshot:

    - keys whose attrs changed: the open row is CLOSED at ``ts`` and a
      new open row starts at ``ts``;
    - brand-new keys: a new open row starts at ``ts``;
    - unchanged keys and all already-closed history: carried verbatim.

    ``ts`` may be a literal value or a Column. The four output row sets
    are disjoint by construction, so the union is exact — no dedup pass.
    """
    ts_col = ts if isinstance(ts, Column) else F.lit(ts)
    ts_col = ts_col.cast(dict(current.dtypes)[effective_from])
    cols = [key, *attrs, effective_from, effective_to]

    closed = current.filter(F.col(effective_to).isNotNull()).select(*cols)
    open_rows = current.filter(F.col(effective_to).isNull()).alias("cur")
    upd = updates.select(key, *attrs).alias("upd")

    j = upd.join(open_rows, on=F.col(f"upd.{key}") == F.col(f"cur.{key}"), how="left")
    is_new = F.col(f"cur.{key}").isNull()
    changed = j.filter(is_new | _attrs_differ(attrs, "upd", "cur"))
    changed_keys = changed.select(F.col(f"upd.{key}").alias(key))

    # open rows whose key got a different value: close them at ts
    closing = (
        open_rows.join(changed_keys, on=key, how="semi")
        .select(
            key,
            *attrs,
            effective_from,
        )
        .withColumn(effective_to, ts_col)
        .select(*cols)
    )
    # open rows untouched by this batch (or touched with identical attrs)
    untouched = open_rows.join(changed_keys, on=key, how="anti").select(*cols)
    # fresh open versions for every changed/new key
    fresh = (
        changed.select(
            F.col(f"upd.{key}").alias(key),
            *[F.col(f"upd.{a}").alias(a) for a in attrs],
        )
        .withColumn(effective_from, ts_col)
        .withColumn(effective_to, F.lit(None).cast(dict(current.dtypes)[effective_to]))
        .select(*cols)
    )
    return closed.union(closing).union(untouched).union(fresh)


def scd2_snapshot_at(
    dim: DataFrame,
    at,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
) -> DataFrame:
    """Point-in-time view of a versioned dimension: rows whose
    [effective_from, effective_to) interval covers ``at`` (open rows
    cover everything from effective_from on). The time-travel read that
    makes SCD2 history queryable with a plain filter — pushed to the
    scan, so a date-partitioned dimension prunes to one version set."""
    at_col = (at if isinstance(at, Column) else F.lit(at)).cast(
        dict(dim.dtypes)[effective_from]
    )
    return dim.filter(
        (F.col(effective_from) <= at_col)
        & (F.col(effective_to).isNull() | (F.col(effective_to) > at_col))
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC change log (Debezium/Delta-CDF shape) to a snapshot:
    MERGE semantics without a transactional table format.

    ``changes`` carries one row per change event: ``key``, a sequence
    column (LSN / commit timestamp), an op column with ``'I'`` (insert),
    ``'U'`` (update) or ``'D'`` (delete), and the snapshot's attribute
    columns. Per key the NET effect is the event with the highest
    ``(seq, op)`` — the deterministic lexicographic tiebreak means a
    same-seq U beats an I beats a D; feed unique sequence numbers if the
    source distinguishes them. Then:

    - net I/U → the key's row becomes the change's attributes (upsert);
    - net D   → the key disappears;
    - untouched keys pass through verbatim.

    Plan: ONE shuffle keyed on ``key`` for the per-key latest-event
    window (map-side combinable in principle via max-struct, window keeps
    it simple and the change batch is the small side), then an anti-join
    of the snapshot against changed keys (broadcastable — daily change
    batches ≪ snapshot at warehouse scale) plus a union. Closed nothing:
    the snapshot is read once, history untouched.
    """
    from pyspark.sql import Window

    attrs = [c for c in snapshot.columns if c != key]
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    net = (
        changes.select(key, op_col, seq_col, *attrs)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    changed_keys = net.select(key)
    upserts = net.filter(F.col(op_col) != "D").select(key, *attrs)
    survivors = snapshot.join(changed_keys, key, "anti").select(key, *attrs)
    return survivors.union(upserts)
