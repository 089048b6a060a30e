"""Time-bucketed rollups (hypertable-style continuous aggregates).

The warehouse pattern behind "dashboard reads must not rescan 100 TB of
raw events": periodically materialize per-(bucket, key) partial
aggregates, then serve queries by MERGING the materialized partials with
a fresh aggregation of only the raw tail past the rollup's high-water
mark. Correct because the partials chosen here (count, sum, min, max)
are commutative monoids — re-aggregating partials equals aggregating raw
rows, which is exactly what the driver-contract oracle checks.

Scale shape: the rollup build is one windowed groupBy over the raw
range (map-side combine applies); the merged read touches only
|buckets × keys| rollup rows + the raw tail. Persist rollups partitioned
by bucket date so reads prune to the queried time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_AGGS = ("n", "sum_value", "min_value", "max_value")


def build_time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    grain: str = "1 hour",
) -> DataFrame:
    """Materializable partial aggregates per (time bucket, key):
    (bucket_start, key, n, sum/min/max of value). Persist the result
    (e.g. ``.write.partitionBy(to_date(bucket_start))``) and append new
    buckets incrementally as the watermark advances."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), grain)["start"].alias("bucket_start"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def merged_rollup(
    rollup: DataFrame,
    raw_tail: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    grain: str = "1 hour",
) -> DataFrame:
    """Serve the full time range: union the materialized rollup with a
    fresh rollup of the raw tail, then merge partials per (bucket, key).
    ``raw_tail`` must start exactly at the rollup's high-water mark (no
    overlap, no gap) — the caller owns that bookkeeping, typically via a
    watermark column stored with the rollup."""
    tail = build_time_rollup(raw_tail, ts_col, key_col, value_col, grain)
    return (
        rollup.select("bucket_start", "key", *ROLLUP_AGGS)
        .unionByName(tail.select("bucket_start", "key", *ROLLUP_AGGS))
        .groupBy("bucket_start", "key")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
