"""Plan-shape utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Repartition iff the input is underpartitioned for the cluster.

    Small parquet inputs (one file → one split) otherwise serialize every
    downstream per-row computation onto a single core — a 32× slowdown on
    local[32] measured on the shingling operators. On genuinely large
    inputs (≥ defaultParallelism/2 splits) this is a no-op, so operators
    can call it unconditionally without risking a 100 TB reshuffle."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_factor)):
        return df.repartition(target)
    return df
