"""Plan-shape utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_GENERATE_RULE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def disable_generate_filter_inference(spark: SparkSession) -> None:
    """Exclude InferFiltersFromGenerate for this session.

    The rule adds ``size(e) > 0`` filters above every explode; predicate
    pushdown then shoves them below Projects/Repartitions with the full
    generator-input expression INLINED — for shingle/token pipelines that
    re-computes the entire tokenization at the scan, on the scan's (often
    single) input partition, once for the filter and again for the real
    explode. Measured: the inferred filter tripled ngram-jaccard runtime.
    Exclusion is perf-only (the explode itself drops empty inputs).
    Idempotent; preserves any other excluded rules."""
    key = "spark.sql.optimizer.excludedRules"
    current = spark.conf.get(key, None) or ""
    rules = [r for r in current.split(",") if r]
    if _GENERATE_RULE not in rules:
        rules.append(_GENERATE_RULE)
        spark.conf.set(key, ",".join(rules))


def ensure_parallelism(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Repartition iff the input is underpartitioned for the cluster.

    Small parquet inputs (one file → one split) otherwise serialize every
    downstream per-row computation onto a single core — a 32× slowdown on
    local[32] measured on the shingling operators. On genuinely large
    inputs (≥ defaultParallelism/2 splits) this is a no-op, so operators
    can call it unconditionally without risking a 100 TB reshuffle."""
    spark = df.sparkSession
    disable_generate_filter_inference(spark)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_factor)):
        return df.repartition(target)
    return df
