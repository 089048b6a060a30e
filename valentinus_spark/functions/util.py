"""Plan-shape utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


def no_pushdown(pred: Column) -> Column:
    """Pin a filter predicate where it is written — Catalyst must not push
    it down the plan.

    PushDownPredicates moves deterministic predicates through
    Project/Repartition with their defining expressions INLINED. When the
    predicate is built from expensive computed columns (a full repetition
    profile, a shingle pipeline), pushdown re-evaluates all of it at the
    scan — on the scan's partitioning, which for a small parquet input is
    ONE partition, serializing the whole computation onto a single core
    (quality_filter measured 70.8 s → 1.7 s at sf0.1 from this wrapper
    alone). Wrapping in a nondeterministic-but-constant guard
    (``rand(7) < 2`` is always true) makes the predicate ineligible for
    every pushdown rule while changing no semantics. At genuine scale the
    scan is many-partitioned and the un-pushed filter simply runs fused
    with the projection above the (no-op) repartition — nothing is lost.

    Construction notes (both verified on pyspark 4.1.2): the guard must be
    the CASE *condition* — ``guard AND pred`` gets conjunct-split and the
    deterministic half pushed anyway — and it must not be a rand()
    comparison, which Spark 4 now folds to a literal. A CASE on
    ``monotonically_increasing_id() >= 0`` (nondeterministic, trivially
    true, unfoldable) survives."""
    return F.when(F.monotonically_increasing_id() >= 0, pred).otherwise(
        F.lit(False)
    )


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
