"""Benchmark-contamination screening: flag training documents that overlap
an evaluation set's n-grams (the decontamination step every serious
training-data pipeline runs; see GPT-3 §C / PaLM-style 13-gram screens —
same shape here, with the n configurable).

The reference engine has no equivalent (it stores and queries vectors
only); this is part of the training-pipeline extension surface.

Scale shape: the benchmark side is SMALL by definition (eval suites are
thousands of documents, the corpus is billions), so its distinct shingle
set is broadcast — the 100 TB corpus is scanned once, each document's
shingles checked against the broadcast hash set via an equi-join that
never shuffles the corpus text, only (doc_id, matched-shingle) hits.
xxhash64 shingle keys keep the broadcast table 8 bytes/entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from valentinus_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
    word_tokens,
)


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per corpus document: how much of it appears verbatim (as word
    n-grams) in the benchmark. Returns (id_col, n_shingles,
    n_contaminated, contamination) where contamination =
    n_contaminated / n_shingles ∈ [0, 1]. Filter ``contamination > 0``
    (strict) or a higher cutoff before training."""
    def shingled(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_toks", word_tokens(normalize_text(text_col)))
            .select(
                F.col(id_col),
                F.explode(
                    F.array_distinct(shingles_from_tokens("_toks", n))
                ).alias("_sh"),
            )
            .select(id_col, F.xxhash64("_sh").alias("_shingle"))
        )

    corpus_sh = shingled(corpus)
    bench_sh = F.broadcast(
        shingled(benchmark).select("_shingle").distinct()
    )
    sizes = corpus_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        corpus_sh.join(bench_sh, "_shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        sizes.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0))
        )
        .withColumn(
            "contamination",
            F.col("n_contaminated") / F.col("n_shingles").cast("double"),
        )
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-space decontamination: per corpus vector, the maximum
    cosine similarity against the benchmark set, and whether it crosses
    ``threshold`` — the semantic companion to the verbatim n-gram screen
    (:func:`benchmark_contamination`). Verbatim screens miss paraphrased
    or reformatted eval leakage; near-identical embeddings catch it
    (SemDeDup-style reasoning applied to train/eval separation).

    Returns (``id_col``, ``max_cosine`` rounded 4, ``contaminated``).

    Scale shape: the benchmark side is SMALL by definition (eval suites,
    not corpora), so it broadcasts; the corpus scans once through a
    broadcast nested-loop join — n·m cosine evaluations, m bounded —
    then a corpus-keyed max. The 100 TB side never shuffles. For
    benchmark sets too big to broadcast, pre-bucket both sides with the
    IVF/LSH machinery in operators/similarity.py instead."""
    from valentinus_spark.functions.util import ensure_parallelism

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    b = benchmark.select(F.col(vec_col).cast("array<double>").alias("_bv"))
    dot = F.aggregate(
        F.zip_with("_cv", "_bv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    # zero-norm guard (the functions/vector.py cosine convention): an
    # all-zero embedding scores 0 instead of an ANSI divide-by-zero
    denom = nrm(F.col("_cv")) * nrm(F.col("_bv"))
    cos = F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))
    return (
        c.crossJoin(F.broadcast(b))
        .select("_cid", cos.alias("_cos"))
        .groupBy(F.col("_cid").alias(id_col))
        .agg(F.round(F.max("_cos"), 4).alias("max_cosine"))
        .withColumn("contaminated", F.col("max_cosine") >= threshold)
    )
