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
