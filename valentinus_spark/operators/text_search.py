"""Keyword search: BM25 scoring over a document corpus, pure DataFrame ops.

Complements the embedding similarity surface (a training-data pipeline
filters/ranks by keyword relevance as well as by vector similarity; the
reference has no keyword search at all — SURVEY.md §2.4).

Plan shape: tokenize (materialized, see shingles_from_tokens note) →
explode to (doc, term) postings restricted to the query terms → term
frequencies (one shuffle keyed by doc), document frequencies (tiny agg,
broadcast back) → score → sum per doc → top-k. Corpus-level stats (N,
avgdl) ride along via a broadcast 1-row crossJoin, so there is no
driver-side collect anywhere and the corpus is scanned once.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from valentinus_spark.functions.text import normalize_text, word_tokens
from valentinus_spark.functions.util import ensure_parallelism


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 for a bag of query terms.

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  (Lucene-style, ≥ 0)
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·|d|/avgdl))

    Returns (id, score) ordered by score desc, id asc."""
    toks = ensure_parallelism(df.filter(F.trim(F.col(text_col)) != "")).select(
        F.col(id_col).alias("_id"),
        word_tokens(normalize_text(text_col)).alias("_toks"),
    )
    lens = toks.select("_id", F.size("_toks").alias("_dl"))
    # carry _dl through the postings so scoring needs no join back to lens
    # (one fewer shuffle; _dl is constant per _id so grouping on it is free)
    postings = toks.select(
        "_id", F.size("_toks").alias("_dl"), F.explode("_toks").alias("term")
    ).filter(F.col("term").isin(list(terms)))

    stats = lens.agg(
        F.count(F.lit(1)).alias("_n_docs"), F.avg("_dl").alias("_avgdl")
    )
    tf = postings.groupBy("_id", "_dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(F.sum("term_score").alias("score"))
        .select(F.col("_id").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
