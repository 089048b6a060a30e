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


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the keyword
    extraction / topic-labelling step of a corpus analysis pipeline.

    tf(t, d) = count(t in d) / |d|;  idf(t) = ln((N + 1)/(df(t) + 1))
    (the +1s keep corpus-wide terms at a small positive idf instead of a
    mass tie at zero).

    Plan shape: explode to (doc, term) postings → per-doc term counts
    (one shuffle keyed on the doc — the same key the tokenize scan
    already carries), document frequencies (an agg whose output is
    |vocab| rows, broadcast back), then a per-doc window for the top-k.
    The window partitions by doc id, so it is partition-parallel; no
    global sort, no driver collect, corpus scanned once.

    Ranking uses the score rounded to 6 decimals (ties broken by term
    asc) so results are reproducible across engines — ln() differs in
    the last ulp between libm implementations, and an unrounded
    order-by would make the top-k boundary engine-dependent.

    Returns (id_col, term, rank, tfidf) with rank 1..k."""
    from pyspark.sql import Window

    toks = ensure_parallelism(df.filter(F.trim(F.col(text_col)) != "")).select(
        F.col(id_col).alias("_id"),
        word_tokens(normalize_text(text_col)).alias("_toks"),
    )
    tf = (
        toks.select(
            "_id", F.size("_toks").alias("_dl"), F.explode("_toks").alias("term")
        )
        .groupBy("_id", "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    n_docs = toks.agg(F.count(F.lit(1)).alias("_n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("_tf") / F.col("_dl"))
                * F.log((F.col("_n_docs") + 1.0) / (F.col("_df") + 1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_id").alias(id_col), "term", "rank", "tfidf")
    )


def build_inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: (term, doc_id, pos) with 1-based token
    positions — the structure behind phrase and proximity queries.

    At corpus scale, persist this bucketed/partitioned BY TERM
    (sources/tables.py write_bucketed): a phrase query then reads only
    its terms' posting partitions (partition pruning on the term filter)
    instead of re-tokenizing the corpus per query."""
    return (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(word_tokens(normalize_text(text_col))).alias("pos0", "term"),
        )
        .select("term", "doc_id", (F.col("pos0") + 1).alias("pos"))
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact-phrase match via posting-list intersection: docs where the
    phrase's tokens appear CONTIGUOUSLY, with match counts.
    Returns (doc_id, n_matches).

    Plan: filter the positional index to the phrase's k terms (pushed to
    the scan — with a term-partitioned index this prunes to k posting
    lists), then k-1 equi-joins on (doc_id, pos ± offset). Join keys are
    (doc, position) pairs, so candidate rows are bounded by the rarest
    term's posting list — the classic intersect-from-rarest shape AQE
    realizes by broadcasting the smaller sides."""
    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("empty phrase")
    idx = index if index is not None else build_inverted_index(df, id_col, text_col)
    base = idx.filter(F.col("term") == words[0]).select("doc_id", "pos")
    for off, w in enumerate(words[1:], start=1):
        nxt = idx.filter(F.col("term") == w).select(
            "doc_id", (F.col("pos") - off).alias("pos")
        )
        base = base.join(nxt, ["doc_id", "pos"])
    return base.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_matches"))


def taxonomy_tags(
    df: DataFrame,
    lexicon: dict[str, Sequence[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dictionary-based topic tagging: count each document's hits against
    a keyword→topic lexicon (the classic curation pass for routing docs
    into domain buckets — code, legal, medical — before mixture planning;
    gazetteer tagging in IE terms). A keyword may belong to several
    topics; matching is exact on lowercased word tokens, so multi-word
    expressions belong in :func:`phrase_search`, not here.

    Returns (``id_col``, ``topic``, ``n_hits``, ``n_keywords``) — total
    keyword occurrences and distinct keywords matched, one row per
    (doc, topic) with ≥1 hit.

    Plan: the lexicon (hundreds of rows, driver-local by definition)
    broadcasts into an equi-join against the exploded token stream —
    tagging is a map-side hash lookup, no shuffle until the (doc, topic)
    aggregate, whose key space is ≤ docs × topics. One corpus scan."""
    rows = [
        (kw.lower(), topic) for topic, kws in sorted(lexicon.items()) for kw in kws
    ]
    if not rows:
        raise ValueError("empty lexicon")
    lex = df.sparkSession.createDataFrame(rows, "_tok string, topic string")
    toks = ensure_parallelism(df.filter(F.trim(F.col(text_col)) != "")).select(
        id_col, F.explode(word_tokens(normalize_text(text_col))).alias("_tok")
    )
    return (
        toks.join(F.broadcast(lex), "_tok")
        .groupBy(id_col, "topic")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("_tok").alias("n_keywords"),
        )
    )
