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

from valentinus_spark.functions.text import normalize_text, sha_hash60, word_tokens
from valentinus_spark.functions.util import ensure_parallelism

# Broadcast gate for the winnowing fingerprint index (two long columns —
# the same byte math as graph.py's _EDGE_BROADCAST_ROWS: 8M rows ≈
# 128 MB raw, a few hundred MB built; the explicit hint bypasses
# autoBroadcastJoinThreshold, so the gate itself is the budget check).
_FP_BROADCAST_ROWS = 8_000_000


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


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Positional winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every character k-gram of the normalized
    text, slide a window of ``window`` consecutive hashes, and in each
    window select the RIGHTMOST minimal hash. Deduplicating selections by
    position yields a fingerprint set with the winnowing guarantee: any
    shared substring of length ≥ window + k − 1 contributes at least one
    shared fingerprint — a detection guarantee the min-k sketch
    (functions/text.py::rolling_fingerprint) cannot give, at an expected
    density of 2/(window+1) fingerprints per character.

    Documents shorter than k + window − 1 characters fall back to a
    single window over all their k-grams (short docs still fingerprint);
    documents shorter than k yield no rows.

    Returns (``id_col``, ``pos``, ``fp``) — 1-based k-gram position of
    each selected fingerprint and its hash value — one row per selected
    (position, hash).

    ``hash_fn="sha256"`` switches to the portable 60-bit hash so the
    whole selection replays in the DuckDB oracle; xxhash64 stays the
    corpus-scale default.

    Scale shape: everything up to the final explode is a per-row
    Catalyst expression over arrays sized by the document (no shuffle,
    no UDF); the explode emits ~2·len/(window+1) rows per doc — smaller
    than the text itself. Whole-stage codegen end to end."""
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k} window={window}")
    s = normalize_text(text_col)
    hasher = F.xxhash64 if hash_fn == "xxhash64" else sha_hash60
    m = F.length(s) - k + 1  # number of k-grams
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m), lambda i: hasher(F.substring(s, i, F.lit(k)))
        ),
    ).otherwise(F.array().cast("array<long>"))
    # repartition BEFORE the hashing select: a single-file input would
    # otherwise compute every per-character hash in one task (the
    # repartition boundary is a shuffle, so expressions after it run at
    # full parallelism; before it they run at the file's parallelism)
    out = ensure_parallelism(df).select(F.col(id_col), grams.alias("_g"))
    wlen = F.least(F.lit(window), F.size("_g"))  # short-doc fallback window
    nwin = F.size("_g") - wlen + 1

    def _pick(j):
        sl = F.slice(F.col("_g"), j, wlen)
        mn = F.array_min(sl)
        rpos = F.array_position(F.reverse(sl), mn)  # 1-based from the right
        return F.struct(
            (j + wlen - rpos).cast("long").alias("pos"), mn.alias("fp")
        )

    sel = F.when(
        F.size("_g") >= 1,
        F.array_distinct(F.transform(F.sequence(F.lit(1), nwin), _pick)),
    ).otherwise(F.array().cast("array<struct<pos:long,fp:long>>"))
    return out.select(id_col, F.explode(sel).alias("_s")).select(
        id_col, F.col("_s.pos").alias("pos"), F.col("_s.fp").alias("fp")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` distinct winnowing
    fingerprints — the MOSS plagiarism-candidate join, here serving as
    substring-level near-dup detection (catches partial containment that
    whole-document MinHash dilutes away: a page quoting three paragraphs
    of another still shares those paragraphs' fingerprints).

    Returns (``id_a``, ``id_b``, ``n_shared``, ``overlap``) with
    id_a < id_b; overlap = n_shared / |fps(a) ∪ fps(b)| (Jaccard over
    distinct fingerprint values, rounded to 4).

    Scale shape: fingerprint inverted index (one explode + distinct),
    then fingerprints appearing in more than ``max_df`` documents are
    dropped BEFORE the self-join (boilerplate fingerprints — headers,
    license blocks — are the skew keys; dropping them is standard and
    bounds the join fan-out at Σ df² ≤ max_df · Σ df). One equi-join on
    the fingerprint value, one pair-keyed aggregate. No cartesian."""
    # fps feeds four consumers (sizes, dfreq, both join sides); without a
    # checkpoint the per-character hashing re-runs for each — the same
    # multiply-consumed-frame pattern dedup.py truncates with
    # localCheckpoint (materialize once, ~2·len/(window+1) longs per doc,
    # far smaller than the text it came from)
    fps = (
        winnow_fingerprints(df, id_col, text_col, k, window, hash_fn)
        .select(F.col(id_col).alias("_id"), "fp")
        .distinct()
        .localCheckpoint()
    )
    sizes = fps.groupBy("_id").agg(F.count(F.lit(1)).alias("_nfp"))
    dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
    idx = fps.join(
        dfreq.filter((F.col("_df") >= 2) & (F.col("_df") <= max_df)).select("fp"),
        "fp",
    )
    a = idx.select(F.col("_id").alias("id_a"), "fp")
    b = idx.select(F.col("_id").alias("id_b"), "fp")
    # size-gated broadcast of the build side (the graph family's edge
    # gate, same two-long-columns byte math): the checkpointed fps count
    # bounds the df-capped index from above, so when it fits, the probe
    # side never shuffles or sorts for this join; above the gate the
    # shuffled join stands (the SCALE.md df-capped bound still holds)
    if fps.count() <= _FP_BROADCAST_ROWS:
        b = F.broadcast(b)
    pairs = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(sizes.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_nfp", "_na")
        .join(sizes.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumnRenamed("_nfp", "_nb")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("_na") + F.col("_nb") - F.col("n_shared")),
                4,
            ).alias("overlap"),
        )
    )


def ql_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = 300.0,
) -> DataFrame:
    """Top-k documents by Dirichlet-smoothed query likelihood (Zhai &
    Lafferty 2001) — the language-modeling retrieval family, scoring
    score(d) = Σ_t log((tf_td + μ·p(t|C)) / (|d| + μ)) over query terms,
    where p(t|C) is the term's corpus unigram probability. The natural
    fusion partner for :func:`bm25_topk` (probabilistic vs LM ranking
    disagree exactly where fusion helps — see :func:`rrf_fuse`).

    Documents missing a query term still score it (the μ·p(t|C) mass),
    so the candidate set is any doc containing ≥1 query term, scored
    with per-term fallback for the absent ones.

    Returns (id, score) ordered by score desc, id asc.

    Scale shape: same postings skeleton as BM25 — explode restricted to
    the q query terms, one doc-keyed shuffle for tf, a q-row corpus-prob
    aggregate broadcast back, score, top-k via TakeOrderedAndProject.
    One corpus scan."""
    qterms = sorted({t.lower() for t in terms})
    if not qterms:
        raise ValueError("empty query")
    toks = ensure_parallelism(df.filter(F.trim(F.col(text_col)) != "")).select(
        F.col(id_col).alias("_id"),
        word_tokens(normalize_text(text_col)).alias("_toks"),
    )
    postings = toks.select(
        "_id", F.size("_toks").alias("_dl"), F.explode("_toks").alias("term")
    )
    corpus = toks.agg(F.sum(F.size("_toks")).alias("_ctot"))
    cf = (
        postings.filter(F.col("term").isin(qterms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_cf"))
    )
    # per-doc tf for query terms only
    tf = (
        postings.filter(F.col("term").isin(qterms))
        .groupBy("_id", "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    # candidate docs: any doc with >= 1 query term; attach all q terms
    # (missing ones score the smoothing-only mass)
    cand = tf.select("_id", "_dl").distinct()
    qdf = df.sparkSession.createDataFrame([(t,) for t in qterms], "term string")
    full = cand.crossJoin(F.broadcast(qdf))  # |cand| × q rows, q is tiny
    scored = (
        full.join(tf, ["_id", "_dl", "term"], "left")
        .join(F.broadcast(cf), "term", "left")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_term_score",
            F.log(
                (
                    F.coalesce(F.col("_tf"), F.lit(0))
                    + F.lit(mu)
                    * F.coalesce(F.col("_cf"), F.lit(0))
                    / F.col("_ctot")
                )
                / (F.col("_dl") + F.lit(mu))
            ),
        )
    )
    return (
        scored.groupBy(F.col("_id").alias(id_col))
        .agg(F.round(F.sum("_term_score"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009):
    score(d) = Σ_lists 1/(k0 + rank_list(d)), ranks 1-based within each
    list by that list's own order. RRF is THE standard way to combine
    lexical (BM25) and semantic (embedding) retrieval without score
    calibration — only ranks matter, so incomparable score scales fuse
    cleanly.

    Each input DataFrame must have ``id_col`` and a ``score`` column
    (higher = better); ties break by id ascending, matching every
    retrieval operator in this module.

    Returns (id, rrf_score, n_lists) — fused top-``topk`` by score desc,
    id asc, with how many input lists ranked the doc.

    Scale shape: inputs are top-k lists (tiny by construction), so the
    per-list rank window and the fused aggregate are bounded by
    Σ list sizes, not the corpus; the expensive work happened inside the
    upstream retrievals. Window over a ~k-row frame is deliberate."""
    if not rankings:
        raise ValueError("need at least one ranking")
    from pyspark.sql import Window

    tagged = []
    for i, r in enumerate(rankings):
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        tagged.append(
            r.select(
                F.col(id_col).alias("_id"),
                F.row_number().over(w).alias("_rank"),
            )
        )
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    return (
        u.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.round(F.sum(1.0 / (F.lit(k0) + F.col("_rank"))), 6).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(topk)
    )


def winnow_shared_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
    gap: int = 20,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Localize WHERE two documents overlap: for every pair that
    :func:`winnow_overlap_pairs` would surface, merge the positions of
    their shared fingerprints into character spans (gaps-and-islands
    with a ``gap``-char tolerance) — the step after pair detection that
    a reviewer actually reads ("these 2 docs share paragraphs 3-5"),
    and the MOSS report format. Spans are per SIDE: one row per
    (pair, side, island), ``span_start``/``span_end`` as 1-based
    character offsets into the normalized text (a selected k-gram at
    position p covers chars [p, p+k-1], so islands extend k-1 past
    their last fingerprint).

    Returns (``id_a``, ``id_b``, ``side`` 'a'|'b', ``span_start``,
    ``span_end``, ``n_fps``) ordered within pair by side, start.

    Scale shape: the pair join is the df-capped fingerprint inverted
    index (same bound as winnow_overlap_pairs); islands are one
    lag+cumsum window partitioned by (pair, side) — parallel across
    pairs, tiny frames within. The two reused frames are materialized
    once: the df-capped index (``idx``) feeds both sides of the
    candidate join instead of re-deriving distinct+df-filter per use,
    and the candidate (pair, fp) join itself is built ONCE — the
    qualifying pairs AND the shared-fp list are both derived from it
    (a count-filter and a semi-join), where the original plan ran the
    index self-join a second time to rediscover the shared fps
    (27 pre-AQE Exchanges → 14, measured in PLANS.md)."""
    from pyspark.sql import Window

    fps = (
        winnow_fingerprints(df, id_col, text_col, k, window, hash_fn)
        .select(F.col(id_col).alias("_id"), "pos", "fp")
        .localCheckpoint()
    )
    dfps = fps.select("_id", "fp").distinct()
    dfreq = dfps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
    keep = dfreq.filter(
        (F.col("_df") >= 2) & (F.col("_df") <= max_df)
    ).select("fp")
    # materialized: reused by both candidate-join sides (bounded by the
    # fingerprint count — strictly smaller than the checkpointed fps)
    idx = dfps.join(keep, "fp").localCheckpoint()
    # candidate (pair, fp) rows — size bounded by Σ_fp df²/2 ≤
    # max_df/2 · |index| (the documented df-cap bound); built once,
    # consumed twice below. Same size-gated broadcast as
    # winnow_overlap_pairs: idx is checkpointed, so its count is free
    # and exact.
    bside = idx.select(F.col("_id").alias("id_b"), "fp")
    if idx.count() <= _FP_BROADCAST_ROWS:
        bside = F.broadcast(bside)
    cand = (
        idx.select(F.col("_id").alias("id_a"), "fp")
        .join(bside, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .localCheckpoint()
    )
    pairs = (
        cand.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_n_shared"))
        .filter(F.col("_n_shared") >= min_shared)
        .select("id_a", "id_b")
    )
    # shared fp VALUES per pair = the candidate rows of qualifying pairs
    shared = cand.join(pairs, ["id_a", "id_b"], "left_semi")
    sides = (
        shared.join(
            fps.select(F.col("_id").alias("id_a"), "fp", F.col("pos").alias("_p")),
            ["id_a", "fp"],
        )
        .select("id_a", "id_b", F.lit("a").alias("side"), F.col("_p"))
        .unionByName(
            shared.join(
                fps.select(F.col("_id").alias("id_b"), "fp", F.col("pos").alias("_p")),
                ["id_b", "fp"],
            ).select("id_a", "id_b", F.lit("b").alias("side"), F.col("_p"))
        )
        .distinct()
    )
    wseq = Window.partitionBy("id_a", "id_b", "side").orderBy("_p")
    islands = (
        sides.withColumn("_prev", F.lag("_p").over(wseq))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("_p") - F.col("_prev") > F.lit(gap)),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_isl",
            F.sum("_new").over(
                wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        islands.groupBy("id_a", "id_b", "side", "_isl")
        .agg(
            F.min("_p").alias("span_start"),
            (F.max("_p") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_fps"),
        )
        .drop("_isl")
        .orderBy("id_a", "id_b", "side", "span_start")
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    topk: int = 30,
    iterations: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """Corpus-level TextRank keywords (Mihalcea & Tarau, EMNLP 2004):
    build the word co-occurrence graph — an undirected edge between
    consecutive non-stopword tokens (window 2 over the stopword-filtered
    sequence; unweighted, the paper's base variant) — and run PageRank
    over it: keywords are words that co-occur with many other
    well-connected words, a graph recursion TF-IDF's counting cannot
    express. Returns the top ``topk`` rows (``word``, ``rank``), rank
    rounded to 6, ordered by rank desc then word.

    Reuses :func:`valentinus_spark.operators.graph.pagerank` (9-dp
    per-round pinning) over :func:`symmetric_edges`, so the whole
    recursion replays in the DuckDB oracle's recursive CTE.

    Scale shape: tokenization and pair extraction are row-local; the
    edge list is DISTINCT (vocabulary² bounded, in practice ~linear in
    corpus bytes with a long tail), and the rank loop is
    iterations × (join + agg) on the vocabulary-sized node set — the
    graph is corpus-SUMMARY-sized, not corpus-sized.
    """
    from valentinus_spark.functions.text import ENGLISH_STOPWORDS
    from valentinus_spark.operators.graph import pagerank, symmetric_edges

    stop = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    toks = docs.select(
        F.filter(
            word_tokens(normalize_text(text_col)),
            lambda t: (t != "") & ~F.array_contains(stop, t),
        ).alias("_w")
    ).filter(F.size("_w") >= 2)
    n = F.size("_w")
    pairs = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice("_w", 1, n - 1).alias("a"),
                    F.slice(F.col("_w"), 2, n - 1).alias("b"),
                )
            ).alias("_p")
        )
        .select(F.col("_p.a").alias("src"), F.col("_p.b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    ranks = pagerank(
        symmetric_edges(pairs), iterations=iterations, damping=damping
    )
    return (
        ranks.select(
            F.col("node").alias("word"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.col("rank").desc(), F.col("word").asc())
        .limit(topk)
    )


def build_trigram_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-trigram index: (trigram, doc_id), distinct — the
    pg_trgm shape that turns arbitrary SUBSTRING search (LIKE
    '%needle%', which no B-tree/prefix index can serve) into an
    index-join candidate prune. Row-local extraction over the
    lowercased text; at corpus scale persist it bucketed BY TRIGRAM
    (sources/tables.py::write_bucketed) so a search reads only its
    pattern's posting lists."""
    t = F.lower(F.col(text_col))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - 2, F.lit(0))),
            lambda i: F.substring(t, i, F.lit(3)),
        )
    )
    return (
        ensure_parallelism(df)
        .filter(F.length(t) >= 3)
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("trigram"))
    )


def substring_search(
    df: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Documents whose text CONTAINS ``pattern`` (case-insensitive plain
    substring), served by the trigram index: a doc can only contain the
    pattern if it contains EVERY trigram of the pattern, so the index
    join prunes candidates before the exact ``contains`` verify —
    lossless by construction (the verify re-applies the real
    predicate). Patterns shorter than 3 chars fall back to the full
    scan (no trigram to prune on). Returns (``doc_id``) ordered.

    Scale shape: the index filter pushes the pattern's trigrams to the
    (trigram-bucketed) index scan; candidates are bounded by the
    RAREST trigram's posting list; only candidates' text is read for
    the verify — the pg_trgm plan, distributed.
    """
    pat = pattern.lower()
    needles = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    verify = F.contains(F.lower(F.col(text_col)), F.lit(pat))
    if not needles:
        return (
            df.filter(verify)
            .select(F.col(id_col).alias("doc_id"))
            .orderBy("doc_id")
        )
    idx = index if index is not None else build_trigram_index(df, id_col, text_col)
    cand = (
        idx.filter(F.col("trigram").isin(needles))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == len(needles))
        .select("doc_id")
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
        .join(cand, "doc_id", "semi")
        .filter(verify)
        .select("doc_id")
        .orderBy("doc_id")
    )


def rake_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 30,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — the shuffle-light
    companion to :func:`textrank_keywords`: candidate phrases are the
    maximal stopword-free token runs (stopwords act as DELIMITERS
    rather than being dropped, so multi-word phrases survive intact),
    each word scores degree/frequency (degree = Σ length of the
    phrases it appears in — co-occurrence credit), and a phrase scores
    the sum of its words' scores. Returns the top ``topk`` rows
    (``phrase``, ``score``, ``n_occ``), score rounded to 6, ordered by
    score desc then phrase.

    Determinism: degree and frequency are exact BIGINTs; per-word
    scores are 9-dp-pinned and the per-phrase sum accumulates
    DECIMAL(18,9) (order-free); the top-k cut orders by the ROUNDED
    score with a phrase tie-break.

    Scale shape: tokenization/run-splitting is one window cumsum
    partitioned by document (row-local after the per-doc sort); word
    stats are one map-side-combined aggregate over phrase words; the
    scoring join broadcasts the vocabulary-sized stats table.
    """
    from pyspark.sql import Window

    from valentinus_spark.functions.text import ENGLISH_STOPWORDS

    stop = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(word_tokens(normalize_text(text_col))).alias("_i", "_t"),
    ).withColumn(
        "_stop", (F.col("_t") == "") | F.array_contains(stop, F.col("_t"))
    )
    w = Window.partitionBy("_id").orderBy("_i")
    runs = tok.withColumn(
        "_rid", F.sum(F.col("_stop").cast("int")).over(w)
    ).filter(~F.col("_stop"))
    ph = runs.groupBy("_id", "_rid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_t"))),
                lambda s: s["_t"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("_len"),
    )
    words = ph.select(
        "_id", "_rid", "phrase", "_len", F.explode(F.split("phrase", " ")).alias("_w")
    )
    wstats = words.groupBy("_w").agg(
        F.count(F.lit(1)).alias("_freq"), F.sum("_len").alias("_deg")
    )
    wscore = F.round(
        F.col("_deg").cast("double") / F.col("_freq").cast("double"), 9
    )
    occ = (
        words.join(F.broadcast(wstats.withColumn("_ws", wscore)), "_w")
        .groupBy("_id", "_rid", "phrase")
        .agg(
            F.sum(F.col("_ws").cast("decimal(18,9)"))
            .cast("double")
            .alias("_raw")
        )
    )
    return (
        occ.groupBy("phrase")
        .agg(
            F.round(F.max("_raw"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(topk)
    )


def texttiling_boundaries(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 20,
) -> DataFrame:
    """TextTiling topic segmentation (Hearst 1997, the block-comparison
    form): split each document into ``block_tokens``-token pseudo-
    sentences, score every gap by the cosine similarity of the
    adjacent blocks' term-count vectors, convert to DEPTH scores
    (how far the gap sits below its neighboring similarity peaks), and
    mark boundaries where depth exceeds Hearst's cutoff
    (mean − std/2 of the document's depths). The semantic chunker for
    RAG/context-window pipelines — unlike fixed-length doc_chunks it
    cuts where the vocabulary actually shifts.

    Returns one row per gap: (``id_col``, ``gap``, ``sim``, ``depth``,
    ``is_boundary``) — gap g sits between blocks g and g+1 (0-based),
    sim/depth rounded to 6, ordered by (id, gap). Documents with < 2
    blocks produce no rows.

    Determinism: block term counts are exact BIGINTs; cosine =
    dot/(||a||·||b||) is one pinned double expression rounded to 9
    before the depth window; per-doc depth mean/std use DECIMAL sums
    of the 9-dp depths ((18,9)² = (37,18) exact); the boundary compare
    runs on 9-dp-rounded cutoffs.

    Scale shape: tokenize+explode is one corpus scan; block vectors
    aggregate on (doc, block, token) with map-side combine; the gap
    join is (doc, token)-keyed between ADJACENT blocks only (no
    all-pairs); depth/cutoff are per-doc windows over gap counts
    (document-length-bounded, not corpus-bounded).
    """
    from pyspark.sql import Window

    def _r6(c):
        # floor-based HALF_UP 6-dp rounding (values here are >= 0):
        # both engines execute the identical (x*1e6 + 0.5 -> floor ->
        # /1e6) op sequence, where native ROUND diverges between
        # Spark's exact-decimal rounding and DuckDB's multiply trick on
        # the very same double (observed at sim = 0.5204165).
        return F.floor(c * 1000000.0 + 0.5) / 1000000.0

    # spread the single-file scan before the per-character tokenize
    # (the winnowing/shingling cliff), and materialize the block term
    # counts ONCE: four consumers (nblocks, norms, both dot sides)
    # otherwise replay the tokenize+explode+aggregate per branch —
    # r10 stage profile showed five one-task stages of ~1.7 s each
    # doing exactly that replay
    tok = ensure_parallelism(docs).select(
        F.col(id_col).alias("_id"),
        F.posexplode(word_tokens(normalize_text(text_col))).alias("_i", "_t"),
    ).select(
        "_id", (F.col("_i") / block_tokens).cast("int").alias("_b"), "_t"
    )
    counts = tok.groupBy("_id", "_b", "_t").agg(
        F.count(F.lit(1)).alias("_c")
    ).localCheckpoint()
    nblocks = counts.groupBy("_id").agg((F.max("_b") + 1).alias("_nb"))
    norms = counts.groupBy("_id", "_b").agg(
        F.sum(F.col("_c") * F.col("_c")).alias("_n2")
    )
    a = counts.select("_id", F.col("_b").alias("_g"), "_t", F.col("_c").alias("_ca"))
    b = counts.select(
        "_id", (F.col("_b") - 1).alias("_g"), "_t", F.col("_c").alias("_cb")
    )
    dots = (
        a.join(b, ["_id", "_g", "_t"])
        .groupBy("_id", "_g")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_dot"))
    )
    na = norms.select("_id", F.col("_b").alias("_g"), F.col("_n2").alias("_na"))
    nb = norms.select(
        "_id", (F.col("_b") - 1).alias("_g"), F.col("_n2").alias("_nb2")
    )
    # dense gap spine: adjacent blocks sharing NO token still form a
    # gap (sim 0) — derive gaps from the block count, not from dots
    gaps = nblocks.filter(F.col("_nb") >= 2).select(
        "_id",
        F.explode(F.sequence(F.lit(0), F.col("_nb") - 2)).alias("_g"),
    )
    sims = (
        gaps.join(dots, ["_id", "_g"], "left")
        .join(na, ["_id", "_g"])
        .join(nb, ["_id", "_g"])
        .select(
            "_id",
            "_g",
            _r6(
                F.coalesce(F.col("_dot"), F.lit(0)).cast("double")
                / (
                    F.sqrt(F.col("_na").cast("double"))
                    * F.sqrt(F.col("_nb2").cast("double"))
                )
            ).alias("_s"),
        )
    )
    w = Window.partitionBy("_id").orderBy("_g")
    depth = sims.select(
        "_id",
        "_g",
        "_s",
        _r6(
            F.greatest(
                F.lit(0.0),
                F.coalesce(F.lag("_s").over(w), F.col("_s")) - F.col("_s"),
            )
            + F.greatest(
                F.lit(0.0),
                F.coalesce(F.lead("_s").over(w), F.col("_s")) - F.col("_s"),
            )
        ).alias("_d"),
    )
    dd = F.col("_d").cast("decimal(18,6)")
    stats = depth.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_gc"),
        F.sum(dd).cast("double").alias("_s1"),
        F.sum((dd * dd).cast("decimal(38,12)")).cast("double").alias("_s2"),
    )
    gc = F.col("_gc").cast("double")
    mean = F.col("_s1") / gc
    var = F.col("_s2") / gc - mean * mean
    cut = stats.select(
        "_id",
        _r6(
            mean - F.when(var > 0, F.sqrt(var)).otherwise(0.0) / 2.0
        ).alias("_cut"),
    )
    return (
        depth.join(F.broadcast(cut), "_id")
        .select(
            F.col("_id").alias(id_col),
            F.col("_g").alias("gap"),
            F.col("_s").alias("sim"),
            F.col("_d").alias("depth"),
            # depth > 0 guard: with near-uniform depths Hearst's cutoff
            # (mean - std/2) can go negative, which would flag every
            # flat gap; a zero-depth gap is never a boundary
            ((F.col("_d") > 0) & (F.col("_d") > F.col("_cut"))).alias(
                "is_boundary"
            ),
        )
        .orderBy(id_col, "gap")
    )


def bm25f_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    title_chars: int = 120,
    title_weight: float = 2.0,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k by simplified BM25F (Robertson-Zaragoza-Taylor 2004) over
    two pseudo-fields — title (the first ``title_chars`` characters)
    and body — the field-weighted upgrade of :func:`bm25_topk`: a hit
    in the title is worth ``title_weight``× a body hit, with PER-FIELD
    length normalization (the part naive field-concatenation-with-
    boosts gets wrong):

        x̃(d,t) = Σ_f w_f · tf_f / B_f,
        B_f = (1 − b) + b·len_f/avglen_f,
        score = Σ_t idf(t) · x̃ / (k1 + x̃)

    idf is document-level (a doc counts once however many fields hit).
    Returns (id, score) ordered (score DESC, id ASC), limited to k.

    Determinism: the two-field x̃ is an explicit two-term expression
    (fixed order); per-term scores are 9-dp-rounded and
    DECIMAL-summed per doc, so term iteration order cannot reorder
    the ranking; ties break on id.

    Scale shape: same as bm25_topk — one tokenize scan per field
    carried in a single projection, postings filtered to the query
    terms BEFORE any shuffle, broadcast df/avg stats, top-k heap.
    """
    tl = F.substring(F.col(text_col), 1, title_chars)
    bd = F.substring(F.col(text_col), title_chars + 1, 1 << 30)
    toks = ensure_parallelism(
        df.filter(F.trim(F.col(text_col)) != "")
    ).select(
        F.col(id_col).alias("_id"),
        word_tokens(normalize_text(tl)).alias("_tt"),
        word_tokens(normalize_text(bd)).alias("_tb"),
    )
    lens = toks.select(
        "_id", F.size("_tt").alias("_dlt"), F.size("_tb").alias("_dlb")
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.avg("_dlt").alias("_avgt"),
        F.avg("_dlb").alias("_avgb"),
    )
    tset = list(terms)
    base = toks.select(
        "_id",
        F.size("_tt").alias("_dlt"),
        F.size("_tb").alias("_dlb"),
        F.filter("_tt", lambda x: x.isin(tset)).alias("_ht"),
        F.filter("_tb", lambda x: x.isin(tset)).alias("_hb"),
    ).filter((F.size("_ht") > 0) | (F.size("_hb") > 0))
    tdf = base.sparkSession.createDataFrame([(t,) for t in tset], ["term"])
    tf = base.join(F.broadcast(tdf)).select(
        "_id",
        "term",
        "_dlt",
        "_dlb",
        F.size(F.filter("_ht", lambda x: x == F.col("term"))).alias("_tft"),
        F.size(F.filter("_hb", lambda x: x == F.col("term"))).alias("_tfb"),
    ).filter((F.col("_tft") > 0) | (F.col("_tfb") > 0))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    # a corpus-wide-empty field (avg length 0) would make dl/avg NaN;
    # its tf is 0 everywhere, so pin its normalizer to 1 and the field
    # contributes exactly 0
    bt = F.when(
        F.col("_avgt") > 0,
        (1.0 - b) + b * F.col("_dlt").cast("double") / F.col("_avgt"),
    ).otherwise(F.lit(1.0))
    bb = F.when(
        F.col("_avgb") > 0,
        (1.0 - b) + b * F.col("_dlb").cast("double") / F.col("_avgb"),
    ).otherwise(F.lit(1.0))
    xt = (
        F.lit(float(title_weight)) * F.col("_tft").cast("double") / bt
        + F.col("_tfb").cast("double") / bb
    )
    idf = F.log(
        (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = F.round(idf * xt / (F.lit(float(k1)) + xt), 9).cast(
        "decimal(28,9)"
    )
    return (
        j.select("_id", term_score.alias("_ts"))
        .groupBy("_id")
        .agg(F.round(F.sum("_ts").cast("double"), 6).alias("score"))
        .select(F.col("_id").alias(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
