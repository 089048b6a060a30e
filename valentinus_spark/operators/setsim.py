"""All-pairs set-similarity join with prefix filtering (PPJoin family:
Chaudhuri et al. 2006 SSJoin, Xiao et al. 2008 PPJoin).

Exact token-set Jaccard join at corpus scale. The naive candidate
generator — join documents on ANY shared token — explodes on frequent
tokens: a stopword appearing in f documents alone contributes f²/2
candidate pairs. Prefix filtering is the classic *lossless* fix:

  1. impose one global token order, rarest first (ties broken by the
     token string so the order is deterministic);
  2. for a document with k distinct tokens and threshold t, index only
     its PREFIX — the first ``k - ceil(t*k) + 1`` tokens in that order;
  3. two documents with Jaccard ≥ t MUST share a prefix token (if they
     shared none, the overlap would be at most min(k_a,k_b) - p tokens,
     below the t bound), so joining on prefix tokens alone loses no
     qualifying pair;
  4. verify surviving candidates with the exact Jaccard.

Because the global order puts RARE tokens in prefixes, the join key
frequency distribution collapses: stopwords sort last and almost never
land in a prefix, so the f²/2 blowup disappears while recall stays
exactly 100%. The oracle proves the losslessness claim per run — it
brute-forces the full token equi-join and must hash-match.

Spark shape: token freq = one map-side-combined count; prefix selection
= one row_number window per doc (partitioned by doc id — no global
sort); candidates = one equi-join on prefix token + distinct on the
pair; verification joins each pair to its (array_sort'ed) token set and
computes ``array_intersect`` sizes JVM-side. No Python UDFs, no
cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from valentinus_spark.functions.text import normalize_text, word_tokens


def _doc_tokens(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int | None = None
) -> DataFrame:
    """(id, token) — distinct word tokens of the normalized text, or
    distinct ``shingle_n``-word shingles (same construction as the
    n-gram dedup family, so the two operators agree on set semantics).
    Shingles are the right element set when single tokens are too
    common to discriminate (small vocabularies, boilerplate-heavy
    corpora): the element space grows like vocab**n, so element
    frequencies — and with them both engines' token-join fan-outs —
    collapse."""
    from valentinus_spark.functions.util import ensure_parallelism

    toks = word_tokens(normalize_text(text_col))
    if shingle_n is not None:
        from valentinus_spark.functions.text import shingles_from_tokens

        elems = F.array_distinct(
            shingles_from_tokens(toks, shingle_n)
        )
    else:
        elems = F.array_distinct(toks)
    # single-file inputs otherwise shingle on ONE core — the same
    # measured cliff _shingle_sets documents (7.5s vs 0.7s on 5k docs);
    # the empty-text prefilter is a cheap scan-pushed predicate
    return ensure_parallelism(
        df.filter(F.trim(F.col(text_col)) != "")
    ).select(
        F.col(id_col).alias("_sid"), F.explode(elems).alias("_tok")
    )


def _prefix_tokens(tok, threshold: float):
    """PPJoin prefix stage: per set, the (sz - ceil(t*sz) + 1) globally
    RAREST tokens (ties by token value). Extracted so the skew stress
    test (test_setsim.py) can assert the candidate-generation property
    directly: a corpus-dominating hot token sorts LAST in every set's
    frequency order and therefore never enters a prefix of any set with
    more than prefix-length tokens — the f²/2 hot-token blowup is
    structurally excluded, not merely verified away."""
    freq = tok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_tf"))
    ranked = tok.join(freq, "_tok")
    w = Window.partitionBy("_sid").orderBy(F.asc("_tf"), F.asc("_tok"))
    sized = ranked.select(
        "_sid",
        "_tok",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("_sid")).alias("_sz"),
    )
    # epsilon guard on the ceil: in doubles 0.8*10 = 8.000000000000002,
    # whose ceil (9) would SHORTEN the prefix below the lossless bound
    # and silently drop boundary pairs. Subtracting 1 ulp-scale epsilon
    # can only lengthen the prefix — extra candidates, never lost ones;
    # the exact verify below still decides membership.
    return sized.where(
        F.col("_rn")
        <= F.col("_sz")
        - F.ceil(F.lit(threshold) * F.col("_sz") - F.lit(1e-9))
        + 1
    )


def set_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_n: int | None = None,
) -> DataFrame:
    """Exact all-pairs token-set Jaccard ≥ ``threshold`` via prefix
    filtering. Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b``
    and jaccard rounded to 4 places. Candidates come only from shared
    PREFIX tokens (see module docstring) — lossless by the prefix-filter
    theorem — then every candidate is verified exactly."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    tok = _doc_tokens(df, id_col, text_col, shingle_n)
    prefix = _prefix_tokens(tok, threshold)
    a = prefix.select(
        F.col("_tok"), F.col("_sid").alias("id_a"), F.col("_sz").alias("_sza")
    )
    b = prefix.select(
        F.col("_tok"), F.col("_sid").alias("id_b"), F.col("_sz").alias("_szb")
    )
    cands = (
        a.join(b, "_tok")
        .where(F.col("id_a") < F.col("id_b"))
        # size filter: Jaccard >= t forces t*max(sz) <= min(sz); the
        # same epsilon keeps an exact-boundary pair (e.g. an 8-subset
        # of a 10-set at t=0.8) from being excluded by one ulp
        .where(
            F.greatest("_sza", "_szb") * F.lit(threshold)
            <= F.least("_sza", "_szb") + F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sets = tok.groupBy("_sid").agg(
        F.array_sort(F.collect_set("_tok")).alias("_set")
    )
    verified = (
        cands.join(sets.withColumnRenamed("_sid", "id_a"), "id_a")
        .withColumnRenamed("_set", "_set_a")
        .join(sets.withColumnRenamed("_sid", "id_b"), "id_b")
        .withColumnRenamed("_set", "_set_b")
        .withColumn(
            "_inter", F.size(F.array_intersect("_set_a", "_set_b"))
        )
        .withColumn(
            "_jac",
            F.col("_inter")
            / (F.size("_set_a") + F.size("_set_b") - F.col("_inter")),
        )
        .where(F.col("_jac") >= threshold)
    )
    return verified.select(
        "id_a", "id_b", F.round("_jac", 4).alias("jaccard")
    )


def set_containment_join(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_text: str,
    corpus_id: str,
    corpus_text: str,
    threshold: float = 0.8,
    shingle_n: int | None = None,
) -> DataFrame:
    """Asymmetric containment join: pairs where at least ``threshold``
    of the QUERY's token set appears in the corpus document —
    ``|q ∩ c| / |q| ≥ t``. This, not symmetric Jaccard, is the right
    measure for benchmark contamination (a 100-token test item buried
    in a 10k-token crawl page has Jaccard ≈ 0.01 but containment 1.0).

    Prefix filtering adapts asymmetrically: only the QUERY side can be
    prefix-pruned (containment bounds the overlap relative to |q|
    alone, so a qualifying pair must hit one of q's
    ``|q| - ceil(t·|q|) + 1`` rarest tokens — rarest by CORPUS
    document frequency, the side being probed); the corpus side indexes
    every token, like an inverted index. No size filter exists — a
    10k-token page may contain any query. Returns
    ``(query_id, corpus_id, containment)`` rounded to 4 places; every
    candidate is verified exactly, so the prefix step cannot change
    results, only cost."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    qtok = _doc_tokens(queries, query_id, query_text, shingle_n)
    ctok = _doc_tokens(corpus, corpus_id, corpus_text, shingle_n)
    # rank query tokens by how often they appear across CORPUS docs
    # (absent-from-corpus tokens rank rarest of all: df 0)
    cdf = ctok.groupBy("_tok").agg(F.count(F.lit(1)).alias("_tf"))
    ranked = qtok.join(cdf, "_tok", "left").withColumn(
        "_tf", F.coalesce("_tf", F.lit(0))
    )
    w = Window.partitionBy("_sid").orderBy(F.asc("_tf"), F.asc("_tok"))
    sized = ranked.select(
        "_sid",
        "_tok",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("_sid")).alias("_sz"),
    )
    prefix = sized.where(
        F.col("_rn")
        <= F.col("_sz")
        - F.ceil(F.lit(threshold) * F.col("_sz") - F.lit(1e-9))
        + 1
    )
    cands = (
        prefix.select(F.col("_tok"), F.col("_sid").alias("qid"))
        .join(ctok.select(F.col("_tok"), F.col("_sid").alias("cid")), "_tok")
        .select("qid", "cid")
        .distinct()
    )
    qsets = qtok.groupBy("_sid").agg(
        F.array_sort(F.collect_set("_tok")).alias("_qset")
    )
    csets = ctok.groupBy("_sid").agg(
        F.array_sort(F.collect_set("_tok")).alias("_cset")
    )
    verified = (
        cands.join(qsets.withColumnRenamed("_sid", "qid"), "qid")
        .join(csets.withColumnRenamed("_sid", "cid"), "cid")
        .withColumn("_inter", F.size(F.array_intersect("_qset", "_cset")))
        .withColumn("_cont", F.col("_inter") / F.size("_qset"))
        .where(F.col("_cont") >= threshold)
    )
    return verified.select(
        F.col("qid").alias(query_id + "_q"),
        F.col("cid").alias(corpus_id + "_c"),
        F.round("_cont", 4).alias("containment"),
    )


def cosine_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    shingle_n: int | None = None,
) -> DataFrame:
    """Exact all-pairs TF-IDF cosine ≥ ``threshold`` (Bayardo, Ma &
    Srikant, WWW 2007 "Scaling Up All Pairs Similarity Search") — the
    weighted-vector sibling of :func:`set_similarity_join`: documents as
    L2-normalized tf·idf vectors, pairs by exact cosine.

    Candidate pruning is the SUFFIX-NORM prefix filter: order each
    document's terms rarest-first (df asc, term asc — one global order),
    and index a term only while the remaining suffix (that term
    included) still has L2 norm ≥ t. For unit vectors, if the first
    shared term of a pair sits where a's suffix norm is < t, then
    cos(a,b) = Σ_shared u_a·u_b ≤ ‖suffix_a‖·‖u_b‖ < t — so joining
    indexed prefixes on the term is LOSSLESS, and every candidate is
    then verified with the exact dot product. High-df terms carry
    near-zero idf weight, sort last, and thus almost never enter a
    prefix: the stopword f²/2 blowup is structurally excluded, same as
    PPJoin's rare-first prefix.

    Weighting: w = tf · ln((N+1)/(df+1)) (the module's tfidf
    convention), L2-normalized per doc; all-zero-weight docs (every
    term corpus-wide) drop out. Returns (``id_a``, ``id_b``,
    ``cosine``) with id_a < id_b, cosine rounded to 4; the threshold
    compares against the 6dp-rounded dot product so the boundary is
    engine-portable.

    ``shingle_n`` switches the feature space from unigrams to word
    n-grams (same rationale as :func:`set_similarity_join`'s shingle
    mode): on template-heavy corpora, single tokens shared by thousands
    of documents can still rank "rare" WITHIN a document and flood the
    prefix index — measured 10.6M candidates for 2.5k true pairs on the
    sf0.1 fixture — while n-gram features make the prefix genuinely
    discriminative (word order matters) and candidates collapse to
    near the true pair count.

    Scale shape: tf counts (one doc-keyed shuffle), df + corpus size
    (broadcast-sized aggs), per-doc norm and suffix-norm windows
    (partitioned by doc — parallel, no global sort), prefix equi-join on
    the term; verification joins each candidate pair to two per-doc
    sparse-vector MAPS and folds the dot product JVM-side — pair-sized
    rows, never a pair×terms postings shuffle. No cartesian, no UDF."""
    from valentinus_spark.functions.util import ensure_parallelism

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    toks = word_tokens(normalize_text(text_col))
    if shingle_n is not None:
        from valentinus_spark.functions.text import shingles_from_tokens

        feats = shingles_from_tokens(toks, shingle_n)
    else:
        feats = toks
    base = ensure_parallelism(df.filter(F.trim(F.col(text_col)) != "")).select(
        F.col(id_col).alias("_sid"),
        F.explode(feats).alias("_tok"),
    )
    tfc = base.groupBy("_sid", "_tok").agg(F.count(F.lit(1)).alias("_tf"))
    n = tfc.agg(F.countDistinct("_sid").alias("_n"))
    dfreq = tfc.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    wts = (
        tfc.join(F.broadcast(dfreq), "_tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_w", F.col("_tf") * F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0))
        )
    )
    wdoc = Window.partitionBy("_sid")
    # suffix norm INCLUDING the current term, in the rare-first order
    wsuf = (
        Window.partitionBy("_sid")
        .orderBy(F.asc("_df"), F.asc("_tok"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # BOTH per-doc passes (whole-doc norm + running suffix norm) fold
    # into ONE window stage: the two specs share the _sid partitioning,
    # so the planner stacks them over a single exchange+sort where the
    # former shape paid a second full exchange+sort of the unit table
    # after the checkpoint. _suf = sqrt(Σ_suffix w²)/‖w‖ instead of
    # sqrt(Σ_suffix u²) differs only in float rounding (~1e-16) — the
    # prefix filter's 1e-9 epsilon slack absorbs it, candidates stay a
    # superset of the qualifying pairs, and the exact verify below
    # (computed from _u, unchanged) decides membership as before.
    # unit feeds three consumers (the prefix filter and both verify
    # sides); localCheckpoint materializes the tf/df/norm lineage once —
    # without it the whole tokenize+window chain re-runs per consumer
    # (measured 96s -> ~8s at 5k docs)
    w2 = F.col("_w") * F.col("_w")
    unit = (
        wts.withColumn("_nrm", F.sqrt(F.sum(w2).over(wdoc)))
        .withColumn("_ssq", F.sum(w2).over(wsuf))
        .where(F.col("_nrm") > 0)
        .select(
            "_sid",
            "_tok",
            (F.col("_w") / F.col("_nrm")).alias("_u"),
            (F.sqrt("_ssq") / F.col("_nrm")).alias("_suf"),
        )
        .localCheckpoint()
    )
    prefix = unit.where(F.col("_suf") >= F.lit(threshold) - F.lit(1e-9))
    # second lossless prune, on the joined rows: for a qualifying pair,
    # its FIRST shared token t1 (global order) has cos ≤ suf_a(t1)·
    # suf_b(t1) by Cauchy-Schwarz over the shared support — so the t1
    # row survives suf_a·suf_b ≥ t, and dropping rows below the bound
    # before the pair-distinct can never lose a qualifying pair. On a
    # template-heavy corpus this collapses candidates ~50× (hot prefix
    # tokens sit DEEP in both docs' prefixes, where suffix norms are
    # already near t and their product falls below it).
    par = df.sparkSession.sparkContext.defaultParallelism
    cands = (
        prefix.select(F.col("_tok"), F.col("_sid").alias("id_a"), F.col("_suf").alias("_sufa"))
        .join(
            prefix.select(
                F.col("_tok"), F.col("_sid").alias("id_b"), F.col("_suf").alias("_sufb")
            ),
            "_tok",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.col("_sufa") * F.col("_sufb") >= F.lit(threshold) - F.lit(1e-9))
        .select("id_a", "id_b")
        .distinct()
        # spread the pairs ROUND-ROBIN at an explicit width: the verify
        # projection below folds an interpreted higher-order dot product
        # per pair (~0.2 ms/row — measured 9.6 s vs 0.8 s for 49k pairs
        # at 1 vs 32 partitions) while the pair table is byte-tiny, so
        # AQE's size-based coalescing otherwise funnels the whole verify
        # through one task. Round-robin, not keyed: a keyed repartition
        # on (id_a, id_b) is elided by ENSURE_REQUIREMENTS (the distinct
        # already hash-partitions on the same key) and the distinct's
        # own exchange then coalesces to 1.
        .repartition(par)
    )
    # verify on per-doc sparse-vector maps: each candidate row carries
    # both docs' (term -> u) maps once, and the dot product folds over
    # the smaller doc's entries with element_at lookups — pair-sized
    # join rows instead of the pair x terms postings explosion (the
    # postings-join formulation shuffled 240M rows for 10.6M candidates
    # on the sf0.1 fixture; this ships 2 maps per pair)
    vecs = unit.groupBy("_sid").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_tok"), F.col("_u")))
        ).alias("_vec")
    )
    dot = F.aggregate(
        F.map_entries("_va"),
        F.lit(0.0),
        lambda acc, e: acc
        + F.coalesce(F.element_at("_vb", e["key"]) * e["value"], F.lit(0.0)),
    )
    return (
        cands.join(vecs.select(F.col("_sid").alias("id_a"), F.col("_vec").alias("_va")), "id_a")
        .join(vecs.select(F.col("_sid").alias("id_b"), F.col("_vec").alias("_vb")), "id_b")
        .withColumn("_cos", dot)
        .where(F.round("_cos", 6) >= threshold)
        .select("id_a", "id_b", F.round("_cos", 4).alias("cosine"))
    )
