"""Repetition-based quality filtering (Gopher-style, Rae et al. 2021
§A1.1): excessive within-document repetition is the single strongest
low-quality signal in web corpora, so training pipelines gate on the
fraction of a document covered by its most common word / n-gram and by
duplicated longer n-grams.

The reference engine has no text analysis at all (SURVEY.md §2) — this is
training-pipeline extension surface alongside functions/text.py.

Scale shape: every statistic here is computed ROW-LOCALLY — sort the
document's own n-gram array and fold over the runs (``aggregate`` over
``array_sort``), so the whole repetition profile of a 100 TB corpus is one
scan with ZERO shuffles and zero Python. The obvious alternative (explode
to (doc_id, ngram), groupBy count, re-aggregate per doc) shuffles
|tokens| rows per document twice; the fold touches nothing outside the
row. Per-row cost is O(G log G) for the sort, G = n-grams per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from valentinus_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
    word_tokens,
)
from valentinus_spark.functions.util import ensure_parallelism


def _run_stats(array_col_name: str) -> Column:
    """Fold over a SORTED copy of an array column → struct(max_run,
    dup_total): the multiplicity of the most frequent element and the
    total count of elements whose value occurs more than once.

    Equal values are adjacent after array_sort, so one pass tracking the
    current run length suffices. SQL-expr form because the accumulator is
    a named_struct the Python lambda API can't build as cleanly;
    ``array_col_name`` must be a materialized column (see
    shingles_from_tokens for why — no CSE inside higher-order lambdas)."""
    return F.expr(
        f"""
        aggregate(
          array_sort({array_col_name}),
          named_struct('prev', cast(null as string),
                       'run', cast(0 as bigint),
                       'max_run', cast(0 as bigint),
                       'dup', cast(0 as bigint)),
          (acc, x) -> case
            when acc.prev is null then
              named_struct('prev', x, 'run', cast(1 as bigint),
                           'max_run', acc.max_run, 'dup', acc.dup)
            when x = acc.prev then
              named_struct('prev', x, 'run', acc.run + 1,
                           'max_run', acc.max_run, 'dup', acc.dup)
            else
              named_struct('prev', x, 'run', cast(1 as bigint),
                           'max_run', greatest(acc.max_run, acc.run),
                           'dup', acc.dup + if(acc.run > 1, acc.run, cast(0 as bigint)))
          end,
          acc -> named_struct(
              'max_run', greatest(acc.max_run, acc.run),
              'dup', acc.dup + if(acc.run > 1, acc.run, cast(0 as bigint))))
        """
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ngram_ns: tuple[int, ...] = (2, 3),
    dup_ngram_n: int = 5,
) -> DataFrame:
    """Per-document repetition profile:

    - ``n_tokens``: normalized token count;
    - ``distinct_token_ratio``: |distinct tokens| / |tokens| (low ⇒
      repetitive vocabulary);
    - ``top_token_frac``: fraction of tokens that are the single most
      common token (Gopher gates "most common word covers > 20 %");
    - ``top_{n}gram_frac`` for n in ``top_ngram_ns``: fraction of word
      n-grams equal to the most frequent n-gram;
    - ``dup_{dup_ngram_n}gram_frac``: fraction of n-grams whose value
      occurs more than once (Gopher's duplicated-5..10-gram gate).

    All ratios are 0.0 for empty documents (never null, never a divide
    error under ANSI mode)."""
    out = ensure_parallelism(df).withColumn(
        "_toks", word_tokens(normalize_text(text_col))
    )
    n_tok = F.size("_toks").cast("long")
    safe_n = F.when(n_tok > 0, n_tok.cast("double"))
    cols: list[Column] = [
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.coalesce(
            F.size(F.array_distinct("_toks")) / safe_n, F.lit(0.0)
        ).alias("distinct_token_ratio"),
    ]
    out = out.withColumn("_tok_stats", _run_stats("_toks"))
    cols.append(
        F.coalesce(F.col("_tok_stats.max_run") / safe_n, F.lit(0.0)).alias(
            "top_token_frac"
        )
    )
    for n in top_ngram_ns:
        g = f"_g{n}"
        out = out.withColumn(g, shingles_from_tokens("_toks", n)).withColumn(
            g + "_stats", _run_stats(g)
        )
        n_grams = F.size(g).cast("double")
        # gate on n_tokens too: an empty doc still yields one empty-string
        # shingle (shingles_from_tokens's short-doc rule)
        cols.append(
            F.coalesce(
                F.col(f"{g}_stats.max_run")
                / F.when((n_tok > 0) & (n_grams > 0), n_grams),
                F.lit(0.0),
            ).alias(f"top_{n}gram_frac")
        )
    gd = f"_g{dup_ngram_n}d"
    out = out.withColumn(
        gd, shingles_from_tokens("_toks", dup_ngram_n)
    ).withColumn(gd + "_stats", _run_stats(gd))
    nd = F.size(gd).cast("double")
    cols.append(
        F.coalesce(
            F.col(f"{gd}_stats.dup") / F.when((n_tok > 0) & (nd > 0), nd),
            F.lit(0.0),
        ).alias(f"dup_{dup_ngram_n}gram_frac")
    )
    return out.select(*cols)


# Gopher-style default gates (Rae et al. 2021 table A1, adapted to token
# fractions): documents outside any bound are dropped.
DEFAULT_QUALITY_GATES: dict[str, tuple[float | None, float | None]] = {
    # stat: (min allowed, max allowed); None = unbounded on that side
    "n_tokens": (5, 100_000),
    "distinct_token_ratio": (0.1, None),
    "top_token_frac": (None, 0.20),
    "top_2gram_frac": (None, 0.20),
    "top_3gram_frac": (None, 0.18),
    "dup_5gram_frac": (None, 0.30),
}


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id_col, _tok) — one row per token occurrence after
    normalize+tokenize, empty docs dropped at the scan."""
    return (
        ensure_parallelism(df.filter(F.trim(F.col(text_col)) != ""))
        .select(id_col, word_tokens(normalize_text(text_col)).alias("_toks"))
        .select(id_col, F.explode("_toks").alias("_tok"))
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_v: int | None = None,
    oov_logprob: float = -20.0,
) -> DataFrame:
    """Per-document cross-entropy against the corpus's own unigram language
    model: score = -avg(log2 p(w)) over the document's tokens, p(w) =
    corpus count / corpus total. The classic cheap fluency/quality signal
    (CCNet, Wenzek et al. 2020 rank by LM perplexity; unigram is the
    degenerate-but-shuffle-free version): gibberish and boilerplate sit at
    the distribution's tails.

    Output: (id_col, n_tokens, unigram_ce) — unigram_ce in bits/token,
    rounded to 4 (both engines compute the same int/int divisions, and the
    avg's float error is ~1e-12, far inside the rounding).

    Plan: token counts via ONE hash-aggregate over the exploded tokens
    (map-side combine → vocab-sized table, not corpus-sized), then score by
    joining token occurrences to the vocab. The vocab join is a broadcast
    when the vocab fits (``top_v`` caps it explicitly — the LM then
    renormalizes over the kept vocab's mass, and out-of-vocab tokens fall
    back to ``oov_logprob``); with an uncapped vocab AQE picks a shuffle
    join keyed on the token, which is the same key the count aggregate
    already used."""
    toks = _token_rows(df, id_col, text_col)
    counts = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    if top_v is not None:
        counts = counts.orderBy(F.desc("_c"), "_tok").limit(top_v)
    total = counts.agg(F.sum("_c").alias("_total"))
    vocab = counts.crossJoin(F.broadcast(total)).select(
        "_tok", F.log2(F.col("_c") / F.col("_total")).alias("_lp")
    )
    how = "inner" if top_v is None else "left"
    scored = toks.join(
        F.broadcast(vocab) if top_v is not None else vocab, "_tok", how
    )
    return (
        scored.groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg(F.coalesce("_lp", F.lit(oov_logprob))), 4).alias(
                "unigram_ce"
            ),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document conditional cross-entropy against the corpus's own
    bigram language model: score = -avg(log2 p(w_i | w_{i-1})) with
    p(w2|w1) = c(w1 w2) / c(w1 ·). One step up the LM ladder from
    :func:`unigram_logprob` — word-order-blind repetition scores well on
    a unigram model but a shuffled bag of common words scores terribly
    here, which is exactly the fluency distinction CCNet-style filters
    use perplexity for. No smoothing needed: the corpus is scored against
    itself, so every bigram has a count.

    Output: (id_col, n_bigrams, bigram_ce), docs with ≥ 2 tokens only
    (a 1-token doc has no bigrams to score).

    Plan: row-local bigram extraction (transform over the token array —
    no shuffle), ONE hash-aggregate to bigram counts (map-side combined,
    vocab²-bounded but in practice ~corpus-distinct-bigrams), context
    counts DERIVED from the checkpointed bigram table (vocab-sized
    re-aggregate, no second corpus scan), scoring join keyed on the
    bigram."""
    toks = (
        ensure_parallelism(df.filter(F.trim(F.col(text_col)) != ""))
        .select(id_col, word_tokens(normalize_text(text_col)).alias("_toks"))
        .filter(F.size("_toks") >= 2)
    )
    # tokens are \S+ so a space join is unambiguous
    bg = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - 2),
                lambda i: F.struct(
                    F.element_at("_toks", i + 1).alias("w1"),
                    F.concat_ws(
                        " ", F.element_at("_toks", i + 1), F.element_at("_toks", i + 2)
                    ).alias("b"),
                ),
            )
        ).alias("_p"),
    ).select(id_col, F.col("_p.w1").alias("_w1"), F.col("_p.b").alias("_b"))
    c2 = (
        bg.groupBy("_w1", "_b").agg(F.count(F.lit(1)).alias("_c2")).localCheckpoint()
    )
    c1 = c2.groupBy("_w1").agg(F.sum("_c2").alias("_c1"))
    probs = c2.join(c1, "_w1").select(
        "_b", F.log2(F.col("_c2") / F.col("_c1")).alias("_lp")
    )
    return (
        bg.join(probs, "_b")
        .groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg("_lp"), 4).alias("bigram_ce"),
        )
    )


def source_token_kl(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group KL divergence of the group's token distribution from the
    whole-corpus distribution: KL(p_g ‖ p) = Σ_w p_g(w) · log2(p_g(w)/p(w)).
    The standard corpus-drift / source-skew monitor — a source whose
    language diverges from the mixture shows up immediately, before any
    model ever trains on it.

    Output: (group_col, n_tokens, kl_bits), kl rounded to 4.

    Plan: one exploded-token scan feeding two hash-aggregates — counts by
    (group, token) and by token (both map-side combined down to vocab-sized
    tables) — then an equi-join on the token and a final tiny aggregate to
    one row per group. Every token in a group is in the corpus by
    construction, so the KL is always finite; no smoothing needed."""
    toks = _token_rows(df, group_col, text_col)
    # materialize the (group × token) counts ONCE: every later table —
    # corpus counts, group totals, corpus total — derives from this
    # vocab-sized result, so the corpus is scanned/tokenized exactly one
    # time (without the checkpoint, lineage recomputes the token explode
    # per consumer; measured 3× the runtime)
    g_counts = (
        toks.groupBy(group_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_gc"))
        .localCheckpoint()
    )
    c_counts = g_counts.groupBy("_tok").agg(F.sum("_gc").alias("_cc"))
    c_total = c_counts.agg(F.sum("_cc").alias("_ct"))
    g_totals = g_counts.groupBy(group_col).agg(F.sum("_gc").alias("_gt"))
    joined = (
        g_counts.join(c_counts, "_tok")
        .join(F.broadcast(g_totals), group_col)
        .crossJoin(F.broadcast(c_total))
    )
    term = (F.col("_gc") / F.col("_gt")) * F.log2(
        (F.col("_gc") / F.col("_gt")) / (F.col("_cc") / F.col("_ct"))
    )
    return (
        joined.groupBy(group_col)
        .agg(
            F.max("_gt").alias("n_tokens"),
            F.round(F.sum(term), 4).alias("kl_bits"),
        )
    )


def relative_outlier_filter(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``value_col`` sits inside the [lo, hi] percentile
    band WITHIN their group — relative outlier trimming (drop the shortest
    and longest 5 % per language) instead of absolute thresholds, which
    never fit every language/source at once.

    Exactness: percent_rank = (rank−1)/(n−1) is a pure rational of row
    counts — no interpolation, so any engine computes the identical band
    (ties share a rank in SQL semantics everywhere). A single-row group
    has percent_rank 0 and is kept whenever lo ≤ 0.

    Scale shape: one hash-partition-by-group + in-partition sort (the
    standard window shuffle); groups are languages/sources, so cardinality
    is tiny but rows per group are huge — for skewed groups prefer
    pre-aggregating exact thresholds via groupBy(value).count() when the
    value domain is small, or approxQuantile when ±ε is acceptable."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(value_col)
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter((F.col("_pr") >= lo) & (F.col("_pr") <= hi))
        .drop("_pr")
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gates: dict[str, tuple[float | None, float | None]] | None = None,
) -> DataFrame:
    """Filter a corpus by the repetition gates: returns the rows of ``df``
    whose repetition profile passes every (min, max) bound. One extra
    profile scan + a key-join back to the corpus (the join is on the id,
    so at scale AQE turns it into a shuffle join keyed the same way any
    dedup step already keys)."""
    from valentinus_spark.functions.util import no_pushdown

    gates = DEFAULT_QUALITY_GATES if gates is None else gates
    stats = repetition_stats(df, id_col=id_col, text_col=text_col)
    pred = F.lit(True)
    for stat, (lo, hi) in gates.items():
        if lo is not None:
            pred = pred & (F.col(stat) >= lo)
        if hi is not None:
            pred = pred & (F.col(stat) <= hi)
    # Two-part plan barrier, both parts load-bearing (measured at sf0.1):
    # - no_pushdown stops the gate predicate passing the exchange (pushed
    #   to the scan it runs on the scan's partitioning: 70.8 s);
    # - repartition(id_col) stops PushDownPredicates walking the gate
    #   through the profile's Project chain, which would INLINE the whole
    #   tokenize/sort/fold pipeline once per gate term — no CSE inside
    #   higher-order lambdas, so ~7× recompute (8.9 s). With both: 1.0 s.
    # The exchange carries only (id, 7 doubles) — ~1% of the text it
    # profiles — and pre-keys the semi-join on the same id.
    keep = (
        stats.repartition(id_col)
        .filter(no_pushdown(pred))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Linear quality classifier (fastText / CCNet-style)
# ---------------------------------------------------------------------------

#: Hand-set weights over the text_quality features (a stand-in for a
#: trained fastText/logreg quality model, whose inference is exactly this
#: dot product).  Signs follow the usual web-corpus heuristics: prose-like
#: word length and stopword density up-weight; punctuation/digit soup
#: down-weights; log document length gives longer docs a mild boost.
DEFAULT_SCORE_WEIGHTS: dict[str, float] = {
    "avg_word_len": 0.30,
    "punct_ratio": -8.0,
    "digit_ratio": -10.0,
    "stopword_ratio": 4.0,
    "log_words": 0.35,
}
DEFAULT_SCORE_BIAS = -2.0


def linear_quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    bias: float = DEFAULT_SCORE_BIAS,
    threshold: float = 0.5,
    return_features: bool = False,
) -> DataFrame:
    """Model-based quality scoring: ``sigmoid(bias + w · features)`` per
    document, the inference step of a fastText/logistic-regression quality
    classifier (CCNet, Wenzek et al. 2019 §4.3 use exactly this shape to
    rank Common Crawl against Wikipedia).

    The reference engine has no quality scoring (SURVEY.md §2); this is
    training-pipeline extension surface.  The feature vector is the
    Catalyst-native :func:`text_quality` struct plus ``log(1+n_words)``,
    so the whole classifier is ONE projection in a single corpus scan —
    zero shuffles, zero Python, fully whole-stage-codegen — and at 100 TB
    it fuses into whatever scan the pipeline is already doing.  Swapping
    in real trained weights is a dict argument, not a code change.

    Returns ``id_col, quality_score, kept`` (+ the feature columns when
    ``return_features``).  Null-safe: empty documents have all-zero
    features and score ``sigmoid(bias)``.
    """
    from valentinus_spark.functions.text import text_quality, word_tokens

    w = DEFAULT_SCORE_WEIGHTS if weights is None else weights
    q = text_quality(text_col)
    feats: dict[str, Column] = {
        "avg_word_len": F.coalesce(q["avg_word_len"], F.lit(0.0)),
        "punct_ratio": F.coalesce(q["punct_ratio"], F.lit(0.0)),
        "digit_ratio": F.coalesce(q["digit_ratio"], F.lit(0.0)),
        "stopword_ratio": F.coalesce(q["stopword_ratio"], F.lit(0.0)),
        "log_words": F.log1p(F.size(word_tokens(text_col)).cast("double")),
    }
    unknown = set(w) - set(feats)
    if unknown:
        raise ValueError(f"unknown feature(s) in weights: {sorted(unknown)}")
    z = F.lit(float(bias))
    for name, weight in w.items():
        z = z + F.lit(float(weight)) * feats[name]
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    cols = [F.col(id_col)]
    if return_features:
        cols += [c.alias(n) for n, c in feats.items()]
    cols += [score.alias("quality_score"), (score >= F.lit(threshold)).alias("kept")]
    return df.select(*cols)


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a [0,1]-scored quality classifier: rows
    bin by equal-width score intervals; each bin reports its empirical
    positive rate against its mean predicted score. The per-bin gap
    (and its count-weighted sum, the Expected Calibration Error) is what
    decides whether a quality score can be THRESHOLDED at a target
    precision or must be recalibrated first — the standard gate before a
    classifier-filtered pretraining corpus (Guo et al. 2017, "On
    Calibration of Modern Neural Networks").

    Returns one row per non-empty bin: (bin, bin_lo, bin_hi, n_rows,
    mean_score, positive_rate, abs_gap). ECE = Σ n_rows/N · abs_gap over
    the result — left to the caller, who often wants per-source ECE via
    a groupBy on this output.

    Scale shape: ONE map-side-combinable aggregate over (bin) — no
    window, no join; score 1.0 closes into the top bin (least(floor, n-1))
    so the domain edge doesn't create a phantom bin."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.withColumn("_bin", b)
        .groupBy("_bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.avg(F.col(score_col)).alias("mean_score"),
            F.avg(F.col(label_col).cast("double")).alias("positive_rate"),
        )
        .select(
            F.col("_bin").alias("bin"),
            (F.col("_bin") / n_bins).alias("bin_lo"),
            ((F.col("_bin") + 1) / n_bins).alias("bin_hi"),
            "n_rows",
            "mean_score",
            "positive_rate",
            F.abs(F.col("mean_score") - F.col("positive_rate")).alias("abs_gap"),
        )
        .orderBy("bin")
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
    score_decimals: int = 4,
) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney U statistic — the quality-gate
    metric for any classifier used in curation (lang-id, quality, PII):
    ``AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)``, computed
    tie-correctly from per-distinct-score counts:
    ``AUC = Σ_s n⁺(s) · (N⁻_below(s) + n⁻(s)/2) / (P·N)``.

    Scores are rounded to ``score_decimals`` first — classifier scores
    are ~uniformly informative past 4 decimals, and the rounding bounds
    the distinct-score table (≤ 10^decimals rows) that the cumulative
    window runs over, which is what keeps this scale-safe: the ONLY
    unpartitioned work is a window over that bounded table, never over
    rows. Counts stay integer until the final division.

    Output per group: (``n_pos``, ``n_neg``, ``auc`` rounded to 6)."""
    keys = [group_col] if group_col else []
    s = F.round(F.col(score_col).cast("double"), score_decimals)
    lab = F.col(label_col).cast("boolean")
    per_score = (
        df.select(*keys, s.alias("_s"), lab.alias("_y"))
        .groupBy(*keys, "_s")
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_np"),
            F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("_nn"),
        )
    )
    w = (
        Window.partitionBy(*keys).orderBy("_s")
        if keys
        else Window.partitionBy(F.lit(1)).orderBy("_s")
    ).rowsBetween(Window.unboundedPreceding, -1)
    stats = per_score.withColumn(
        "_below", F.coalesce(F.sum("_nn").over(w), F.lit(0))
    )
    # Σ n⁺·(2·below + n⁻) stays integer; halve once at the end
    num = F.sum(F.col("_np") * (2 * F.col("_below") + F.col("_nn")))
    return (
        stats.groupBy(*keys)
        .agg(
            F.sum("_np").alias("n_pos"),
            F.sum("_nn").alias("n_neg"),
            num.alias("_num2"),
        )
        .where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            *keys,
            "n_pos",
            "n_neg",
            F.round(
                F.col("_num2")
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc"),
        )
    )


def trigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """Per-document cross-entropy against an interpolated trigram LM
    (Jelinek-Mercer deleted interpolation — the classical n-gram
    smoothing):

        p(w3 | w1 w2) = λ3·c(w1w2w3)/c(w1w2·) + λ2·c(w2w3)/c(w2·)
                        + λ1·c(w3)/N

    scored as -avg(log2 p) over the document's trigram positions. The
    next rung of the LM ladder after :func:`bigram_logprob`: a doc of
    locally-plausible word pairs in an implausible order (spun/stitched
    text, the classic SEO-spam signature) passes the bigram screen but
    scores poorly here, while interpolation keeps rare-but-legitimate
    trigrams from being over-penalized the way a raw trigram MLE would.

    Output: (id_col, ``n_trigrams``, ``trigram_ce`` rounded 4), docs
    with ≥ 3 tokens only. λs must be positive and sum to 1.

    Plan: row-local trigram extraction (transform over the token array,
    no shuffle), ONE hash-aggregate to trigram counts (map-side
    combined; context counts derive from the checkpointed trigram table,
    bigram/unigram counts from their own streams), then a scoring join
    per n-gram order — all keyed on the n-gram string, all vocab-sized
    tables against the corpus-sized position stream."""
    l3, l2, l1 = lambdas
    if min(lambdas) <= 0 or abs(l1 + l2 + l3 - 1.0) > 1e-9:
        raise ValueError(f"lambdas must be positive and sum to 1, got {lambdas}")
    # toks feeds four consumers (trigram, bigram, unigram streams and
    # the token total) — checkpoint so tokenization runs once
    toks = (
        ensure_parallelism(df.filter(F.trim(F.col(text_col)) != ""))
        .select(id_col, word_tokens(normalize_text(text_col)).alias("_toks"))
        .filter(F.size("_toks") >= 3)
        .localCheckpoint()
    )
    tg = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - 3),
                lambda i: F.struct(
                    F.concat_ws(
                        " ", F.element_at("_toks", i + 1), F.element_at("_toks", i + 2)
                    ).alias("ctx"),
                    F.concat_ws(
                        " ",
                        F.element_at("_toks", i + 1),
                        F.element_at("_toks", i + 2),
                        F.element_at("_toks", i + 3),
                    ).alias("t"),
                    F.concat_ws(
                        " ", F.element_at("_toks", i + 2), F.element_at("_toks", i + 3)
                    ).alias("bg"),
                    F.element_at("_toks", i + 2).alias("w2"),
                    F.element_at("_toks", i + 3).alias("w3"),
                ),
            )
        ).alias("_p"),
    ).select(
        id_col,
        F.col("_p.ctx").alias("_ctx"),
        F.col("_p.t").alias("_t"),
        F.col("_p.bg").alias("_bg"),
        F.col("_p.w2").alias("_w2"),
        F.col("_p.w3").alias("_w3"),
    )
    c3 = tg.groupBy("_ctx", "_t").agg(F.count(F.lit(1)).alias("_c3")).localCheckpoint()
    cctx = c3.groupBy("_ctx").agg(F.sum("_c3").alias("_cctx"))
    # bigram/unigram models from their own full streams (n-1 / n
    # positions per doc), not the trigram-truncated ones
    bg_all = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - 2),
                lambda i: F.struct(
                    F.concat_ws(
                        " ", F.element_at("_toks", i + 1), F.element_at("_toks", i + 2)
                    ).alias("bg"),
                    F.element_at("_toks", i + 1).alias("w1"),
                ),
            )
        ).alias("_q")
    ).select(F.col("_q.bg").alias("_bg"), F.col("_q.w1").alias("_w1"))
    cb = bg_all.groupBy("_bg").agg(F.count(F.lit(1)).alias("_cb")).localCheckpoint()
    uni = toks.select(F.explode("_toks").alias("_w"))
    c1 = uni.groupBy("_w").agg(F.count(F.lit(1)).alias("_c1")).localCheckpoint()
    ntot = uni.agg(F.count(F.lit(1)).alias("_n"))
    # context count for the bigram term: c(w2 ·) = occurrences of w2 as
    # a bigram LEFT word (so the bigram ratio is a proper conditional)
    cw = bg_all.groupBy(F.col("_w1").alias("_w2")).agg(
        F.count(F.lit(1)).alias("_cw")
    )
    scored = (
        tg.join(c3, ["_ctx", "_t"])
        .join(cctx, "_ctx")
        .join(cb, "_bg")
        .join(cw, "_w2")
        .join(c1.withColumnRenamed("_w", "_w3"), "_w3")
        .crossJoin(F.broadcast(ntot))
        .withColumn(
            "_p",
            F.lit(l3) * F.col("_c3") / F.col("_cctx")
            + F.lit(l2) * F.col("_cb") / F.col("_cw")
            + F.lit(l1) * F.col("_c1") / F.col("_n"),
        )
    )
    return (
        scored.groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(-F.avg(F.log2("_p")), 4).alias("trigram_ce"),
        )
    )


def flesch_readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade (Flesch 1948, Kincaid
    1975) per document — the classic surface-readability score, used in
    corpus curation to bucket documents by audience level and to flag
    boilerplate (very high FRE) or OCR soup (very low / negative FRE):

        FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
        FKG = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    Counting is a deterministic heuristic, fully SQL-replayable:
    sentences = runs of ``[.!?]`` (min 1); words = whitespace tokens
    (after normalize); syllables per word = vowel-group runs
    ``[aeiouy]+`` with a floor of 1 so vowel-less tokens ("7", "xkcd")
    still count one. English-centric by construction — meaningful for
    lang='en' buckets, a rough proxy elsewhere.

    Returns (``id_col``, ``n_words``, ``n_sentences``, ``n_syllables``,
    ``fre``, ``fk_grade``) per document with n_words > 0; scores rounded
    to 4.

    Scale shape: narrow map over the corpus — regexp counts and one
    aggregate-over-token-array per row, zero shuffles, whole-stage
    codegen end to end. Embarrassingly parallel at any scale.
    """
    t = df.select(
        F.col(id_col),
        word_tokens(normalize_text(text_col)).alias("_toks"),
        F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)),
        ).alias("n_sentences"),
    )
    syl_per_tok = lambda w: F.greatest(  # noqa: E731
        F.lit(1), F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0))
    )
    t = t.select(
        id_col,
        F.size("_toks").alias("n_words"),
        "n_sentences",
        F.aggregate(
            "_toks", F.lit(0), lambda acc, w: acc + syl_per_tok(F.lower(w))
        ).alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return t.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("fre"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
    )


def lexical_diversity(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-group lexical-diversity panel from the token frequency
    spectrum — the corpus-health dashboard row that separates rich
    natural text from template spam before any model-based scoring:

    * ``ttr``        type-token ratio V/N (collapses on boilerplate)
    * ``hapax_frac`` fraction of vocabulary seen exactly once
      (crawl dirt and OCR noise push it UP, templates push it DOWN)
    * ``yule_k``     Yule's characteristic K = 10⁴·(Σ_f f²·V_f − N)/N²
      — repetition measure that, unlike TTR, is ~invariant to sample
      size (Yule 1944), so groups of different volume compare fairly.

    Returns one row per group: (``group_col``, ``n_tokens``, ``vocab``,
    ``ttr``, ``hapax_frac``, ``yule_k``), ratios rounded to 6; groups
    with < 2 tokens get NULL yule_k (N² denominator degenerate at 0/1).

    Scale shape: one (group, token) count aggregate — map-side
    combined, the only corpus-sized shuffle — then a group-sized fold.
    Σf² and all spectrum sums are exact BIGINTs; floats appear only in
    the final per-group ratios. Same skeleton as source_token_kl.
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(word_tokens(normalize_text(text_col))).alias("_t"),
    )
    freq = toks.groupBy("_g", "_t").agg(F.count(F.lit(1)).alias("_f"))
    agg = freq.groupBy("_g").agg(
        F.sum("_f").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("_f") == 1, 1).otherwise(0)).alias("_hapax"),
        F.sum(F.col("_f") * F.col("_f")).alias("_sf2"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        F.col("_g").alias(group_col),
        "n_tokens",
        "vocab",
        F.round(F.col("vocab") / n, 6).alias("ttr"),
        F.round(F.col("_hapax") / F.col("vocab").cast("double"), 6).alias(
            "hapax_frac"
        ),
        F.round(
            F.when(
                F.col("n_tokens") >= 2,
                1e4 * (F.col("_sf2") - F.col("n_tokens")).cast("double") / (n * n),
            ),
            6,
        ).alias("yule_k"),
    ).orderBy(group_col)


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon entropy of the CHARACTER distribution, in
    bits — the classic cheap garbage detector: base64 blobs and packed
    binary score ~6 bits (near-uniform bytes), natural language ~4-4.5,
    single-char spam ~0. Run it before any model-based quality score;
    it is the filter that catches what token heuristics miss (no
    tokenizer assumption at all).

    Returns (``id_col``, ``n_chars``, ``distinct_chars``, ``entropy``)
    per non-empty document, entropy rounded to 4.

    Scale shape: ZERO shuffles — the char distribution folds row-locally
    over the SORTED char array (run-length fold via ``aggregate``: O(1)
    state, one pass), so the operator is a pure narrow map like
    flesch_readability. The first formulation exploded (doc, char) rows
    through a count aggregate; the fold measures ~4× faster steady-state
    at sf0.1 (≈9 s → 2.1 s) and ships corpus×avg_len fewer rows into the
    map-side combiner. H = log2(n) − (Σ c·log2 c)/n with exact integer
    run lengths; floats only in the per-run log terms.
    """
    # repartition BEFORE the sort/fold — a single-file input otherwise
    # runs the per-doc O(len·log len) sort on one core (shingling-cliff
    # rule)
    cs = F.array_sort(
        F.filter(F.split(F.col(text_col), ""), lambda x: x != F.lit(""))
    )
    # run-length fold over the sorted chars: state = (prev char,
    # current run length, Σ run·log2(run) over closed runs, run count)
    zero = F.struct(
        F.lit("").alias("p"),
        F.lit(0).cast("bigint").alias("r"),
        F.lit(0.0).alias("acc"),
        F.lit(0).cast("bigint").alias("k"),
    )
    run_term = lambda r: F.when(  # noqa: E731
        r > 0, r.cast("double") * F.log2(r.cast("double"))
    ).otherwise(F.lit(0.0))

    def _merge(st, x):
        closing = x != st["p"]
        return F.struct(
            x.alias("p"),
            F.when(closing, F.lit(1).cast("bigint"))
            .otherwise(st["r"] + 1)
            .alias("r"),
            F.when(closing, st["acc"] + run_term(st["r"]))
            .otherwise(st["acc"])
            .alias("acc"),
            F.when(closing, st["k"] + 1).otherwise(st["k"]).alias("k"),
        )

    folded = ensure_parallelism(df).select(
        F.col(id_col),
        F.size(cs).alias("n_chars"),
        F.aggregate(
            cs,
            zero,
            _merge,
            lambda st: F.struct(
                (st["acc"] + run_term(st["r"])).alias("clogc"),
                st["k"].alias("k"),
            ),
        ).alias("_st"),
    ).filter(F.col("n_chars") > 0)
    n = F.col("n_chars").cast("double")
    return folded.select(
        id_col,
        "n_chars",
        F.col("_st.k").alias("distinct_chars"),
        F.round(F.log2(n) - F.col("_st.clogc") / n, 4).alias("entropy"),
    )


def heaps_law(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps' law fit per group: V ≈ k·N^β — vocabulary growth against
    corpus size. β ≈ 0.4-0.6 for natural language; β → 0 means the
    group stopped contributing new vocabulary (template/boilerplate
    saturation — stop ingesting it), β → 1 means near-random strings
    (OCR noise, ids). The one-number answer to "is MORE of this source
    still worth crawling?".

    Docs are ordered by ``id_col`` within the group (deterministic
    replay); each doc contributes one (log10 N_r, log10 V_r) point at
    its cumulative token count N_r and cumulative distinct-vocab count
    V_r, and the fit is plain OLS over the group's points. Returns
    (``group_col``, ``n_docs``, ``n_tokens``, ``vocab``, ``beta``,
    ``k``) rounded to 6 — β NULL for groups with < 2 docs or zero
    x-variance (single prefix size).

    Scale shape: one (group, token) first-occurrence aggregate (min doc
    rank — the only corpus-sized shuffle), two group-keyed window
    cumsums over doc-sized frames, and a group-sized OLS fold. Window
    partitions on the group key; skew = docs per group.
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.explode(word_tokens(normalize_text(text_col))).alias("_t"),
    )
    rank_w = Window.partitionBy("_g").orderBy("_id")
    # per-doc token counts, ranked within group
    doc_n = toks.groupBy("_g", "_id").agg(F.count(F.lit(1)).alias("_dn"))
    doc_n = doc_n.withColumn("_r", F.row_number().over(rank_w))
    # token first occurrence: min doc rank — join rank in via the doc key
    first_seen = (
        toks.join(doc_n.select("_g", "_id", "_r"), ["_g", "_id"])
        .groupBy("_g", "_t")
        .agg(F.min("_r").alias("_fr"))
    )
    new_vocab = first_seen.groupBy("_g", F.col("_fr").alias("_r")).agg(
        F.count(F.lit(1)).alias("_nv")
    )
    cum_w = (
        Window.partitionBy("_g")
        .orderBy("_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pts = (
        doc_n.join(new_vocab, ["_g", "_r"], "left")
        .select(
            "_g",
            "_r",
            F.sum("_dn").over(cum_w).alias("_N"),
            F.sum(F.coalesce("_nv", F.lit(0))).over(cum_w).alias("_V"),
        )
        .filter(F.col("_N") > 0)
        .select(
            "_g",
            # 12-dp-pinned logs cast to DECIMAL so every OLS sum below
            # is EXACT (order-free): raw double sums let partition
            # order flip the SIGN of a ~0 slope (a '0' vs '-0' driver
            # hash mismatch caught by the r6 full sweep)
            F.round(F.log10(F.col("_N").cast("double")), 12)
            .cast("decimal(16,12)")
            .alias("_x"),
            F.round(F.log10(F.col("_V").cast("double")), 12)
            .cast("decimal(16,12)")
            .alias("_y"),
            F.col("_N").alias("_n_cum"),
            F.col("_V").alias("_v_cum"),
        )
    )
    ols = pts.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("_n_cum").alias("n_tokens"),
        F.max("_v_cum").alias("vocab"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxyd"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxxd"),
    )
    n = F.col("n_docs").cast("double")
    ols = ols.select(
        "*",
        (F.col("_sx").cast("double") / n).alias("_mx"),
        (F.col("_sy").cast("double") / n).alias("_my"),
        F.col("_sxyd").cast("double").alias("_sxy"),
        F.col("_sxxd").cast("double").alias("_sxx"),
    )
    varx = F.col("_sxx") - n * F.col("_mx") * F.col("_mx")
    beta = F.when(
        (F.col("n_docs") >= 2) & (varx > 1e-12),
        (F.col("_sxy") - n * F.col("_mx") * F.col("_my")) / varx,
    )
    return ols.select(
        F.col("_g").alias(group_col),
        "n_docs",
        "n_tokens",
        "vocab",
        F.round(beta, 6).alias("beta"),
        F.round(
            F.when(beta.isNotNull(), F.pow(F.lit(10.0), F.col("_my") - beta * F.col("_mx"))),
            6,
        ).alias("k"),
    ).orderBy(group_col)


def term_burstiness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    topk: int = 50,
) -> DataFrame:
    """Term burstiness: the variance-to-mean ratio (index of dispersion)
    of each term's per-document count, over ALL documents (absences
    count as zeros). VMR ≈ 1 is Poisson scatter (function words); VMR ≫
    1 is a BURSTY term — concentrated in few docs at high counts, the
    signature of topical vocabulary, but also of template blocks and
    spam keywords when paired with high df. Church & Gale (1995)
    adaptation used in corpus linguistics; in a curation pipeline the
    high-VMR/high-df corner is the boilerplate candidate list.

    Zeros are handled exactly WITHOUT materializing doc×vocab rows:
    with D docs, per-term Σc and Σc² over docs-containing equal the
    full-population sums (absent docs contribute 0), so

        μ = Σc / D,   s² = (Σc² − D·μ²) / (D − 1),   vmr = s²/μ

    Returns the ``topk`` highest-VMR terms with document frequency ≥
    ``min_df``: (``term``, ``df``, ``total_tf``, ``mean_tf``, ``vmr``),
    rounded to 6, ties broken by term ascending.

    Scale shape: one (doc, term) count aggregate, one term-keyed fold
    (all moment sums exact BIGINTs), a broadcast single-row D, and a
    top-k TakeOrderedAndProject. Never a doc×vocab expansion.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.explode(word_tokens(normalize_text(text_col))).alias("_t"),
    )
    tf = toks.groupBy("_id", "_t").agg(F.count(F.lit(1)).alias("_c"))
    per_term = tf.groupBy("_t").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("_c").alias("total_tf"),
        F.sum(F.col("_c") * F.col("_c")).alias("_sc2"),
    )
    ndocs = df.select(F.count(F.lit(1)).alias("_D"))
    mu = F.col("total_tf").cast("double") / F.col("_D")
    var = (F.col("_sc2") - F.col("_D") * mu * mu) / (F.col("_D") - 1.0)
    scored = (
        per_term.crossJoin(F.broadcast(ndocs))
        .filter((F.col("df") >= min_df) & (F.col("_D") >= 2))
        .select(
            F.col("_t").alias("term"),
            "df",
            "total_tf",
            F.round(mu, 6).alias("mean_tf"),
            F.round(var / mu, 6).alias("vmr"),
        )
    )
    return scored.orderBy(F.desc("vmr"), "term").limit(topk)


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the cheap whole-document
    repetitiveness signal the big web-corpus pipelines gate on (Dolma,
    RefinedWeb: boilerplate, keyword-stuffed spam, and generator loops
    compress far below natural prose; ratio = compressed/raw bytes, so
    LOW is suspicious). Returns (``id_col``, ``n_bytes``,
    ``compression_ratio`` rounded to 6); empty text gets ratio NULL.

    This is a real Python boundary — zlib has no Catalyst equivalent —
    so it runs as ONE Arrow-batched mapInPandas over (id, text), the
    same posture as the media decoders: batch-vectorized, no per-row
    UDF calls, executor-parallel. zlib output is deterministic for a
    fixed level (RFC 1950 fixed algorithm in CPython's bundled zlib),
    which the planted driver oracle relies on.

    Scale shape: embarrassingly parallel single scan; output is two
    numbers per doc. Compose with quality_filter / repetition_stats —
    this catches document-scale repetition their n-gram windows miss.
    """
    import pandas as pd
    from pyspark.sql.types import StructType, StructField, LongType, DoubleType

    def score(it):
        import zlib

        for pdf in it:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n = raw.str.len()
            comp = raw.map(lambda b: len(zlib.compress(b, level)))
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n.astype("int64"),
                    "compression_ratio": [
                        round(c / nb, 6) if nb > 0 else None
                        for c, nb in zip(comp, n)
                    ],
                }
            )
            yield out

    # Output id field keeps the caller's name AND type (a string or
    # renamed id column previously hit an Arrow cast error against the
    # hardcoded 'doc_id long').
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("n_bytes", LongType(), True),
            StructField("compression_ratio", DoubleType(), True),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(score, schema=out_schema)


def good_turing_vocab(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Good-Turing unseen-mass + Chao1 vocabulary-richness estimate per
    group (Good 1953; Chao 1984, bias-corrected form) from the token
    frequency spectrum — the "how much vocabulary haven't we crawled
    yet" panel: P₀ = N₁/N estimates the probability the NEXT token is
    unseen (high → the source is far from exhausted; near 0 → more
    crawl budget buys repetition), and Chao1 lower-bounds the group's
    total vocabulary:

        chao1 = V + N₁(N₁ − 1) / (2(N₂ + 1))

    Returns one row per group: (``group_col``, ``n_tokens``, ``vocab``,
    ``n1``, ``n2``, ``p_unseen``, ``chao1``) — ratios rounded to 6,
    groups with 0 tokens dropped (no spectrum).

    Determinism: the whole spectrum (N, V, N₁, N₂) is exact BIGINT
    counting; the only floats are the two final ratios. Scale shape:
    one (group, token) count aggregate — map-side combined, the only
    corpus-sized shuffle — then a group-sized fold (the
    lexical_diversity skeleton).
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(word_tokens(normalize_text(text_col))).alias("_t"),
    )
    freq = toks.groupBy("_g", "_t").agg(F.count(F.lit(1)).alias("_f"))
    agg = freq.groupBy("_g").agg(
        F.sum("_f").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("_f") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("_f") == 2, 1).otherwise(0)).alias("n2"),
    )
    n1 = F.col("n1").cast("double")
    return agg.select(
        F.col("_g").alias(group_col),
        "n_tokens",
        "vocab",
        "n1",
        "n2",
        F.round(n1 / F.col("n_tokens").cast("double"), 6).alias("p_unseen"),
        F.round(
            F.col("vocab").cast("double")
            + n1 * (n1 - 1.0) / (2.0 * (F.col("n2").cast("double") + 1.0)),
            6,
        ).alias("chao1"),
    ).orderBy(group_col)


def js_divergence(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_v: int = 5000,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (Lin 1991) between groups'
    unigram distributions over the ``top_v`` corpus-wide most frequent
    tokens — the SYMMETRIC, bounded ([0, 1] in bits) companion to
    source_token_kl: mixture planning wants a distance (d(a,b) =
    d(b,a), finite even when supports differ), which KL is not.

        JS(p, q) = ½·Σ p·log2(p/m) + ½·Σ q·log2(q/m),  m = (p+q)/2

    Returns one row per unordered group pair (a < b): (``group_a``,
    ``group_b``, ``js_bits``) rounded to 6, ordered by (a, b).

    Determinism: relative frequencies are 9-dp-pinned; each token's JS
    term is rounded to 12 dp and DECIMAL-accumulated, so the pair sums
    are independent of partition order (the one libm lean, log2, is
    absorbed by the 12-dp pin). Zero-probability terms contribute 0 by
    construction (0·log 0 = 0).

    Scale shape: one corpus-sized (group, token) count aggregate
    (shared, localCheckpointed); the pair join runs on groups × top_v
    rows — dashboard-sized, like burrows_delta.
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(word_tokens(normalize_text(text_col))).alias("_t"),
    )
    freq = (
        toks.groupBy("_g", "_t")
        .agg(F.count(F.lit(1)).alias("_f"))
        .localCheckpoint()
    )
    top = (
        freq.groupBy("_t")
        .agg(F.sum("_f").alias("_tot"))
        .orderBy(F.desc("_tot"), F.asc("_t"))
        .limit(top_v)
        .select("_t")
    )
    gtot = freq.groupBy("_g").agg(F.sum("_f").alias("_gn"))
    spine = gtot.crossJoin(F.broadcast(top))
    rel = (
        spine.join(freq, ["_g", "_t"], "left")
        .select(
            "_g",
            "_t",
            F.round(
                F.coalesce(F.col("_f"), F.lit(0)).cast("double")
                / F.col("_gn").cast("double"),
                9,
            ).alias("_r"),
        )
        .localCheckpoint()
    )
    a = rel.select(F.col("_g").alias("group_a"), "_t", F.col("_r").alias("_p"))
    b = rel.select(F.col("_g").alias("group_b"), "_t", F.col("_r").alias("_q"))
    ln2 = 0.6931471805599453
    p, q = F.col("_p"), F.col("_q")
    m = (p + q) / 2.0
    term = (
        F.when(p > 0, p * (F.log(p / m) / ln2)).otherwise(0.0)
        + F.when(q > 0, q * (F.log(q / m) / ln2)).otherwise(0.0)
    ) / 2.0
    pairs = a.join(b, "_t").filter(F.col("group_a") < F.col("group_b"))
    return (
        pairs.select(
            "group_a",
            "group_b",
            F.round(term, 12).cast("decimal(18,12)").alias("_j"),
        )
        .groupBy("group_a", "group_b")
        .agg(F.round(F.sum("_j").cast("double"), 6).alias("js_bits"))
        .orderBy("group_a", "group_b")
    )


def source_tv_distance(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group total-variation distance from the whole-corpus token
    distribution: TV(p_g, p) = ½ Σ_w |p_g(w) − p(w)| — the bounded
    [0,1] companion to :func:`source_token_kl` (KL explodes on rare-
    word mismatch and is asymmetric; TV is the fraction of probability
    mass you would have to move, the number a mixture-rebalancing
    decision actually wants) and to js_divergence (which this bounds:
    JS ≤ TV·ln2... the panel reads together).

    Output: (group_col, ``n_tokens``, ``tv_distance``) rounded to 6,
    one row per group, ordered by group.

    Determinism: EXACT integer arithmetic throughout — each present
    word contributes |c_gw·C − c_w·G| (DECIMAL(38,0) cross products of
    BIGINT counts; G = group total, C = corpus total) and the words
    ABSENT from the group contribute G·(C − Σ_present c_w) in one
    closed-form correction, so no per-absent-word rows materialize.
    The single float is the final ½·num/(G·C) division.

    Scale shape: identical to source_token_kl — one exploded-token
    scan into a checkpointed (group, token) count table, vocab-sized
    join, group-sized fold. No float-sum anywhere.
    """
    toks = _token_rows(df, group_col, text_col)
    g_counts = (
        toks.groupBy(group_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_gc"))
        .localCheckpoint()
    )
    c_counts = g_counts.groupBy("_tok").agg(F.sum("_gc").alias("_cc"))
    c_total = c_counts.agg(F.sum("_cc").alias("_ct"))
    g_totals = g_counts.groupBy(group_col).agg(F.sum("_gc").alias("_gt"))
    joined = (
        g_counts.join(c_counts, "_tok")
        .join(F.broadcast(g_totals), group_col)
        .crossJoin(F.broadcast(c_total))
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    cross = (d19("_gc") * d19("_ct")).cast("decimal(38,0)") - (
        d19("_cc") * d19("_gt")
    ).cast("decimal(38,0)")
    agg = joined.groupBy(group_col).agg(
        F.max("_gt").alias("n_tokens"),
        F.max("_ct").alias("_ct"),
        F.sum(F.abs(cross)).alias("_num_present"),
        F.sum("_cc").alias("_cc_present"),
    )
    num = F.col("_num_present") + (
        d19("n_tokens") * (d19("_ct") - d19("_cc_present"))
    ).cast("decimal(38,0)")
    tv = (
        F.lit(0.5)
        * num.cast("double")
        / (F.col("n_tokens").cast("double") * F.col("_ct").cast("double"))
    )
    return agg.select(
        group_col,
        "n_tokens",
        F.round(tv, 6).alias("tv_distance"),
    ).orderBy(group_col)


def fog_smog_readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gunning-Fog (1952) + SMOG (McLaughlin 1969) grades per document
    — the COMPLEX-WORD members of the readability panel next to
    :func:`flesch_readability`'s syllable-rate ones (the two families
    disagree exactly on long-but-simple vs short-but-dense prose,
    which is the curation signal):

        Fog  = 0.4·(words/sentences + 100·complex/words)
        SMOG = 1.0430·√(complex·30/sentences) + 3.1291

    where complex = words with ≥ 3 syllable groups, on the SAME
    deterministic counting heuristics as flesch_readability (sentences
    = ``[.!?]+`` runs min 1, words = normalized whitespace tokens,
    syllables = ``[aeiouy]+`` runs floor 1) — fully SQL-replayable.

    Returns (``id_col``, ``n_words``, ``n_sentences``, ``n_complex``,
    ``fog``, ``smog``) per document with n_words > 0, scores rounded
    to 4.

    Scale shape: narrow per-row map, zero shuffles, whole-stage
    codegen — embarrassingly parallel.
    """
    t = df.select(
        F.col(id_col),
        word_tokens(normalize_text(text_col)).alias("_toks"),
        F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)),
        ).alias("n_sentences"),
    )
    syl = lambda w: F.greatest(  # noqa: E731
        F.lit(1), F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0))
    )
    t = t.select(
        id_col,
        F.size("_toks").alias("n_words"),
        "n_sentences",
        F.size(
            F.filter("_toks", lambda w: syl(F.lower(w)) >= 3)
        ).alias("n_complex"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    cpw = F.col("n_complex").cast("double") / F.col("n_words").cast("double")
    fog = 0.4 * (wps + 100.0 * cpw)
    smog = (
        1.0430
        * F.sqrt(
            F.col("n_complex").cast("double") * 30.0
            / F.col("n_sentences").cast("double")
        )
        + 3.1291
    )
    return t.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_complex",
        F.round(fog, 4).alias("fog"),
        F.round(smog, 4).alias("smog"),
    )


def fightin_words(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.01,
    top_k: int = 5,
) -> DataFrame:
    """Monroe-Colaresi-Quinn "Fightin' Words" (2008): per-group
    distinctive terms by log-odds ratio with an informative Dirichlet
    prior — the statistically honest replacement for raw TF-IDF
    keyword diffs (which over-reward rare words; the prior shrinks
    low-count noise and the z-score accounts for variance):

        δ_gw = ln[(c_gw + α_w)/(n_g + α₀ − c_gw − α_w)]
             − ln[(c_w − c_gw + α_w)/(n − n_g + α₀ − c_w + c_gw − α_w)]
        z_gw = δ_gw / √(1/(c_gw + α_w) + 1/(c_w − c_gw + α_w))

    with α_w = α·c_w/n·n... here the uninformative-scaled prior
    α_w = α·c_w (corpus-proportional, the paper's recommended choice)
    and α₀ = Σ_w α_w = α·n. Returns the ``top_k`` terms per group by
    z DESC (term ASC tie-break): (``group_col``, ``term``, ``count``,
    ``z_score``) rounded to 6.

    Determinism: counts are exact BIGINTs; each z is a pure per-row
    double formula (no cross-row float sums); ranking is on the
    6-dp-rounded z with a lexical tie-break, so the top-k is stable.

    Scale shape: the source_token_kl skeleton — one exploded-token
    scan into a checkpointed (group, token) count table, vocab-sized
    joins, per-group top-k via WindowGroupLimit heaps.
    """
    from pyspark.sql import Window

    toks = _token_rows(df, group_col, text_col)
    g_counts = (
        toks.groupBy(group_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_gc"))
        .localCheckpoint()
    )
    c_counts = g_counts.groupBy("_tok").agg(F.sum("_gc").alias("_cc"))
    c_total = c_counts.agg(F.sum("_cc").alias("_ct"))
    g_totals = g_counts.groupBy(group_col).agg(F.sum("_gc").alias("_gt"))
    j = (
        g_counts.join(c_counts, "_tok")
        .join(F.broadcast(g_totals), group_col)
        .crossJoin(F.broadcast(c_total))
    )
    a = float(alpha)
    aw = a * F.col("_cc").cast("double")
    a0 = a * F.col("_ct").cast("double")
    cg = F.col("_gc").cast("double")
    cw = F.col("_cc").cast("double")
    ng = F.col("_gt").cast("double")
    n = F.col("_ct").cast("double")
    delta = F.log((cg + aw) / (ng + a0 - cg - aw)) - F.log(
        (cw - cg + aw) / (n - ng + a0 - cw + cg - aw)
    )
    var = 1.0 / (cg + aw) + 1.0 / (cw - cg + aw)
    z = F.round(delta / F.sqrt(var), 6)
    scored = j.select(
        group_col,
        F.col("_tok").alias("term"),
        F.col("_gc").alias("count"),
        z.alias("z_score"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("z_score"), F.asc("term")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
        .orderBy(group_col, F.desc("z_score"), "term")
    )


def perplexity_buckets(
    df: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 3,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020 §4.3:
    per-language head/middle/tail terciles by LM perplexity is the
    quality split CCNet ships and most pretraining recipes keep): score
    every document with :func:`trigram_logprob` cross-entropy, cut
    per-language ``n_buckets`` equal-frequency buckets (ntile over
    (ce asc, id asc) — lower entropy = bucket 1 = head), and summarize
    each (language, bucket) cell.

    Returns (``lang_col``, ``bucket``, ``bucket_label``, ``n_docs``,
    ``mean_ce``, ``min_ce``, ``max_ce``) ordered by (lang, bucket);
    labels are head/middle/tail when ``n_buckets`` is 3, ``b<k>``
    otherwise. Mean accumulates the 4dp-rounded per-doc entropies in
    DECIMAL (association-order-free across engines).

    Scale shape: the LM scoring dominates (vocab-keyed joins, see
    trigram_logprob); the bucketing itself is one window over DOC-level
    rows partitioned by language, then a (lang, bucket)-keyed
    hash-aggregate — both tiny next to the position stream."""
    ce = trigram_logprob(df, id_col=id_col, text_col=text_col, lambdas=lambdas)
    joined = ce.join(df.select(id_col, lang_col), id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.asc("trigram_ce"), F.asc(id_col)
    )
    if n_buckets == 3:
        label = F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.col("bucket"),
        )
    else:
        label = F.concat(F.lit("b"), F.col("bucket").cast("string"))
    return (
        joined.withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy(lang_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.round(
                    F.sum(F.col("trigram_ce").cast("decimal(18,4)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1)),
                    4,
                )
                + F.lit(0.0)
            ).alias("mean_ce"),
            F.min("trigram_ce").alias("min_ce"),
            F.max("trigram_ce").alias("max_ce"),
        )
        .withColumn("bucket_label", label)
        .select(
            lang_col, "bucket", "bucket_label", "n_docs",
            "mean_ce", "min_ce", "max_ce",
        )
        .orderBy(lang_col, "bucket")
    )


# the five ensemble rules' thresholds (Gopher A1.1-shaped bounds over
# characters/words; the stopword floor follows the C4/Gopher "has real
# function words" test) — module-level so tests and oracles pin them
ENSEMBLE_RULES = {
    "len": (50, 20000),        # raw char length bounds
    "word_len": (3.0, 12.0),   # mean token length bounds
    "stopword": 0.05,          # min stopword token fraction
    "alpha": 0.70,             # min fraction of tokens containing a letter
    "digit": 0.20,             # max digit-char fraction of raw text
}


def ensemble_quality_vote(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_votes: int = 4,
) -> DataFrame:
    """Quality-rule ENSEMBLE vote: five independent cheap heuristics
    (char-length bounds, mean-word-length bounds, stopword floor,
    alphabetic-token floor, digit-fraction ceiling — the Gopher/C4 rule
    family) each cast one keep vote; a document is kept when at least
    ``min_votes`` agree. Single-rule filters are brittle — a legitimate
    table-heavy page fails the digit rule, a terse FAQ fails the length
    rule; requiring near-consensus keeps both unless several signals
    concur (the standard reason quality pipelines ensemble their
    filters rather than AND-ing them).

    Returns one row per document: (``id_col``, ``ok_len``,
    ``ok_word_len``, ``ok_stopword``, ``ok_alpha``, ``ok_digit``,
    ``votes``, ``keep``). Every rule is a deterministic integer-count
    ratio (single division), so an independent SQL replay is bit-exact.

    Scale shape: entirely ROW-LOCAL (token-array folds inside the
    projection) — one corpus scan, zero shuffles, zero Python."""
    from valentinus_spark.functions.text import ENGLISH_STOPWORDS

    lo_len, hi_len = ENSEMBLE_RULES["len"]
    lo_wl, hi_wl = ENSEMBLE_RULES["word_len"]
    toks = word_tokens(normalize_text(text_col))
    n_tok = F.size(toks)
    raw_len = F.length(F.col(text_col))
    sum_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_wl = F.when(
        n_tok > 0, sum_tok_len.cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    stop_frac = F.when(
        n_tok > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
            "double"
        )
        / n_tok,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_tok > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    digit_frac = F.when(
        raw_len > 0,
        F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast(
            "double"
        )
        / raw_len,
    ).otherwise(F.lit(0.0))
    rules = {
        "ok_len": (raw_len >= lo_len) & (raw_len <= hi_len),
        "ok_word_len": (mean_wl >= lo_wl) & (mean_wl <= hi_wl),
        "ok_stopword": stop_frac >= ENSEMBLE_RULES["stopword"],
        "ok_alpha": alpha_frac >= ENSEMBLE_RULES["alpha"],
        "ok_digit": digit_frac <= ENSEMBLE_RULES["digit"],
    }
    out = ensure_parallelism(df).select(
        id_col, *[v.alias(k) for k, v in rules.items()]
    )
    votes = sum(F.col(k).cast("int") for k in rules)
    return out.withColumn("votes", votes).withColumn(
        "keep", F.col("votes") >= min_votes
    )


# Unicode script ranges used by script_profile. Deliberately coarse
# codepoint blocks (not full Unicode Script property sets): both Spark's
# Java regex and the DuckDB oracle's RE2 agree exactly on literal
# codepoint ranges, while \p{Script=...} classes differ engine to
# engine. Order = dominance precedence (earlier wins count ties).
SCRIPT_RANGES: "tuple[tuple[str, str], ...]" = (
    ("latin", "A-Za-z\\u00C0-\\u024F"),
    ("cyrillic", "\\u0400-\\u04FF"),
    ("greek", "\\u0370-\\u03FF"),
    ("cjk", "\\u3040-\\u30FF\\u4E00-\\u9FFF"),
    ("arabic", "\\u0600-\\u06FF"),
    ("hangul", "\\u1100-\\u11FF\\uAC00-\\uD7AF"),
)

# ISO 639-1 codes whose standard orthography is Latin script — the set
# the mismatch flag checks against (a doc declared 'en' but dominated
# by Cyrillic is either mislabeled or homoglyph-spoofed).
LATIN_SCRIPT_LANGS: frozenset = frozenset(
    {"en", "es", "de", "fr", "it", "pt", "nl", "pl", "tr", "vi", "id", "sv"}
)


def script_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
) -> DataFrame:
    """Per-document Unicode script histogram + dominance QC — the
    multilingual-corpus integrity check that catches (a) language
    labels contradicted by the actual script (wrong lang-id upstream)
    and (b) homoglyph spoofing (Cyrillic 'а' passed off as Latin 'a'),
    both of which poison lang-conditional sampling and tokenizer
    training if they reach the mixture stage.

    Per script class in :data:`SCRIPT_RANGES` the count of matching
    characters is ``length(s) - length(regexp_replace(s, '[range]',
    ''))`` — one strip per class, all JVM regexp inside one projection.
    ``dominant_script`` is the argmax with precedence-order tie-break
    (earlier in SCRIPT_RANGES wins; 'none' when every class counts 0).
    With ``lang_col``, adds ``script_mismatch``: true when the declared
    language is a Latin-script language (:data:`LATIN_SCRIPT_LANGS`)
    but the dominant script isn't latin, or vice versa for the known
    non-Latin anchors (ru→cyrillic, el→greek, ja/zh→cjk, ar→arabic,
    ko→hangul); NULL for languages the table doesn't know.

    Returns (``id_col``[, ``lang_col``], ``n_<script>``×6,
    ``dominant_script``[, ``script_mismatch``]).

    Scale shape: a single codegen'd map stage — zero shuffles, zero
    Python, composes with any pushed-down metadata filter; the regex
    strips are fixed character classes (no backtracking)."""
    s = F.col(text_col)
    counts = [
        (name, (F.length(s) - F.length(F.regexp_replace(s, f"[{rng}]", ""))).cast("long"))
        for name, rng in SCRIPT_RANGES
    ]
    k = len(counts)
    # argmax with earlier-wins ties: struct max compares count first,
    # then the REVERSED index (earlier script -> larger rank).
    packed = F.array(
        *[
            F.struct(
                c.alias("c"), F.lit(k - 1 - i).alias("r"), F.lit(name).alias("s")
            )
            for i, (name, c) in enumerate(counts)
        ]
    )
    best = F.array_max(packed)
    dominant = F.when(best["c"] > 0, best["s"]).otherwise(F.lit("none"))
    cols = [F.col(id_col)]
    if lang_col:
        cols.append(F.col(lang_col))
    cols += [c.alias(f"n_{name}") for name, c in counts]
    out = ensure_parallelism(df).select(*cols, dominant.alias("dominant_script"))
    if lang_col:
        nonlatin_anchor = F.create_map(
            F.lit("ru"), F.lit("cyrillic"),
            F.lit("el"), F.lit("greek"),
            F.lit("ja"), F.lit("cjk"),
            F.lit("zh"), F.lit("cjk"),
            F.lit("ar"), F.lit("arabic"),
            F.lit("ko"), F.lit("hangul"),
        )
        lang = F.col(lang_col)
        expected = F.when(
            lang.isin(*sorted(LATIN_SCRIPT_LANGS)), F.lit("latin")
        ).otherwise(nonlatin_anchor[lang])
        out = out.withColumn(
            "script_mismatch",
            F.when(
                expected.isNotNull(), F.col("dominant_script") != expected
            ).otherwise(F.lit(None).cast("boolean")),
        )
    return out


def source_cross_entropy(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain-affinity matrix: unigram cross-entropy H(eval, train) for
    every ordered source pair — how well source t's add-one-smoothed
    unigram LM predicts source e's token stream. The panel behind
    mixture design and data selection (Moore-Lewis 2010 cross-entropy
    difference; DSIR and DoReMi both reduce to "which domains are
    close" questions this matrix answers directly). The diagonal is
    each source's within-domain entropy floor; a low off-diagonal cell
    marks near-duplicate domains the mixture should not double-count.

    With q(w|t) = (c_t(w)+1)/(N_t+V) over the GLOBAL vocabulary V and
    p(w|e) = c_e(w)/N_e, the absent-token mass telescopes:

        H(e,t) = ln(N_t + V) − Σ_{w ∈ e∩t} p(w|e)·ln(c_t(w)+1)

    so ONLY shared-token terms need computing — the identity that makes
    the matrix one vocab-sized join instead of a vocab×sources² blowup.

    Returns (``eval_source``, ``train_source``, ``n_shared_tokens``,
    ``cross_entropy`` rounded 6) ordered, one row per ordered pair
    (pairs sharing no token get the pure-smoothing ceiling ln(N_t+V)).

    Determinism: per-term products round to 12 dp and accumulate in
    DECIMAL(38,12) — double-sum association differs between engines and
    between shuffle layouts; the pinned-digit DECIMAL fold does not
    (the score_brier_logloss convention). Scale shape: ONE corpus scan
    into a map-side-combinable (source, token) count; everything after
    is vocab-sized. The final spine cross join is |sources|², driver-
    free and broadcast."""
    from pyspark.sql.types import DecimalType

    cnt = (
        _token_rows(df, group_col, text_col)
        .groupBy(F.col(group_col).alias("_g"), "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    tot = cnt.groupBy("_g").agg(F.sum("_c").alias("_n"))
    vocab = cnt.select("_tok").distinct().count()
    ev = cnt.select(
        F.col("_g").alias("eval_source"), "_tok", F.col("_c").alias("_ce")
    )
    tr = cnt.select(
        F.col("_g").alias("train_source"), "_tok", F.col("_c").alias("_ct")
    )
    ev_tot = tot.select(F.col("_g").alias("eval_source"), F.col("_n").alias("_ne"))
    inner = (
        ev.join(tr, "_tok")
        .join(F.broadcast(ev_tot), "eval_source")
        .groupBy("eval_source", "train_source")
        .agg(
            F.count(F.lit(1)).alias("n_shared_tokens"),
            F.sum(
                F.round(
                    F.col("_ce") / F.col("_ne") * F.log(F.col("_ct") + 1), 12
                ).cast(DecimalType(38, 12))
            ).alias("_s"),
        )
    )
    spine = (
        tot.select(F.col("_g").alias("eval_source"))
        .crossJoin(
            tot.select(
                F.col("_g").alias("train_source"), F.col("_n").alias("_nt")
            )
        )
    )
    return (
        spine.join(F.broadcast(inner), ["eval_source", "train_source"], "left")
        .select(
            "eval_source",
            "train_source",
            F.coalesce("n_shared_tokens", F.lit(0)).alias("n_shared_tokens"),
            F.round(
                F.log(F.col("_nt") + F.lit(vocab))
                - F.coalesce(F.col("_s").cast("double"), F.lit(0.0)),
                6,
            ).alias("cross_entropy"),
        )
        .orderBy("eval_source", "train_source")
    )
