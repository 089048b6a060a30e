"""Collocation mining: PMI-scored adjacent token pairs with a-priori
support pruning.

The classic corpus-linguistics primitive (Church & Hanks 1990, "Word
Association Norms, Mutual Information, and Lexicography") that training
pipelines use to pick multi-word vocabulary entries, detect boilerplate
phrases, and seed tokenizer merges. No reference equivalent
(training-pipeline extension surface).

Scale shape (the a-priori property is the whole design):

- Pass 1 aggregates token unigram counts — map-side combinable, output
  bounded by vocabulary size (Zipfian corpora: ≪ corpus rows).
- The frequent-vocabulary set (count ≥ min_count) is an a-priori bound:
  a pair can only reach min_count if BOTH members do, so pruning
  unigrams first loses no qualifying pair (Agrawal & Srikant 1994's
  downward closure, applied to bigrams).
- Pass 2 counts only ADJACENT pairs (positions i, i+1) — linear in
  corpus tokens, never a within-document self-join — and keeps a pair
  only when both members are frequent. The candidate space is bounded
  by min(corpus tokens, |V_freq|²).
- PMI arithmetic runs on the tiny aggregate with the corpus totals
  broadcast (single-row frame), so nothing after pass 2 touches the
  corpus again.

At 100 TB both passes are single scans with partial aggregation; the
only shuffles key on token / (token, token) — high-cardinality, evenly
spread, no skew pattern (the hottest English bigram is ~1% of tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from valentinus_spark.functions.text import normalize_text, word_tokens


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 0,
) -> DataFrame:
    """Adjacent-pair collocations scored by pointwise mutual information.

    PMI(a,b) = log2( p(a,b) / (p(a)·p(b)) ) with p(a,b) = pair_count /
    total_pairs and p(x) = token_count / total_tokens. Pairs and both
    member tokens must each occur ≥ ``min_count`` times. Returns
    (token_a, token_b, pair_count, count_a, count_b, pmi) ordered by
    (pmi desc, token_a, token_b); ``top_n > 0`` truncates after the
    (deterministic) ordering.

    High PMI + low count is the classic noise regime — min_count is the
    significance gate, not an optimization knob; raise it with corpus
    size.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = docs.select(word_tokens(normalize_text(text_col)).alias("w")).where(
        F.size("w") > 0
    )
    tok = toks.select(F.explode("w").alias("t"))
    unigrams = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    total_tokens = unigrams.agg(F.sum("cnt").alias("total_tokens"))

    freq = unigrams.where(F.col("cnt") >= min_count)

    # adjacent pairs: zip the token array with its tail, row-locally —
    # no join, one row per token position (minus one per doc)
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("ta"), b.alias("tb")),
            )
        ).alias("p")
    ).select(F.col("p.ta").alias("token_a"), F.col("p.tb").alias("token_b"))
    total_pairs = pairs.agg(F.count(F.lit(1)).alias("total_pairs"))

    pair_counts = (
        pairs.groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )
    # a-priori prune via broadcast of the frequent vocab (bounded by
    # |V_freq|; for web-scale corpora still far under executor memory —
    # a 10M-entry vocab of 16-byte tokens is ~160 MB; shrink with
    # min_count, which is what significance wants anyway)
    scored = (
        pair_counts.join(
            F.broadcast(freq.select(F.col("t").alias("token_a"), F.col("cnt").alias("count_a"))),
            "token_a",
        )
        .join(
            F.broadcast(freq.select(F.col("t").alias("token_b"), F.col("cnt").alias("count_b"))),
            "token_b",
        )
        .crossJoin(F.broadcast(total_tokens))
        .crossJoin(F.broadcast(total_pairs))
        .select(
            "token_a",
            "token_b",
            "pair_count",
            "count_a",
            "count_b",
            (
                F.log2(
                    (F.col("pair_count") / F.col("total_pairs"))
                    / (
                        (F.col("count_a") / F.col("total_tokens"))
                        * (F.col("count_b") / F.col("total_tokens"))
                    )
                )
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("token_a"), F.asc("token_b"))
    )
    if top_n > 0:
        scored = scored.limit(top_n)
    return scored


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 5,
    top_n: int = 0,
) -> DataFrame:
    """Pairwise association rules over (basket, item) rows — the
    market-basket face of :func:`pmi_collocations` (Agrawal & Srikant
    1994): for every ordered pair (a → b) co-occurring in ≥
    ``min_support_count`` baskets, emit support / confidence / lift.

    Columns: antecedent, consequent, pair_baskets, baskets_a, baskets_b,
    support, confidence, lift; ordered by (lift desc, antecedent,
    consequent), truncated to ``top_n`` when > 0. Both directions of a
    pair appear (confidence is asymmetric).

    Scale shape: item→basket-count aggregate (map-side combinable,
    catalog-bounded) gates candidates a priori (downward closure —
    a pair needs both members frequent); pair counting self-joins
    WITHIN a basket only (blow-up bounded by max-basket-size², the
    market-basket norm), then distinct-per-basket count. Ratios run on
    the pair aggregate with the basket total broadcast. Same
    EXACT-arithmetic-shape contract as pmi_collocations: both engines
    compute the identical double expressions, so orderings agree."""
    if min_support_count < 1:
        raise ValueError(f"min_support_count must be >= 1, got {min_support_count}")
    b = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    item_counts = b.groupBy("_i").agg(F.count(F.lit(1)).alias("cnt"))
    freq = item_counts.where(F.col("cnt") >= min_support_count)
    n_baskets = b.select("_b").distinct().select(
        F.count(F.lit(1)).alias("total_baskets")
    )
    lhs = b.select(F.col("_b"), F.col("_i").alias("antecedent"))
    rhs = b.select(F.col("_b"), F.col("_i").alias("consequent"))
    pairs = (
        lhs.join(rhs, "_b")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .where(F.col("pair_baskets") >= min_support_count)
    )
    out = (
        pairs.join(
            F.broadcast(
                freq.select(F.col("_i").alias("antecedent"), F.col("cnt").alias("baskets_a"))
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                freq.select(F.col("_i").alias("consequent"), F.col("cnt").alias("baskets_b"))
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "pair_baskets",
            "baskets_a",
            "baskets_b",
            (F.col("pair_baskets") / F.col("total_baskets")).alias("support"),
            (F.col("pair_baskets") / F.col("baskets_a")).alias("confidence"),
            (
                (F.col("pair_baskets") / F.col("baskets_a"))
                / (F.col("baskets_b") / F.col("total_baskets"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("antecedent"), F.asc("consequent"))
    )
    if top_n > 0:
        out = out.limit(top_n)
    return out


def top_ngrams(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    k: int = 3,
) -> DataFrame:
    """WIMBD-style most-common n-grams per group (Elazar et al. ICLR
    2024, "What's In My Big Data?" — the summary panel every corpus
    release ships: which phrases dominate each language/source slice;
    boilerplate, ads, and template spam surface at the top of it).

    Counts RAW n-gram occurrences (every token position, not
    distinct-per-doc), ranks within each group by (count desc, n-gram
    asc — a total order, so the top-k set is unique), keeps ``k`` rows
    per group. Returns (``group_col``, ``ngram``, ``n_occurrences``,
    ``rank``) ordered by group, rank.

    Scale shape: one corpus scan exploding to (group, ngram), then a
    map-side-combinable hash aggregate keyed on (group, ngram) — the
    shuffle carries one record per distinct n-gram per mapper, and the
    window that ranks the AGGREGATED counts is WindowGroupLimit-pruned
    (Spark ≥ 3.5 pushes the rank<=k filter map-side), so the few-groups
    skew of partitioning by group alone applies only to the already
    vocabulary-sized aggregate, never to corpus rows."""
    from pyspark.sql import Window

    from valentinus_spark.functions.text import shingles_from_tokens
    from valentinus_spark.functions.util import ensure_parallelism

    if k < 1 or n < 1:
        raise ValueError(f"n and k must be >= 1, got n={n} k={k}")
    grams = (
        ensure_parallelism(df.filter(F.trim(F.col(text_col)) != ""))
        .select(
            F.col(group_col).alias("_g"),
            word_tokens(normalize_text(text_col)).alias("_toks"),
        )
        .filter(F.size("_toks") >= n)
        .select("_g", F.explode(shingles_from_tokens("_toks", n)).alias("ngram"))
        .groupBy("_g", "ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy("_g").orderBy(
        F.desc("n_occurrences"), F.asc("ngram")
    )
    return (
        grams.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_g").alias(group_col), "ngram", "n_occurrences", "rank")
        .orderBy(group_col, "rank")
    )
