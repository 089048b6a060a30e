"""Evaluation metrics for corpus and retrieval QA — the measurement side
of a training-data pipeline (the reference, kn0sys/valentinus, has no
evaluation surface; this is part of the mandated LLM-pipeline extension,
SURVEY.md §2.4):

* :func:`rouge_n_pairs` — clipped n-gram overlap (ROUGE-n
  precision/recall/F1, Lin 2004) between paired texts: dedup triage,
  summary-vs-source leakage checks, paraphrase mining QA.
* :func:`fleiss_kappa` — chance-corrected agreement for MANY raters
  (Fleiss 1971), the multi-annotator generalization of Cohen's κ
  (operators/profile.py::cohens_kappa handles the 2-rater case).
* :func:`ndcg_at_k` — graded retrieval quality (Järvelin & Kekäläinen
  2002) per query over any (query, doc, score, relevance) frame: the
  standard gate before trusting a ranker (BM25, QL, fused) to mine
  hard negatives or build eval sets.
* :func:`krippendorff_alpha` — agreement under MISSING ratings
  (Krippendorff 2004): uneven annotator coverage, the common case.
* :func:`mutual_information` — entropy / MI / NMI between two
  categorical columns: metadata redundancy audits (is ``lang``
  predictable from ``source``? then stratifying on both double-counts).

* :func:`rank_correlation` — Spearman ρ + Kendall τ-b between two
  scorers: the do-the-rankers-agree audit before fusion (rrf_fuse).

All of these are pure Catalyst — counts, joins, window ranks, and log
arithmetic; no UDFs, no driver collect — and each is exactly replayable
in ANSI SQL (driver oracles: rouge_pair_overlap, fleiss_lang_raters,
krippendorff_lang, ndcg_retrieval, field_mutual_info, rank_agreement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from valentinus_spark.functions.text import (
    normalize_text,
    shingles_from_tokens,
    word_tokens,
)

__all__ = [
    "rbo_overlap",
    "rouge_n_pairs",
    "fleiss_kappa",
    "krippendorff_alpha",
    "ndcg_at_k",
    "mutual_information",
    "rank_correlation",
    "cronbach_alpha",
    "adjusted_rand_index",
    "average_precision",
    "map_mrr",
    "brier_log_loss",
    "gain_lift_chart",
]


def _gram_counts(
    df: DataFrame, pair_col: str, text_col: str, n: int, out: str
) -> DataFrame:
    """(pair, gram) → multiset count for one side of the pair frame."""
    toks = df.select(
        F.col(pair_col).alias("_pid"),
        word_tokens(normalize_text(text_col)).alias("_toks"),
    )
    grams = toks.select(
        "_pid",
        F.explode(
            F.when(F.size("_toks") == 0, F.array().cast("array<string>")).otherwise(
                shingles_from_tokens("_toks", n)
            )
        ).alias("_g"),
    )
    return grams.groupBy("_pid", "_g").agg(F.count(F.lit(1)).alias(out))


def rouge_n_pairs(
    pairs: DataFrame,
    pair_col: str,
    text_a: str,
    text_b: str,
    n: int = 1,
) -> DataFrame:
    """ROUGE-n (Lin 2004) per text pair: clipped n-gram overlap.

    For each row of ``pairs`` (a candidate/reference text pair keyed by
    ``pair_col``), tokenize both sides (lowercase, whitespace), form word
    n-grams, and count the CLIPPED overlap — per distinct gram,
    ``min(count_a, count_b)`` — the multiset intersection that stops a
    candidate from farming credit by repeating one reference gram.

    Short-text convention (house shingle semantics,
    `functions/text.py shingles_from_tokens`): a non-empty side with
    ≤ n tokens contributes ONE gram — the whole text — rather than the
    textbook zero n-grams, so 1-token candidates keep a defined
    precision instead of going NULL. The DuckDB oracle replays this.

        recall    = overlap / total_grams_b   (ROUGE-n proper)
        precision = overlap / total_grams_a
        f1        = harmonic mean — NULL when either side is empty
                    (prec/rec undefined), 0 when both sides are
                    non-empty with zero overlap

    Returns one row per pair: (``pair_col``, ``overlap``, ``n_a``,
    ``n_b``, ``precision``, ``recall``, ``f1``), ratios rounded to 6,
    NULL ratio when its denominator is 0. The DuckDB oracle replays
    the same NULL convention.

    Scale shape: two (pair, gram) aggregates + one full outer join on the
    same key, so every shuffle is on (pair, gram) — cardinality
    Σ doc_len, linear in corpus size, no all-pairs anything. The join is
    co-partitioned with the aggregates (same key), so AQE typically
    collapses it to one exchange per side. 100 TB: pairs arrive from an
    upstream blocked/banded candidate generator (dedup.py, linkage.py);
    this operator is linear in the candidate-pair text volume.
    """
    ca = _gram_counts(pairs, pair_col, text_a, n, "_ca")
    cb = _gram_counts(pairs, pair_col, text_b, n, "_cb")
    merged = ca.join(cb, ["_pid", "_g"], "full_outer").select(
        "_pid",
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    per_pair = merged.groupBy("_pid").agg(
        F.sum(F.least("_ca", "_cb")).alias("overlap"),
        F.sum("_ca").alias("n_a"),
        F.sum("_cb").alias("n_b"),
    )
    # pairs whose BOTH sides were empty produce no gram rows at all —
    # restore them with 0/0/0 so the output keys match the input keys
    keys = pairs.select(F.col(pair_col).alias("_pid")).distinct()
    per_pair = keys.join(per_pair, "_pid", "left").select(
        "_pid",
        F.coalesce("overlap", F.lit(0)).alias("overlap"),
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    prec = F.when(F.col("n_a") > 0, F.col("overlap") / F.col("n_a"))
    rec = F.when(F.col("n_b") > 0, F.col("overlap") / F.col("n_b"))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        2.0 * prec * rec / (prec + rec),
    ).otherwise(F.when(prec.isNotNull() & rec.isNotNull(), F.lit(0.0)))
    return per_pair.select(
        F.col("_pid").alias(pair_col),
        "overlap",
        "n_a",
        "n_b",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str,
    category_col: str,
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971): chance-corrected agreement among m
    raters who each assign one of k categories to every item — the
    multi-annotator QA statistic for labeling fleets (Cohen's κ,
    operators/profile.py, covers exactly two raters).

    ``ratings`` holds one row per (item, rater) assignment; rater
    identity is irrelevant to the statistic, only the per-item category
    counts n_ij matter. With m ratings per item:

        P_i  = Σ_j n_ij(n_ij − 1) / (m(m − 1))     per-item agreement
        P̄   = mean_i P_i                            observed
        P_e  = Σ_j p_j²  with p_j = Σ_i n_ij / (N·m) chance
        κ    = (P̄ − P_e) / (1 − P_e)

    Items with fewer ratings than the max (incomplete panels) are
    EXCLUDED — Fleiss' formula requires constant m; the output reports
    how many were dropped so silent data loss is visible. NULL rows are
    excluded first. Returns ONE row: (``n_items``, ``n_raters``,
    ``n_dropped``, ``p_bar``, ``p_e``, ``kappa``), κ NULL when P_e = 1
    (single shared category — undefined, same convention as cohens_kappa).

    Scale shape: one (item, category) count aggregate (shuffle key =
    items × k), one per-item fold, then category-sized and scalar
    aggregates. No driver collect, no UDFs.
    """
    r = ratings.filter(
        F.col(item_col).isNotNull() & F.col(category_col).isNotNull()
    ).select(F.col(item_col).alias("_i"), F.col(category_col).alias("_c"))
    nij = r.groupBy("_i", "_c").agg(F.count(F.lit(1)).alias("_n"))
    per_item = nij.groupBy("_i").agg(
        F.sum("_n").alias("_m"),
        F.sum(F.col("_n") * (F.col("_n") - 1)).alias("_pairs"),
    )
    mstats = per_item.agg(F.max("_m").alias("_mmax"))
    complete = per_item.crossJoin(F.broadcast(mstats))
    kept = complete.filter(F.col("_m") == F.col("_mmax"))
    dropped = complete.filter(F.col("_m") != F.col("_mmax")).agg(
        F.count(F.lit(1)).alias("_ndrop")
    )
    # m == 1 (every kept item rated once) leaves per-item agreement
    # undefined — m(m−1) = 0 would raise under ANSI mode, so the whole
    # statistic goes NULL instead (same convention as the P_e = 1 case)
    pbar = kept.agg(
        F.count(F.lit(1)).alias("_nitems"),
        F.first("_mmax").alias("_m"),
        F.avg(
            F.when(
                F.col("_mmax") >= 2,
                F.col("_pairs") / (F.col("_mmax") * (F.col("_mmax") - 1)),
            )
        ).alias("_pbar"),
    )
    # chance agreement over the KEPT items only (consistent marginals)
    kept_items = kept.select("_i")
    pj = (
        nij.join(kept_items, "_i")
        .groupBy("_c")
        .agg(F.sum("_n").alias("_nc"))
        .crossJoin(F.broadcast(pbar.select("_nitems", "_m")))
        .agg(
            F.sum(
                F.pow(F.col("_nc") / (F.col("_nitems") * F.col("_m")), 2)
            ).alias("_pe")
        )
    )
    return (
        pbar.crossJoin(F.broadcast(pj))
        .crossJoin(F.broadcast(dropped))
        .select(
            F.col("_nitems").alias("n_items"),
            F.col("_m").alias("n_raters"),
            F.coalesce("_ndrop", F.lit(0)).alias("n_dropped"),
            F.round("_pbar", 6).alias("p_bar"),
            F.round("_pe", 6).alias("p_e"),
            F.round(
                F.when(
                    F.col("_pe") < 1.0,
                    (F.col("_pbar") - F.col("_pe")) / (1.0 - F.col("_pe")),
                ),
                6,
            ).alias("kappa"),
        )
    )


def ndcg_at_k(
    scored: DataFrame,
    query_col: str,
    doc_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """nDCG@k (Järvelin & Kekäläinen 2002) per query, exponential gain:

        DCG@k  = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1)   by score rank
        IDCG@k = the same sum with relevance sorted descending
        nDCG   = DCG / IDCG  (NULL when IDCG = 0 — no relevant docs)

    ``scored`` has one row per (query, doc) with the ranker's score and
    the graded relevance judgment. Ranking ties break on ``doc_col``
    ascending so the metric is deterministic and SQL-replayable. Returns
    one row per query: (``query_col``, ``n_judged``, ``dcg``, ``idcg``,
    ``ndcg``), rounded to 6, ordered by query.

    Scale shape: two window ranks partitioned by query (one shuffle on
    the query key — both windows share it, Catalyst reuses the exchange)
    then a per-query aggregate. Queries are the partition key, so skew =
    max docs judged per query; rank truncation at k keeps the fold tiny.
    No UDFs, no collect.
    """
    w_score = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(doc_col)
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), F.asc(doc_col)
    )
    gain = F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - 1.0
    ranked = scored.select(
        F.col(query_col).alias("_q"),
        gain.alias("_gain"),
        F.row_number().over(w_score).alias("_r"),
        F.row_number().over(w_ideal).alias("_ri"),
    )
    agg = ranked.groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_judged"),
        F.sum(
            F.when(
                F.col("_r") <= k, F.col("_gain") / F.log2(F.col("_r") + 1.0)
            ).otherwise(0.0)
        ).alias("_dcg"),
        F.sum(
            F.when(
                F.col("_ri") <= k, F.col("_gain") / F.log2(F.col("_ri") + 1.0)
            ).otherwise(0.0)
        ).alias("_idcg"),
    )
    return agg.select(
        F.col("_q").alias(query_col),
        "n_judged",
        F.round("_dcg", 6).alias("dcg"),
        F.round("_idcg", 6).alias("idcg"),
        F.round(
            F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg")), 6
        ).alias("ndcg"),
    ).orderBy(query_col)


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Shannon entropy / mutual information / NMI between two categorical
    columns, in bits — the metadata-redundancy audit: MI ≈ H(A) means B
    determines A (stratifying a sample on both double-counts one signal);
    MI ≈ 0 means the fields are independent knobs.

        H(A)   = −Σ p(a) log2 p(a)          (likewise H(B), H(A,B))
        MI     = H(A) + H(B) − H(A,B)
        NMI    = MI / sqrt(H(A)·H(B))        (NULL if either H = 0)

    Rows with a NULL in either column are excluded. Returns ONE row:
    (``n``, ``h_a``, ``h_b``, ``h_ab``, ``mi``, ``nmi``), bits, rounded
    to 6. MI is clamped at 0 (it can round a hair negative through
    floating point on independent columns).

    Scale shape: one (a, b) joint-count aggregate — the only
    corpus-sized shuffle, key space |A|×|B| — with both marginals
    derived from the joint table (no second corpus pass), then
    category-sized folds. Same skeleton as cohens_kappa.
    """
    pairs = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    joint = pairs.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_n"))
    tot = joint.agg(F.sum("_n").alias("_tot"))

    def _entropy(counts: DataFrame) -> DataFrame:
        p = F.col("_n") / F.col("_tot")
        return counts.crossJoin(F.broadcast(tot)).agg(
            (-F.sum(p * F.log2(p))).alias("_h")
        )

    ha = _entropy(joint.groupBy("_a").agg(F.sum("_n").alias("_n")))
    hb = _entropy(joint.groupBy("_b").agg(F.sum("_n").alias("_n")))
    hab = _entropy(joint)
    mi = F.greatest(
        F.lit(0.0), F.col("_ha") + F.col("_hb") - F.col("_hab")
    )
    return (
        tot.crossJoin(F.broadcast(ha.select(F.col("_h").alias("_ha"))))
        .crossJoin(F.broadcast(hb.select(F.col("_h").alias("_hb"))))
        .crossJoin(F.broadcast(hab.select(F.col("_h").alias("_hab"))))
        .select(
            F.col("_tot").alias("n"),
            F.round("_ha", 6).alias("h_a"),
            F.round("_hb", 6).alias("h_b"),
            F.round("_hab", 6).alias("h_ab"),
            F.round(mi, 6).alias("mi"),
            F.round(
                F.when(
                    (F.col("_ha") > 0) & (F.col("_hb") > 0),
                    mi / F.sqrt(F.col("_ha") * F.col("_hb")),
                ),
                6,
            ).alias("nmi"),
        )
    )


def krippendorff_alpha(
    ratings: DataFrame,
    item_col: str,
    category_col: str,
) -> DataFrame:
    """Krippendorff's alpha (nominal data) — chance-corrected agreement
    that, unlike Fleiss' kappa, handles MISSING ratings: every item with
    ≥ 2 ratings contributes, weighted by its own pairable count, so a
    labeling fleet with uneven coverage still gets one unbiased
    reliability number (Krippendorff 2004, the content-analysis
    standard; α ≥ 0.8 = reliable, ≥ 0.667 = tentative).

    With n_uc the count of category c on unit u, m_u = Σ_c n_uc, and
    n = Σ_{m_u ≥ 2} m_u pairable values:

        D_o = (1/n)      Σ_u (1/(m_u−1)) Σ_c n_uc (m_u − n_uc)
        D_e = (1/(n(n−1))) Σ_c n_c (n − n_c)       (n_c over pairable units)
        α   = 1 − D_o / D_e

    Units with a single rating are excluded (nothing to pair) and
    counted in ``n_dropped``. Returns ONE row: (``n_items``,
    ``n_values``, ``n_dropped``, ``d_o``, ``d_e``, ``alpha``), rounded
    to 6; α NULL when D_e = 0 (one shared category — undefined).

    Scale shape: one (item, category) count shuffle (the only
    corpus-sized exchange), one per-item disagreement fold, and
    category-sized marginal aggregates — identical skeleton to
    :func:`fleiss_kappa`, without the constant-panel requirement.
    """
    r = ratings.filter(
        F.col(item_col).isNotNull() & F.col(category_col).isNotNull()
    ).select(F.col(item_col).alias("_i"), F.col(category_col).alias("_c"))
    nuc = r.groupBy("_i", "_c").agg(F.count(F.lit(1)).alias("_n"))
    per_item = nuc.groupBy("_i").agg(
        F.sum("_n").alias("_m"),
        # Σ_c n_uc(m_u − n_uc) needs m_u; fold it in a second pass below
        F.sum(F.col("_n") * F.col("_n")).alias("_sq"),
    )
    pairable = per_item.filter(F.col("_m") >= 2)
    dropped = per_item.filter(F.col("_m") < 2).agg(
        F.count(F.lit(1)).alias("_ndrop")
    )
    # Σ_c n_uc(m_u − n_uc) = m_u² − Σ_c n_uc² — no join back to nuc needed
    do_parts = pairable.agg(
        F.count(F.lit(1)).alias("_nitems"),
        F.sum("_m").alias("_nvals"),
        F.sum(
            (F.col("_m") * F.col("_m") - F.col("_sq")).cast("double")
            / (F.col("_m") - 1)
        ).alias("_dosum"),
    )
    nc = (
        nuc.join(pairable.select("_i"), "_i")
        .groupBy("_c")
        .agg(F.sum("_n").alias("_nc"))
    )
    de_parts = nc.crossJoin(F.broadcast(do_parts.select("_nvals"))).agg(
        F.sum((F.col("_nc") * (F.col("_nvals") - F.col("_nc"))).cast("double")).alias(
            "_desum"
        )
    )
    n = F.col("_nvals").cast("double")
    d_o = F.col("_dosum") / n
    d_e = F.col("_desum") / (n * (n - 1.0))
    return (
        do_parts.crossJoin(F.broadcast(de_parts))
        .crossJoin(F.broadcast(dropped))
        .select(
            F.col("_nitems").alias("n_items"),
            F.col("_nvals").alias("n_values"),
            F.coalesce("_ndrop", F.lit(0)).alias("n_dropped"),
            F.round(d_o, 6).alias("d_o"),
            F.round(d_e, 6).alias("d_e"),
            F.round(
                F.when(d_e > 0, 1.0 - d_o / d_e), 6
            ).alias("alpha"),
        )
    )


def rank_correlation(
    scored: DataFrame,
    group_col: str,
    score_a: str,
    score_b: str,
) -> DataFrame:
    """Rank agreement between two scorers, per group: Spearman's ρ
    (Pearson over average ranks — the tie-correct form) and Kendall's
    τ-b (concordant-vs-discordant pairs with tie normalization) — the
    do-two-rankers-agree audit run before fusing them (rrf_fuse) or
    replacing an expensive scorer with a cheap one.

    ``scored`` has one row per (group, item) with both scores. Returns
    one row per group: (``group_col``, ``n``, ``spearman_rho``,
    ``kendall_tau``), rounded to 6 — NULL when either score is constant
    within the group (zero rank variance / all pairs tied).

    Scale shape: ρ costs two group-keyed window rank passes (shared
    exchange) and a group-sized moment fold — linear. τ enumerates
    within-group pairs (one self-equi-join on the group key): Σ|g|²
    work, intended for BOUNDED groups — top-k ranking lists, eval
    suites — exactly where rank agreement is asked for; gate upstream
    if a group can be corpus-sized (same contract as bounded-panel
    linkage blocks).
    """
    w_a = Window.partitionBy(group_col).orderBy(score_a)
    w_b = Window.partitionBy(group_col).orderBy(score_b)
    # average ranks (tie-correct): rank + (count_of_equal − 1)/2
    ranked = scored.select(
        F.col(group_col).alias("_g"),
        F.col(score_a).alias("_sa"),
        F.col(score_b).alias("_sb"),
        (
            F.rank().over(w_a)
            + (F.count(F.lit(1)).over(w_a.rangeBetween(0, 0)) - 1) / 2.0
        ).alias("_ra"),
        (
            F.rank().over(w_b)
            + (F.count(F.lit(1)).over(w_b.rangeBetween(0, 0)) - 1) / 2.0
        ).alias("_rb"),
    )
    mom = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_ra").alias("_sra"),
        F.sum("_rb").alias("_srb"),
        F.sum(F.col("_ra") * F.col("_rb")).alias("_srab"),
        F.sum(F.col("_ra") * F.col("_ra")).alias("_sraa"),
        F.sum(F.col("_rb") * F.col("_rb")).alias("_srbb"),
    )
    nn = F.col("n").cast("double")
    cov = F.col("_srab") - F.col("_sra") * F.col("_srb") / nn
    va = F.col("_sraa") - F.col("_sra") * F.col("_sra") / nn
    vb = F.col("_srbb") - F.col("_srb") * F.col("_srb") / nn
    rho = mom.select(
        "_g",
        "n",
        F.round(
            F.when((va > 1e-12) & (vb > 1e-12), cov / F.sqrt(va * vb)), 6
        ).alias("spearman_rho"),
    )
    # Kendall tau-b over within-group pairs
    l, r = ranked.alias("l"), ranked.alias("r")
    pairs = l.join(r, F.col("l._g") == F.col("r._g")).where(
        (F.col("l._ra") < F.col("r._ra"))
        | ((F.col("l._ra") == F.col("r._ra")) & (F.col("l._rb") < F.col("r._rb")))
    )
    # signum(da)*signum(db), NOT signum(da*db): the product of two tiny
    # differences underflows to 0.0 and silently miscounts the pair as
    # neither concordant nor discordant (hypothesis-found)
    sgn = F.signum(F.col("l._sa") - F.col("r._sa")) * F.signum(
        F.col("l._sb") - F.col("r._sb")
    )
    tie_a = (F.col("l._sa") == F.col("r._sa")).cast("int")
    tie_b = (F.col("l._sb") == F.col("r._sb")).cast("int")
    tau = pairs.groupBy(F.col("l._g").alias("_g")).agg(
        F.sum(F.when((tie_a == 0) & (tie_b == 0), sgn).otherwise(0.0)).alias("_s"),
        F.count(F.lit(1)).alias("_npairs"),
        F.sum(tie_a).alias("_ta"),
        F.sum(tie_b).alias("_tb"),
    )
    denom = F.sqrt(
        (F.col("_npairs") - F.col("_ta")).cast("double")
        * (F.col("_npairs") - F.col("_tb")).cast("double")
    )
    tau = tau.select(
        "_g",
        F.round(F.when(denom > 0, F.col("_s") / denom), 6).alias("kendall_tau"),
    )
    return (
        rho.join(tau, "_g", "left")
        .select(
            F.col("_g").alias(group_col), "n", "spearman_rho", "kendall_tau"
        )
        .orderBy(group_col)
    )


def rbo_overlap(
    df: DataFrame,
    id_col: str,
    score_a: str,
    score_b: str,
    k: int = 50,
    p: float = 0.9,
) -> DataFrame:
    """Rank-Biased Overlap (Webber, Moffat & Zobel, TOIS 2010) between
    the two rankings ``score_a`` and ``score_b`` induce over the same
    items — the TOP-WEIGHTED agreement measure :func:`rank_correlation`
    is not: Spearman/Kendall weight a swap at rank 999 like one at rank
    1, but for retrieval/curation rankings only the head matters.
    Truncated prefix form (documented; no tail extrapolation):

        RBO@k = (1-p) · Σ_{d=1..k} p^{d-1} · |top_d(A) ∩ top_d(B)| / d

    p sets how fast depth weight decays (0.9 → ~the top 10 carry 86% of
    the weight). Returns ONE row: (``k``, ``p``, ``rbo``) rounded to 6;
    1.0 = identical prefixes, → 0 = disjoint heads.

    Determinism: both rankings order by the 6-dp-rounded score with id
    tie-breaks (the house convention); an item enters the intersection
    at depth max(rank_a, rank_b), so the per-depth overlap counts are
    exact integers, and the weighted terms are 12-dp-pinned DECIMALs —
    no float-sum order anywhere.

    Scale shape: two TakeOrderedAndProject top-k heaps over one corpus
    scan each, then arithmetic on ≤ k rows (a join of two k-row
    frames + a k-row spine). The corpus never shuffles.
    """
    wa = Window.orderBy(F.desc(F.round(F.col(score_a), 6)), F.asc(id_col))
    wb = Window.orderBy(F.desc(F.round(F.col(score_b), 6)), F.asc(id_col))
    ra = (
        df.select(id_col, score_a)
        .withColumn("_ra", F.row_number().over(wa))
        .filter(F.col("_ra") <= k)
        .select(id_col, "_ra")
    )
    rb = (
        df.select(id_col, score_b)
        .withColumn("_rb", F.row_number().over(wb))
        .filter(F.col("_rb") <= k)
        .select(id_col, "_rb")
    )
    entered = ra.join(rb, id_col).select(
        F.greatest("_ra", "_rb").alias("_m")
    )
    spine = df.sparkSession.range(1, k + 1).select(F.col("id").cast("int").alias("_d"))
    # c_d = #items whose BOTH ranks are <= d  (exact integer)
    cum = (
        spine.join(entered, F.col("_m") <= F.col("_d"), "left")
        .groupBy("_d")
        .agg(F.count("_m").alias("_c"))
    )
    term = (
        F.round(
            F.pow(F.lit(float(p)), F.col("_d") - 1)
            * F.col("_c").cast("double")
            / F.col("_d").cast("double"),
            12,
        )
    ).cast("decimal(16,12)")
    return cum.agg(
        F.lit(k).alias("k"),
        F.lit(float(p)).alias("p"),
        F.round(
            F.lit(1.0 - float(p)) * F.sum(term).cast("double"), 6
        ).alias("rbo"),
    )


def cronbach_alpha(
    df: DataFrame,
    subject_col: str,
    item_col: str,
    score_col: str,
) -> DataFrame:
    """Cronbach's alpha (Cronbach 1951) — internal-consistency
    reliability of a k-item instrument over subjects: do the k rubric
    dimensions / labeling passes measure one underlying construct?
    The annotation-pipeline twin of the agreement family (kappa,
    Krippendorff) for CONTINUOUS item scores:

        α = k/(k−1) · (1 − Σ var(item_j) / var(Σ_j item_j))

    computed over subjects with a COMPLETE item row (listwise
    deletion, the standard). Returns ONE row: (``n_subjects``, ``k``,
    ``alpha``) rounded to 6 — NULL when k < 2 or the total-score
    variance is 0 (no between-subject spread to be reliable about).

    Determinism: per-item and total-score moments accumulate in
    DECIMAL ((17,4) operands, (35,8)-exact squares — the msprt
    discipline); population variances; the k-item variance sum is
    9-dp-pinned and DECIMAL-accumulated.

    Scale shape: one (subject, item) aggregate to the score matrix,
    one subject-keyed row-sum aggregate, item-sized + one-row folds.
    """
    base = df.filter(
        F.col(subject_col).isNotNull()
        & F.col(item_col).isNotNull()
        & F.col(score_col).isNotNull()
    ).select(
        F.col(subject_col).alias("_s"),
        F.col(item_col).alias("_i"),
        F.col(score_col).try_cast("decimal(17,4)").alias("_v"),
    )
    k_total = base.select("_i").distinct().count()
    counts = base.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_ni"),
        F.sum("_v").cast("decimal(38,4)").alias("_tot"),
    )
    complete = counts.filter(F.col("_ni") == k_total).select("_s", "_tot")
    kept = base.join(F.broadcast(complete.select("_s")), "_s")
    sq = lambda c: (c * c).cast("decimal(38,8)")  # noqa: E731
    item_var = (
        kept.groupBy("_i")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_v").cast("decimal(38,8)")).cast("double").alias("_s1"),
            F.sum(sq(F.col("_v"))).cast("double").alias("_s2"),
        )
        .select(
            F.round(
                F.col("_s2") / F.col("_n")
                - (F.col("_s1") / F.col("_n")) * (F.col("_s1") / F.col("_n")),
                9,
            ).alias("_var")
        )
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.col("_var").cast("decimal(28,9)")).cast("double").alias("_sv"),
        )
    )
    tot_var = complete.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum(F.col("_tot").cast("decimal(38,8)")).cast("double").alias("_t1"),
        F.sum(sq(F.col("_tot"))).cast("double").alias("_t2"),
    )
    j = tot_var.crossJoin(item_var)
    nn = F.col("n_subjects").cast("double")
    vt = F.round(
        F.col("_t2") / nn - (F.col("_t1") / nn) * (F.col("_t1") / nn), 9
    )
    kk = F.col("k").cast("double")
    alpha = F.when(
        (F.col("k") >= 2) & (vt > 0),
        kk / (kk - 1.0) * (1.0 - F.col("_sv") / vt),
    )
    return j.select(
        "n_subjects", "k", F.round(alpha, 6).alias("alpha")
    )


def adjusted_rand_index(
    df: DataFrame,
    labels_a_col: str,
    labels_b_col: str,
) -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) between two
    partitions of the same items — the PAIR-COUNTING agreement
    companion to mutual_information's NMI (which is information-
    theoretic; ARI is chance-corrected at the pair level, so the two
    disagree exactly when cluster size skew matters). The standard
    readout for "did my clustering/sharding recover the known
    grouping":

        ARI = (Σ_ij C(n_ij,2) − E) / (½[Σ_i C(a_i,2) + Σ_j C(b_j,2)] − E),
        E = Σ_i C(a_i,2)·Σ_j C(b_j,2) / C(n,2)

    Returns ONE row: (``n``, ``clusters_a``, ``clusters_b``, ``ari``)
    rounded to 6 — ARI NULL when the denominator is 0 (both
    partitions all-singletons or one single cluster: agreement is
    undefined, not 1).

    Determinism: every C(·,2) is exact BIGINT; the Σa·Σb product is
    carried as DECIMAL(38,0) (BIGINT would overflow past ~3B pairs);
    only the final ratio is float.

    Scale shape: one (a,b)-cell count aggregate (the contingency
    table — at most |A|·|B| rows), two margin folds, one-row combine.
    The corpus is scanned once.
    """
    base = df.filter(
        F.col(labels_a_col).isNotNull() & F.col(labels_b_col).isNotNull()
    ).select(
        F.col(labels_a_col).alias("_a"), F.col(labels_b_col).alias("_b")
    )
    cells = base.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_c"))
    pairs2 = lambda c: (c * (c - 1)) / 2  # noqa: E731  exact: c(c-1) is even
    cell_sum = cells.agg(
        F.sum("_c").alias("n"),
        F.coalesce(
            F.sum(F.floor(pairs2(F.col("_c")))), F.lit(0)
        ).alias("_sij"),
    )
    ma = (
        cells.groupBy("_a")
        .agg(F.sum("_c").alias("_ca"))
        .agg(
            F.count(F.lit(1)).alias("clusters_a"),
            F.coalesce(
                F.sum(F.floor(pairs2(F.col("_ca")))), F.lit(0)
            ).alias("_sa"),
        )
    )
    mb = (
        cells.groupBy("_b")
        .agg(F.sum("_c").alias("_cb"))
        .agg(
            F.count(F.lit(1)).alias("clusters_b"),
            F.coalesce(
                F.sum(F.floor(pairs2(F.col("_cb")))), F.lit(0)
            ).alias("_sb"),
        )
    )
    j = cell_sum.crossJoin(ma).crossJoin(mb)
    tot = F.floor((F.col("n") * (F.col("n") - 1)) / 2).cast("double")
    expected = (
        (
            F.col("_sa").cast("decimal(19,0)")
            * F.col("_sb").cast("decimal(19,0)")
        ).cast("decimal(38,0)").cast("double")
        / tot
    )
    half = (F.col("_sa").cast("double") + F.col("_sb").cast("double")) / 2.0
    den = half - expected
    ari = F.when(
        (F.col("n") >= 2) & (den != 0.0),
        (F.col("_sij").cast("double") - expected) / den,
    )
    return j.select(
        "n",
        "clusters_a",
        "clusters_b",
        F.round(ari, 6).alias("ari"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Average precision — the area under the precision-recall curve
    by the standard step interpolation (AP = mean of precision@k over
    the positive ranks). The class-imbalance-honest twin of roc_auc:
    AUC stays high when negatives dominate; AP collapses, which is
    what a rare-defect quality filter actually feels. Ranking is by
    ``score`` DESC with ``id_col`` ASC as the deterministic tie-break
    (documented: with heavy score ties AP is only defined relative to
    a tie order, so the oracle replays the identical one).

    Returns per group (or ONE row): (``n``, ``n_pos``,
    ``average_precision``) rounded to 6 — NULL when there are no
    positives.

    Determinism: ranks and cumulative-positive counts are exact
    BIGINT; each precision@k term is rounded to 12 dp and accumulated
    in DECIMAL so partition order cannot wiggle the sum; one float
    division at the end.

    Scale shape: one rank window per group (Spark compiles the
    per-group ordered window to a shuffle on the group key — for a
    single global group this is a bounded single-pass sort, intended
    for evaluation sets, not raw corpora), one aggregate.
    """
    from pyspark.sql import Window

    gcol = group_col if group_col is not None else None
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *([F.col(gcol).alias("_g")] if gcol else [F.lit("all").alias("_g")]),
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("_g").orderBy(F.desc("_s"), F.asc("_id"))
    ranked = base.select(
        "_g",
        "_y",
        F.row_number().over(w).alias("_k"),
        F.sum("_y").over(
            Window.partitionBy("_g")
            .orderBy(F.desc("_s"), F.asc("_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cp"),
    )
    term = F.round(
        F.col("_cp").cast("double") / F.col("_k").cast("double"), 12
    ).cast("decimal(28,12)")
    agg = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("_y"), F.lit(0)).alias("n_pos"),
        F.sum(F.when(F.col("_y") == 1, term)).cast("double").alias("_ap_sum"),
    )
    ap = F.when(
        F.col("n_pos") > 0,
        F.col("_ap_sum") / F.col("n_pos").cast("double"),
    )
    out = agg.select(
        F.col("_g").alias(gcol if gcol else "group"),
        "n",
        "n_pos",
        F.round(ap, 6).alias("average_precision"),
    )
    return out.orderBy(gcol if gcol else "group")


def map_mrr(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """MAP@k and MRR — the binary-relevance retrieval scorecard next
    to ndcg_at_k's graded one: AP@k averages precision at each
    relevant hit inside the cutoff, RR is 1/rank of the FIRST
    relevant hit (rank counted on the full ranking, the standard).
    Ranking is by ``score`` DESC, ``id_col`` ASC (deterministic
    tie-break, same convention as average_precision). ``rel_col`` > 0
    means relevant.

    Returns per query: (``query``, ``n_judged``, ``n_rel``,
    ``ap_at_k``, ``rr``) rounded to 6 — ap/rr NULL when the query has
    no relevant documents. (Mean across queries is a trivial AVG over
    this frame; returning per-query rows keeps the oracle comparison
    sharp.)

    Determinism: ranks/counts exact; AP terms 12-dp DECIMAL-
    accumulated; RR is a single exact division.

    Scale shape: one rank window per query (shuffle on the query
    key — queries evaluate in parallel), one aggregate.
    """
    from pyspark.sql import Window

    base = df.filter(
        F.col(score_col).isNotNull() & F.col(rel_col).isNotNull()
    ).select(
        F.col(query_col).alias("_q"),
        F.col(score_col).cast("double").alias("_s"),
        (F.col(rel_col) > 0).cast("int").alias("_r"),
        F.col(id_col).alias("_id"),
    )
    order = [F.desc("_s"), F.asc("_id")]
    w = Window.partitionBy("_q").orderBy(*order)
    ranked = base.select(
        "_q",
        "_r",
        F.row_number().over(w).alias("_k"),
        F.sum("_r").over(
            Window.partitionBy("_q")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cr"),
    )
    term = F.round(
        F.col("_cr").cast("double") / F.col("_k").cast("double"), 12
    ).cast("decimal(28,12)")
    agg = ranked.groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_judged"),
        F.coalesce(F.sum("_r"), F.lit(0)).alias("n_rel"),
        F.sum(
            F.when((F.col("_r") == 1) & (F.col("_k") <= k), term)
        ).cast("double").alias("_ap_sum"),
        F.min(F.when(F.col("_r") == 1, F.col("_k"))).alias("_first"),
        F.sum(
            F.when((F.col("_r") == 1) & (F.col("_k") <= k), 1).otherwise(0)
        ).alias("_rel_in_k"),
    )
    denom = F.least(F.col("n_rel"), F.lit(k)).cast("double")
    ap = F.when(
        F.col("n_rel") > 0,
        F.coalesce(F.col("_ap_sum"), F.lit(0.0)) / denom,
    )
    rr = F.when(
        F.col("n_rel") > 0, 1.0 / F.col("_first").cast("double")
    )
    return agg.select(
        F.col("_q").alias("query"),
        "n_judged",
        "n_rel",
        F.round(ap, 6).alias("ap_at_k"),
        F.round(rr, 6).alias("rr"),
    ).orderBy("query")


def brier_log_loss(
    df: DataFrame,
    prob_col: str,
    label_col: str,
) -> DataFrame:
    """Brier score (1950) + log loss — the two proper scoring rules
    for probabilistic classifiers, the single-number companions to
    the binned quality_calibration readout (a model can have perfect
    calibration bins and still be useless; Brier/log-loss price
    sharpness too):

        Brier = mean (p − y)²,   LogLoss = −mean [y·ln p + (1−y)·ln(1−p)]

    Probabilities are clamped to [1e-15, 1−1e-15] before the logs
    (the sklearn convention) so planted hard 0/1 scores stay finite.
    Returns ONE row: (``n``, ``n_pos``, ``brier``, ``log_loss``)
    rounded to 6.

    Determinism: each row's squared error and log term is rounded to
    12 dp and accumulated in DECIMAL — float-sum order cannot move
    the mean; ln on identical doubles agrees across engines (the
    js_divergence precedent).

    Scale shape: one map-side-combined aggregate; the corpus is
    scanned once.
    """
    eps = 1e-15
    p = F.least(
        F.lit(1.0 - eps), F.greatest(F.lit(eps), F.col(prob_col).cast("double"))
    )
    y = F.col(label_col).cast("int")
    yd = y.cast("double")
    sq = F.round((p - yd) * (p - yd), 12).cast("decimal(28,12)")
    ll = F.round(
        -(yd * F.log(p) + (1.0 - yd) * F.log(1.0 - p)), 12
    ).cast("decimal(28,12)")
    base = df.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(y), F.lit(0)).alias("n_pos"),
        F.sum(sq).cast("double").alias("_bs"),
        F.sum(ll).cast("double").alias("_ls"),
    )
    nn = F.col("n").cast("double")
    return agg.select(
        "n",
        "n_pos",
        F.round(F.when(F.col("n") > 0, F.col("_bs") / nn), 6).alias("brier"),
        F.round(F.when(F.col("n") > 0, F.col("_ls") / nn), 6).alias("log_loss"),
    )


def gain_lift_chart(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table — the THIRD classifier readout
    next to roc_auc (ranking quality) and average_precision
    (imbalance-honest area): "if I act on the top k % by score, what
    fraction of all positives do I capture, and at what multiple of
    random?" — the number a budgeted review/labeling queue actually
    allocates by. Tiles are exact NTILE buckets on (score DESC,
    ``id_col`` ASC — deterministic under ties).

    Returns per tile: (``tile``, ``n``, ``n_pos``, ``cum_recall``,
    ``lift``) rounded to 6 — lift = tile positive rate / overall rate,
    NULL when the corpus has no positives.

    Determinism: integer counts throughout; two divisions per row.

    Scale shape: one ordered window over the scored rows (evaluation
    sets, not raw corpora — the average_precision caveat), two
    tile-sized folds.
    """
    from pyspark.sql import Window

    from valentinus_spark.operators._distrank import global_ranks, ntile_from_rank

    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
        F.col(id_col).alias("_id"),
    )
    # NTILE(n_tiles) OVER (ORDER BY _s DESC, _id ASC) — but via two-phase
    # distributed ranking (the zorder_bucket_stats device) instead of a
    # single-partition global window over the whole scored corpus; the
    # ordering key is total (_id unique), so the closed-form bucket is
    # bit-identical to the window ntile
    ranked = global_ranks(base, [F.desc("_s"), F.asc("_id")])
    tiled = ranked.select(
        ntile_from_rank(F.col("_rank"), F.col("_n"), n_tiles)
        .cast("int")
        .alias("tile"),
        "_y",
    )
    agg = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("_y"), F.lit(0)).alias("n_pos"),
    )
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wc = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = agg.select(
        "tile",
        "n",
        "n_pos",
        F.sum("n_pos").over(wt).alias("_tot_pos"),
        F.sum("n").over(wt).alias("_tot"),
        F.sum("n_pos").over(wc).alias("_cum_pos"),
    )
    recall = F.when(
        F.col("_tot_pos") > 0,
        F.col("_cum_pos").cast("double") / F.col("_tot_pos").cast("double"),
    )
    lift = F.when(
        F.col("_tot_pos") > 0,
        (F.col("n_pos").cast("double") / F.col("n").cast("double"))
        / (F.col("_tot_pos").cast("double") / F.col("_tot").cast("double")),
    )
    return out.select(
        "tile",
        "n",
        "n_pos",
        F.round(recall, 6).alias("cum_recall"),
        F.round(lift, 6).alias("lift"),
    ).orderBy("tile")
