"""Hand-computed oracles for the evaluation operators
(operators/evaluation.py, quality.py::flesch_readability).

Each test pins the statistic against an independently-derived value —
arithmetic done by hand or with a tiny pure-Python replica in the test —
so a Catalyst-expression regression cannot hide behind a matching
implementation bug.
"""

import math

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators import (
    fleiss_kappa,
    flesch_readability,
    mutual_information,
    ndcg_at_k,
    rouge_n_pairs,
)


# ---------------------------------------------------------------- ROUGE


def test_rouge1_hand_example(spark):
    # candidate: "the cat the cat sat"  (grams: the×2, cat×2, sat×1)
    # reference: "the cat sat on the mat" (the×2, cat×1, sat×1, on, mat)
    # clipped overlap: the min(2,2)=2, cat min(2,1)=1, sat 1  → 4
    df = spark.createDataFrame(
        [(1, "the cat the cat sat", "the cat sat on the mat")],
        ["pid", "a", "b"],
    )
    row = rouge_n_pairs(df, "pid", "a", "b", n=1).collect()[0]
    assert row.overlap == 4 and row.n_a == 5 and row.n_b == 6
    assert row.precision == pytest.approx(4 / 5)
    assert row.recall == pytest.approx(4 / 6, abs=1e-6)
    p, r = 4 / 5, 4 / 6
    assert row.f1 == pytest.approx(2 * p * r / (p + r), abs=1e-6)


def test_rouge2_and_identity(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "a b c d"), (2, "a b c d", "x y z")],
        ["pid", "a", "b"],
    )
    out = {r.pid: r for r in rouge_n_pairs(df, "pid", "a", "b", n=2).collect()}
    assert out[1].f1 == pytest.approx(1.0)  # identical → perfect ROUGE-2
    assert out[2].overlap == 0 and out[2].f1 == 0.0


def test_rouge_empty_sides_preserved(spark):
    # both-empty pair must still appear, with NULL ratios (0/0)
    df = spark.createDataFrame(
        [(1, "", ""), (2, "a b", "")], ["pid", "a", "b"]
    )
    out = {r.pid: r for r in rouge_n_pairs(df, "pid", "a", "b", n=1).collect()}
    assert out[1].overlap == 0 and out[1].precision is None and out[1].f1 is None
    # one-sided empty: precision defined (0/2), recall NULL
    assert out[2].precision == 0.0 and out[2].recall is None


# ---------------------------------------------------------------- Fleiss


def test_fleiss_textbook_perfect_and_random(spark):
    # perfect agreement: every item's raters unanimous → kappa = 1
    rows = [(i, r, "yes" if i % 2 else "no") for i in range(10) for r in range(3)]
    df = spark.createDataFrame(rows, ["item", "rater", "label"])
    out = fleiss_kappa(df, "item", "label").collect()[0]
    assert out.n_items == 10 and out.n_raters == 3 and out.n_dropped == 0
    assert out.p_bar == pytest.approx(1.0) and out.kappa == pytest.approx(1.0)


def test_fleiss_hand_computed(spark):
    # 2 items, 2 raters each. item1: (A,A) item2: (A,B)
    # P_1 = (2·1)/(2·1) = 1 ; P_2 = 0 ; P̄ = 0.5
    # p_A = 3/4, p_B = 1/4 → P_e = 9/16 + 1/16 = 0.625
    # κ = (0.5 − 0.625)/(1 − 0.625) = −1/3
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "A"), (2, "B")], ["item", "label"]
    )
    out = fleiss_kappa(df, "item", "label").collect()[0]
    assert out.p_bar == pytest.approx(0.5)
    assert out.p_e == pytest.approx(0.625)
    assert out.kappa == pytest.approx(-1 / 3, abs=1e-6)


def test_fleiss_incomplete_items_dropped(spark):
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "A")], ["item", "label"]  # item2: 1 rating
    )
    out = fleiss_kappa(df, "item", "label").collect()[0]
    assert out.n_items == 1 and out.n_dropped == 1
    # single category among kept → P_e = 1 → kappa undefined
    assert out.kappa is None


# ---------------------------------------------------------------- nDCG


def _ndcg_py(pairs, k):
    # pairs: list of (doc, score, rel)
    by_score = sorted(pairs, key=lambda t: (-t[1], t[0]))
    by_rel = sorted(pairs, key=lambda t: (-t[2], t[0]))
    dcg = sum(
        (2 ** rel - 1) / math.log2(i + 2)
        for i, (_, _, rel) in enumerate(by_score[:k])
    )
    idcg = sum(
        (2 ** rel - 1) / math.log2(i + 2)
        for i, (_, _, rel) in enumerate(by_rel[:k])
    )
    return dcg, idcg


def test_ndcg_matches_python_replica(spark):
    pairs = [
        ("d1", 0.9, 3), ("d2", 0.8, 0), ("d3", 0.7, 2),
        ("d4", 0.6, 3), ("d5", 0.5, 1),
    ]
    df = spark.createDataFrame(
        [("q",) + p for p in pairs], ["q", "doc", "score", "rel"]
    )
    out = ndcg_at_k(df, "q", "doc", "score", "rel", k=3).collect()[0]
    dcg, idcg = _ndcg_py(pairs, 3)
    assert out.dcg == pytest.approx(dcg, abs=1e-6)
    assert out.idcg == pytest.approx(idcg, abs=1e-6)
    assert out.ndcg == pytest.approx(dcg / idcg, abs=1e-6)


def test_ndcg_perfect_ranking_is_one_and_zero_rel_null(spark):
    df = spark.createDataFrame(
        [("q1", "a", 2.0, 2), ("q1", "b", 1.0, 1), ("q2", "c", 5.0, 0)],
        ["q", "doc", "score", "rel"],
    )
    out = {r.q: r for r in ndcg_at_k(df, "q", "doc", "score", "rel").collect()}
    assert out["q1"].ndcg == pytest.approx(1.0)
    assert out["q2"].ndcg is None  # IDCG = 0: no relevant docs


def test_ndcg_tiebreak_deterministic(spark):
    # equal scores → doc ascending decides rank; rel (2 then 0) vs (0 then 2)
    df = spark.createDataFrame(
        [("q", "a", 1.0, 0), ("q", "b", 1.0, 2)], ["q", "doc", "score", "rel"]
    )
    out = ndcg_at_k(df, "q", "doc", "score", "rel", k=2).collect()[0]
    # DCG = 0/log2(2) + 3/log2(3); IDCG = 3/log2(2) = 3
    assert out.dcg == pytest.approx(3 / math.log2(3), abs=1e-6)
    assert out.ndcg == pytest.approx(3 / math.log2(3) / 3, abs=1e-6)


# ------------------------------------------------- mutual information


def test_mi_identical_columns(spark):
    # A == B → MI = H(A) = H(B) = H(AB), NMI = 1
    df = spark.createDataFrame(
        [("x", "x")] * 2 + [("y", "y")] * 2, ["a", "b"]
    )
    out = mutual_information(df, "a", "b").collect()[0]
    assert out.h_a == pytest.approx(1.0)
    assert out.mi == pytest.approx(1.0)
    assert out.nmi == pytest.approx(1.0)


def test_mi_independent_columns(spark):
    # uniform independent 2×2 → MI = 0, H(AB) = 2 bits
    rows = [(a, b) for a in "xy" for b in "uv"]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = mutual_information(df, "a", "b").collect()[0]
    assert out.h_ab == pytest.approx(2.0)
    assert out.mi == pytest.approx(0.0, abs=1e-9)


def test_mi_constant_column_nmi_null(spark):
    df = spark.createDataFrame([("k", "u"), ("k", "v")], ["a", "b"])
    out = mutual_information(df, "a", "b").collect()[0]
    assert out.h_a == 0.0 and out.mi == 0.0 and out.nmi is None


# ------------------------------------------------------------- Flesch


def test_flesch_hand_example(spark):
    # "The cat sat. It ran fast!"  → 2 sentences, 6 words
    # syllables (vowel-group runs, floor 1): the=1 cat=1 sat=1 it=1
    # ran=1 fast=1 → 6 → wps=3, spw=1
    df = spark.createDataFrame(
        [(1, "The cat sat. It ran fast!")], ["doc_id", "text"]
    )
    out = flesch_readability(df).collect()[0]
    assert out.n_words == 6 and out.n_sentences == 2 and out.n_syllables == 6
    assert out.fre == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1, abs=1e-3)
    assert out.fk_grade == pytest.approx(0.39 * 3 + 11.8 * 1 - 15.59, abs=1e-3)


def test_flesch_vowelless_floor_and_empty_dropped(spark):
    df = spark.createDataFrame(
        [(1, "xkcd 7 tv"), (2, "")], ["doc_id", "text"]
    )
    rows = flesch_readability(df).collect()
    assert len(rows) == 1  # empty doc has no words → dropped
    assert rows[0].n_syllables == 3  # floor of 1 per vowel-less token


def test_flesch_multisyllable(spark):
    # "beautiful examination" → beau-ti-ful? vowel groups: eau,i,u =3;
    # examination: e,a,i,a,io = 5 → 8 syllables, 1 sentence (floor), 2 words
    df = spark.createDataFrame([(1, "beautiful examination")], ["doc_id", "text"])
    out = flesch_readability(df).collect()[0]
    assert out.n_syllables == 8 and out.n_sentences == 1


# -------------------------------------------------- Krippendorff alpha


def test_krippendorff_perfect_and_chance(spark):
    from valentinus_spark.operators import krippendorff_alpha

    # u1 [A,A], u2 [B,B] → D_o = 0 → alpha = 1
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "B"), (2, "B")], ["item", "label"]
    )
    out = krippendorff_alpha(df, "item", "label").collect()[0]
    assert out.alpha == pytest.approx(1.0) and out.n_values == 4

    # u1 [A,A], u2 [A,B] → D_o = 0.5, D_e = 0.5 → alpha = 0
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "A"), (2, "B")], ["item", "label"]
    )
    out = krippendorff_alpha(df, "item", "label").collect()[0]
    assert out.alpha == pytest.approx(0.0)


def test_krippendorff_hand_computed_mixed(spark):
    from valentinus_spark.operators import krippendorff_alpha

    # u1 [A,A], u2 [B,B], u3 [A,B]:
    # D_o = (1/6)(0+0+2) = 1/3 ; D_e = (3·3+3·3)/(6·5) = 0.6
    # alpha = 1 − (1/3)/0.6 = 4/9
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "B"), (2, "B"), (3, "A"), (3, "B")],
        ["item", "label"],
    )
    out = krippendorff_alpha(df, "item", "label").collect()[0]
    assert out.d_o == pytest.approx(1 / 3, abs=1e-6)
    assert out.d_e == pytest.approx(0.6)
    assert out.alpha == pytest.approx(4 / 9, abs=1e-6)


def test_krippendorff_single_rating_dropped_and_de_zero(spark):
    from valentinus_spark.operators import krippendorff_alpha

    # u2 has one rating → dropped; kept units share one category → D_e=0
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "B")], ["item", "label"]
    )
    out = krippendorff_alpha(df, "item", "label").collect()[0]
    assert out.n_dropped == 1 and out.n_items == 1
    assert out.alpha is None


# ---------------------------------------------------------------- Elo


def test_elo_single_round_even_match(spark):
    from valentinus_spark.operators import elo_ratings

    df = spark.createDataFrame([("A", "B", 1)], ["winner", "loser", "round"])
    out = {r.item: r for r in elo_ratings(df).collect()}
    # equal ratings → E = 0.5 → winner +8, loser −8 at K=16
    assert out["A"].rating == pytest.approx(1508.0)
    assert out["B"].rating == pytest.approx(1492.0)
    assert out["A"].rank == 1 and out["A"].wins == 1 and out["A"].losses == 0


def test_elo_two_rounds_matches_python_replica(spark):
    from valentinus_spark.operators import elo_ratings

    df = spark.createDataFrame(
        [("A", "B", 1), ("B", "A", 2)], ["winner", "loser", "round"]
    )
    out = {r.item: r for r in elo_ratings(df).collect()}
    # after r1: A=1508, B=1492. r2: B beats A.
    eb = 1.0 / (1.0 + 10 ** ((1508.0 - 1492.0) / 400.0))
    db = 16.0 * (1.0 - eb)
    assert out["B"].rating == pytest.approx(round(1492.0 + db, 4), abs=1e-4)
    assert out["A"].rating == pytest.approx(round(1508.0 - db, 4), abs=1e-4)
    assert out["A"].n_matches == 2


def test_elo_round_start_ratings_synchronous(spark):
    from valentinus_spark.operators import elo_ratings

    # two matches in the SAME round both score against 1500-everywhere:
    # A beats B, B beats C → B gains +8 and loses 8 in one round → 1500
    df = spark.createDataFrame(
        [("A", "B", 1), ("B", "C", 1)], ["winner", "loser", "round"]
    )
    out = {r.item: r for r in elo_ratings(df).collect()}
    assert out["B"].rating == pytest.approx(1500.0)
    assert out["A"].rating == pytest.approx(1508.0)
    assert out["C"].rating == pytest.approx(1492.0)


# -------------------------------------------------- lexical diversity


def test_lexical_diversity_hand_example(spark):
    from valentinus_spark.operators import lexical_diversity

    # "a a b c": N=4 V=3 hapax=2 Σf²=6 → K = 1e4·(6−4)/16 = 1250
    df = spark.createDataFrame([("g", "a a b c")], ["src", "text"])
    out = lexical_diversity(df, "src").collect()[0]
    assert out.n_tokens == 4 and out.vocab == 3
    assert out.ttr == pytest.approx(0.75)
    assert out.hapax_frac == pytest.approx(2 / 3, abs=1e-6)
    assert out.yule_k == pytest.approx(1250.0)


def test_lexical_diversity_groups_and_degenerate(spark):
    from valentinus_spark.operators import lexical_diversity

    df = spark.createDataFrame(
        [("g1", "x x x x"), ("g2", "w")], ["src", "text"]
    )
    out = {r.src: r for r in lexical_diversity(df, "src").collect()}
    # g1: pure repetition → TTR 0.25, hapax 0, K = 1e4·(16−4)/16 = 7500
    assert out["g1"].ttr == pytest.approx(0.25)
    assert out["g1"].hapax_frac == 0.0
    assert out["g1"].yule_k == pytest.approx(7500.0)
    # g2: single token → yule_k NULL
    assert out["g2"].yule_k is None


# --------------------------------------------------------- char entropy


def test_char_entropy_hand_examples(spark):
    from valentinus_spark.operators import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, "")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[1].entropy == pytest.approx(0.0)  # single char
    assert out[2].entropy == pytest.approx(1.0)  # uniform 2
    assert out[3].entropy == pytest.approx(2.0)  # uniform 4
    assert 4 not in out  # empty doc dropped
    assert out[3].distinct_chars == 4 and out[3].n_chars == 4


def test_char_entropy_weighted(spark):
    from valentinus_spark.operators import char_entropy

    # "aab": p=[2/3, 1/3] → H = log2(3) − (2·1)/3 = 0.918295...
    df = spark.createDataFrame([(1, "aab")], ["doc_id", "text"])
    out = char_entropy(df).collect()[0]
    assert out.entropy == pytest.approx(
        math.log2(3) - 2 / 3, abs=1e-4
    )


# --------------------------------------------------------- Heaps' law


def test_heaps_law_saturating_vs_growing(spark):
    from valentinus_spark.operators import heaps_law

    # saturating: same 2 tokens forever → V flat → beta ≈ 0
    sat = [("s", i, "x y") for i in range(8)]
    # growing: all-new tokens each doc → V = N → beta = 1
    grow = [("g", i, f"t{2*i} t{2*i+1}") for i in range(8)]
    df = spark.createDataFrame(sat + grow, ["src", "doc_id", "text"])
    out = {r.src: r for r in heaps_law(df, "src").collect()}
    assert out["s"].beta == pytest.approx(0.0, abs=1e-6)
    assert out["g"].beta == pytest.approx(1.0, abs=1e-6)
    assert out["g"].k == pytest.approx(1.0, abs=1e-4)
    assert out["s"].vocab == 2 and out["s"].n_tokens == 16


def test_heaps_law_single_doc_null(spark):
    from valentinus_spark.operators import heaps_law

    df = spark.createDataFrame([("s", 1, "a b c")], ["src", "doc_id", "text"])
    out = heaps_law(df, "src").collect()[0]
    assert out.beta is None and out.n_docs == 1


def test_heaps_law_matches_python_ols(spark):
    from valentinus_spark.operators import heaps_law

    docs = [
        ("s", 0, "a b c d"),
        ("s", 1, "a b e f g"),
        ("s", 2, "a c e h"),
        ("s", 3, "i j a b c d e"),
    ]
    df = spark.createDataFrame(docs, ["src", "doc_id", "text"])
    out = heaps_law(df, "src").collect()[0]
    # python replica
    seen, N, V, xs, ys = set(), 0, 0, [], []
    for _, _, text in docs:
        toks = text.split()
        N += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                V += 1
        xs.append(math.log10(N))
        ys.append(math.log10(V))
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    beta = (sum(x * y for x, y in zip(xs, ys)) - n * mx * my) / (
        sum(x * x for x in xs) - n * mx * mx
    )
    assert out.beta == pytest.approx(beta, abs=1e-6)
    assert out.k == pytest.approx(10 ** (my - beta * mx), abs=1e-4)


# ------------------------------------------------------ n-gram novelty


def test_ngram_novelty_unique_vs_shared(spark):
    from valentinus_spark.operators import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares grams with doc 2
            (2, "the quick brown fox sleeps"),
            (3, "entirely different words here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in ngram_novelty(df, n=3).collect()}
    # doc3's grams appear nowhere else → novelty 1
    assert out[3].novelty == pytest.approx(1.0)
    # docs 1/2 share "the quick brown" and "quick brown fox" (2 of 3)
    assert out[1].n_grams == 3 and out[1].novel_grams == 1
    assert out[1].novelty == pytest.approx(1 / 3, abs=1e-6)


def test_ngram_novelty_exact_dup_zero(spark):
    from valentinus_spark.operators import ngram_novelty

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in ngram_novelty(df, n=2).collect()}
    assert out[1].novelty == 0.0 and out[2].novelty == 0.0


# ----------------------------------------------------- term burstiness


def test_term_burstiness_hand_computed(spark):
    from valentinus_spark.operators import term_burstiness

    # D=3. x: df=1 Σc=4 Σc²=16 → μ=4/3 var=16/3 vmr=4
    #      y: df=2 Σc=2 Σc²=2  → μ=2/3 var=1/3  vmr=0.5
    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "y"), (3, "y")], ["doc_id", "text"]
    )
    out = term_burstiness(df, min_df=1, topk=10).collect()
    assert [r.term for r in out] == ["x", "y"]
    assert out[0].vmr == pytest.approx(4.0)
    assert out[0].df == 1 and out[0].total_tf == 4
    assert out[1].vmr == pytest.approx(0.5)
    assert out[1].mean_tf == pytest.approx(2 / 3, abs=1e-6)


def test_term_burstiness_min_df_filter(spark):
    from valentinus_spark.operators import term_burstiness

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b"), (3, "b c")], ["doc_id", "text"]
    )
    out = term_burstiness(df, min_df=2, topk=10).collect()
    assert {r.term for r in out} == {"b"}  # a (df=1), c (df=1) filtered


def test_term_burstiness_uniform_term_low_vmr(spark):
    from valentinus_spark.operators import term_burstiness

    # same count in every doc → var = 0 → vmr = 0
    df = spark.createDataFrame(
        [(i, "the quick") for i in range(6)], ["doc_id", "text"]
    )
    out = {r.term: r for r in term_burstiness(df, min_df=1).collect()}
    assert out["the"].vmr == pytest.approx(0.0)


# ----------------------------------------------------- rank correlation


def test_rank_correlation_perfect_and_reversed(spark):
    from valentinus_spark.operators import rank_correlation

    rows = [("g", i, float(i), float(i)) for i in range(6)] + [
        ("h", i, float(i), float(-i)) for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["g", "item", "sa", "sb"])
    out = {r.g: r for r in rank_correlation(df, "g", "sa", "sb").collect()}
    assert out["g"].spearman_rho == pytest.approx(1.0)
    assert out["g"].kendall_tau == pytest.approx(1.0)
    assert out["h"].spearman_rho == pytest.approx(-1.0)
    assert out["h"].kendall_tau == pytest.approx(-1.0)


def test_rank_correlation_matches_scipy_style_replica(spark):
    from valentinus_spark.operators import rank_correlation

    sa = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    sb = [2.0, 7.0, 1.0, 8.0, 2.0, 8.0]
    df = spark.createDataFrame(
        [("g", i, a, b) for i, (a, b) in enumerate(zip(sa, sb))],
        ["g", "item", "sa", "sb"],
    )
    out = rank_correlation(df, "g", "sa", "sb").collect()[0]

    # python replica: average ranks + pearson; tau-b pair counts
    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            r = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    ra, rb = avg_ranks(sa), avg_ranks(sb)
    n = len(sa)
    mx, my = sum(ra) / n, sum(rb) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(ra, rb))
    va = sum((x - mx) ** 2 for x in ra)
    vb = sum((y - my) ** 2 for y in rb)
    rho = cov / math.sqrt(va * vb)
    s = ta = tb = npairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            npairs += 1
            da, db = sa[i] - sa[j], sb[i] - sb[j]
            if da == 0:
                ta += 1
            if db == 0:
                tb += 1
            if da != 0 and db != 0:
                s += (1 if da * db > 0 else -1)
    tau = s / math.sqrt((npairs - ta) * (npairs - tb))
    assert out.spearman_rho == pytest.approx(rho, abs=1e-6)
    assert out.kendall_tau == pytest.approx(tau, abs=1e-6)


def test_rank_correlation_constant_score_null(spark):
    from valentinus_spark.operators import rank_correlation

    df = spark.createDataFrame(
        [("g", i, 1.0, float(i)) for i in range(4)], ["g", "item", "sa", "sb"]
    )
    out = rank_correlation(df, "g", "sa", "sb").collect()[0]
    assert out.spearman_rho is None and out.kendall_tau is None


def test_cronbach_alpha_consistent_vs_noise_items(spark):
    """Items that all track the same construct (score + small offsets)
    give alpha near 1; unrelated alternating items give low/negative
    alpha; incomplete subjects are listwise-dropped."""
    from valentinus_spark.operators import cronbach_alpha

    rows = []
    for s in range(12):
        base = float(s)
        for i, off in (("i1", 0.0), ("i2", 0.5), ("i3", 1.0)):
            rows.append((s, i, base + off))
    rows.append((99, "i1", 5.0))  # incomplete subject -> dropped
    df = spark.createDataFrame(rows, ["subj", "item", "score"])
    r = cronbach_alpha(df, "subj", "item", "score").collect()[0]
    assert r.n_subjects == 12 and r.k == 3
    assert r.alpha == pytest.approx(1.0, abs=1e-6)  # perfectly parallel items

    noisy = []
    for s in range(12):
        noisy.append((s, "i1", float(s % 2)))
        noisy.append((s, "i2", float((s + 1) % 2)))
    rn = cronbach_alpha(
        spark.createDataFrame(noisy, ["subj", "item", "score"]),
        "subj", "item", "score",
    ).collect()[0]
    assert rn.alpha is None or rn.alpha < 0.2  # anti-correlated items


def test_adjusted_rand_index_perfect_and_independent(spark):
    """Identical partitions -> ARI = 1; a partition vs itself relabeled
    is still 1 (ARI is label-invariant)."""
    from valentinus_spark.operators import adjusted_rand_index

    rows = [(i, f"c{i % 3}", f"k{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    r = adjusted_rand_index(df, "a", "b").collect()[0]
    assert (r.n, r.clusters_a, r.clusters_b) == (30, 3, 3)
    assert r.ari == pytest.approx(1.0, abs=1e-9)


def test_adjusted_rand_index_sklearn_replica(spark):
    """Hand-checked contingency: a=[0,0,1,1,1,1], b=[0,1,1,1,2,2] ->
    sklearn.metrics.adjusted_rand_score = 0.0 (this split lands exactly
    at chance)."""
    from valentinus_spark.operators import adjusted_rand_index

    a = [0, 0, 1, 1, 1, 1]
    b = [0, 1, 1, 1, 2, 2]
    df = spark.createDataFrame(
        [(i, str(a[i]), str(b[i])) for i in range(6)], ["id", "a", "b"]
    )
    r = adjusted_rand_index(df, "a", "b").collect()[0]
    # replicate the formula in python
    from collections import Counter

    cells = Counter(zip(a, b))
    sij = sum(c * (c - 1) // 2 for c in cells.values())
    sa = sum(c * (c - 1) // 2 for c in Counter(a).values())
    sb = sum(c * (c - 1) // 2 for c in Counter(b).values())
    tot = 6 * 5 // 2
    exp = sa * sb / tot
    ari = (sij - exp) / ((sa + sb) / 2 - exp)
    assert r.ari == pytest.approx(round(ari, 6), abs=1e-9)


def test_adjusted_rand_degenerate_null(spark):
    """Both partitions one single cluster: denominator 0 -> NULL."""
    from valentinus_spark.operators import adjusted_rand_index

    df = spark.createDataFrame([(i, "x", "y") for i in range(5)], ["id", "a", "b"])
    assert adjusted_rand_index(df, "a", "b").collect()[0].ari is None


def test_average_precision_hand_ranking(spark):
    """Ranking [+,-,+,-,+]: AP = (1/1 + 2/3 + 3/5)/3."""
    from valentinus_spark.operators import average_precision

    rows = [  # id breaks no ties here; scores strictly decreasing
        (1, 0.9, 1), (2, 0.8, 0), (3, 0.7, 1), (4, 0.6, 0), (5, 0.5, 1),
    ]
    df = spark.createDataFrame(rows, ["id", "score", "label"])
    r = average_precision(df, "score", "label", "id").collect()[0]
    assert (r.n, r.n_pos) == (5, 3)
    assert r.average_precision == pytest.approx((1 + 2 / 3 + 3 / 5) / 3, abs=1e-6)


def test_average_precision_tie_break_and_no_pos(spark):
    """All scores tie -> ranking is id order; no positives -> NULL."""
    from valentinus_spark.operators import average_precision

    rows = [(1, 0.5, 0), (2, 0.5, 1), (3, 0.5, 0), (4, 0.5, 1)]
    df = spark.createDataFrame(rows, ["id", "score", "label"])
    r = average_precision(df, "score", "label", "id").collect()[0]
    assert r.average_precision == pytest.approx((1 / 2 + 2 / 4) / 2, abs=1e-6)

    neg = spark.createDataFrame([(1, 0.5, 0)], ["id", "score", "label"])
    assert (
        average_precision(neg, "score", "label", "id")
        .collect()[0]
        .average_precision
        is None
    )


def test_map_mrr_two_queries(spark):
    """q1: first rel at rank 2 of 3 -> RR 0.5, AP@10 = (1/2 + 2/3)/2;
    q2: no relevant -> NULLs."""
    from valentinus_spark.operators import map_mrr

    rows = [
        ("q1", 1, 0.9, 0), ("q1", 2, 0.8, 1), ("q1", 3, 0.7, 1),
        ("q2", 4, 0.9, 0), ("q2", 5, 0.8, 0),
    ]
    df = spark.createDataFrame(rows, ["q", "id", "score", "rel"])
    out = {r.query: r for r in map_mrr(df, "q", "id", "score", "rel", k=10).collect()}
    assert out["q1"].rr == pytest.approx(0.5, abs=1e-9)
    assert out["q1"].ap_at_k == pytest.approx((1 / 2 + 2 / 3) / 2, abs=1e-6)
    assert out["q2"].ap_at_k is None and out["q2"].rr is None


def test_map_mrr_cutoff_denominator(spark):
    """3 relevant docs but k=2: AP@2 divides by min(n_rel, k) = 2."""
    from valentinus_spark.operators import map_mrr

    rows = [("q", i, 1.0 - i / 10.0, 1 if i < 3 else 0) for i in range(5)]
    df = spark.createDataFrame(rows, ["q", "id", "score", "rel"])
    r = map_mrr(df, "q", "id", "score", "rel", k=2).collect()[0]
    assert r.n_rel == 3
    assert r.ap_at_k == pytest.approx((1.0 + 1.0) / 2, abs=1e-9)


def test_brier_log_loss_hand_values(spark):
    """Two rows: p=.8/y=1, p=.4/y=0 -> Brier=(0.04+0.16)/2,
    LL=-(ln .8 + ln .6)/2."""
    import math

    from valentinus_spark.operators import brier_log_loss

    df = spark.createDataFrame([(0.8, 1), (0.4, 0)], ["p", "y"])
    r = brier_log_loss(df, "p", "y").collect()[0]
    assert (r.n, r.n_pos) == (2, 1)
    assert r.brier == pytest.approx((0.04 + 0.16) / 2, abs=1e-6)
    assert r.log_loss == pytest.approx(-(math.log(0.8) + math.log(0.6)) / 2, abs=1e-6)


def test_brier_log_loss_clamps_hard_scores(spark):
    """p=0 on a positive would be -inf log loss; the 1e-15 clamp keeps
    it finite (~34.5)."""
    from valentinus_spark.operators import brier_log_loss

    df = spark.createDataFrame([(0.0, 1)], ["p", "y"])
    r = brier_log_loss(df, "p", "y").collect()[0]
    assert r.brier == pytest.approx(1.0, abs=1e-9)
    assert 30 < r.log_loss < 40


def test_gain_lift_chart_perfect_ranker(spark):
    """Positives all score above negatives, 20% base rate, 10 tiles:
    tiles 1-2 capture everything (lift 5), the rest are empty of
    positives."""
    from valentinus_spark.operators import gain_lift_chart

    rows = [(i, 1 if i < 20 else 0, 100.0 - i) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "label", "score"])
    out = {r.tile: r for r in gain_lift_chart(df, "score", "label", "id").collect()}
    assert out[1].n_pos == 10 and out[2].n_pos == 10
    assert out[2].cum_recall == pytest.approx(1.0, abs=1e-9)
    assert out[1].lift == pytest.approx(5.0, abs=1e-9)
    assert out[10].n_pos == 0 and out[10].cum_recall == pytest.approx(1.0, abs=1e-9)


def test_gain_lift_no_positives_null(spark):
    from valentinus_spark.operators import gain_lift_chart

    df = spark.createDataFrame(
        [(i, 0, float(i)) for i in range(20)], ["id", "label", "score"]
    )
    out = gain_lift_chart(df, "score", "label", "id").collect()
    assert all(r.cum_recall is None and r.lift is None for r in out)
