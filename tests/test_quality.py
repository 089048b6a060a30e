"""Repetition / quality-gate operator (operators/quality.py)."""

import pytest

from valentinus_spark.operators.quality import (
    DEFAULT_QUALITY_GATES,
    quality_filter,
    repetition_stats,
)


def _stats_map(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_repetition_stats_against_python(spark):
    docs = [
        (0, "the cat sat on the mat and the dog sat too"),
        (1, "spam spam spam spam spam"),
        (2, "a b c d e f g h"),
        (3, ""),
        (4, "x y x y x y x y x y x y"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _stats_map(repetition_stats(df, top_ngram_ns=(2,), dup_ngram_n=3))

    def expect(text, top_n=2, dup_n=3):
        toks = text.lower().split()
        n = len(toks)
        if n == 0:
            return dict(n_tokens=0, distinct_token_ratio=0.0, top_token_frac=0.0,
                        top_2gram_frac=0.0, dup_3gram_frac=0.0)
        from collections import Counter

        def grams(k):
            if n <= k:
                return [" ".join(toks)]
            return [" ".join(toks[i : i + k]) for i in range(n - k + 1)]

        c_tok = Counter(toks)
        c2 = Counter(grams(top_n))
        c3 = Counter(grams(dup_n))
        return dict(
            n_tokens=n,
            distinct_token_ratio=len(c_tok) / n,
            top_token_frac=max(c_tok.values()) / n,
            top_2gram_frac=max(c2.values()) / len(grams(top_n)),
            dup_3gram_frac=sum(v for v in c3.values() if v > 1) / len(grams(dup_n)),
        )

    for i, text in docs:
        want = expect(text)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v), f"doc {i} stat {k}"


def test_quality_filter_gates(spark):
    df = spark.createDataFrame(
        [
            (0, "a perfectly normal sentence with reasonably many distinct words here"),
            (1, "buy buy buy buy buy buy buy buy buy buy"),  # top_token_frac = 1
            (2, "too short"),  # n_tokens < 5
        ],
        "doc_id long, text string",
    )
    kept = [r["doc_id"] for r in quality_filter(df).select("doc_id").collect()]
    assert kept == [0]


def test_quality_filter_custom_gates_and_bounds(spark):
    df = spark.createDataFrame(
        [(0, "one two three"), (1, "one one one one")], "doc_id long, text string"
    )
    # only a minimum-distinct gate: doc 1 has ratio 0.25 and is dropped
    kept = quality_filter(df, gates={"distinct_token_ratio": (0.5, None)})
    assert [r["doc_id"] for r in kept.collect()] == [0]
    # unbounded gates keep everything
    kept_all = quality_filter(df, gates={"n_tokens": (None, None)})
    assert kept_all.count() == 2


def test_default_gates_are_sane():
    for stat, (lo, hi) in DEFAULT_QUALITY_GATES.items():
        assert lo is not None or hi is not None, stat


def test_unigram_logprob_matches_python_oracle(spark):
    import math
    from collections import Counter

    from valentinus_spark.operators.quality import unigram_logprob

    docs = [(0, "a b a c"), (1, "a a a"), (2, "b c d d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    corpus = Counter()
    for _, t in docs:
        corpus.update(t.split())
    total = sum(corpus.values())
    got = {
        r["doc_id"]: (r["n_tokens"], r["unigram_ce"])
        for r in unigram_logprob(df).collect()
    }
    for i, t in docs:
        toks = t.split()
        ce = -sum(math.log2(corpus[w] / total) for w in toks) / len(toks)
        assert got[i][0] == len(toks)
        assert got[i][1] == pytest.approx(round(ce, 4), abs=1e-9), f"doc {i}"


def test_unigram_logprob_top_v_oov_fallback(spark):
    from valentinus_spark.operators.quality import unigram_logprob

    # vocab capped to the single most frequent token; everything else
    # scores at the OOV floor
    df = spark.createDataFrame(
        [(0, "common common rare")], "doc_id long, text string"
    )
    row = unigram_logprob(df, top_v=1, oov_logprob=-20.0).collect()[0]
    import math

    # top_v keeps only 'common' (count 2, capped total 2 -> logprob 0);
    # 'rare' is OOV: doc ce = -(0 + 0 + (-20)) / 3
    assert row["unigram_ce"] == pytest.approx(round(20.0 / 3, 4))


def test_source_token_kl_matches_python_oracle(spark):
    import math
    from collections import Counter

    from valentinus_spark.operators.quality import source_token_kl

    docs = [
        ("s0", "a a b c"),
        ("s0", "a b"),
        ("s1", "d d d e"),
        ("s1", "a e"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    corpus = Counter()
    groups: dict[str, Counter] = {}
    for s, t in docs:
        corpus.update(t.split())
        groups.setdefault(s, Counter()).update(t.split())
    ct = sum(corpus.values())
    got = {
        r["source"]: (r["n_tokens"], r["kl_bits"])
        for r in source_token_kl(df).collect()
    }
    for s, cnt in groups.items():
        gt = sum(cnt.values())
        kl = sum(
            (c / gt) * math.log2((c / gt) / (corpus[w] / ct)) for w, c in cnt.items()
        )
        assert got[s][0] == gt
        assert got[s][1] == pytest.approx(round(kl, 4), abs=1e-9), f"group {s}"


def test_source_token_kl_identical_groups_zero(spark):
    from valentinus_spark.operators.quality import source_token_kl

    # both groups have the same token distribution as the corpus -> KL 0
    df = spark.createDataFrame(
        [("s0", "x y"), ("s1", "x y")], "source string, text string"
    )
    got = {r["source"]: r["kl_bits"] for r in source_token_kl(df).collect()}
    assert got == {"s0": 0.0, "s1": 0.0}


def test_relative_outlier_filter_band(spark):
    from valentinus_spark.operators.quality import relative_outlier_filter

    # 21 rows, values 0..20: percent_rank = i/20; [0.05, 0.95] keeps 1..19
    df = spark.createDataFrame(
        [(i, "en", i) for i in range(21)], "doc_id long, lang string, n_chars long"
    )
    kept = sorted(
        r["doc_id"] for r in relative_outlier_filter(df).collect()
    )
    assert kept == list(range(1, 20))


def test_relative_outlier_filter_per_group_and_singleton(spark):
    from valentinus_spark.operators.quality import relative_outlier_filter

    rows = [(i, "en", i) for i in range(21)] + [(100, "fr", 7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    kept = {r["doc_id"] for r in relative_outlier_filter(df).collect()}
    # fr's singleton has percent_rank 0 and survives lo=0.05? no: 0 < 0.05
    assert 100 not in kept
    kept0 = {
        r["doc_id"] for r in relative_outlier_filter(df, lo=0.0).collect()
    }
    assert 100 in kept0


def test_bigram_logprob_matches_python_oracle(spark):
    import math
    from collections import Counter

    from valentinus_spark.operators.quality import bigram_logprob

    docs = [(0, "a b a b c"), (1, "a b"), (2, "c a b a"), (3, "solo")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    c2: Counter = Counter()
    c1: Counter = Counter()
    for _, t in docs:
        w = t.split()
        for i in range(len(w) - 1):
            c2[(w[i], w[i + 1])] += 1
            c1[w[i]] += 1
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_ce"])
        for r in bigram_logprob(df).collect()
    }
    assert 3 not in got  # 1-token doc has no bigrams
    for i, t in docs:
        w = t.split()
        if len(w) < 2:
            continue
        lps = [
            math.log2(c2[(w[j], w[j + 1])] / c1[w[j]]) for j in range(len(w) - 1)
        ]
        ce = -sum(lps) / len(lps)
        assert got[i][0] == len(w) - 1
        assert got[i][1] == pytest.approx(round(ce, 4), abs=1e-9), f"doc {i}"


def test_bigram_beats_unigram_on_shuffled_text(spark):
    """A bag of common words in a nonsense order must look WORSE to the
    bigram model than to the unigram model, relative to fluent text."""
    from valentinus_spark.operators.quality import bigram_logprob

    fluent = "the cat sat on the mat and the dog sat on the rug"
    shuffled = "mat the on dog sat the and rug cat the on sat the"
    filler = [
        (10 + i, f"the cat sat on the mat again and again number {i}")
        for i in range(5)
    ]
    df = spark.createDataFrame(
        [(0, fluent), (1, shuffled)] + filler, "doc_id long, text string"
    )
    ce = {r["doc_id"]: r["bigram_ce"] for r in bigram_logprob(df).collect()}
    assert ce[1] > ce[0]


def test_linear_quality_score_matches_python(spark):
    import math
    import re

    from valentinus_spark.functions.text import ENGLISH_STOPWORDS
    from valentinus_spark.operators.quality import (
        DEFAULT_SCORE_BIAS,
        DEFAULT_SCORE_WEIGHTS,
        linear_quality_score,
    )

    docs = [
        (0, "the cat sat on the mat and it was good for the dog"),
        (1, "1234 5678 90 42 7 3.14159 0000"),
        (2, "!!! ??? ,,, ;;; :::"),
        (3, ""),
        (4, "   "),
        (5, "supercalifragilistic expialidocious antidisestablishmentarianism"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in linear_quality_score(df, return_features=True).collect()
    }

    def expect(text):
        toks = text.strip().split() if text.strip() else []
        n_chars = len(text)
        n_words = len(toks)
        n_punct = len(re.findall(r"[.,;:!?'\"]", text))
        n_digit = len(re.findall(r"[0-9]", text))
        n_stop = sum(1 for t in toks if t in ENGLISH_STOPWORDS)
        f = {
            "avg_word_len": n_chars / n_words if n_words else 0.0,
            "punct_ratio": n_punct / n_chars if n_chars else 0.0,
            "digit_ratio": n_digit / n_chars if n_chars else 0.0,
            "stopword_ratio": n_stop / n_words if n_words else 0.0,
            "log_words": math.log1p(n_words),
        }
        z = DEFAULT_SCORE_BIAS + sum(
            w * f[k] for k, w in DEFAULT_SCORE_WEIGHTS.items()
        )
        return f, 1.0 / (1.0 + math.exp(-z))

    for doc_id, text in docs:
        f, score = expect(text)
        row = got[doc_id]
        for k, v in f.items():
            assert row[k] == pytest.approx(v, abs=1e-12), (doc_id, k)
        assert row["quality_score"] == pytest.approx(score, abs=1e-12)
        assert row["kept"] == (score >= 0.5)
    # prose-with-stopwords must outrank digit/punct soup
    assert got[0]["quality_score"] > got[1]["quality_score"]
    assert got[0]["quality_score"] > got[2]["quality_score"]


def test_linear_quality_score_custom_weights_and_unknown_raise(spark):
    from valentinus_spark.operators.quality import linear_quality_score

    df = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    row = linear_quality_score(
        df, weights={"log_words": 1.0}, bias=0.0, threshold=0.9
    ).collect()[0]
    import math

    assert row["quality_score"] == pytest.approx(
        1.0 / (1.0 + math.exp(-math.log1p(2))), abs=1e-12
    )
    assert row["kept"] == (row["quality_score"] >= 0.9)
    with pytest.raises(ValueError, match="unknown feature"):
        linear_quality_score(df, weights={"nope": 1.0})


def test_roc_auc_hand_values_and_ties(spark):
    """Perfect separation → 1.0; reversed → 0.0; all-tied scores → 0.5
    exactly (the tie correction, not an approximation)."""
    from valentinus_spark.operators.quality import roc_auc

    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False), (0.1, False)],
        "s double, y boolean",
    )
    assert roc_auc(perfect, "s", "y").collect()[0]["auc"] == 1.0
    reverse = spark.createDataFrame(
        [(0.1, True), (0.2, True), (0.8, False), (0.9, False)],
        "s double, y boolean",
    )
    assert roc_auc(reverse, "s", "y").collect()[0]["auc"] == 0.0
    tied = spark.createDataFrame(
        [(0.5, True), (0.5, True), (0.5, False), (0.5, False)],
        "s double, y boolean",
    )
    assert roc_auc(tied, "s", "y").collect()[0]["auc"] == 0.5


def test_roc_auc_matches_pair_counting(spark):
    """AUC equals brute-force pair counting (wins + half-ties) on a
    random-ish planted set with collisions."""
    from valentinus_spark.operators.quality import roc_auc

    rows = [((i * 37) % 10 / 10.0 + (0.15 if i % 3 == 0 else 0.0), i % 3 == 0)
            for i in range(60)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    got = roc_auc(df, "s", "y").collect()[0]
    pos = [round(s, 4) for s, y in rows if y]
    neg = [round(s, 4) for s, y in rows if not y]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    assert got["auc"] == round(wins / (len(pos) * len(neg)), 6)
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)


def test_trigram_logprob_matches_python(spark):
    import math
    import re
    from collections import Counter

    from valentinus_spark.operators.quality import trigram_logprob

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat again today"),
        (3, "mat the on sat cat the"),   # scrambled: same unigrams as 1
        (4, "hi there"),                 # < 3 tokens -> excluded
    ]

    toks = {
        d: re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for d, t in corpus
        if len(t.split()) >= 3
    }
    tgc, ctxc, bgc, w2c, unic = Counter(), Counter(), Counter(), Counter(), Counter()
    for v in toks.values():
        for i in range(len(v) - 2):
            tgc[(v[i], v[i + 1], v[i + 2])] += 1
            ctxc[(v[i], v[i + 1])] += 1
        for i in range(len(v) - 1):
            bgc[(v[i], v[i + 1])] += 1
            w2c[v[i]] += 1
        unic.update(v)
    n = sum(unic.values())

    def score(v):
        lps = []
        for i in range(len(v) - 2):
            w1, w2, w3 = v[i], v[i + 1], v[i + 2]
            p = (
                0.6 * tgc[(w1, w2, w3)] / ctxc[(w1, w2)]
                + 0.3 * bgc[(w2, w3)] / w2c[w2]
                + 0.1 * unic[w3] / n
            )
            lps.append(math.log2(p))
        return len(lps), round(-sum(lps) / len(lps), 4)

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.n_trigrams, r.trigram_ce)
           for r in trigram_logprob(df).collect()}
    want = {d: score(v) for d, v in toks.items()}
    assert got == want
    # the fluency signal: scrambled doc scores higher CE than fluent one
    assert got[3][1] > got[1][1]


def test_trigram_logprob_lambda_validation(spark):
    import pytest

    from valentinus_spark.operators.quality import trigram_logprob

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        trigram_logprob(df, lambdas=(0.5, 0.5, 0.5))
    with pytest.raises(ValueError):
        trigram_logprob(df, lambdas=(1.0, 0.0, 0.0))


def test_compression_ratio_separates_repetitive_from_prose(spark):
    """Repetitive text compresses far below varied text; ratios match a
    direct python zlib replay; empty text gets NULL."""
    import zlib

    from valentinus_spark.operators import compression_ratio

    prose = "the quick brown fox jumps over a lazy dog near riverbanks 123"
    spam = "buy now " * 50
    df = spark.createDataFrame(
        [(1, prose * 5), (2, spam), (3, "")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert out[2].compression_ratio < 0.2 < out[1].compression_ratio
    assert out[3].compression_ratio is None and out[3].n_bytes == 0
    for i, t in ((1, prose * 5), (2, spam)):
        raw = t.encode("utf-8")
        want = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert out[i].compression_ratio == want
        assert out[i].n_bytes == len(raw)


def test_compression_ratio_respects_id_col_name_and_type(spark):
    """ADVICE r6: the output id field must carry the caller's id column
    NAME and TYPE (the schema was hardcoded 'doc_id long', so a string
    or renamed id column hit an Arrow cast error)."""
    from valentinus_spark.operators import compression_ratio

    df = spark.createDataFrame(
        [("u-1", "hello world " * 10), ("u-2", "abc")], ["url", "text"]
    )
    out = compression_ratio(df, id_col="url")
    assert out.schema["url"].dataType.typeName() == "string"
    rows = {r.url: r for r in out.collect()}
    assert set(rows) == {"u-1", "u-2"}
    assert rows["u-1"].compression_ratio < rows["u-2"].compression_ratio


def test_good_turing_vocab_exact_spectrum(spark):
    """Hand-computable spectrum: 'a a a b b c d' -> N=7, V=4, N1=2
    (c, d), N2=1 (b), P0 = 2/7, chao1 = 4 + 2*1/(2*2) = 4.5."""
    from valentinus_spark.operators import good_turing_vocab

    df = spark.createDataFrame([("s1", "a a a b b c d")], ["source", "text"])
    r = good_turing_vocab(df, "source").collect()[0]
    assert (r.n_tokens, r.vocab, r.n1, r.n2) == (7, 4, 2, 1)
    assert r.p_unseen == pytest.approx(2 / 7, abs=1e-6)
    assert r.chao1 == pytest.approx(4 + 2 * 1 / (2 * 2), abs=1e-6)


def test_good_turing_no_singletons_means_no_unseen_mass(spark):
    """Every token repeated: N1 = 0 -> P0 = 0 and chao1 = V (the
    vocabulary looks exhausted)."""
    from valentinus_spark.operators import good_turing_vocab

    df = spark.createDataFrame([("s", "x x y y z z")], ["source", "text"])
    r = good_turing_vocab(df, "source").collect()[0]
    assert r.n1 == 0 and r.p_unseen == 0.0 and r.chao1 == float(r.vocab)


def test_js_divergence_bounds_and_symmetry_inputs(spark):
    """Identical distributions -> 0; disjoint vocabularies -> 1 bit
    (the JS maximum); a mixed pair lands strictly between."""
    from valentinus_spark.operators import js_divergence

    df = spark.createDataFrame(
        [
            ("A", "x y z x y z"),
            ("B", "x y z x y z"),
            ("C", "p q r p q r"),
            ("D", "x y p q x y"),
        ],
        ["source", "text"],
    )
    out = {(r.group_a, r.group_b): r.js_bits for r in js_divergence(df, "source", top_v=10).collect()}
    assert out[("A", "B")] == pytest.approx(0.0, abs=1e-6)
    assert out[("A", "C")] == pytest.approx(1.0, abs=1e-6)
    assert 0.0 < out[("A", "D")] < 1.0
    # pair matrix covers all 6 unordered pairs
    assert len(out) == 6


def test_source_tv_distance_identical_and_disjoint(spark):
    """Two groups with identical token distributions -> TV = 0 for
    both; fully disjoint vocabularies -> TV = 1 - group share."""
    from valentinus_spark.operators import source_tv_distance

    same = [("a", "x y z"), ("b", "x y z")]
    out = {
        r.source: r.tv_distance
        for r in source_tv_distance(
            spark.createDataFrame(same, ["source", "text"])
        ).collect()
    }
    assert out["a"] == pytest.approx(0.0, abs=1e-9)
    assert out["b"] == pytest.approx(0.0, abs=1e-9)

    # a = {x,y}, b = {p,q}: p_a puts 1/2 on each of x,y; corpus puts 1/4
    # TV(a, corpus) = 1/2*(|1/2-1/4|*2 + 1/4*2) = 1/2
    disj = [("a", "x y"), ("b", "p q")]
    out2 = {
        r.source: r.tv_distance
        for r in source_tv_distance(
            spark.createDataFrame(disj, ["source", "text"])
        ).collect()
    }
    assert out2["a"] == pytest.approx(0.5, abs=1e-9)
    assert out2["b"] == pytest.approx(0.5, abs=1e-9)


def test_source_tv_distance_python_replica(spark):
    """Exact python replay on a small mixed corpus."""
    from collections import Counter

    from valentinus_spark.operators import source_tv_distance

    rows = [("a", "x x y z"), ("a", "x w"), ("b", "y y z z q")]
    cnt_g = {"a": Counter("x x y z x w".split()), "b": Counter("y y z z q".split())}
    corpus = Counter("x x y z x w y y z z q".split())
    ct = sum(corpus.values())
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r.source: r for r in source_tv_distance(df).collect()}
    for g, cg in cnt_g.items():
        gt = sum(cg.values())
        tv = 0.5 * sum(
            abs(cg.get(w, 0) / gt - c / ct) for w, c in corpus.items()
        )
        assert out[g].n_tokens == gt
        assert out[g].tv_distance == pytest.approx(round(tv, 6), abs=1e-6)


def test_fog_smog_hand_counts(spark):
    """'the cat sat. elephantine considerations notwithstanding!' ->
    sentences=2; hand syllable groups; python replay of both grades."""
    import math

    from valentinus_spark.operators import fog_smog_readability

    text = "the cat sat. elephantine considerations notwithstanding!"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = fog_smog_readability(df).collect()[0]
    # tokens: the(1) cat(1) sat.(1) elephantine(4: e,e,a,i+e groups)
    # considerations(5) notwithstanding!(4) -> complex = 3
    assert (r.n_words, r.n_sentences, r.n_complex) == (6, 2, 3)
    fog = 0.4 * (6 / 2 + 100 * 3 / 6)
    smog = 1.0430 * math.sqrt(3 * 30 / 2) + 3.1291
    assert r.fog == pytest.approx(fog, abs=1e-4)
    assert r.smog == pytest.approx(smog, abs=1e-4)


def test_fog_smog_empty_doc_dropped(spark):
    from valentinus_spark.operators import fog_smog_readability

    df = spark.createDataFrame([(1, "   "), (2, "a b.")], ["doc_id", "text"])
    rows = fog_smog_readability(df).collect()
    assert [r.doc_id for r in rows] == [2]
    assert rows[0].n_complex == 0


def test_fightin_words_separates_planted_vocab(spark):
    """Group a over-uses 'alpha', group b over-uses 'beta' on a shared
    background: each group's top distinctive term is its planted one,
    with positive z."""
    from valentinus_spark.operators import fightin_words

    shared = "the quick brown fox jumps over the lazy dog"
    rows = (
        [("a", f"{shared} alpha alpha alpha")] * 10
        + [("b", f"{shared} beta beta beta")] * 10
    )
    df = spark.createDataFrame(rows, ["source", "text"])
    out = fightin_words(df, "source", "text", top_k=1).collect()
    top = {r.source: (r.term, r.z_score) for r in out}
    assert top["a"][0] == "alpha" and top["a"][1] > 2
    assert top["b"][0] == "beta" and top["b"][1] > 2


def test_perplexity_buckets_even_split_and_head_semantics(spark):
    """Per-lang ntile(3): buckets split each language's docs evenly
    (earlier buckets at most one larger); a highly repetitive doc (low
    trigram entropy) must land in the HEAD bucket of its language."""
    from valentinus_spark.operators.quality import perplexity_buckets

    rows = []
    # 9 'en' docs: one ultra-repetitive (low CE), others varied
    rows.append((0, "the cat sat " * 30, "en"))
    texts = [
        "quick brown fox jumps over the lazy dog near a quiet river bank",
        "many words combine into sentences that rarely repeat their order",
        "data pipelines shuffle join aggregate and write results to disk",
        "seven distinct phrases about completely unrelated subjects here",
        "economic indicators rose while maritime shipping costs declined",
        "the committee approved a proposal regarding municipal drainage",
        "astronomers observed a transient signal from a distant galaxy",
        "recipes call for flour butter sugar eggs and a pinch of salt",
    ]
    for i, t in enumerate(texts):
        rows.append((1 + i, t + " " + t[::-1], "en"))
    # 5 'de' docs
    for i in range(5):
        rows.append((100 + i, f"wort folge nummer {i} und noch mehr text dazu kommt jetzt", "de"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(df).collect()
    by = {(r["lang"], r["bucket"]): r for r in out}
    en_sizes = [by[("en", b)]["n_docs"] for b in (1, 2, 3)]
    assert sum(en_sizes) == 9 and max(en_sizes) - min(en_sizes) <= 1
    assert by[("en", 1)]["bucket_label"] == "head"
    assert by[("en", 3)]["bucket_label"] == "tail"
    # the head bucket's mean entropy is the language's lowest
    assert by[("en", 1)]["mean_ce"] < by[("en", 3)]["mean_ce"]
    # min/max are coherent per cell
    for r in out:
        assert r["min_ce"] <= r["mean_ce"] <= r["max_ce"]


def test_ensemble_quality_vote_rules_and_majority(spark):
    """Each planted document fails exactly the intended rule; keep
    requires >= 4 of 5 votes."""
    from valentinus_spark.operators.quality import ensemble_quality_vote

    good = ("this is a perfectly reasonable document with many common "
            "words that the filters should accept without any trouble "
            "because it looks like ordinary english prose")
    rows = [
        (0, good),                                  # passes everything
        (1, "too short"),                           # fails len (also stopword?) keep robust below
        (2, good + " " + "9876543210 " * 40),       # digit-heavy -> fails digit
        (3, ("zq " * 80).strip()),                  # 2-char tokens -> fails word_len + stopword -> drop
        (4, good.replace("the", "xxx")),            # still mostly fine
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ensemble_quality_vote(df).collect()}
    assert got[0]["votes"] == 5 and got[0]["keep"]
    assert not got[1]["ok_len"]
    assert not got[2]["ok_digit"]
    assert not got[3]["ok_word_len"] and not got[3]["ok_stopword"]
    assert not got[3]["keep"]  # two failures -> 3 votes < 4
    for d in got.values():
        assert d["votes"] == sum(
            int(d[c]) for c in
            ("ok_len", "ok_word_len", "ok_stopword", "ok_alpha", "ok_digit")
        )


def test_ensemble_quality_vote_empty_text(spark):
    """Empty / whitespace text: every ratio rule degrades to its
    documented zero (no division error under ANSI), keep = False."""
    from valentinus_spark.operators.quality import ensemble_quality_vote

    df = spark.createDataFrame([(0, ""), (1, "   ")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ensemble_quality_vote(df).collect()}
    for r in got.values():
        assert not r["keep"]
        assert not r["ok_len"] and not r["ok_stopword"] and not r["ok_alpha"]
