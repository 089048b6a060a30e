"""BPE tokenizer training (operators/tokenizer.py)."""

import re
from collections import Counter

from valentinus_spark.operators.tokenizer import (
    bpe_pair_counts,
    learn_bpe,
    word_frequencies,
)


def _py_vocab(texts):
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-zA-Z]+", t.lower()))
    return words


def _py_pair_counts(texts):
    counts = Counter()
    for word, freq in _py_vocab(texts).items():
        for a, b in zip(word, word[1:]):
            counts[(a, b)] += freq
    return counts


def _py_learn_bpe(texts, n_merges):
    vocab = {tuple(w): f for w, f in _py_vocab(texts).items()}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for symbols, freq in vocab.items():
            for pair in zip(symbols, symbols[1:]):
                counts[pair] += freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for symbols, freq in vocab.items():
            out, i = [], 0
            while i < len(symbols):
                if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the thin thief thought thoroughly",
    "low lower lowest newer newest widest wide",
    "aaa aaa aab abb",
    "",
    "12345 !!! only-symbols 999",
]


def test_word_frequencies_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = {r["word"]: r["freq"] for r in word_frequencies(df).collect()}
    assert got == dict(_py_vocab(TEXTS))


def test_bpe_pair_counts_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in bpe_pair_counts(df, k=None).collect()
    }
    assert got == dict(_py_pair_counts(TEXTS))


def test_bpe_pair_counts_topk_deterministic_order(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    rows = bpe_pair_counts(df, k=5).collect()
    expected = sorted(
        _py_pair_counts(TEXTS).items(), key=lambda kv: (-kv[1], kv[0])
    )[:5]
    assert [((r["left_sym"], r["right_sym"]), r["pair_count"]) for r in rows] == expected


def test_learn_bpe_matches_reference_loop(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = learn_bpe(df, n_merges=8)
    assert got == _py_learn_bpe(TEXTS, 8)
    # first merge must be the argmax pair of the distributed counter
    top = bpe_pair_counts(df, k=1).collect()[0]
    assert got[0] == (top["left_sym"], top["right_sym"])


def test_learn_bpe_exhausts_gracefully(spark):
    df = spark.createDataFrame([(0, "ab ab"), (1, "ab")], "doc_id long, text string")
    merges = learn_bpe(df, n_merges=10)
    # 'ab' collapses after one merge; single-symbol words have no pairs left
    assert merges == [("a", "b")]


def test_bpe_encode_matches_training_vocab_state(spark):
    """Encoding the training corpus with the learned merges must produce
    exactly the symbol sequences learn_bpe's vocab holds after its last
    merge — the sequential-replay ≡ greedy-rank-encode equivalence."""
    from valentinus_spark.operators.tokenizer import bpe_encode, learn_bpe

    rows = [
        (1, "lower lower lowest low low low"),
        (2, "newer newest new new lower"),
        (3, "widest wider wide low new"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe(df, n_merges=8)
    assert len(merges) == 8

    # python reference: replay the merges sequentially per word
    def replay(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    for doc_id, text in rows:
        expect = []
        for w in text.split():
            expect.extend(replay(w))
        assert got[doc_id] == expect, doc_id


def test_bpe_encode_roundtrip_and_empty(spark):
    from valentinus_spark.operators.tokenizer import bpe_encode, learn_bpe

    df = spark.createDataFrame(
        [(1, "abab abab cdcd"), (2, ""), (3, "xyz")], "doc_id long, text string"
    )
    merges = learn_bpe(df, n_merges=3)
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    # concatenating a word's subwords reconstructs it (BPE is lossless)
    assert "".join(t for t in out[1]) == "ababababcdcd"
    assert out[2] == []
    assert "".join(out[3]) == "xyz"
    # the planted repetition actually merged: fewer tokens than chars
    assert len(out[1]) < len("ababababcdcd")


def test_unigram_encode_matches_python_viterbi(spark):
    """unigram_encode vs an independent brute-force enumeration of ALL
    segmentations: on an ambiguous vocab the Viterbi pick must be the
    max-likelihood segmentation with the documented tie-breaks (fewer
    pieces, then lexicographic), and unknown characters fall back to
    unk pieces so every word segments."""
    import itertools
    import math

    from valentinus_spark.operators.tokenizer import unigram_encode

    vocab = {
        "un": -2.0, "related": -3.0, "unrelated": -4.5,
        "re": -1.5, "lated": -3.1, "l": -4.0, "ated": -3.5,
        "a": -2.5, "b": -2.5, "ab": -5.0,  # tie: 'a'+'b' == 'ab' -> fewer pieces wins
        "x": -3.0,
    }
    UNK = -100.0

    def brute(w):
        best = None
        n = len(w)
        for cuts in itertools.product([0, 1], repeat=n - 1) if n > 1 else [()]:
            pieces, start = [], 0
            for i, c in enumerate(cuts, 1):
                if c:
                    pieces.append(w[start:i]); start = i
            pieces.append(w[start:])
            score = 0.0
            ok = True
            for p in pieces:
                if p in vocab:
                    score += vocab[p]
                elif len(p) == 1:
                    score += UNK
                else:
                    ok = False; break
            if not ok:
                continue
            key = (score, -len(pieces), [p for p in pieces])
            if best is None or (key[0], key[1]) > (best[0], best[1]) or (
                (key[0], key[1]) == (best[0], best[1]) and key[2] < best[2]
            ):
                best = key
        return best[2]

    words = ["unrelated", "ab", "xx", "qq", "relatedx"]
    df = spark.createDataFrame([(w,) for w in words], "text string")
    got = {
        r["text"]: r["unigram_tokens"]
        for r in unigram_encode(df, vocab, unk_logprob=UNK).collect()
    }
    for w in words:
        assert got[w] == brute(w), (w, got[w], brute(w))
    # sanity on the planted cases
    assert got["unrelated"] == ["unrelated"]  # -4.5 beats un+related -5.0
    assert got["ab"] == ["ab"]  # tie on score: fewer pieces wins
    assert got["qq"] == ["q", "q"]  # pure-unk fallback


def test_vocab_coverage_hand_counts(spark):
    """Two groups, vocab_size=2 → vocab = {a, b} (counts 4 and 3). Group
    g1 is fully covered; g2's 'zz zz yy' has 3 OOV occurrences of 2 OOV
    types against 1 covered 'a'."""
    from valentinus_spark.operators.tokenizer import vocab_coverage

    docs = spark.createDataFrame(
        [
            ("g1", "a a b b"),
            ("g1", "a b"),
            ("g2", "a zz zz yy"),
        ],
        "lang string, text string",
    )
    got = {r["lang"]: r for r in vocab_coverage(docs, vocab_size=2).collect()}
    g1, g2 = got["g1"], got["g2"]
    assert g1["n_tokens"] == 6 and g1["covered_tokens"] == 6
    assert g1["oov_types"] == 0 and g1["oov_rate"] == 0.0
    assert g2["n_tokens"] == 4 and g2["covered_tokens"] == 1
    assert g2["n_types"] == 3 and g2["oov_types"] == 2
    assert g2["oov_rate"] == 0.75


def test_bpe_decode_roundtrip_identity(spark):
    from valentinus_spark.operators.tokenizer import bpe_decode, bpe_encode

    docs = spark.createDataFrame(
        [(1, "Hello, World! lower UPPER"), (2, "abab abab cd")],
        ["doc_id", "text"],
    )
    merges = [("a", "b"), ("ab", "ab"), ("l", "o")]
    enc = bpe_encode(docs, merges)
    dec = bpe_decode(enc)
    import re
    from pyspark.sql import functions as F

    rows = dec.select("doc_id", "decoded").collect()
    src = {1: "Hello, World! lower UPPER", 2: "abab abab cd"}
    for r in rows:
        expected = "".join(re.findall("[a-zA-Z]+", src[r.doc_id].lower()))
        assert r.decoded == expected


def test_bpe_decode_custom_cols(spark):
    from valentinus_spark.operators.tokenizer import bpe_decode

    df = spark.createDataFrame([(["ab", "cd", "e"],)], ["toks"])
    out = bpe_decode(df, "toks", "joined").collect()[0]
    assert out.joined == "abcde"


def test_tokenizer_fertility_hand_computed(spark):
    """Fertility on a hand-traceable corpus: with merges [(a,b),(ab,c)],
    'abc' encodes to 1 token (fertility 1.0 for a 1-word doc), 'abcabc'
    is ONE regex word -> 'abc'+'abc' = 2 tokens; 'xy z' is 2 words and
    4 single-letter tokens -> fertility 2.0."""
    from valentinus_spark.operators.tokenizer import tokenizer_fertility

    merges = [("a", "b"), ("ab", "c")]
    rows = [
        (0, "abc", "s1"),
        (1, "abcabc abc", "s1"),   # words: abcabc(2 toks) + abc(1 tok)
        (2, "xy z", "s2"),        # x,y + z = 3 tokens over 2 words
        (3, "", "s2"),            # no words, no tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["source"]: r for r in tokenizer_fertility(df, merges).collect()}
    # s1: words = 1 + 2 = 3; tokens = 1 + (2 + 1) = 4
    assert got["s1"]["n_docs"] == 2
    assert got["s1"]["n_words"] == 3 and got["s1"]["n_tokens"] == 4
    assert got["s1"]["fertility"] == round(4 / 3, 6)
    # s2: words = 2 + 0; tokens = 3 + 0
    assert got["s2"]["n_docs"] == 2
    assert got["s2"]["n_words"] == 2 and got["s2"]["n_tokens"] == 3
    assert got["s2"]["fertility"] == 1.5


def test_tokenizer_fertility_all_empty_group(spark):
    """A group with zero words reports NULL fertility, not a crash."""
    from valentinus_spark.operators.tokenizer import tokenizer_fertility

    df = spark.createDataFrame(
        [(0, "123 456 !!!", "nums")], ["doc_id", "text", "source"]
    )
    r = tokenizer_fertility(df, [("a", "b")]).first()
    assert r["n_words"] == 0 and r["n_tokens"] == 0
    assert r["fertility"] is None
