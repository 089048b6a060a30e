"""Unicode edge-case screen: astral-plane emoji (ZWJ sequences),
decomposed combining marks, RTL text with diacritics, zero-width
characters, BOM, NUL bytes, and mixed-script lines through the whole
text family. Spark's regex/char semantics (UTF-16 code units, Java
regex classes) differ from Python's (code points, re module) in
exactly these corners — the screen pins the class: every operator
must survive, and the cheap invariants (token_count == |word_tokens|,
normalize idempotence, simhash self-distance 0) must hold on ALL of
them, not just ASCII."""

import pytest
from pyspark.sql import functions as F

import valentinus_spark.operators as O
from valentinus_spark.functions.text import (
    char_ngrams,
    hamming64,
    lang_id,
    normalize_text,
    pack_simhash,
    rolling_fingerprint,
    simhash_counts,
    text_quality,
    token_count,
    word_tokens,
)
from valentinus_spark.operators import dedup, profile, quality, text_search

NASTY = [
    "family: \U0001f469‍\U0001f469‍\U0001f467‍\U0001f466 emoji",
    "math \U0001d518\U0001d52b\U0001d526\U0001d520 letters",
    "café composed vs café decomposed",
    "العَرَبِيَّة rtl with harakat",
    "zero​width‌joined‍words",
    "﻿bom prefixed line",
    "nul\x00byte and tab\tand newline\nline",
    "中文混合 english ümläut",
    "\U0001f600\U0001f601\U0001f602",  # astral-only, no ascii at all
    "a",  # single char
    "  ",  # whitespace only
]


@pytest.fixture(scope="module")
def udocs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(NASTY)], "doc_id long, text string"
    )


def test_text_functions_survive_and_invariants_hold(spark, udocs):
    import re

    # python replica of _TOKEN_REGEX; re.ASCII pins \s to Java's
    # ascii-only default so both engines class U+00A0/ZWJ as symbols
    tok_re = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]", re.ASCII)
    out = (
        udocs.withColumn("toks", word_tokens("text"))
        .withColumn("norm", normalize_text("text"))
        .withColumn("norm2", normalize_text(F.col("norm")))
        .withColumn("tc", token_count("text"))
        .withColumn("ngrams", char_ngrams("text", 3))
        .withColumn("quality", text_quality("text"))
        .withColumn("lang", lang_id("text"))
        .withColumn("fp", rolling_fingerprint("text"))
        .withColumn("sh_counts", simhash_counts("toks"))
        .withColumn("sh", pack_simhash("sh_counts"))
        .withColumn("self_dist", hamming64(F.col("sh"), F.col("sh")))
        .collect()
    )
    for r in out:
        # token_count == python replica of the BPE-ish regex, on every
        # script (letter-runs are ascii-only BY CONVENTION; astral
        # symbols count one each in both engines)
        assert r.tc == len(tok_re.findall(r.text))
        assert r.norm2 == r.norm  # normalize_text is idempotent
        assert r.self_dist == 0  # simhash self-distance


SCREEN = {
    "exact_dedup": lambda d: dedup.exact_dedup(d, text_col="text"),
    "ngram_jaccard_pairs": lambda d: dedup.ngram_jaccard_pairs(d, max_df=None),
    "simhash_pairs": lambda d: dedup.simhash_pairs(d),
    "duplicated_span_stats": lambda d: dedup.duplicated_span_stats(d),
    "remove_duplicated_spans": lambda d: dedup.remove_duplicated_spans(d),
    "ngram_novelty": lambda d: dedup.ngram_novelty(d),
    "bm25": lambda d: text_search.bm25_topk(d, ["emoji", "中文"]),
    "tfidf_keywords": lambda d: text_search.tfidf_keywords(d),
    "rake_keywords": lambda d: text_search.rake_keywords(d),
    "texttiling": lambda d: text_search.texttiling_boundaries(d),
    "zipf_profile": lambda d: profile.zipf_profile(d),
    "lexical_diversity": lambda d: O.lexical_diversity(d, "doc_id"),
    "flesch": lambda d: O.flesch_readability(d),
    "term_burstiness": lambda d: O.term_burstiness(d, min_df=1),
    "heaps_law": lambda d: O.heaps_law(d, "doc_id"),
}


@pytest.mark.parametrize("name", sorted(SCREEN))
def test_operator_survives_unicode(spark, udocs, name):
    SCREEN[name](udocs).collect()


# quality-family screen over the same nasty corpus (with a source
# column for the grouped scores): LM log-probs, entropy, compression,
# and vocabulary estimators all tokenize/fold the same corners
QUALITY_SCREEN = {
    "repetition_stats": lambda d: quality.repetition_stats(d),
    "quality_filter": lambda d: quality.quality_filter(d),
    "unigram_logprob": lambda d: quality.unigram_logprob(d),
    "bigram_logprob": lambda d: quality.bigram_logprob(d),
    "trigram_logprob": lambda d: quality.trigram_logprob(d),
    "char_entropy": lambda d: quality.char_entropy(d),
    "compression_ratio": lambda d: quality.compression_ratio(d),
    "source_token_kl": lambda d: quality.source_token_kl(d),
    "good_turing_vocab": lambda d: quality.good_turing_vocab(d, "source"),
    "js_divergence": lambda d: quality.js_divergence(d, "source"),
    "fightin_words": lambda d: quality.fightin_words(d),
    "source_tv_distance": lambda d: quality.source_tv_distance(d, "source"),
}


@pytest.mark.parametrize("name", sorted(QUALITY_SCREEN))
def test_quality_ops_survive_unicode(spark, udocs, name):
    d = udocs.withColumn("source", (F.col("doc_id") % 2).cast("string"))
    QUALITY_SCREEN[name](d).collect()


def test_bpe_roundtrip_on_unicode_corpus(spark, udocs):
    # BPE is ASCII-letters-by-convention (the [a-zA-Z]+ word regex,
    # documented in tokenizer.py) — on a unicode corpus it must still
    # train, encode, and decode back to exactly the ascii-letter
    # residue of each doc, never crash or mangle
    import re

    from valentinus_spark.operators.tokenizer import (
        bpe_decode,
        bpe_encode,
        learn_bpe,
    )

    merges = learn_bpe(udocs, 8)
    dec = bpe_decode(bpe_encode(udocs, merges))
    got = {r.doc_id: r.decoded for r in dec.select("doc_id", "decoded").collect()}
    for i, t in enumerate(NASTY):
        expected = "".join(re.findall("[a-zA-Z]+", t.lower()))
        assert got.get(i, "") == expected
