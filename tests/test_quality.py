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
