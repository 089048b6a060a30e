"""BM25 keyword-search tests vs a pure-python oracle."""

import math

from valentinus_spark.operators.text_search import bm25_topk


def py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    tf = {(i, t): w.count(t) for i, w in toks.items() for t in terms if t in w}
    df = {t: sum(1 for i in toks if (i, t) in tf) for t in terms}
    scores = {}
    for (i, t), f in tf.items():
        idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
        scores[i] = scores.get(i, 0.0) + idf * (f * (k1 + 1)) / (
            f + k1 * (1 - b + b * len(toks[i]) / avgdl)
        )
    return scores


def test_bm25_matches_python_oracle(spark):
    corpus = {
        0: "spark streams data through partitions and data shuffles",
        1: "a query planner optimizes the query tree",
        2: "data data data everywhere in the lake",
        3: "completely unrelated text about gardening roses",
        4: "stream processing with stateful stream operators",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ["data", "query", "stream"], k=10).collect()
    }
    expect = py_bm25(corpus, ["data", "query", "stream"])
    assert set(got) == set(expect)  # doc 3 excluded (no terms)
    for i, s in expect.items():
        assert abs(got[i] - s) < 1e-9


def test_bm25_topk_cut(spark):
    rows = [(i, "data " * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["data"], k=3).collect()
    assert len(out) == 3
    assert [r["doc_id"] for r in out] == sorted(
        (r["doc_id"] for r in out),
        key=lambda i: -dict((x["doc_id"], x["score"]) for x in out)[i],
    )


def test_tfidf_keywords_against_python(spark):
    import math
    from collections import Counter

    from valentinus_spark.operators.text_search import tfidf_keywords

    docs = [
        (0, "apple banana apple cherry"),
        (1, "banana banana durian"),
        (2, "cherry durian elderberry elderberry elderberry"),
        (3, ""),  # dropped: empty docs don't participate
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
        for r in tfidf_keywords(df, k=2).collect()
    }

    texts = {i: t.split() for i, t in docs if t}
    n = len(texts)
    dfreq = Counter(t for toks in texts.values() for t in set(toks))
    for i, toks in texts.items():
        tf = Counter(toks)
        scores = {
            t: round(c / len(toks) * math.log((n + 1) / (dfreq[t] + 1)), 6)
            for t, c in tf.items()
        }
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for rank, (term, s) in enumerate(want, 1):
            assert got[(i, rank)] == (term, s), f"doc {i} rank {rank}"
    assert not any(d == 3 for d, _ in got)  # empty doc absent


def test_tfidf_rank_is_dense_per_doc(spark):
    from valentinus_spark.operators.text_search import tfidf_keywords

    df = spark.createDataFrame(
        [(i, "w%d common" % i) for i in range(20)], "doc_id long, text string"
    )
    out = tfidf_keywords(df, k=5).groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in out)  # only 2 distinct terms per doc


def test_phrase_search_counts_and_positions(spark):
    from valentinus_spark.operators.text_search import (
        build_inverted_index,
        phrase_search,
    )

    rows = [
        (1, "the quick brown fox jumps over the quick brown dog"),
        (2, "quick brown"),
        (3, "brown quick"),          # reversed — no match
        (4, "quick fox brown"),      # not contiguous — no match
        (5, "QUICK   Brown things"), # case/whitespace normalize → match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_matches"] for r in phrase_search(df, "quick brown").collect()}
    assert out == {1: 2, 2: 1, 5: 1}

    # precomputed index path gives identical results
    idx = build_inverted_index(df)
    out2 = {r["doc_id"]: r["n_matches"] for r in phrase_search(df, "quick brown", index=idx).collect()}
    assert out2 == out


def test_phrase_search_three_words_and_empty(spark):
    import pytest

    from valentinus_spark.operators.text_search import phrase_search

    df = spark.createDataFrame(
        [(1, "a b c a b c a b"), (2, "c b a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_matches"] for r in phrase_search(df, "a b c").collect()}
    assert out == {1: 2}
    with pytest.raises(ValueError, match="empty"):
        phrase_search(df, "   ")


def test_inverted_index_positions_one_based(spark):
    from valentinus_spark.operators.text_search import build_inverted_index

    df = spark.createDataFrame([(7, "alpha beta alpha")], "doc_id long, text string")
    rows = {(r["term"], r["pos"]) for r in build_inverted_index(df).collect()}
    assert rows == {("alpha", 1), ("beta", 2), ("alpha", 3)}


def test_taxonomy_tags_counts_and_multi_topic(spark):
    """'join' hits execution only; 'window' hits streaming; a keyword in
    two topics tags both; docs with zero hits emit no rows."""
    from valentinus_spark.operators.text_search import taxonomy_tags

    docs = spark.createDataFrame(
        [(1, "join the window join"), (2, "nothing here"), (3, "Apple APPLE pie")],
        "doc_id long, text string",
    )
    lex = {
        "execution": ["join"],
        "streaming": ["window"],
        "fruit": ["apple", "pie"],
        "tech": ["apple"],
    }
    got = {
        (r["doc_id"], r["topic"]): (r["n_hits"], r["n_keywords"])
        for r in taxonomy_tags(docs, lex).collect()
    }
    assert got[(1, "execution")] == (2, 1)
    assert got[(1, "streaming")] == (1, 1)
    assert got[(3, "fruit")] == (3, 2)  # lowercased matching
    assert got[(3, "tech")] == (2, 1)
    assert not any(d == 2 for d, _ in got)
