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
