"""BM25 keyword-search tests vs a pure-python oracle."""

import pytest
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


def _py_winnow(text, k, w):
    """Independent Python winnowing oracle (rightmost-min, xxhash64-free:
    uses the portable 60-bit sha hash to match hash_fn='sha256')."""
    import hashlib
    import re

    s = re.sub(r"\s+", " ", text.lower()).strip()
    if len(s) < k:
        return set()
    grams = [
        int(hashlib.sha256(s[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(s) - k + 1)
    ]
    wlen = min(w, len(grams))
    out = set()
    for j in range(len(grams) - wlen + 1):
        sl = grams[j : j + wlen]
        mn = min(sl)
        # rightmost minimum
        rpos = wlen - 1 - sl[::-1].index(mn)
        out.add((j + rpos + 1, mn))  # 1-based gram position
    return out


def test_winnow_fingerprints_match_python_oracle(spark):
    from valentinus_spark.operators.text_search import winnow_fingerprints

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack   my box with five dozen LIQUOR jugs"),
        (3, "short"),        # < k: no fingerprints
        (4, "tiny doc ok"),  # >= k but < k+w-1: single-window fallback
        (5, "aaaaaaaaaaaaaaaaaaaa"),  # degenerate equal-hash runs
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, k=8, window=4, hash_fn="sha256").collect()
    }
    want = set()
    for did, text in docs:
        for pos, fp in _py_winnow(text, 8, 4):
            want.add((did, pos, fp))
    assert got == want


def test_winnow_guarantee_shared_substring_detected(spark):
    # winnowing guarantee: a shared substring of length >= w + k - 1
    # produces >= 1 shared fingerprint value
    from valentinus_spark.operators.text_search import winnow_overlap_pairs

    shared = "this exact sentence appears verbatim in both documents"
    docs = [
        (1, "intro text alpha. " + shared + " trailing words one"),
        (2, "completely different opening. " + shared + " and another tail"),
        (3, "nothing in common with the others at all, truly disjoint words"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = winnow_overlap_pairs(
        df, k=8, window=4, min_shared=1, max_df=10, hash_fn="sha256"
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)
    row = [r for r in pairs if (r.id_a, r.id_b) == (1, 2)][0]
    assert row.n_shared >= 1 and 0 < row.overlap <= 1


def test_winnow_max_df_drops_boilerplate(spark):
    from valentinus_spark.operators.text_search import winnow_overlap_pairs

    # the same boilerplate in EVERY doc; max_df below corpus size drops
    # its fingerprints before the join. (Subtlety: a boilerplate gram can
    # be SELECTED as a window min in only a subset of docs — end-of-doc
    # context differs — so a handful of low-df stragglers may survive;
    # the cap's job is killing the bulk, asserted via n_shared.)
    bp = "standard license header text common to all files here"
    docs = [(i, bp + f" unique body {i} " + "x" * i) for i in range(1, 6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = winnow_overlap_pairs(
        df, k=8, window=4, min_shared=1, max_df=10, hash_fn="sha256"
    ).collect()
    capped = winnow_overlap_pairs(
        df, k=8, window=4, min_shared=1, max_df=4, hash_fn="sha256"
    ).collect()
    # without the cap every pair shares the whole boilerplate fingerprint set
    assert max(r.n_shared for r in uncapped) >= 5
    assert len(uncapped) == 10  # all C(5,2) pairs
    # with the cap only straggler selections remain
    assert capped == [] or max(r.n_shared for r in capped) <= 2


def _py_ql(corpus, terms, mu):
    import math
    import re

    toks = {d: re.sub(r"\s+", " ", t.lower()).strip().split(" ") for d, t in corpus}
    ctot = sum(len(v) for v in toks.values())
    cf = {
        t: sum(v.count(t) for v in toks.values()) for t in terms
    }
    out = {}
    for d, v in toks.items():
        if not any(t in v for t in terms):
            continue
        s = 0.0
        for t in terms:
            s += math.log((v.count(t) + mu * cf[t] / ctot) / (len(v) + mu))
        out[d] = round(s, 4)
    return out


def test_ql_topk_matches_python_oracle(spark):
    from valentinus_spark.operators.text_search import ql_topk

    docs = [
        (1, "data query stream data data"),
        (2, "stream of words about query planning"),
        (3, "nothing relevant here at all"),
        (4, "data data data data data"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.score for r in ql_topk(df, ["data", "query"], k=10).collect()}
    want = _py_ql(docs, ["data", "query"], 300.0)
    assert got == want


def test_rrf_fuse_combines_rankings(spark):
    from valentinus_spark.operators.text_search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (2, 0.5), (4, 0.1)], "doc_id long, score double"
    )
    rows = {r.doc_id: r for r in rrf_fuse([a, b], k0=60, topk=10).collect()}
    # doc 2: rank 2 in both lists
    assert rows[2].rrf_score == round(1 / 62 + 1 / 62, 6)
    assert rows[2].n_lists == 2
    # doc 1: rank 1 in list a only
    assert rows[1].rrf_score == round(1 / 61, 6)
    assert rows[1].n_lists == 1
    assert rows[3].rrf_score == round(1 / 63 + 1 / 61, 6)
    order = [
        r.doc_id
        for r in sorted(rows.values(), key=lambda r: (-r.rrf_score, r.doc_id))
    ]
    # 1/(k0+r) is convex, so (rank 3, rank 1) edges out (rank 2, rank 2);
    # both two-list docs beat every single-list doc
    assert order[:2] == [3, 2]


def test_winnow_shared_spans_matches_python(spark):
    from collections import defaultdict

    from valentinus_spark.operators.text_search import winnow_shared_spans

    shared_block = "this exact sentence appears verbatim in both documents and runs on"
    docs = [
        (1, "intro alpha. " + shared_block + " tail one"),
        (2, "different opening entirely. " + shared_block + " closing words"),
        (3, "nothing in common at all with those two above"),
    ]
    k, w, gap, max_df = 8, 4, 20, 10
    fps = {d: _py_winnow(t, k, w) for d, t in docs}
    dfreq = defaultdict(set)
    for d, s in fps.items():
        for _, f in s:
            dfreq[f].add(d)
    keep = {f for f, ds in dfreq.items() if 2 <= len(ds) <= max_df}
    import itertools
    want = set()
    for a, b in itertools.combinations(sorted(fps), 2):
        sh = ({f for _, f in fps[a]} & {f for _, f in fps[b]}) & keep
        if len(sh) < 1:
            continue
        for side, doc in (("a", a), ("b", b)):
            ps = sorted({p for p, f in fps[doc] if f in sh})
            start, prev, n = ps[0], ps[0], 1
            for p in ps[1:]:
                if p - prev > gap:
                    want.add((a, b, side, start, prev + k - 1, n))
                    start, n = p, 0
                prev = p
                n += 1
            want.add((a, b, side, start, prev + k - 1, n))
    got = {
        (r.id_a, r.id_b, r.side, r.span_start, r.span_end, r.n_fps)
        for r in winnow_shared_spans(
            spark.createDataFrame(docs, "doc_id long, text string"),
            k=k, window=w, min_shared=1, max_df=max_df, gap=gap, hash_fn="sha256",
        ).collect()
    }
    assert got == want
    # both sides cover the shared block with the same fingerprint count
    a_spans = [t for t in got if t[2] == "a"]
    b_spans = [t for t in got if t[2] == "b"]
    assert len(a_spans) == len(b_spans) == 1
    assert a_spans[0][5] == b_spans[0][5]


def test_textrank_keywords_structure_and_python_oracle(spark):
    """Window-2 co-occurrence graph + pagerank, replayed in python on a
    tiny corpus: the rank values must match a literal numpy power
    iteration with the same teleport/damping/per-round 9-dp rounding,
    and stopwords must never appear as keywords."""
    from valentinus_spark.operators import textrank_keywords

    docs = spark.createDataFrame(
        [
            (1, "the spark engine runs the spark planner"),
            (2, "engine planner engine"),
            (3, "a catalyst planner optimizes the spark engine"),
        ],
        ["doc_id", "text"],
    )
    out = textrank_keywords(docs, topk=10, iterations=8).collect()
    words = [r.word for r in out]
    assert "the" not in words and "a" not in words
    assert set(words) <= {"spark", "engine", "runs", "planner", "catalyst", "optimizes"}

    # python replay: filtered sequences per doc -> window-2 sym edges
    seqs = [
        ["spark", "engine", "runs", "spark", "planner"],
        ["engine", "planner", "engine"],
        ["catalyst", "planner", "optimizes", "spark", "engine"],
    ]
    edges = set()
    for s in seqs:
        for x, y in zip(s, s[1:]):
            if x != y:
                edges.add((x, y))
                edges.add((y, x))
    nodes = sorted({n for e in edges for n in e})
    out_deg = {u: sum(1 for a, _ in edges if a == u) for u in nodes}
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(8):
        contrib = {u: 0.0 for u in nodes}
        for a, b in edges:
            contrib[b] += rank[a] / out_deg[a]
        rank = {
            u: round(0.15 / n + 0.85 * contrib[u], 9) for u in nodes
        }
    got = {r.word: r.rank for r in out}
    for w in got:
        assert got[w] == pytest.approx(round(rank[w], 6), abs=2e-6), w
    # hub word 'engine' (degree 4) must outrank leaf 'runs'
    assert got["engine"] > got["runs"]


def test_substring_search_matches_naive_contains(spark):
    from valentinus_spark.operators import build_trigram_index, substring_search

    docs = spark.createDataFrame(
        [
            (1, "The Quick Brown Fox"),
            (2, "quickest route home"),
            (3, "slow and steady"),
            (4, "QUICKLY now"),
            (5, "qu"),  # shorter than the pattern
        ],
        ["doc_id", "text"],
    )
    got = [r.doc_id for r in substring_search(docs, "Quick").collect()]
    assert got == [1, 2, 4]  # case-insensitive contains
    # prebuilt index path gives the same answer
    idx = build_trigram_index(docs)
    got2 = [r.doc_id for r in substring_search(docs, "quick", index=idx).collect()]
    assert got2 == [1, 2, 4]
    # trigram prune is a SUPERSET filter: a doc holding all trigrams
    # but not the contiguous pattern must be rejected by the verify
    docs2 = spark.createDataFrame(
        [(1, "abc def cde bcd"), (2, "abcde")], ["doc_id", "text"]
    )
    assert [r.doc_id for r in substring_search(docs2, "abcde").collect()] == [2]


def test_substring_search_short_pattern_fallback(spark):
    from valentinus_spark.operators import substring_search

    docs = spark.createDataFrame(
        [(1, "xy and more"), (2, "no match"), (3, "XYlophone")],
        ["doc_id", "text"],
    )
    assert [r.doc_id for r in substring_search(docs, "xy").collect()] == [1, 3]


def test_rake_keywords_scores_match_hand_computation(spark):
    """Single doc with two stopword-delimited phrases; deg/freq and
    phrase sums computed by hand. 'the' splits phrases; 'linear
    diophantine equations' (len 3) outranks 'strict inequations'
    (len 2) because its words carry higher degree."""
    from valentinus_spark.operators import rake_keywords

    text = "linear diophantine equations and strict inequations"
    # 'and' is a stopword -> phrases: [linear diophantine equations],
    # [strict inequations]; each word freq 1, deg = own phrase len.
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = {r.phrase: r for r in rake_keywords(df, topk=10).collect()}
    assert set(out) == {"linear diophantine equations", "strict inequations"}
    assert out["linear diophantine equations"].score == pytest.approx(9.0, abs=1e-6)
    assert out["strict inequations"].score == pytest.approx(4.0, abs=1e-6)
    assert out["linear diophantine equations"].n_occ == 1


def test_rake_keywords_degree_credit_and_occurrence_count(spark):
    """A word shared across a long and a short phrase gains degree
    from both (deg/freq > own-phrase length share); repeated phrases
    count occurrences without double-scoring."""
    from valentinus_spark.operators import rake_keywords

    docs = [
        (1, "machine learning systems and machine learning"),
        (2, "machine learning"),
    ]
    out = {r.phrase: r for r in rake_keywords(
        spark.createDataFrame(docs, ["doc_id", "text"]), topk=10
    ).collect()}
    # phrases: 'machine learning systems' (1x), 'machine learning' (2x)
    assert out["machine learning"].n_occ == 2
    # machine: freq 3, deg = 3+2+2 = 7 -> 7/3; learning same; systems 3/1
    w = 7.0 / 3.0
    assert out["machine learning"].score == pytest.approx(round(w, 9) * 2, abs=1e-5)
    assert out["machine learning systems"].score == pytest.approx(
        round(w, 9) * 2 + 3.0, abs=1e-5
    )


def test_texttiling_detects_planted_topic_shift(spark):
    """A document whose first half repeats topic-A vocabulary and
    second half topic-B: the gap at the switch must have the LOWEST
    similarity and be flagged as a boundary; within-topic gaps are
    not."""
    from valentinus_spark.operators import texttiling_boundaries

    a = "apple banana cherry fruit orchard harvest sweet ripe juice tree "
    b = "engine piston torque valve cylinder exhaust turbo shaft gear oil "
    text = a * 8 + b * 8  # 80 tokens per topic, block=20 -> 8 blocks
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = texttiling_boundaries(df, block_tokens=20).collect()
    assert len(out) == 7  # 8 blocks -> 7 gaps
    sims = {r.gap: r.sim for r in out}
    # the topic switch sits between blocks 3 and 4 (gap 3)
    assert sims[3] == min(sims.values())
    flags = {r.gap: r.is_boundary for r in out}
    assert flags[3]
    assert not flags[0] and not flags[6]


def test_texttiling_short_docs_produce_no_rows(spark):
    from valentinus_spark.operators import texttiling_boundaries

    df = spark.createDataFrame([(1, "only a few tokens here")], ["doc_id", "text"])
    assert texttiling_boundaries(df, block_tokens=20).count() == 0


def test_bm25f_title_hits_outrank_body_hits(spark):
    """Same tf, but one doc's hits are in the title (first 120 chars):
    the title doc must outrank the body doc at weight 2."""
    from valentinus_spark.operators.text_search import bm25f_topk

    pad = "filler words here " * 10  # pushes later text past 120 chars
    rows = [
        (1, "data data relevant title " + pad + " nothing else"),
        (2, pad + " data data buried deep in the body text"),
        (3, pad + " completely unrelated content"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25f_topk(df, terms=["data"], k=3)
    rows_out = out.collect()
    assert rows_out[0].doc_id == 1
    assert rows_out[0].score > rows_out[1].score
    assert all(r.doc_id != 3 for r in rows_out)


def test_bm25f_matches_flat_bm25_when_weight_one_single_field(spark):
    """With title_chars=0 every token is body: bm25f degenerates to a
    single-field BM25 and must produce the same ranking as bm25_topk."""
    from valentinus_spark.operators.text_search import bm25_topk, bm25f_topk

    rows = [(i, f"data point {'data ' * (i % 4)} end") for i in range(1, 12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    flat = [r.doc_id for r in bm25_topk(df, terms=["data"], k=5).collect()]
    f = [
        r.doc_id
        for r in bm25f_topk(
            df, terms=["data"], k=5, title_chars=0, title_weight=2.0
        ).collect()
    ]
    assert f == flat
