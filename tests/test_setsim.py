"""Prefix-filtered set-similarity join (operators/setsim.py) and
equi-width histogram (operators/profile.py::equi_width_histogram)."""

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from valentinus_spark.operators.setsim import set_similarity_join


def _brute_jaccard_pairs(rows, threshold):
    """Driver-side oracle: all-pairs Jaccard over distinct word tokens."""
    sets = {r.did: set(r.body.lower().split()) for r in rows if r.body.strip()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= threshold:
            out[(a, b)] = round(inter / union, 4)
    return out


def test_prefix_filter_is_lossless_vs_brute_force(spark):
    rows = [
        Row(did=1, body="the quick brown fox jumps over the lazy dog"),
        Row(did=2, body="the quick brown fox jumps over a lazy dog"),  # ~0.8
        Row(did=3, body="quick brown fox jumps over the lazy dog the"),  # ==1
        Row(did=4, body="completely unrelated words appear here tonight"),
        Row(did=5, body="unrelated words appear here tonight completely"),  # ==4
        Row(did=6, body="half related the quick brown stone cold words"),
        Row(did=7, body=""),
    ]
    for t in (0.5, 0.8, 1.0):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in set_similarity_join(
                spark.createDataFrame(rows), "did", "body", threshold=t
            ).collect()
        }
        assert got == _brute_jaccard_pairs(rows, t), f"t={t}"


def test_setsim_shingle_mode_requires_contiguity(spark):
    # same token SET, different order: token-mode Jaccard = 1.0, but
    # 3-shingle sets differ, so shingle mode scores them apart
    rows = [
        Row(did=1, body="a b c d e f g h"),
        Row(did=2, body="h g f e d c b a"),
    ]
    df = spark.createDataFrame(rows)
    tok = set_similarity_join(df, "did", "body", threshold=0.99).collect()
    assert len(tok) == 1 and tok[0]["jaccard"] == 1.0
    sh = set_similarity_join(df, "did", "body", threshold=0.5, shingle_n=3).collect()
    assert sh == []


def test_setsim_threshold_validation(spark):
    df = spark.createDataFrame([Row(did=1, body="x")])
    with pytest.raises(ValueError):
        set_similarity_join(df, "did", "body", threshold=0.0)
    with pytest.raises(ValueError):
        set_similarity_join(df, "did", "body", threshold=1.5)


def test_equi_width_histogram_exact_bins(spark):
    from valentinus_spark.operators.profile import equi_width_histogram

    # values 0..99: min=0 max=99, 10 bins of width 9.9
    df = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    h = equi_width_histogram(df, "v", n_bins=10).collect()
    assert [r["bin"] for r in h] == list(range(10))
    assert sum(r["n_rows"] for r in h) == 100
    assert h[0]["lo"] == 0.0 and h[-1]["hi"] == 99.0
    # v=99 (the max) folds into the last bin, not an 11th
    assert h[-1]["n_rows"] >= 1


def test_equi_width_histogram_degenerate_and_nulls(spark):
    from valentinus_spark.operators.profile import equi_width_histogram

    df = spark.createDataFrame(
        [Row(v=5.0), Row(v=5.0), Row(v=None)], "v double"
    )
    h = equi_width_histogram(df, "v", n_bins=4).collect()
    assert len(h) == 1
    assert h[0]["bin"] == 0 and h[0]["n_rows"] == 2
    assert h[0]["lo"] == 5.0 and h[0]["hi"] == 5.0


def test_prefix_length_float_boundary_lossless(spark):
    """t*k landing a hair above an integer in doubles (0.8*10 =
    8.000000000000002) must not shorten the prefix below the lossless
    bound: two 10-token sets sharing 9 tokens (J = 9/11 >= 0.8) have to
    be found, and the subset pair (8 of 10, J = 0.8 exactly, which
    double-compares BELOW the 0.8 literal) must match the brute-force
    decision on both sides."""
    toks = [f"w{i:02d}" for i in range(12)]
    rows = [
        Row(did=1, body=" ".join(toks[0:10])),       # w00..w09
        Row(did=2, body=" ".join(toks[1:11])),       # w01..w10 (shares 9)
        Row(did=3, body=" ".join(toks[0:8])),        # subset of did=1 (8/10)
        Row(did=4, body=" ".join(reversed(toks[0:10]))),  # same set as 1
    ]
    got = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(
            spark.createDataFrame(rows), "did", "body", threshold=0.8
        ).collect()
    }
    want = set(_brute_jaccard_pairs(rows, 0.8))
    assert got == want
    assert (1, 2) in got and (1, 4) in got


def test_containment_finds_buried_query(spark):
    from valentinus_spark.operators.setsim import set_containment_join

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "totally different content with other words entirely here"),
        ],
        "cid long, body string",
    )
    queries = spark.createDataFrame(
        [
            (10, "gamma delta epsilon"),      # fully inside corpus doc 1
            (11, "gamma delta missingword"),  # 2/3 inside doc 1
            (12, "nothing matches anywhere"),
        ],
        "qid long, q string",
    )
    got = {
        (r["qid_q"], r["cid_c"]): r["containment"]
        for r in set_containment_join(
            queries, corpus, "qid", "q", "cid", "body", threshold=0.9
        ).collect()
    }
    assert got == {(10, 1): 1.0}
    # lower threshold admits the partial containment
    got2 = {
        (r["qid_q"], r["cid_c"]): r["containment"]
        for r in set_containment_join(
            queries, corpus, "qid", "q", "cid", "body", threshold=0.6
        ).collect()
    }
    assert (11, 1) in got2 and got2[(11, 1)] == round(2 / 3, 4)
    assert (12, 1) not in got2 and (12, 2) not in got2


def test_containment_asymmetry_vs_jaccard(spark):
    """A short query inside a long doc: containment 1.0 while Jaccard is
    far below any useful threshold — the reason contamination checks
    need the asymmetric measure."""
    from valentinus_spark.operators.setsim import set_containment_join

    long_body = " ".join(f"w{i}" for i in range(100)) 
    corpus = spark.createDataFrame([(1, long_body)], "cid long, body string")
    queries = spark.createDataFrame([(5, "w10 w20 w30")], "qid long, q string")
    got = set_containment_join(
        queries, corpus, "qid", "q", "cid", "body", threshold=0.99
    ).collect()
    assert len(got) == 1 and got[0]["containment"] == 1.0
    # jaccard for the same pair would be 3/100


def test_setsim_hot_token_skew_stays_out_of_prefixes(spark):
    """Adversarial skew fixture (VERDICT r3 item 6): one token in 50% of
    all docs, zipf-heavy tail. The PPJoin prefix orders tokens by
    ascending global frequency, so the hot token must appear in ZERO
    prefixes — the f²/2 hot-token candidate blowup (here ~500k pairs)
    is structurally excluded — while the verified output still equals
    the planted near-dup set exactly (prefix filtering is lossless
    under skew, not just on benign data)."""
    from valentinus_spark.operators.setsim import _doc_tokens, _prefix_tokens, set_similarity_join

    n_docs = 2000
    rows = []
    for i in range(n_docs):
        # zipf-ish tail: token j appears in ~n/(j+2) docs
        toks = [f"t{j}" for j in range(50) if i % (j + 2) == 0]
        body = (" zzhot" if i % 2 == 0 else "") + " " + " ".join(toks) + f" u{i}a u{i}b"
        rows.append((i, body.strip()))
    # planted near-dups: doc 2000+k is doc 10k with one tail token changed
    for k in range(20):
        base = rows[10 * k][1]
        rows.append((n_docs + k, base + " extra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    tok = _doc_tokens(df, "doc_id", "text")
    prefix = _prefix_tokens(tok, 0.8)
    hot_in_prefix = prefix.where(F.col("_tok") == "zzhot").count()
    assert hot_in_prefix == 0, "hot token leaked into a PPJoin prefix"

    # candidate volume: prefix self-join pairs stay ~3 orders of
    # magnitude under the hot-token f²/2 bound (~500k)
    pa = prefix.select("_tok", F.col("_sid").alias("a"))
    pb = prefix.select("_tok", F.col("_sid").alias("b"))
    n_cand = (
        pa.join(pb, "_tok").where(F.col("a") < F.col("b")).select("a", "b").distinct().count()
    )
    # vs the un-prefixed token join (what a naive engine shuffles): the
    # hot token alone contributes ~n²/8 pairs there
    ta = tok.select("_tok", F.col("_sid").alias("a"))
    tb = tok.select("_tok", F.col("_sid").alias("b"))
    n_naive = (
        ta.join(tb, "_tok").where(F.col("a") < F.col("b")).select("a", "b").distinct().count()
    )
    assert n_naive > 400_000, f"fixture not skewed enough: {n_naive}"
    assert n_cand * 50 < n_naive, (
        f"prefix candidates blew up under skew: {n_cand} vs naive {n_naive}"
    )

    # losslessness under skew: output == brute-force exact Jaccard pairs
    sets = tok.groupBy("_sid").agg(F.collect_set("_tok").alias("s"))
    brute = (
        sets.alias("x")
        .join(sets.alias("y"), F.col("x._sid") < F.col("y._sid"))
        .withColumn("i", F.size(F.array_intersect("x.s", "y.s")))
        .withColumn(
            "j", F.col("i") / (F.size("x.s") + F.size("y.s") - F.col("i"))
        )
        .where(F.col("j") >= 0.8)
        .select(F.col("x._sid").alias("id_a"), F.col("y._sid").alias("id_b"))
    )
    expected = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    got = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(df, "doc_id", "text", threshold=0.8).collect()
    }
    assert got == expected and len(expected) >= 20


def _py_cosine_pairs(corpus, threshold):
    """Brute-force tf-idf cosine oracle (weighting mirrors the operator:
    w = tf * ln((N+1)/(df+1)), L2-normalized)."""
    import math
    import re
    from collections import Counter

    toks = {
        d: re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for d, t in corpus
        if t.strip()
    }
    n = len(toks)
    dfreq = Counter()
    for v in toks.values():
        dfreq.update(set(v))
    vecs = {}
    for d, v in toks.items():
        tf = Counter(v)
        w = {t: c * math.log((n + 1) / (dfreq[t] + 1)) for t, c in tf.items()}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        if nrm > 0:
            vecs[d] = {t: x / nrm for t, x in w.items()}
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            cos = sum(vecs[a][t] * vecs[b].get(t, 0.0) for t in vecs[a])
            if round(cos, 6) >= threshold:
                out[(a, b)] = round(cos, 4)
    return out


def test_cosine_join_matches_brute_force(spark):
    from valentinus_spark.operators.setsim import cosine_similarity_join

    corpus = [
        (1, "apple banana cherry apple"),
        (2, "apple banana cherry"),
        (3, "apple banana cherry date elderberry"),
        (4, "totally different words entirely here"),
        (5, "totally different words entirely here now"),
        (6, "the the the the common common"),   # stopword-only doc
        (7, ""),                                # empty -> excluded
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    for th in (0.3, 0.6, 0.9):
        got = {
            (r.id_a, r.id_b): r.cosine
            for r in cosine_similarity_join(df, threshold=th).collect()
        }
        assert got == _py_cosine_pairs(corpus, th), f"threshold {th}"


def test_cosine_join_no_cartesian_and_hot_token_excluded(spark):
    from valentinus_spark.operators.setsim import cosine_similarity_join

    # a corpus-wide hot token ('common') must not drive the candidate
    # join: idf ~ ln(1) ~ 0 puts it at the suffix end with ~0 weight
    docs = [(i, f"common shared word{i} word{i+1} word{i+2}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cosine_similarity_join(df, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {(r.id_a, r.id_b): r.cosine for r in out.collect()}
    assert got == _py_cosine_pairs(docs, 0.5)


def test_cosine_join_shingle_mode_matches_brute_force(spark):
    """Trigram-feature mode: same brute-force oracle over the shingle
    feature space (word order now matters — swapped docs diverge)."""
    from valentinus_spark.operators.setsim import cosine_similarity_join

    corpus = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),
        (3, "epsilon delta gamma beta alpha"),   # reversed: unigram-identical to 1
        (4, "unrelated words over here friend"),
        (5, "tiny doc"),                         # < n tokens -> whole-doc shingle
        (6, "tiny doc"),                         # exact dup of 5 -> cosine 1.0
    ]

    def shingle(text, n=3):
        import re
        w = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        if len(w) <= n:
            return [" ".join(w)]
        return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]

    shingled = [(d, shingle(t)) for d, t in corpus]
    import math
    from collections import Counter
    toks = {d: s for d, s in shingled}
    n_docs = len(toks)
    dfreq = Counter()
    for v in toks.values():
        dfreq.update(set(v))
    vecs = {}
    for d, v in toks.items():
        tf = Counter(v)
        w = {t: c * math.log((n_docs + 1) / (dfreq[t] + 1)) for t, c in tf.items()}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        if nrm > 0:
            vecs[d] = {t: x / nrm for t, x in w.items()}
    want = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            cos = sum(vecs[a][t] * vecs[b].get(t, 0.0) for t in vecs[a])
            if round(cos, 6) >= 0.3:
                want[(a, b)] = round(cos, 4)

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_similarity_join(df, threshold=0.3, shingle_n=3).collect()
    }
    assert got == want
    assert got[(5, 6)] == 1.0           # exact dup via whole-doc shingle
    assert (1, 3) not in got or got[(1, 3)] < got[(1, 2)]  # reversal penalized
