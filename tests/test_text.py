"""Text-function unit tests (functions/text.py)."""

from pyspark.sql import functions as F

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
    word_shingles,
    word_tokens,
)


def one(spark, text, expr):
    return spark.createDataFrame([(text,)], "t string").select(expr.alias("v")).first()["v"]


def test_normalize(spark):
    assert one(spark, "  Hello   WORLD \n", normalize_text("t")) == "hello world"


def test_word_tokens(spark):
    assert one(spark, "a b  c", word_tokens("t")) == ["a", "b", "c"]
    assert one(spark, "   ", word_tokens("t")) == []


def test_token_count_bpe_ish(spark):
    # letters run + digits run + symbols separately
    assert one(spark, "abc123 def!", token_count("t")) == 4
    assert one(spark, "", token_count("t")) == 0


def test_char_ngrams(spark):
    assert one(spark, "abcd", char_ngrams("t", 2)) == ["ab", "bc", "cd"]
    assert one(spark, "ab", char_ngrams("t", 5)) == ["ab"]


def test_word_shingles(spark):
    assert one(spark, "a b c d", word_shingles("t", 3)) == ["a b c", "b c d"]
    assert one(spark, "a b", word_shingles("t", 3)) == ["a b"]


def test_text_quality_struct(spark):
    v = one(spark, "The cat, the hat! 42", text_quality("t"))
    assert v["n_words"] == 5
    assert v["n_chars"] == 20
    assert v["punct_ratio"] > 0 and v["digit_ratio"] > 0
    assert 0 < v["stopword_ratio"] <= 1  # "The"/"the" are stopwords


def test_lang_id(spark):
    assert one(spark, "the cat and the dog is in it for a win", lang_id("t")) == "en"
    assert one(spark, "el perro y la casa en un con los por que", lang_id("t")) == "es"
    assert one(spark, "zzz qqq", lang_id("t")) == "und"


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",),
         ("the quick brown fox jumps over the lazy cat",),
         ("completely different words entirely unrelated content here",)],
        "t string",
    )
    hashed = (
        df.select(word_tokens(normalize_text("t")).alias("_toks"), "t")
        .withColumn("_counts", simhash_counts("_toks"))
        .select("t", pack_simhash("_counts").alias("sh"))
        .collect()
    )
    vals = [r["sh"] for r in hashed]
    # deterministic
    again = (
        df.select(word_tokens(normalize_text("t")).alias("_toks"), "t")
        .withColumn("_counts", simhash_counts("_toks"))
        .select(pack_simhash("_counts").alias("sh"))
        .collect()
    )
    assert [r["sh"] for r in again] == vals

    ham = spark.createDataFrame([(vals[0], vals[1]), (vals[0], vals[2])], "a long, b long")
    d_near, d_far = [r["d"] for r in ham.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()]
    assert d_near < d_far  # one-word change ≪ different doc


def test_rolling_fingerprint(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog and keeps running",),
         ("the quick brown fox jumps over the lazy dog and keeps walking",)],
        "t string",
    )
    fps = [r["f"] for r in df.select(rolling_fingerprint("t", n=8, keep=4).alias("f")).collect()]
    assert len(fps[0]) == 4 and fps[0] == sorted(fps[0])
    # near-identical docs share most min-hashes
    assert len(set(fps[0]) & set(fps[1])) >= 2


def test_stable_split_deterministic_and_proportional(spark):
    from valentinus_spark.functions.text import stable_split

    df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {r["k"]: r["split"] for r in df.select("k", stable_split("k", w)).collect()}
    b = {r["k"]: r["split"] for r in df.select("k", stable_split("k", w)).collect()}
    assert a == b  # reproducible
    from collections import Counter

    counts = Counter(a.values())
    assert abs(counts["train"] / 20000 - 0.9) < 0.01
    assert abs(counts["val"] / 20000 - 0.05) < 0.005
    # stability under growth: assignments of the first 20k unchanged
    bigger = spark.range(40000).select(F.col("id").cast("string").alias("k"))
    c = {r["k"]: r["split"] for r in bigger.select("k", stable_split("k", w)).collect()}
    assert all(c[k] == v for k, v in a.items())


def test_stable_split_salt_changes_assignment(spark):
    from valentinus_spark.functions.text import stable_split

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    w = {"train": 0.5, "test": 0.5}
    a = {r["k"]: r["split"] for r in df.select("k", stable_split("k", w)).collect()}
    b = {r["k"]: r["split"] for r in df.select("k", stable_split("k", w, salt="v2")).collect()}
    flipped = sum(1 for k in a if a[k] != b[k])
    assert flipped > 500  # ~half move under an independent draw


def test_stable_split_bad_weights(spark):
    import pytest
    from valentinus_spark.functions.text import stable_split

    with pytest.raises(ValueError):
        stable_split("k", {"train": 0.5, "test": 0.4})


def test_stratified_keep_rates_and_determinism(spark):
    from valentinus_spark.functions.text import stratified_keep

    df = spark.range(30000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("lang"), (F.col("id") % 3)).alias("lang"),
    )
    pred = stratified_keep("k", "lang", {"lang0": 0.1, "lang1": 0.5}, default_rate=1.0)
    kept = df.filter(pred)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["lang0"] / 10000 - 0.1) < 0.02
    assert abs(counts["lang1"] / 10000 - 0.5) < 0.02
    assert counts["lang2"] == 10000  # default rate keeps everything
    # deterministic
    assert kept.count() == df.filter(pred).count()


def test_pii_counts_and_redaction(spark):
    from valentinus_spark.functions.text import pii_counts, redact_pii

    rows = [
        (0, "mail me at alice.smith+spam@corp.example.org today"),
        (1, "server 10.0.255.3 and ssn 123-45-6789 and +44-207-946-0958"),
        (2, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r["i"]: (r["c"], r["red"])
        for r in df.select(
            "i", pii_counts("text").alias("c"), redact_pii("text").alias("red")
        ).collect()
    }
    assert got[0][0]["email"] == 1 and got[0][0]["phone"] == 0
    assert got[0][1] == "mail me at <EMAIL> today"
    c1 = got[1][0]
    assert (c1["ipv4"], c1["ssn"], c1["phone"], c1["email"]) == (1, 1, 1, 0)
    assert got[1][1] == "server <IPV4> and ssn <SSN> and <PHONE>"
    assert got[2][0]["email"] == 0 and got[2][1] == "no pii here at all"


def test_chunks_from_tokens(spark):
    import pytest

    from valentinus_spark.functions.text import chunks_from_tokens, word_tokens

    rows = [(0, " ".join(f"t{i}" for i in range(10))), (1, "a b"), (2, "")]
    df = spark.createDataFrame(rows, "i long, text string")
    out = (
        df.withColumn("_toks", word_tokens("text"))
        .select("i", chunks_from_tokens("_toks", size=4, stride=3).alias("ch"))
        .collect()
    )
    ch = {r["i"]: [(c["chunk_id"], c["chunk"]) for c in r["ch"]] for r in out}
    # 10 tokens, size 4 stride 3 → ceil((10-4)/3)+1 = 3 chunks; windows
    # [0:4) [3:7) [6:10) — every token covered, overlap = 1
    assert ch[0] == [(0, "t0 t1 t2 t3"), (1, "t3 t4 t5 t6"), (2, "t6 t7 t8 t9")]
    assert ch[1] == [(0, "a b")]  # short doc: one whole-doc chunk
    assert ch[2] == [(0, "")]  # empty doc: one empty chunk
    with pytest.raises(ValueError):
        chunks_from_tokens("_toks", size=4, stride=5)  # stride > size


def test_mixture_repeat_count_semantics(spark):
    import hashlib

    from valentinus_spark.functions.text import mixture_repeat_count

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    n = mixture_repeat_count("doc_id", "source", {"a": 2.5, "b": 0.0})
    got = {r["doc_id"]: r["n_repeat"] for r in df.select("doc_id", n).collect()}

    def bucket(k):
        return int(hashlib.sha256(f"v1{k}".encode()).hexdigest()[:8], 16)

    for i, s in rows:
        if s == "b":
            assert got[i] == 0
        else:
            expect = 2 + (1 if bucket(i) < int(0.5 * 2**32) else 0)
            assert got[i] == expect, f"doc {i}"
    # the fractional half really splits (not all-or-nothing)
    a_counts = [v for (i, s), v in zip(rows, [got[i] for i, _ in rows]) if s == "a"]
    assert 2 in a_counts and 3 in a_counts


def test_mixture_repeat_growth_stable(spark):
    from valentinus_spark.functions.text import mixture_repeat_count

    small = spark.createDataFrame([(i, "a") for i in range(50)], "doc_id long, source string")
    big = spark.createDataFrame([(i, "a") for i in range(500)], "doc_id long, source string")
    n = mixture_repeat_count("doc_id", "source", {"a": 1.5})
    s = {r["doc_id"]: r["n_repeat"] for r in small.select("doc_id", n).collect()}
    b = {r["doc_id"]: r["n_repeat"] for r in big.select("doc_id", n).collect()}
    assert all(b[k] == v for k, v in s.items())


def test_mixture_repeat_rejects_negative(spark):
    import pytest as _pytest

    from valentinus_spark.functions.text import mixture_repeat_count

    with _pytest.raises(ValueError):
        mixture_repeat_count("doc_id", "source", {"a": -0.5})


def test_weighted_sample_key_matches_python_oracle(spark):
    """E-S order key ln(u)/w recomputed row-for-row in Python from the
    same sha256 bucketing — and the induced top-k must agree."""
    import hashlib
    import math

    from valentinus_spark.functions.text import weighted_sample_key

    rows = [(i, float(10 + 7 * (i % 13))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", weighted_sample_key("doc_id", "w").alias("k")
        ).collect()
    }

    def oracle(key, w):
        b = int(hashlib.sha256(f"ws-v1{key}".encode()).hexdigest()[:8], 16)
        return math.log((b + 1) / 2**32) / w

    for i, w in rows:
        assert abs(got[i] - oracle(i, w)) < 1e-12, f"doc {i}"
    top_got = sorted(got, key=lambda i: -got[i])[:20]
    top_exp = sorted(
        (i for i, _ in rows), key=lambda i: -oracle(i, dict(rows)[i])
    )[:20]
    assert top_got == top_exp


def test_weighted_sample_key_nonpositive_weight_null(spark):
    from valentinus_spark.functions.text import weighted_sample_key

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "doc_id long, w double"
    )
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", weighted_sample_key("doc_id", "w").alias("k")
        ).collect()
    }
    assert got[1] is None and got[2] is None and got[3] is not None


def test_weighted_sample_key_salt_decorrelated_from_split(spark):
    """Regression for the round-2 advice: the default salt must differ
    from stable_split's so sampling within a split is unbiased — with a
    shared salt, u would be conditioned to the split's sub-interval."""
    from valentinus_spark.functions.text import stable_split, weighted_sample_key

    df = spark.createDataFrame([(i, 1.0) for i in range(2000)], "doc_id long, w double")
    out = df.select(
        "doc_id",
        stable_split("doc_id", {"train": 0.9, "val": 0.1}).alias("split"),
        weighted_sample_key("doc_id", "w").alias("k"),
    ).collect()
    # with w=1, k = ln(u): u > 0.9 (k > ln(0.9)) must appear in BOTH
    # splits — under a shared salt every val row would have u >= 0.9
    import math

    hi = {r["split"] for r in out if r["k"] > math.log(0.9)}
    assert hi == {"train", "val"}


# ------------------------------------------- deterministic quota sampling


def test_group_sample_k_quota_and_determinism(spark):
    from valentinus_spark.operators.packing import group_sample_k

    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(2)]
    df = spark.createDataFrame(rows, "g string, k int")
    out = group_sample_k(df, ["g"], "k", k=5).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["k"])
    assert len(by_g["a"]) == 5          # exact quota
    assert sorted(by_g["b"]) == [0, 1]  # min(k, group size)
    again = group_sample_k(df.repartition(7), ["g"], "k", k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_group_sample_k_matches_python_oracle(spark):
    import hashlib

    from valentinus_spark.operators.packing import group_sample_k

    rows = [("g", i) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, k int")
    out = sorted(r["k"] for r in group_sample_k(df, ["g"], "k", k=7).collect())

    def h(i):
        return int(hashlib.sha256(f"gsk-v1{i}".encode()).hexdigest()[:8], 16)

    expected = sorted(sorted(range(50), key=lambda i: (h(i), i))[:7])
    assert out == expected


def test_group_sample_k_append_stability(spark):
    from valentinus_spark.operators.packing import group_sample_k

    base = spark.createDataFrame([("g", i) for i in range(30)], "g string, k int")
    more = spark.createDataFrame([("g", i) for i in range(30, 40)], "g string, k int")
    s1 = {r["k"] for r in group_sample_k(base, ["g"], "k", k=10).collect()}
    s2 = {r["k"] for r in group_sample_k(base.union(more), ["g"], "k", k=10).collect()}
    # hash-rank sampling: appended rows only EVICT — survivors of the
    # bigger corpus that existed before are exactly the old sample's
    # lowest-ranked members (s2's old part ⊆ s1)
    assert (s2 & set(range(30))) <= s1


def test_encoding_artifacts_counts(spark):
    """encoding_artifacts: the three corpus-health counters — U+FFFD,
    UTF-8-as-Latin-1 mojibake sequences, stray C0 controls — counted
    per kind; clean text scores zero everywhere."""
    from valentinus_spark.functions.text import encoding_artifacts

    rows = [
        (0, "perfectly clean ascii text."),
        (1, "decoder gave up here \uFFFD and here \uFFFD"),
        (2, "caf\u00C3\u00A9 says \u00E2\u0080\u0099hi\u00E2\u0080\u0099"),  # mojibake e-acute + two curly quotes
        (3, "nbsp artifact\u00C2\u00A0and copyright \u00C2\u00A9"),
        (4, "binary junk\u0001here\ttab and newline\nare fine\u0007"),
        (5, "unicode that is FINE: caf\u00E9 na\u00EFve \u2014 \u2019curly\u2019"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["a"]["replacement"], r["a"]["mojibake"], r["a"]["control"])
        for r in df.select("id", encoding_artifacts("text").alias("a")).collect()
    }
    assert got[0] == (0, 0, 0)
    assert got[1] == (2, 0, 0)
    assert got[2] == (0, 3, 0)
    assert got[3] == (0, 2, 0)
    assert got[4] == (0, 0, 2)  # \t and \n are NOT artifacts
    assert got[5] == (0, 0, 0)  # real non-ASCII text must not false-positive
