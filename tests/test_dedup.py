"""Dedup-operator tests on planted duplicates (operators/dedup.py)."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_native_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "spark engines shuffle data across partitions while queries aggregate rows into results"
    rows = [
        (0, base),
        (1, base.upper() + "  "),  # exact dup after normalization
        (2, base.replace("aggregate", "combine")),  # near dup (1 word)
        (3, "completely different text about cooking pasta with tomatoes and basil in a pan"),
        (4, "yet another unrelated document mentioning mountains rivers forests and hiking trails"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = exact_dedup(docs).collect()
    by_kept = {r["kept_id"]: r["dup_count"] for r in out}
    assert by_kept[0] == 2  # 0 and 1 collapse
    assert by_kept[2] == 1 and by_kept[3] == 1 and by_kept[4] == 1
    assert len(out) == 4


def test_deduplicate_keeps_winners(docs):
    from valentinus_spark.operators.dedup import deduplicate

    kept = deduplicate(docs).collect()
    assert {r["doc_id"] for r in kept} == {0, 2, 3, 4}  # 1 is the dup of 0
    assert all(len(r) == 2 for r in kept)  # original columns preserved


def test_ngram_jaccard(docs):
    out = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert pairs[(0, 1)] == 1.0  # identical after normalize
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert all(a < b for (a, b) in pairs)
    assert not any(3 in p or 4 in p for p in pairs)


def test_ngram_max_df_drops_boilerplate_shingles(spark):
    """A boilerplate shingle shared by d docs alone generates d(d-1)/2 join
    rows; max_df (default ON) drops it. Docs that only share boilerplate
    must produce NO pair under the cap, while exact mode (max_df=None)
    still scores them."""
    boiler = "copyright acme corp all rights reserved"
    rows = [(i, f"{boiler} unique{i} body{i} text{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(df, n=3, threshold=0.1, max_df=10).collect()
    assert capped == []  # every shared shingle is boilerplate → dropped
    exact = ngram_jaccard_pairs(df, n=3, threshold=0.1, max_df=None).collect()
    assert len(exact) == 40 * 39 / 2  # boilerplate alone clears J >= 0.1


def test_minhash_lsh_finds_planted_dups(docs):
    out = minhash_lsh_pairs(docs, n=3, threshold=0.5, num_hash_tables=5)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_native_matches_exact_jaccard(docs):
    """Native minhash candidates are exact-verified, so its output must be
    a subset of the exact Jaccard join — and at J≥0.5 with 4×4 bands the
    planted dups must be recalled."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    native = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_native_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert set(native) <= set(exact)
    assert (0, 1) in native and (0, 2) in native
    for pair, j in native.items():
        assert abs(j - exact[pair]) < 1e-9  # verified jaccard is exact


def test_simhash_pairs(docs):
    from valentinus_spark.functions.text import (
        normalize_text,
        pack_simhash,
        simhash_counts,
        word_tokens,
    )

    # brute-force expectation from the raw hashes
    hashed = (
        docs.select("doc_id", word_tokens(normalize_text("text")).alias("_toks"))
        .withColumn("_counts", simhash_counts("_toks"))
        .select("doc_id", pack_simhash("_counts").alias("sh"))
        .collect()
    )
    sh = {r["doc_id"]: r["sh"] for r in hashed}

    def ham(a, b):
        return bin((sh[a] ^ sh[b]) & (2**64 - 1)).count("1")

    for budget in (3, 16):
        expected = {
            (a, b): ham(a, b)
            for a in sh
            for b in sh
            if a < b and ham(a, b) <= budget
        }
        out = simhash_pairs(docs, max_hamming=budget).collect()
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
        assert got == expected, f"budget={budget}"
    assert ham(0, 1) == 0  # identical normalized text → same simhash


def test_sha_hash60_matches_hashlib(spark):
    """The portable 60-bit hash must equal int(sha256-hex[:15], 16) — the
    exact contract the DuckDB oracle SQL relies on
    (('0x'||substr(sha256(x),1,15))::UBIGINT)."""
    import hashlib

    from valentinus_spark.functions.text import sha_hash60

    vals = ["abc", "0:shingle text here", "üñïçødé"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", sha_hash60("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == int(hashlib.sha256(v.encode()).hexdigest()[:15], 16)


def test_minhash_sha256_variant_matches_exact_jaccard(docs):
    """hash_fn="sha256" (the oracle-reproducible path) must behave like
    the default: exact-verified subset of the all-pairs Jaccard join with
    the planted dups recalled."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    # 8 bands of 2 rows: recall 1-(1-J^2)^8 ≈ 0.94 at the J≈0.55 planted
    # near-dup (4×4's ≈0.32 recalls it only on hash luck — the xxhash64
    # default happens to, the sha variant happens not to; both correct)
    native = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_native_pairs(
            docs, n=3, threshold=0.5, hash_fn="sha256", num_hashes=16, bands=8
        ).collect()
    }
    assert set(native) <= set(exact)
    assert (0, 1) in native and (0, 2) in native
    for pair, j in native.items():
        assert abs(j - exact[pair]) < 1e-9


def test_simhash_sha256_variant(docs):
    """60-bit portable simhash: identical-after-normalization docs are a
    Hamming-0 pair, every emitted pair is within budget, and hashes fit in
    60 bits (the BIGINT-safe range both engines share)."""
    from valentinus_spark.functions.text import (
        normalize_text,
        pack_simhash,
        simhash_counts,
        word_tokens,
    )

    hashed = (
        docs.select("doc_id", word_tokens(normalize_text("text")).alias("_toks"))
        .withColumn("_counts", simhash_counts("_toks", bits=60, hash_fn="sha256"))
        .select("doc_id", pack_simhash("_counts", bits=60).alias("sh"))
        .collect()
    )
    assert all(0 <= r["sh"] < 2**60 for r in hashed)
    out = simhash_pairs(docs, max_hamming=3, hash_fn="sha256").collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs[(0, 1)] == 0
    assert all(h <= 3 for h in pairs.values())


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_neardup_pairs(df, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 1)}
    assert out[0]["cosine"] > 0.99


def test_embedding_neardup_lsh_matches_exact(spark):
    """Scale path (LSH candidates + exact verify) returns the identical
    pair set and scores as the O(n²) exact baseline on real testdata."""
    from valentinus_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 4)
        for r in embedding_neardup_pairs(df, threshold=0.35).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 4)
        for r in embedding_neardup_pairs_lsh(
            df, threshold=0.35, bucket_length=8.0, num_hash_tables=12
        ).collect()
    }
    assert exact and lsh == exact


def test_connected_components_matches_python(spark):
    from valentinus_spark.operators.dedup import connected_components

    # two chains, one triangle, one isolated pair: {1,2,3,4} {10,11} {20,21,22}
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"] for r in connected_components(pdf).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_string_ids_deep_chain(spark):
    """Regression: string ids (the collection API's own 'id{i}' format) used
    to break the numeric-cast convergence witness — ANSI throws, non-ANSI
    NULLs the sum and stops after one round, wrong for diameter >= 2."""
    from valentinus_spark.operators.dedup import connected_components

    pairs = [("id0", "id1"), ("id1", "id2"), ("id2", "id3"), ("id3", "id4"),
             ("id7", "id8")]
    pdf = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {r["id"]: r["cluster_id"] for r in connected_components(pdf).collect()}
    assert got == {
        "id0": "id0", "id1": "id0", "id2": "id0", "id3": "id0", "id4": "id0",
        "id7": "id7", "id8": "id7",
    }


def test_connected_components_distributed_path(spark):
    """Force the distributed min-label rounds (driver_threshold=0) — the
    100 TB path must stay green even while small graphs take the
    driver union-find fast path."""
    from valentinus_spark.operators.dedup import connected_components

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pdf, driver_threshold=0).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_distributed_string_deep_chain(spark):
    from valentinus_spark.operators.dedup import connected_components

    pairs = [("id0", "id1"), ("id1", "id2"), ("id2", "id3"), ("id3", "id4"),
             ("id7", "id8")]
    pdf = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pdf, driver_threshold=0).collect()
    }
    assert got == {
        "id0": "id0", "id1": "id0", "id2": "id0", "id3": "id0", "id4": "id0",
        "id7": "id7", "id8": "id7",
    }


def test_connected_components_star_distributed_path(spark):
    from valentinus_spark.operators.dedup import connected_components_star

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components_star(pdf, driver_threshold=0).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_clusters_includes_singletons(spark):
    from valentinus_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "id_a long, id_b long")
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert got[0] == (0, 3) and got[1] == (0, 3) and got[2] == (0, 3)
    assert got[5] == (5, 2) and got[6] == (5, 2)
    for single in (3, 4, 7):
        assert got[single] == (single, 1)


def test_benchmark_contamination(spark):
    from valentinus_spark.operators.contamination import benchmark_contamination

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),  # fully inside bench doc
            (1, "quick brown fox somewhere else entirely today"),  # partial overlap
            (2, "completely unrelated text about cooking pasta"),  # zero overlap
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "prefix words the quick brown fox jumps over the lazy dog suffix")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contamination"])
        for r in benchmark_contamination(corpus, bench, n=3).collect()
    }
    assert got[0][0] == 7 and got[0][1] == 7 and got[0][2] == 1.0  # all 3-grams hit
    assert got[1][1] == 1  # only "quick brown fox"
    assert got[2] == (4, 0, 0.0)  # zero-hit doc still reported (6 words -> 4 3-grams)


def test_pack_assignments_matches_python(spark):
    from valentinus_spark.operators.packing import pack_assignments

    toks = [(i, (i * 37) % 90 + (10 if i % 5 else 0)) for i in range(200)]
    df = spark.createDataFrame(toks, "doc_id long, n_tokens long")
    # bucket_size=16 → 13 buckets: exercises the two-level prefix sum
    got = {
        r["doc_id"]: (r["token_start"], r["token_end"], r["pack_first"], r["pack_last"])
        for r in pack_assignments(df, budget=100, bucket_size=16).collect()
    }
    cum = 0
    for i, n in toks:
        start, end = cum, cum + n
        cum = end
        expect = (start, end, start // 100, max((end - 1) // 100, start // 100))
        assert got[i] == expect, f"doc {i}"
    # some doc must actually span a pack boundary for the test to mean much
    assert any(a != b for (_, _, a, b) in got.values())


def test_pack_assignments_zero_token_doc(spark):
    from valentinus_spark.operators.packing import pack_assignments

    df = spark.createDataFrame(
        [(0, 100), (1, 0), (2, 50)], "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["token_start"], r["token_end"], r["pack_first"], r["pack_last"])
        for r in pack_assignments(df, budget=100, bucket_size=10).collect()
    }
    # doc 1 is empty and sits exactly on the boundary: it belongs to pack 1
    # (where it would start), not pack 0
    assert got[1] == (100, 100, 1, 1)
    assert got[2] == (100, 150, 1, 1)


def test_incremental_dedup_anti_join_and_in_batch(spark):
    from valentinus_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "existing corpus document")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "THE  quick brown fox"),  # dup of corpus doc 0 after normalize
            (11, "a genuinely new document"),
            (12, "a genuinely NEW document"),  # in-batch dup of 11; 11 wins
            (13, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in incremental_dedup(incoming, corpus).collect()
    )
    assert got == [11, 13]


def test_incremental_dedup_preserves_columns(spark):
    from valentinus_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame([(0, "x", "en")], "doc_id long, text string, lang string")
    incoming = spark.createDataFrame([(1, "y", "fr")], "doc_id long, text string, lang string")
    rows = incremental_dedup(incoming, corpus).collect()
    assert [tuple(r) for r in rows] == [(1, "y", "fr")]


def test_duplicated_span_stats_exact_counts(spark):
    from valentinus_spark.operators.dedup import duplicated_span_stats

    # 7 tokens -> 3 distinct 5-gram spans per doc; docs 0 and 1 share their
    # first 6 tokens -> spans 1..2 shared, span 3 unique to each
    base = "alpha beta gamma delta epsilon zeta"
    d0 = base + " omega"
    d1 = base + " sigma"
    d2 = "totally different words in this one here"
    df = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["shared_spans"], r["shared_frac"])
        for r in duplicated_span_stats(df, n=5, max_df=None).collect()
    }
    assert got[0] == (3, 2, round(2 / 3, 4))
    assert got[1] == (3, 2, round(2 / 3, 4))
    assert got[2] == (3, 0, 0.0)


def test_duplicated_span_stats_short_doc_rule(spark):
    from valentinus_spark.operators.dedup import duplicated_span_stats

    # <= n tokens: the whole doc is ONE span; identical short docs share it
    df = spark.createDataFrame(
        [(0, "tiny doc"), (1, "tiny doc"), (2, "other")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["shared_spans"])
        for r in duplicated_span_stats(df, n=5, max_df=None).collect()
    }
    assert got[0] == (1, 1) and got[1] == (1, 1) and got[2] == (1, 0)


def test_duplicated_span_stats_max_df_cap_keeps_shared_flag(spark):
    from valentinus_spark.operators.dedup import duplicated_span_stats

    # boilerplate span in every doc: capping df must still mark it shared
    df = spark.createDataFrame(
        [(i, "same boilerplate line everywhere") for i in range(6)],
        "doc_id long, text string",
    )
    got = duplicated_span_stats(df, n=5, max_df=3).collect()
    assert all(r["shared_spans"] == r["n_spans"] for r in got)


def _cc_oracle(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_star_cc_long_chain(spark):
    """A 200-link chain needs 200 min-label iterations but only O(log n)
    star rounds — the adversarial-diameter case the star variant exists
    for."""
    from valentinus_spark.operators.dedup import connected_components_star

    chain = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components_star(df, max_iter=15, driver_threshold=0).collect()
    }
    assert got == {i: 0 for i in range(201)}


def test_star_cc_matches_union_find_random(spark):
    import random

    from valentinus_spark.operators.dedup import connected_components_star

    rnd = random.Random(42)
    pairs = [(rnd.randrange(300), rnd.randrange(300)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components_star(df, driver_threshold=0).collect()
    }
    assert got == _cc_oracle(pairs)


def test_star_cc_string_ids(spark):
    from valentinus_spark.operators.dedup import connected_components_star

    pairs = [("d", "c"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components_star(df, driver_threshold=0).collect()
    }
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_star_cc_agrees_with_min_label(spark):
    from valentinus_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    a = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
    b = {r["id"]: r["cluster_id"] for r in connected_components_star(df).collect()}
    assert a == b


def test_corpus_diff_statuses(spark):
    from valentinus_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(0, "same text"), (1, "will change"), (2, "to be removed")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(0, "SAME   text"), (1, "changed now"), (3, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    # normalize_text makes doc 0 identical despite case/whitespace
    assert got == {0: "unchanged", 1: "modified", 2: "removed", 3: "added"}


def test_source_overlap_counts(spark):
    from valentinus_spark.operators.dedup import source_overlap

    rows = [
        (0, "sa", "shared one"),
        (1, "sb", "SHARED   one"),   # same digest as 0 after normalize
        (2, "sa", "also shared"),
        (3, "sc", "also shared"),
        (4, "sb", "also shared"),
        (5, "sa", "unique to a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["group_a"], r["group_b"]): r["shared"]
        for r in source_overlap(df).collect()
    }
    assert got == {("sa", "sb"): 2, ("sa", "sc"): 1, ("sb", "sc"): 1}


def test_source_overlap_span_mode(spark):
    from valentinus_spark.operators.dedup import source_overlap

    rows = [
        (0, "sa", "alpha beta gamma delta epsilon zeta"),
        (1, "sb", "alpha beta gamma delta epsilon eta"),  # shares 2 of 2 5-grams? no:
        # sa spans: 'a b g d e', 'b g d e z'; sb: 'a b g d e', 'b g d e eta' -> 1 shared
        (2, "sc", "completely different words here now ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["group_a"], r["group_b"]): r["shared"]
        for r in source_overlap(df, unit="span", n=5).collect()
    }
    assert got == {("sa", "sb"): 1}


def test_incremental_neardup_fuzzy_match(spark):
    from valentinus_spark.operators.dedup import incremental_neardup

    corpus = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            # near-dup of corpus doc 0: one word changed at the end
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            # unrelated
            (11, "completely different content about spark pipelines here"),
            # exact dup of corpus (also a near-dup at J=1.0)
            (12, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_neardup(
            incoming, corpus, threshold=0.6, max_df=None
        ).collect()
    )
    assert got == [11]
    # a stricter threshold lets the near-dup (but not the exact dup) through
    strict = sorted(
        r["doc_id"]
        for r in incremental_neardup(
            incoming, corpus, threshold=0.99, max_df=None
        ).collect()
    )
    assert strict == [10, 11]


def test_minhash_signatures_are_distinct_hash_families(spark):
    """Regression pin for the two-parameter-lambda footgun: PySpark binds
    a second lambda parameter to the ARRAY INDEX, so a captured per-hash
    salt (`lambda s, i=i: xxhash64(lit(i), s)`) silently collapses all
    signatures to one hash family — banding degenerates to a single
    band. The 16 signature values of a multi-shingle doc must not be
    (near-)identical."""
    from pyspark.sql import functions as F

    from valentinus_spark.operators.dedup import _shingle_sets

    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten eleven twelve")],
        "doc_id long, text string",
    )
    sh = _shingle_sets(df, "doc_id", "text", 3)
    ex = sh.select("_id", F.explode("_shingles").alias("_s"))
    sig = ex.groupBy("_id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("_s"))).alias(f"h{i}") for i in range(16)]
    ).first()
    values = [sig[f"h{i}"] for i in range(16)]
    # 16 mins over 10 shingles from independent families: collisions of
    # ALL values would need identical families; require near-all distinct
    assert len(set(values)) >= 12, values


def test_cluster_canonical_prefers_quality_then_id(spark):
    from pyspark.sql import functions as F

    from valentinus_spark.operators.dedup import cluster_canonical

    rows = [
        # cluster 0: doc 2 longest -> canonical; 0 and 1 point at it
        (0, 0, 10), (1, 0, 20), (2, 0, 30),
        # cluster 5: tie on quality -> lowest doc_id wins
        (5, 5, 7), (6, 5, 7),
        # singleton
        (9, 9, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long, n_chars long")
    out = {
        r["doc_id"]: (r["canonical_id"], r["is_canonical"])
        for r in cluster_canonical(
            df, [F.col("n_chars").desc(), F.col("doc_id").asc()]
        ).collect()
    }
    assert out == {
        0: (2, False), 1: (2, False), 2: (2, True),
        5: (5, True), 6: (5, False),
        9: (9, True),
    }


def test_remove_duplicated_spans_matches_python_reference(spark):
    """Span removal vs a direct Python implementation of the rule: every
    duplicated n-gram keeps only its min-(id, pos) occurrence; other
    occurrences delete the union of their positions. Includes overlap,
    within-doc repetition, a fully-deleted doc, and a blank doc."""
    import re as _re

    from valentinus_spark.operators.dedup import remove_duplicated_spans

    n = 3
    rows = [
        (0, "a b c d e f"),            # keeper of 'a b c' etc.
        (1, "a b c d x y z"),          # overlaps doc 0's spans
        (2, "a b c d e f"),            # fully duplicated -> everything dies
        (3, "q q q q q q q q"),        # within-doc repetition of 'q q q'
        (4, "unique words only here"),
        (5, "   "),                    # blank
    ]

    def norm_tokens(t):
        t = _re.sub(r"\s+", " ", t.lower()).strip()
        return t.split(" ") if t else []

    toks = {i: norm_tokens(t) for i, t in rows}
    occs = {}
    for i, ws in toks.items():
        for p in range(len(ws) - n + 1):
            occs.setdefault(tuple(ws[p : p + n]), []).append((i, p))
    dead = {i: set() for i in toks}
    for span, where in occs.items():
        if len(where) > 1:
            keeper = min(where)
            for i, p in where:
                if (i, p) != keeper:
                    dead[i].update(range(p, p + n))
    expect = {}
    for i, ws in toks.items():
        keptw = [w for p, w in enumerate(ws) if p not in dead[i]]
        expect[i] = (len(ws), len(keptw), " ".join(keptw))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["clean_text"])
        for r in remove_duplicated_spans(df, n=n).collect()
    }
    assert got == expect
    assert got[2][1] == 0          # fully-deleted doc survives as a row
    assert got[5] == (0, 0, "")    # blank doc passes through


def test_minhash_hot_shingle_skew_does_not_cobucket(spark):
    """Adversarial skew (VERDICT r3 item 6): 20% of docs open with the
    SAME boilerplate trigram but are otherwise unique. A hot shingle
    must not co-bucket its carriers — the band key hashes an r=4
    signature slice and one shared shingle wins a single min with
    probability ~1/|set| — so the largest (band, key) bucket stays at
    the true duplicate-class size (planted: 2) and the verified output
    is exactly the planted pairs."""
    from pyspark.sql import functions as F

    from valentinus_spark.operators.dedup import (
        _minhash_banded,
        _shingle_sets,
        minhash_native_pairs,
    )

    rows = []
    for i in range(1500):
        uniq = " ".join(f"u{i}x{j}" for j in range(12))
        if i < 300:  # 20% carry the hot boilerplate trigram
            rows.append((i, "common boiler plate " + uniq))
        else:
            rows.append((i, uniq))
    for k in range(10):  # planted exact dups (pair ids 2000+k <-> k)
        rows.append((2000 + k, rows[k][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    shingled = _shingle_sets(df, "doc_id", "text", 3)
    banded = _minhash_banded(shingled, 16, 4, "xxhash64")
    top = (
        banded.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert top <= 4, f"hot shingle co-bucketed {top} docs in one band bucket"

    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_native_pairs(df, "doc_id", "text", n=3, threshold=0.8).collect()
    }
    assert got == {(k, 2000 + k) for k in range(10)}


def test_connected_components_star_hot_hub_distributed(spark):
    """Skew through the distributed CC path (driver_threshold=0 forces
    the star rounds even for a small fixture): one hub carries 20% of
    all edges (a star), plus a 60-link chain and disjoint pairs. The
    alternating large-star/small-star rounds must produce exactly the
    union-find components — hub skew concentrates one groupBy key but
    cannot break correctness, and the chain proves O(log n) round
    convergence handles long diameters."""
    from valentinus_spark.operators.dedup import connected_components_star

    edges = []
    edges += [(0, i) for i in range(100, 400)]  # hot hub: 300 edges at node 0
    edges += [(1000 + i, 1001 + i) for i in range(60)]  # 60-link chain
    edges += [(5000 + 2 * i, 5001 + 2 * i) for i in range(200)]  # disjoint pairs
    df = spark.createDataFrame(edges, "id_a long, id_b long")

    # expected components via plain union-find in the test
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}

    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components_star(df, driver_threshold=0).collect()
    }
    assert got == expected
    assert got[399] == 0 and got[1060] == 1000 and got[5399] == 5398


def test_epoch_shuffle_permutation_properties(spark):
    """epoch_shuffle: positions form 0..n_s-1 per shard, the permutation
    is reproducible, differs across epochs, and is stable per row under
    corpus growth (a doc's (shard, position-hash-key) never depends on
    other rows' presence — only its rank does)."""
    from pyspark.sql import functions as F

    from valentinus_spark.operators.packing import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    e0 = epoch_shuffle(df, "doc_id", epoch=0, n_shards=4)
    rows = e0.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    assert sum(len(v) for v in by_shard.values()) == 500
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))  # dense 0..n-1
    # reproducible
    again = {(r["doc_id"], r["shard"], r["position"]) for r in e0.collect()}
    assert again == {(r["doc_id"], r["shard"], r["position"]) for r in rows}
    # epoch changes the permutation
    e1 = {(r["doc_id"]): (r["shard"], r["position"]) for r in
          epoch_shuffle(df, "doc_id", epoch=1, n_shards=4).collect()}
    moved = sum(1 for r in rows if e1[r["doc_id"]] != (r["shard"], r["position"]))
    assert moved > 400
    # validation
    import pytest as _pytest
    with _pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", n_shards=0)


def test_temperature_mixture_weights_math_and_cap(spark):
    """temperature_mixture_weights: tau=1 is identity (repeat 1.0
    everywhere), tau=2 square-roots shares, a binding cap pins the heavy
    stratum and renormalizes the rest to sum 1."""
    import math

    from valentinus_spark.operators.mixture import temperature_mixture_weights

    rows = [(i, "big" if i < 800 else ("mid" if i < 950 else "small"), 10)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, source string, n_chars long")

    t1 = {r["source"]: r for r in
          temperature_mixture_weights(df, "source", "n_chars", tau=1.0).collect()}
    for r in t1.values():
        assert abs(r["repeat_factor"] - 1.0) < 1e-6
    assert abs(t1["big"]["p_raw"] - 0.8) < 1e-6

    t2 = {r["source"]: r for r in
          temperature_mixture_weights(df, "source", "n_chars", tau=2.0).collect()}
    z = math.sqrt(0.8) + math.sqrt(0.15) + math.sqrt(0.05)
    assert abs(t2["big"]["p_target"] - math.sqrt(0.8) / z) < 1e-5
    assert abs(sum(r["p_target"] for r in t2.values()) - 1.0) < 1e-5

    t2c = {r["source"]: r for r in
           temperature_mixture_weights(df, "source", "n_chars", tau=2.0, cap=0.5).collect()}
    assert t2c["big"]["p_target"] == 0.5
    assert abs(sum(r["p_target"] for r in t2c.values()) - 1.0) < 1e-5
    # uncapped strata keep their relative proportions
    ratio = t2c["mid"]["p_target"] / t2c["small"]["p_target"]
    assert abs(ratio - math.sqrt(0.15) / math.sqrt(0.05)) < 1e-4

    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_mixture_weights(df, "source", tau=0.5)
    with _pytest.raises(ValueError):
        temperature_mixture_weights(df, "source", cap=0.0)


def test_temperature_mixture_infeasible_cap_raises(spark):
    """cap * n_strata < 1 admits NO distribution summing to 1; the old
    code silently pinned every stratum at cap (targets summing to
    n*cap) with NULL-poisoned repeat factors (r4 ADVICE, mixture.py:66).
    The in-plan assert_true guard must raise at evaluation, and a
    boundary-feasible cap (= 1/n) must still work."""
    import pytest as _pytest

    from valentinus_spark.operators.mixture import temperature_mixture_weights

    rows = [(i, "s%d" % (i % 4), 10) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, source string, n_chars long")

    with _pytest.raises(Exception, match="infeasible mixture cap"):
        temperature_mixture_weights(df, "source", "n_chars", tau=2.0, cap=0.2).collect()

    # cap exactly 1/n is feasible: uniform pinning sums to 1
    ok = temperature_mixture_weights(df, "source", "n_chars", tau=2.0, cap=0.25).collect()
    assert abs(sum(r["p_target"] for r in ok) - 1.0) < 1e-5


def test_incremental_components_equals_full_recompute(spark):
    """The delta-merge invariant: incremental_components(labeling(old),
    delta) == connected_components(old ∪ delta), across the four delta
    shapes — merge two old clusters, extend one, brand-new cluster,
    untouched clusters pass through."""
    from valentinus_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    old = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31), (40, 41)]
    new = [
        (3, 10),    # merges {1,2,3} with {10,11}
        (21, 22),   # extends {20,21}
        (50, 51),   # brand-new component
    ]
    old_df = spark.createDataFrame(old, "id_a long, id_b long")
    new_df = spark.createDataFrame(new, "id_a long, id_b long")

    labeling = connected_components(old_df, "id_a", "id_b")
    inc = {
        (r["id"], r["cluster_id"])
        for r in incremental_components(labeling, new_df).collect()
    }
    full = {
        (r["id"], r["cluster_id"])
        for r in connected_components(
            old_df.unionByName(new_df), "id_a", "id_b"
        ).collect()
    }
    assert inc == full
    got = dict(inc)
    assert got[11] == 1 and got[22] == 20 and got[51] == 50
    assert got[30] == 30 and got[40] == 40  # untouched pass-through


def test_incremental_components_seed_absent_from_labeling(spark):
    """A delta pair touching an id the labeling has never seen treats it
    as an implicit singleton."""
    from valentinus_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    labeling = connected_components(
        spark.createDataFrame([(1, 2)], "id_a long, id_b long"), "id_a", "id_b"
    )
    new_df = spark.createDataFrame([(99, 2)], "id_a long, id_b long")
    got = {
        (r["id"], r["cluster_id"])
        for r in incremental_components(labeling, new_df).collect()
    }
    assert got == {(1, 1), (2, 1), (99, 1)}


def test_dedup_paragraphs_first_occurrence_wins(spark):
    """Corpus-wide paragraph dedup: keeper = min (id, pos); later
    occurrences (whitespace-insensitive) are deleted and docs rebuilt in
    original order."""
    from valentinus_spark.operators.dedup import dedup_paragraphs

    rows = [
        (1, "A\n\nB\n\nC"),
        (2, "B \n\nD"),   # B duplicates doc1's (trim-normalized)
        (3, "A"),          # fully redundant
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert got[1]["clean_text"] == "A\n\nB\n\nC"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 3)
    assert got[2]["clean_text"] == "D"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)
    assert got[3]["clean_text"] == ""
    assert (got[3]["n_paras"], got[3]["n_kept"]) == (1, 0)


def test_dedup_paragraphs_within_doc_repeat(spark):
    """A paragraph repeated inside ONE doc keeps only its first copy."""
    from valentinus_spark.operators.dedup import dedup_paragraphs

    df = spark.createDataFrame(
        [(7, "X\n\nY\n\nX\n\nZ")], "doc_id long, text string"
    )
    r = dedup_paragraphs(df).collect()[0]
    assert r["clean_text"] == "X\n\nY\n\nZ"
    assert (r["n_paras"], r["n_kept"]) == (4, 3)


def test_token_budget_sample_exact_prefix(spark):
    """Per-stratum hash-order prefix whose inclusive token sum fits the
    budget; deterministic across runs; over-budget docs drop whole."""
    import hashlib

    from valentinus_spark.operators.mixture import token_budget_sample

    rows = [(i, "a" if i < 8 else "b", 10) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    budgets = spark.createDataFrame(
        [("a", 35), ("b", 1000)], "source string, budget_tokens long"
    )
    got = token_budget_sample(docs, budgets).collect()
    a_ids = sorted(r["doc_id"] for r in got if r["source"] == "a")
    b_ids = sorted(r["doc_id"] for r in got if r["source"] == "b")
    assert b_ids == [8, 9, 10, 11]  # budget ample: all of b
    assert len(a_ids) == 3  # 3 * 10 <= 35 < 4 * 10

    # python oracle: the same sha order picks the same prefix
    def h(i):
        return hashlib.sha256(f"v1\x1f{i}".encode()).hexdigest()

    expect = sorted(sorted(range(8), key=h)[:3])
    assert a_ids == expect

    again = sorted(
        r["doc_id"] for r in token_budget_sample(docs, budgets).collect()
        if r["source"] == "a"
    )
    assert again == a_ids
