"""Tests for the r9 corpus-analysis additions: dedup_threshold_curve,
boilerplate_line_stats, script_profile, top_ngrams, and
EmbeddingCollection.upsert."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.cleaning import boilerplate_line_stats
from valentinus_spark.operators.collocations import top_ngrams
from valentinus_spark.operators.dedup import dedup_threshold_curve
from valentinus_spark.operators.quality import script_profile


# ---------------------------------------------------------------- curve


def test_threshold_curve_counts_and_monotonicity(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),  # J=1.0 with 1
        (3, "alpha beta gamma delta zeta"),  # J=0.5 with 1/2
        (4, "totally different words entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r.threshold: r
        for r in dedup_threshold_curve(
            df, thresholds=(0.4, 0.9), max_df=None
        ).collect()
    }
    assert out[0.4].n_pairs == 3  # (1,2) J=1; (1,3),(2,3) J=0.5
    assert out[0.4].n_docs_flagged == 3
    assert out[0.9].n_pairs == 1
    assert out[0.9].n_docs_flagged == 2
    assert out[0.9].frac_docs_flagged == 0.5
    # monotone non-increasing in threshold
    assert out[0.9].n_pairs <= out[0.4].n_pairs


def test_threshold_curve_zero_rows_kept(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "four five six")], "doc_id int, text string"
    )
    rows = dedup_threshold_curve(df, thresholds=(0.5,), max_df=None).collect()
    assert len(rows) == 1
    assert rows[0].n_pairs == 0 and rows[0].n_docs_flagged == 0
    assert rows[0].frac_docs_flagged == 0.0


def test_threshold_curve_empty_thresholds_raises(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError):
        dedup_threshold_curve(df, thresholds=())


# ---------------------------------------------------------- boilerplate


def test_boilerplate_lines_detects_repeated_footer(spark):
    footer = "Copyright Example Corp all rights reserved"
    rows = [
        (1, "s1", f"Article one body text.\n{footer}"),
        (2, "s1", f"Article two body text.\n{footer}"),
        (3, "s1", f"Article three body text.\n{footer}"),
        (4, "s1", "Article four stands alone."),
        (5, "s2", "Clean source doc one.\nUnique line."),
        (6, "s2", "Clean source doc two.\nAnother unique line."),
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = {r.source: r for r in boilerplate_line_stats(df, min_frac=0.5).collect()}
    assert out["s1"].n_docs == 4
    assert out["s1"].n_boilerplate_lines == 1
    assert out["s1"].n_docs_affected == 3
    assert out["s1"].boilerplate_occurrences == 3
    # clean group keeps its zero row
    assert out["s2"].n_boilerplate_lines == 0
    assert out["s2"].n_docs_affected == 0


def test_boilerplate_lines_within_doc_repeat_not_counted_twice(spark):
    # the same line twice in ONE doc counts as df=1 (distinct per doc)
    rows = [
        (1, "s", "repeat me\nrepeat me"),
        (2, "s", "repeat me\nother"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = boilerplate_line_stats(df, min_frac=0.9).collect()[0]
    assert out.n_boilerplate_lines == 1
    assert out.boilerplate_occurrences == 2  # df, not raw occurrences


def test_boilerplate_lines_bad_frac_raises(spark):
    df = spark.createDataFrame([(1, "s", "x")], "doc_id int, source string, text string")
    with pytest.raises(ValueError):
        boilerplate_line_stats(df, min_frac=0.0)


# --------------------------------------------------------------- script


def test_script_profile_counts_and_dominance(spark):
    rows = [
        (1, "en", "hello world"),  # latin
        (2, "en", "привет мир"),  # cyrillic, mismatch
        (3, "ru", "привет мир"),  # cyrillic, ok
        (4, "xx", "hello"),  # unknown lang -> NULL flag
        (5, "en", "12345 !!"),  # no script chars -> dominant none
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    out = {r.doc_id: r for r in script_profile(df, lang_col="lang").collect()}
    assert out[1].dominant_script == "latin" and out[1].script_mismatch is False
    assert out[2].dominant_script == "cyrillic" and out[2].script_mismatch is True
    assert out[2].n_cyrillic == 9
    assert out[3].script_mismatch is False
    assert out[4].script_mismatch is None
    assert out[5].dominant_script == "none"


def test_script_profile_tie_prefers_earlier_script(spark):
    # equal latin and cyrillic counts: precedence order wins
    df = spark.createDataFrame([(1, "ab аб")], "doc_id int, text string")
    row = script_profile(df).collect()[0]
    assert row.n_latin == 2 and row.n_cyrillic == 2
    assert row.dominant_script == "latin"


def test_script_profile_no_lang_col_omits_flag(spark):
    df = spark.createDataFrame([(1, "hi")], "doc_id int, text string")
    assert "script_mismatch" not in script_profile(df).columns


# ------------------------------------------------------------ top_ngrams


def test_top_ngrams_rank_and_tiebreak(spark):
    rows = [
        (1, "en", "a b c a b c a b c"),  # 'a b c' x3 (+ wraps)
        (2, "en", "x y z"),
        (3, "de", "k l m"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    out = top_ngrams(df, n=3, k=2).collect()
    en = [r for r in out if r.lang == "en"]
    assert en[0].ngram == "a b c" and en[0].n_occurrences == 3 and en[0].rank == 1
    # ties broken lexicographically: 'b c a' (2) beats 'c a b' (2)
    assert en[1].ngram == "b c a"
    de = [r for r in out if r.lang == "de"]
    assert len(de) == 1 and de[0].ngram == "k l m"


def test_top_ngrams_short_docs_excluded(spark):
    df = spark.createDataFrame([(1, "en", "one two")], "doc_id int, lang string, text string")
    assert top_ngrams(df, n=3, k=3).count() == 0


def test_top_ngrams_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "en", "a b c")], "doc_id int, lang string, text string")
    with pytest.raises(ValueError):
        top_ngrams(df, k=0)


# --------------------------------------------------------------- upsert


def _mk_collection(spark, tmp_path, name):
    from valentinus_spark.collection import CollectionCatalog, EmbeddingCollection
    from valentinus_spark.embed import HashEmbedder

    catalog = CollectionCatalog(spark, warehouse=str(tmp_path))
    base = spark.createDataFrame(
        [("a", "alpha doc"), ("b", "beta doc"), ("c", "gamma doc")],
        "id string, document string",
    )
    col = EmbeddingCollection.from_dataframe(
        spark, base, name, embedder=HashEmbedder(dim=8), catalog=catalog
    ).save()
    return col, catalog


def test_upsert_replaces_and_inserts(spark, tmp_path):
    col, _ = _mk_collection(spark, tmp_path, "ups1")
    batch = spark.createDataFrame(
        [("b", "beta doc REVISED"), ("d", "delta doc")],
        "id string, document string",
    )
    col.upsert(batch)
    rows = {r.id: r.document for r in col.df.select("id", "document").collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    assert rows["b"] == "beta doc REVISED"
    # every row has an embedding (batch was embedded, survivors kept theirs)
    assert col.df.filter(F.col("embedding").isNull()).count() == 0


def test_upsert_reembeds_replaced_docs(spark, tmp_path):
    from valentinus_spark.embed import HashEmbedder

    col, _ = _mk_collection(spark, tmp_path, "ups2")
    before = col.df.filter(F.col("id") == "b").select("embedding").collect()[0][0]
    col.upsert(
        spark.createDataFrame([("b", "changed entirely")], "id string, document string")
    )
    after = col.df.filter(F.col("id") == "b").select("embedding").collect()[0][0]
    assert list(before) != list(after)
    assert list(after) == [
        float(v) for v in HashEmbedder(dim=8).embed_texts(["changed entirely"])[0]
    ]


def test_upsert_duplicate_batch_ids_raise(spark, tmp_path):
    from valentinus_spark.errors import BatchError

    col, _ = _mk_collection(spark, tmp_path, "ups3")
    dup = spark.createDataFrame(
        [("x", "one"), ("x", "two")], "id string, document string"
    )
    with pytest.raises(BatchError):
        col.upsert(dup)


def test_upsert_unsaved_collection_raises(spark, tmp_path):
    from valentinus_spark.collection import CollectionCatalog, EmbeddingCollection
    from valentinus_spark.embed import HashEmbedder
    from valentinus_spark.errors import NotFoundError

    catalog = CollectionCatalog(spark, warehouse=str(tmp_path))
    col = EmbeddingCollection.from_dataframe(
        spark,
        spark.createDataFrame([("a", "doc")], "id string, document string"),
        "ups4",
        embedder=HashEmbedder(dim=8),
        catalog=catalog,
    )
    with pytest.raises(NotFoundError):
        col.upsert(spark.createDataFrame([("b", "x")], "id string, document string"))


def test_upsert_marks_ann_index_stale(spark, tmp_path):
    col, catalog = _mk_collection(spark, tmp_path, "ups5")
    col.build_ann_index(num_hash_tables=2)
    col.upsert(
        spark.createDataFrame([("z", "new doc")], "id string, document string")
    )
    assert catalog.resolve(col.view).get("ann_index") == "stale"


# ----------------------------------------------------------------- luhn


def test_luhn_valid_known_vectors(spark):
    from valentinus_spark.functions.text import luhn_valid

    rows = [
        ("4532015112830366", True),   # valid Visa test PAN
        ("4532015112830367", False),  # single digit off
        ("79927398713", True),        # the ISO/IEC 7812 textbook example
        ("79927398710", False),
        ("0", True),                  # trivial: sum 0 % 10 == 0
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "s string")
    got = {r.s: r.v for r in df.select("s", luhn_valid("s").alias("v")).collect()}
    for s, exp in rows:
        assert got[s] is exp, s


def test_luhn_valid_non_digit_and_empty_are_null(spark):
    from valentinus_spark.functions.text import luhn_valid

    df = spark.createDataFrame([("",), ("12a4",), ("4532 0151",)], "s string")
    assert [r.v for r in df.select(luhn_valid("s").alias("v")).collect()] == [
        None,
        None,
        None,
    ]


def test_cc_candidate_pattern_excludes_short_and_long_runs(spark):
    from pyspark.sql import functions as F

    from valentinus_spark.functions.text import CC_CANDIDATE_PATTERN

    df = spark.createDataFrame(
        [("order 123456789012 cards 4532015112830366 id 12345678901234567",)],
        "t string",
    )
    out = df.select(
        F.regexp_extract_all("t", F.lit(CC_CANDIDATE_PATTERN), 0).alias("c")
    ).collect()[0].c
    assert out == ["4532015112830366"]  # 12-digit and 17-digit runs excluded


# -------------------------------------------------- source cross-entropy


def test_source_cross_entropy_matches_python(spark):
    import math

    from valentinus_spark.operators.quality import source_cross_entropy

    rows = [
        ("a", "x x y"),
        ("a", "y z"),
        ("b", "x q q"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.eval_source, r.train_source): (r.n_shared_tokens, r.cross_entropy)
        for r in source_cross_entropy(df).collect()
    }
    cnt = {"a": {"x": 2, "y": 2, "z": 1}, "b": {"x": 1, "q": 2}}
    tot = {s: sum(c.values()) for s, c in cnt.items()}
    vocab = len({t for c in cnt.values() for t in c})  # x y z q = 4
    for e in cnt:
        for t in cnt:
            shared = set(cnt[e]) & set(cnt[t])
            s = sum(
                round(cnt[e][w] / tot[e] * math.log(cnt[t][w] + 1), 12)
                for w in shared
            )
            exp = round(math.log(tot[t] + vocab) - s, 6)
            assert got[(e, t)][0] == len(shared)
            assert got[(e, t)][1] == pytest.approx(exp, abs=1e-9), (e, t)


def test_source_cross_entropy_diagonal_is_minimum_on_disjoint_domains(spark):
    from valentinus_spark.operators.quality import source_cross_entropy

    rows = [
        ("a", "alpha beta gamma alpha beta"),
        ("b", "delta epsilon zeta delta epsilon"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.eval_source, r.train_source): r.cross_entropy
        for r in source_cross_entropy(df).collect()
    }
    assert got[("a", "a")] < got[("a", "b")]
    assert got[("b", "b")] < got[("b", "a")]
    # disjoint pairs share nothing: pure smoothing ceiling ln(N_t + V)
    import math

    assert got[("a", "b")] == pytest.approx(math.log(5 + 6), abs=1e-6)
