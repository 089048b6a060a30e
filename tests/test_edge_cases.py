"""Empty-input edge cases: every operator must return an empty (or
correctly-degenerate) result, not throw — a 100 TB pipeline routinely
produces empty partitions, empty filter results, and empty pair lists."""

import tempfile

from valentinus_spark.collection import CollectionCatalog, EmbeddingCollection
from valentinus_spark.embed import HashEmbedder
from valentinus_spark.operators.asof import asof_join
from valentinus_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    exact_dedup,
    ngram_jaccard_pairs,
)
from valentinus_spark.operators.range_join import range_join
from valentinus_spark.operators.rollup import build_time_rollup, merged_rollup
from valentinus_spark.operators.text_search import bm25_topk


def test_dedup_family_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    assert bm25_topk(empty, ["x"]).count() == 0


def test_clusters_empty_pairs(spark):
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty_pairs).count() == 0
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {r["doc_id"]: r["cluster_size"] for r in dedup_clusters(docs, empty_pairs).collect()}
    assert got == {1: 1, 2: 1}  # all singletons


def test_temporal_joins_empty_sides(spark):
    el = spark.createDataFrame([], "eid long, k long, ts long")
    rl = spark.createDataFrame([(1, 0, 5, 1.0)], "rid long, k long, ts long, v double")
    assert asof_join(el, rl, key="k", ts="ts", value_cols=["rid"]).count() == 0
    # empty right: left rows survive with NULL as-of values
    row = asof_join(
        rl.selectExpr("rid as eid", "k", "ts"),
        el.selectExpr("eid as rid", "k", "ts"),
        key="k", ts="ts", value_cols=["rid"],
    ).first()
    assert row["asof_rid"] is None
    empty_iv = spark.createDataFrame([], "iid long, k long, s long, e long")
    assert range_join(
        rl.selectExpr("rid as pid", "k", "ts"), empty_iv,
        key="k", point_ts="ts", start="s", end="e", bucket_width=10,
    ).count() == 0


def test_rollup_empty_everything(spark):
    ev = spark.createDataFrame([], "ts timestamp, event_type string, value double")
    assert merged_rollup(build_time_rollup(ev), ev).count() == 0


def test_empty_collection_lifecycle(spark, tmp_path):
    cat = CollectionCatalog(spark, warehouse=str(tmp_path / "wh"))
    col = EmbeddingCollection.from_dataframe(
        spark,
        spark.createDataFrame([], "id string, document string"),
        "emptycol",
        embedder=HashEmbedder(dim=8),
        catalog=cat,
    ).save()
    assert col.cosine_query("q", num_results=5).count() == 0


def test_round2_operators_empty_inputs(spark):
    from valentinus_spark.operators.dedup import (
        connected_components_star,
        corpus_diff,
        duplicated_span_stats,
        incremental_dedup,
    )
    from valentinus_spark.operators.quality import (
        relative_outlier_filter,
        source_token_kl,
        unigram_logprob,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")

    # empty corpus -> everything incoming survives; empty incoming -> nothing
    assert incremental_dedup(docs, empty_docs).count() == 1
    assert incremental_dedup(empty_docs, docs).count() == 0
    assert duplicated_span_stats(empty_docs).count() == 0
    assert unigram_logprob(empty_docs).count() == 0
    assert connected_components_star(
        spark.createDataFrame([], "id_a long, id_b long")
    ).count() == 0
    # diff against an empty snapshot classifies everything one-sided
    assert {
        r["status"] for r in corpus_diff(empty_docs, docs).collect()
    } == {"added"}
    assert {
        r["status"] for r in corpus_diff(docs, empty_docs).collect()
    } == {"removed"}
    empty_kl = spark.createDataFrame([], "source string, text string")
    assert source_token_kl(empty_kl).count() == 0
    empty_len = spark.createDataFrame([], "doc_id long, lang string, n_chars long")
    assert relative_outlier_filter(empty_len).count() == 0


def test_interval_overlap_degenerate_intervals(spark):
    from valentinus_spark.operators.range_join import interval_overlap_join

    # zero-width intervals: [5,5] overlaps [5,5] and [0,10], not [6,8]
    l = spark.createDataFrame([(0, 1, 5, 5)], "k long, lid long, s long, e long")
    r = spark.createDataFrame(
        [(0, 10, 5, 5), (0, 11, 0, 10), (0, 12, 6, 8)],
        "k long, rid long, s long, e long",
    )
    got = {
        r_["rid"]
        for r_ in interval_overlap_join(
            l, r, key="k", left_start="s", left_end="e",
            right_start="s", right_end="e", bucket_width=3,
        ).collect()
    }
    assert got == {10, 11}


def test_shard_manifest_single_shard_and_empty(spark):
    from valentinus_spark.operators.packing import shard_manifest

    df = spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, n_chars long")
    rows = shard_manifest(df, n_shards=1).collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 2 and rows[0]["total_n_chars"] == 12
    empty = spark.createDataFrame([], "doc_id long, n_chars long")
    assert shard_manifest(empty, n_shards=4).count() == 0


def test_setsim_empty_and_single_doc(spark):
    from valentinus_spark.operators.setsim import set_similarity_join

    empty = spark.createDataFrame([], "did long, body string")
    assert set_similarity_join(empty, "did", "body", threshold=0.5).count() == 0
    one = spark.createDataFrame([(1, "only doc here")], "did long, body string")
    assert set_similarity_join(one, "did", "body", threshold=0.5).count() == 0


def test_linkage_empty_and_all_blank_names(spark):
    from valentinus_spark.operators.linkage import linkage_pairs

    empty = spark.createDataFrame([], "pid long, name string")
    assert linkage_pairs(empty, "pid", "name").count() == 0
    blanks = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, "")], "pid long, name string"
    )
    # blank names produce no usable block keys -> no pairs, no crash
    assert linkage_pairs(blanks, "pid", "name").count() == 0


def test_histogram_empty_and_all_null(spark):
    from valentinus_spark.operators.profile import equi_width_histogram

    empty = spark.createDataFrame([], "v double")
    assert equi_width_histogram(empty, "v", n_bins=4).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert equi_width_histogram(nulls, "v", n_bins=4).count() == 0


def test_key_skew_profile_single_key(spark):
    from valentinus_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame([("k",)] * 5, "k string")
    prof = key_skew_profile(df, "k", top_n=3).collect()
    assert len(prof) == 1
    assert prof[0]["share"] == 1.0 and prof[0]["hotness"] == 1.0
