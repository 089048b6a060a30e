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
