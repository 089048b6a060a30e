"""End-to-end training-data pipeline over the driver testdata: the
composition a user migrating from the reference gains for free.

    corpus → language/quality gates → exact + fuzzy dedup (clusters)
           → embed → collection save (typed promoted keys)
           → filtered cosine search + ANN index

Run: python examples/training_pipeline_example.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import EmbeddingCollection, HashEmbedder, get_spark
from valentinus_spark.collection import CollectionCatalog
from valentinus_spark.functions.text import lang_id, text_quality, token_count
from valentinus_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = corpus.count()

    # 1. gates: language + quality thresholds (all JVM-side expressions)
    gated = (
        corpus.withColumn("lang_guess", lang_id("text"))
        .withColumn("q", text_quality("text"))
        .withColumn("n_tokens", token_count("text"))
        .filter(
            (F.col("q.punct_ratio") < 0.2)
            & (F.col("n_tokens") >= 10)
        )
    )
    n1 = gated.count()

    # 2. fuzzy dedup: jaccard pairs → transitive clusters → keep min id
    pairs = ngram_jaccard_pairs(gated, n=3, threshold=0.8).select("id_a", "id_b")
    clustered = dedup_clusters(gated, pairs)
    keep = clustered.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    deduped = gated.join(keep, "doc_id", "left_semi")
    n2 = deduped.count()

    # 2b. corpus-level quality: Gopher repetition gates, then trim length
    # outliers per language and plan the sharded export
    from valentinus_spark.operators.packing import shard_manifest
    from valentinus_spark.operators.quality import (
        quality_filter,
        relative_outlier_filter,
    )

    cleaned = relative_outlier_filter(
        quality_filter(deduped), group_col="lang", value_col="n_chars"
    )
    n3 = cleaned.count()
    shards = shard_manifest(cleaned, n_shards=8).orderBy("shard")

    # 3. embed + save as a collection with typed promoted keys
    catalog = CollectionCatalog(spark, warehouse=tempfile.mkdtemp(prefix="vs_pipe_"))
    docs = cleaned.select(
        F.concat(F.lit("id"), F.col("doc_id")).alias("id"),
        F.col("text").alias("document"),
        F.create_map(
            F.lit("Lang"), F.col("lang"),
            F.lit("Tokens"), F.col("n_tokens").cast("string"),
        ).alias("metadata"),
    )
    col = EmbeddingCollection.from_dataframe(
        spark, docs, "training_corpus", embedder=HashEmbedder(dim=64), catalog=catalog
    ).save(promote_keys={"Lang": "string", "Tokens": "long"})

    # 4. query: filtered cosine top-5 + persisted ANN index
    top = col.cosine_query(
        "distributed data processing", num_results=5,
        f_where=[{"Lang": {"eq": "en"}}, {"Tokens": {"gte": 20}}],
    )
    col.build_ann_index()
    nn = col.nearest_query_approx("distributed data processing", k=3)

    print(f"corpus {n0} -> gated {n1} -> deduped {n2} -> cleaned {n3}")
    shards.show()
    top.select("id", F.round("similarity", 4).alias("sim")).show(truncate=60)
    nn.select("id", F.round("distance", 4).alias("dist")).show(truncate=60)
    EmbeddingCollection.delete(spark, "view-training_corpus", catalog=catalog)


if __name__ == "__main__":
    main()
