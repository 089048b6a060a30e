from valentinus_spark.operators.query import cosine_topk, nearest_topk
from valentinus_spark.operators.similarity import (
    brute_force_knn_join,
    lsh_ann_index,
    bucketed_ann_topk,
    ivf_centroids,
)
from valentinus_spark.operators.text_search import bm25_topk
from valentinus_spark.operators.dedup import (
    deduplicate,
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    minhash_native_pairs,
    simhash_pairs,
    embedding_neardup_pairs,
)

__all__ = [
    "cosine_topk",
    "nearest_topk",
    "brute_force_knn_join",
    "lsh_ann_index",
    "bucketed_ann_topk",
    "ivf_centroids",
    "bm25_topk",
    "deduplicate",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_native_pairs",
    "simhash_pairs",
    "embedding_neardup_pairs",
]
