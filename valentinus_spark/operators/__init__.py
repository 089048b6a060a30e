from valentinus_spark.operators.query import cosine_topk, nearest_topk
from valentinus_spark.operators.similarity import (
    brute_force_knn_join,
    lsh_ann_index,
    bucketed_ann_topk,
    ivf_centroids,
    mmr_rerank,
    random_projection,
    rp_ann_topk,
)
from valentinus_spark.operators.text_search import bm25_topk, tfidf_keywords
from valentinus_spark.operators.dedup import (
    deduplicate,
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    minhash_native_pairs,
    simhash_pairs,
    embedding_neardup_pairs,
    embedding_neardup_pairs_lsh,
    incremental_dedup,
    incremental_neardup,
    duplicated_span_stats,
    corpus_diff,
    source_overlap,
    connected_components,
    connected_components_star,
    dedup_clusters,
)
from valentinus_spark.operators.contamination import benchmark_contamination
from valentinus_spark.operators.packing import (
    pack_assignments,
    shard_assignment,
    shard_manifest,
)
from valentinus_spark.operators.quality import (
    quality_filter,
    repetition_stats,
    unigram_logprob,
    bigram_logprob,
    source_token_kl,
    relative_outlier_filter,
)
from valentinus_spark.operators.asof import asof_join
from valentinus_spark.operators.range_join import range_join, interval_overlap_join
from valentinus_spark.operators.skew import salted_join, salted_agg
from valentinus_spark.operators.rollup import build_time_rollup, merged_rollup

__all__ = [
    "cosine_topk",
    "nearest_topk",
    "brute_force_knn_join",
    "lsh_ann_index",
    "bucketed_ann_topk",
    "ivf_centroids",
    "mmr_rerank",
    "random_projection",
    "rp_ann_topk",
    "bm25_topk",
    "tfidf_keywords",
    "deduplicate",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_native_pairs",
    "simhash_pairs",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_lsh",
    "incremental_dedup",
    "incremental_neardup",
    "duplicated_span_stats",
    "corpus_diff",
    "source_overlap",
    "connected_components",
    "connected_components_star",
    "dedup_clusters",
    "benchmark_contamination",
    "pack_assignments",
    "shard_assignment",
    "shard_manifest",
    "quality_filter",
    "repetition_stats",
    "unigram_logprob",
    "bigram_logprob",
    "source_token_kl",
    "relative_outlier_filter",
    "asof_join",
    "range_join",
    "interval_overlap_join",
    "salted_join",
    "salted_agg",
    "build_time_rollup",
    "merged_rollup",
]
