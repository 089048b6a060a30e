from valentinus_spark.functions.vector import (
    dot,
    cosine_similarity,
    l2_distance,
    l2_normalize,
    literal_vector,
)
from valentinus_spark.functions.text import (
    normalize_text,
    word_tokens,
    token_count,
    char_ngrams,
    word_shingles,
    text_quality,
    simhash_counts,
    pack_simhash,
    hamming64,
    rolling_fingerprint,
)

__all__ = [
    "dot",
    "cosine_similarity",
    "l2_distance",
    "l2_normalize",
    "literal_vector",
    "normalize_text",
    "word_tokens",
    "token_count",
    "char_ngrams",
    "word_shingles",
    "text_quality",
    "simhash_counts",
    "pack_simhash",
    "hamming64",
    "rolling_fingerprint",
]
