"""Deduplication operators for training-data pipelines (north-star
extension — the reference has no dedup surface at all, SURVEY.md §2.4).

Five strategies, all DataFrame-native and shuffle-conscious:

- exact:            hash-groupBy on normalized text (one shuffle on a
                    64-hex-char key; map-side partial agg applies)
- n-gram Jaccard:   exact set-similarity via shingle explode + self-join
                    on shingle (the join key is the shingle, so only
                    co-shingled pairs materialize — never the full n²)
- MinHash LSH:      MLlib MinHashLSH approxSimilarityJoin (the 100 TB
                    path: candidate pairs only within LSH bands)
- SimHash:          64-bit simhash JVM-side + band-join on 16-bit chunks
                    (Hamming ≤ 3 ⇒ some 16-bit band equal — pigeonhole)
- embedding cosine: near-dup by embedding similarity; exact self-join
                    baseline here, LSH/bucketed variants in similarity.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from valentinus_spark.functions.text import (
    hamming64,
    normalize_text,
    pack_simhash,
    simhash_counts,
    word_shingles,
    word_tokens,
)
from valentinus_spark.functions.vector import cosine_similarity


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one row per distinct normalized text; returns
    (kept id, content hash, dup_count) per cluster.

    Plan: project(md5(normalize)) → hash-aggregate. One shuffle keyed on
    the digest; partial aggregation runs map-side, so at 100 TB the shuffle
    carries one record per distinct digest per mapper, not per row."""
    return (
        df.select(
            F.col(id_col), F.md5(normalize_text(text_col)).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs (a < b, J ≥ threshold).

    Plan: explode distinct shingles → self-equi-join on shingle →
    count intersections per pair → Jaccard from |A|,|B|,|A∩B|. The join
    key is the shingle, so candidate pairs are generated only where sets
    actually overlap; with a stopword-free shingle space the blow-up is
    bounded by shingle document frequency (for heavy-tail shingles, cap df
    upstream — at pipeline scale drop shingles with df > ~1000 as
    non-discriminative, which also kills the skew)."""
    shingled = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("shingle"),
    )
    sizes = shingled.groupBy("_id").agg(F.count(F.lit(1)).alias("set_size"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Approximate Jaccard near-dup pairs via MinHash LSH
    (shingle → hashingTF sparse vector → MinHash bands → band-bucket join).

    This is the scale path for fuzzy dedup: candidate pairs are generated
    only inside LSH buckets, so cost is ~linear in corpus size for
    realistic duplicate densities (vs ngram_jaccard_pairs' exact join).
    Returns (id_a, id_b, jaccard) with a < b — jaccard here is exact,
    recomputed on the candidates MLlib emits (distCol = 1 - J)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(word_shingles(text_col, n)).alias("_shingles"),
    ).filter(F.size("_shingles") > 0)
    tf = HashingTF(inputCol="_shingles", outputCol="_features", numFeatures=num_features)
    feats = tf.transform(shingled)
    lsh = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, threshold=1.0 - threshold, distCol="_dist"
    )
    return (
        pairs.select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            (1.0 - F.col("_dist")).alias("jaccard"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash with Hamming distance ≤ max_hamming.

    Banding: split the 64-bit hash into ``max_hamming + 1`` bands; by
    pigeonhole, any pair within the Hamming budget agrees exactly on at
    least one band, so the self-join runs on (band_index, band_value) —
    candidates only, never n². Exact Hamming then verifies candidates, so
    recall is 100% within the budget. More bands (higher budget) → shorter
    bands → more candidates; keep the budget small at corpus scale."""
    # three stages so the O(64·tokens) vote aggregate runs exactly once per
    # row (projection collapse would otherwise duplicate it per reference)
    hashed = (
        df.select(
            F.col(id_col).alias("_id"),
            word_tokens(normalize_text(text_col)).alias("_toks"),
        )
        .withColumn("_counts", simhash_counts("_toks"))
        .select("_id", pack_simhash("_counts").alias("simhash"))
    )
    n_bands = max_hamming + 1
    width = 64 // n_bands
    bands = []
    for i in range(n_bands):
        start = i * width
        # last band absorbs the remainder bits
        w = 64 - start if i == n_bands - 1 else width
        mask = (1 << w) - 1
        bands.append(
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("simhash"), start).bitwiseAND(F.lit(mask)).alias("value"),
            )
        )
    banded = hashed.select(
        "_id", "simhash", F.explode(F.array(*bands)).alias("b")
    ).select("_id", "simhash", F.col("b.band").alias("band"), F.col("b.value").alias("value"))
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, on=["band", "value"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (a < b).

    Exact self-join baseline — O(n²) scoring, correct oracle for the
    approximate paths. At scale use lsh_ann_index/approxSimilarityJoin or
    bucketed_ann_topk (similarity.py) to restrict candidates first; this
    exact form is still the right tool for within-bucket verification."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
