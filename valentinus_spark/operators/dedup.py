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

from contextlib import contextmanager

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from valentinus_spark.functions.text import (
    hamming64,
    normalize_text,
    pack_simhash,
    shingles_from_tokens,
    simhash_counts,
    word_tokens,
)


from valentinus_spark.functions.util import ensure_parallelism
from valentinus_spark.functions.vector import cosine_similarity


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(_id, _shingles) with tokens materialized before shingling — see
    shingles_from_tokens for why the two-stage form matters.

    The empty-doc guard is a CHEAP text predicate applied before
    repartition so Catalyst pushes it to the scan. (A ``size(_shingles) >
    0`` filter here instead gets predicate-pushed below the Repartition
    with the whole shingling expression inlined — recomputing it
    single-partition; measured 7.5s vs 0.7s on 5k docs.)"""
    return (
        ensure_parallelism(df.filter(F.trim(F.col(text_col)) != ""))
        .select(
            F.col(id_col).alias("_id"),
            word_tokens(normalize_text(text_col)).alias("_toks"),
        )
        .select(
            "_id", F.array_distinct(shingles_from_tokens("_toks", n)).alias("_shingles")
        )
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one row per distinct normalized text; returns
    (kept id, content hash, dup_count) per cluster.

    Plan: project(md5(normalize)) → hash-aggregate. One shuffle keyed on
    the digest; partial aggregation runs map-side, so at 100 TB the shuffle
    carries one record per distinct digest per mapper, not per row."""
    return (
        ensure_parallelism(df)
        .select(
            F.col(id_col), F.md5(normalize_text(text_col)).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def deduplicate(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The corpus after exact dedup: keeps exactly the ``kept_id`` row of
    every content cluster (all original columns preserved).

    Plan: semi-join against the cluster winners — broadcast when the
    winner set is small, shuffle-hash otherwise (AQE decides)."""
    winners = exact_dedup(df, id_col, text_col).select(
        F.col("kept_id").alias(id_col)
    )
    return df.join(winners, on=id_col, how="semi")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 100_000,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs (a < b, J ≥ threshold).

    Plan: explode distinct shingles → self-equi-join on shingle →
    count intersections per pair → Jaccard from |A|,|B|,|A∩B|. The join
    key is the shingle, so candidate pairs are generated only where sets
    actually overlap; with a stopword-free shingle space the blow-up is
    bounded by shingle document frequency: ``max_df`` drops shingles in
    more than max_df docs as non-discriminative, which also kills join
    skew. A single boilerplate shingle shared by d documents alone
    contributes d·(d−1)/2 join rows — at corpus scale that is THE
    bottleneck, so the cap defaults ON (a shingle in >100k docs carries
    ~no Jaccard signal). The cap prunes CANDIDATE GENERATION only: set
    sizes (the Jaccard denominator) are computed before it, so surviving
    pairs score against their true set sizes — the same contract as
    :func:`incremental_neardup` with a pre-built shingle artifact. Pass
    ``max_df=None`` for exact all-pairs semantics (oracle comparisons at
    test scale).

    The join runs on xxhash64(shingle) — an 8-byte key instead of a
    ~20-byte string — which shrinks the shuffle and makes comparisons
    cheap; a hash collision would need two distinct shingles in the same
    corpus pair at ~2^-64, far below float-rounding noise."""
    # set size = |distinct shingles| is known BEFORE the explode — a free
    # per-row scalar, not a window. (An earlier version windowed over _id
    # post-explode: one whole extra shuffle keyed on _id for a number the
    # pre-explode array already carries.)
    sized = (
        _shingle_sets(df, id_col, text_col, n)
        .select(
            "_id",
            F.size("_shingles").alias("set_size"),
            F.explode("_shingles").alias("_sh"),
        )
        .select("_id", "set_size", F.xxhash64("_sh").alias("shingle"))
    )
    if max_df is not None:
        keep = (
            sized.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        # NOTE: set_size stays the FULL distinct-shingle count (computed
        # pre-filter), so max_df prunes candidate generation only — the
        # Jaccard denominator is exact, matching build_shingle_table's
        # stored sizes.
        sized = sized.join(keep, "shingle", "semi")
    a = sized.alias("a")
    b = sized.alias("b")
    return (
        a.join(b, on="shingle")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("intersection"),
            # constant within the group: set_size is a per-doc scalar
            F.first("a.set_size").alias("size_a"),
            F.first("b.set_size").alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_threshold_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    thresholds: "tuple[float, ...]" = (0.5, 0.6, 0.7, 0.8, 0.9),
    max_df: int | None = 100_000,
) -> DataFrame:
    """Near-dup threshold sweep: for each candidate Jaccard threshold,
    how many document pairs qualify, how many documents are flagged by
    at least one qualifying pair, and the flagged fraction of the
    corpus — the tuning panel one reads BEFORE committing a corpus-wide
    dedup threshold (Lee et al. ACL 2022 settled on 0.8 for C4; the
    right cut is corpus-specific and this curve is how it's chosen).

    Returns one row per threshold, ordered:
    (``threshold``, ``n_pairs``, ``n_docs_flagged``,
    ``frac_docs_flagged`` rounded to 6 dp; zero rows for thresholds no
    pair reaches).

    Scale shape: ONE df-capped shingle self-join at ``min(thresholds)``
    (the dominant cost, identical to :func:`ngram_jaccard_pairs`) feeds
    every threshold row through a broadcast threshold spine — the sweep
    costs one corpus pass, not ``len(thresholds)`` passes. Everything
    after the pair filter is sized by qualifying pairs × thresholds,
    orders of magnitude below the corpus; the final per-threshold
    distinct-count shuffles only those endpoint rows."""
    ts = sorted({float(t) for t in thresholds})
    if not ts:
        raise ValueError("thresholds must be non-empty")
    n_docs = (
        df.filter(F.trim(F.col(text_col)) != "").select(id_col).distinct().count()
    )
    spark = df.sparkSession
    spine = spark.createDataFrame([(t,) for t in ts], "threshold double")
    pairs = ngram_jaccard_pairs(
        df, id_col, text_col, n=n, threshold=ts[0], max_df=max_df
    )
    hits = pairs.join(
        F.broadcast(spine), F.col("jaccard") >= F.col("threshold"), "inner"
    )
    per_t = hits.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    flagged = (
        hits.select(
            "threshold", F.explode(F.array("id_a", "id_b")).alias("_id")
        )
        .groupBy("threshold")
        .agg(F.count_distinct("_id").alias("n_docs_flagged"))
    )
    return (
        spine.join(F.broadcast(per_t), "threshold", "left")
        .join(F.broadcast(flagged), "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_docs_flagged", F.lit(0)).alias("n_docs_flagged"),
            F.round(
                F.coalesce("n_docs_flagged", F.lit(0))
                / F.lit(n_docs).cast("double"),
                6,
            ).alias("frac_docs_flagged")
            if n_docs
            else F.lit(None).cast("double").alias("frac_docs_flagged"),
        )
        .orderBy("threshold")
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

    shingled = _shingle_sets(df, id_col, text_col, n)
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


def _minhash_banded(shingled, num_hashes: int, bands: int, hash_fn: str):
    """Signature + banding stage of :func:`minhash_native_pairs`:
    (_id, _shingles) → one (_id, _mh, band, bh) row per band. Extracted
    so the skew stress test (test_dedup.py) can measure band-bucket
    occupancy directly: a hot shingle shared by 20% of the corpus must
    NOT co-bucket those docs — the band key hashes an r-wide signature
    slice, and a single shared shingle only wins one signature's min
    with probability ~1/|set| — so the shuffle's largest (band, key)
    bucket tracks the true duplicate-class size, not the hot-token
    class size.

    Signatures via explode → groupBy(min × num_hashes) rather than a
    per-row higher-order aggregate: HOF lambdas run INTERPRETED (no
    whole-stage codegen, no common-subexpression elimination), while
    the explode/hash-aggregate shape is fully codegen'd with map-side
    partial mins — the shuffle carries one num_hashes-wide row per doc
    per mapper, never the shingles.

    CAUTION (regression-pinned in test_minhash_signatures_are_distinct
    _hash_families): an earlier form used
    F.transform(shingles, lambda s, i=i: xxhash64(lit(i), s)) — PySpark
    treats ANY two-parameter lambda as (element, array_index), so the
    captured default i was silently shadowed by the index column and
    all 16 "independent" signatures collapsed to one hash family
    (banding degenerated; recall rode on the exact-verify stage). Keep
    per-hash salts OUTSIDE lambda parameter lists."""
    r = num_hashes // bands
    exploded = shingled.select("_id", F.explode("_shingles").alias("_s"))
    if hash_fn == "sha256":
        # one sha256 = 64 hex chars = FOUR independent 60-bit values, so
        # hash i is slice (i % 4) of sha256((i//4) || ':' || shingle) —
        # 4× fewer digests than a salt per hash (codegen CSE shares each
        # digest across its four slice expressions)
        def _h(i):
            digest = F.sha2(F.concat(F.lit(f"{i // 4}:"), F.col("_s")), 256)
            return F.conv(F.substring(digest, 1 + 15 * (i % 4), 15), 16, 10).cast(
                "long"
            )
    else:
        def _h(i):
            return F.xxhash64(F.lit(i), F.col("_s"))

    sig = exploded.groupBy("_id").agg(
        *[F.min(_h(i)).alias(f"_h{i}") for i in range(num_hashes)]
    ).select("_id", F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("_mh"))

    # band key: xxhash64 over the band's signature slice for the fast path;
    # for the portable variant the slice itself (comma-joined) IS the key —
    # no second hash function for the oracle to reproduce
    def _band_key(b):
        elems = [F.element_at("_mh", b * r + j + 1) for j in range(r)]
        if hash_fn == "sha256":
            return F.concat_ws(",", *[e.cast("string") for e in elems])
        return F.xxhash64(*elems)

    # candidate generation carries ONLY (id, 16-long signature) through the
    # band join — never the shingle arrays (cheap shuffle rows)
    return sig.select(
        "_id",
        "_mh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _band_key(b).alias("bh")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_mh", F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh"))


def minhash_native_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash LSH near-dup pairs, pure Catalyst expressions end-to-end.

    Per row: ``num_hashes`` minhash signatures, signature i =
    min(hash(i, shingle)) over the doc's distinct word n-gram shingles
    — whole-stage-codegen'd, no MLlib vector objects, no Scala UDF in the
    candidate loop (unlike MinHashLSH.approxSimilarityJoin). Banding:
    ``bands`` bands of ``num_hashes/bands`` rows; pairs agreeing on ≥1
    band become candidates (equi-join on band hash, so only co-bucketed
    pairs materialize). Candidates are verified with EXACT Jaccard via
    array_intersect, so precision is 1.0 and recall is the standard LSH
    s-curve 1-(1-J^r)^b of the chosen banding.

    ``hash_fn``: "xxhash64" (default — the corpus-scale fast path) or
    "sha256" (the portable 60-bit hash, functions/text.py sha_hash60):
    same pipeline, but every stage — signatures, band keys, candidates —
    is reproducible in DuckDB SQL, so the ENTIRE LSH pipeline is
    oracle-verifiable, not just the exact-Jaccard verify.

    Scale shape: one shuffle keyed on (band, band_hash); skewed buckets
    (boilerplate docs) can be salted upstream by capping shingle document
    frequency."""
    shingled = _shingle_sets(df, id_col, text_col, n)
    banded = _minhash_banded(shingled, num_hashes, bands, hash_fn)
    a = banded.alias("a")
    b = banded.alias("b")
    # estimated Jaccard from signature agreement prunes false candidates
    # (common-shingle-dominated minima) before the expensive exact verify
    est = F.size(
        F.filter(
            F.zip_with(F.col("a._mh"), F.col("b._mh"), lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(float(num_hashes))
    cands = (
        a.join(b, on=["band", "bh"])
        .filter(F.col("a._id") < F.col("b._id"))
        .filter(est >= threshold * 0.5)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verify: join shingle sets back for the surviving pairs only
    sa = shingled.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("_sa"))
    sb = shingled.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", inter / (F.size("_sa") + F.size("_sb") - inter))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash with Hamming distance ≤ max_hamming.

    Banding: split the hash into ``max_hamming + 1`` bands; by
    pigeonhole, any pair within the Hamming budget agrees exactly on at
    least one band, so the self-join runs on (band_index, band_value) —
    candidates only, never n². Exact Hamming then verifies candidates, so
    recall is 100% within the budget. More bands (higher budget) → shorter
    bands → more candidates; keep the budget small at corpus scale.

    ``hash_fn``: "xxhash64" → 64-bit simhash (default fast path);
    "sha256" → 60-bit simhash from the portable hash
    (functions/text.py sha_hash60), end-to-end reproducible in the DuckDB
    oracle (token hashes, per-bit votes, packing, banding, Hamming)."""
    nbits = 64 if hash_fn == "xxhash64" else 60
    # three stages so the O(bits·tokens) vote aggregate runs exactly once
    # per row (projection collapse would otherwise duplicate it per ref)
    hashed = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            word_tokens(normalize_text(text_col)).alias("_toks"),
        )
        .withColumn("_counts", simhash_counts("_toks", bits=nbits, hash_fn=hash_fn))
        .select("_id", pack_simhash("_counts", bits=nbits).alias("simhash"))
    )
    n_bands = max_hamming + 1
    width = nbits // n_bands
    bands = []
    for i in range(n_bands):
        start = i * width
        # last band absorbs the remainder bits
        w = nbits - start if i == n_bands - 1 else width
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
    exact form is still the right tool for within-bucket verification.

    Cost shape: vectors are L2-normalized ONCE per row before the join, so
    each of the O(n²) pairs pays a single 1-fold dot product instead of
    dot + two norms (~3× less expression work in the pair loop)."""
    from valentinus_spark.functions.vector import dot, l2_normalize

    normed = ensure_parallelism(df).select(
        F.col(id_col).alias("_nid"), l2_normalize(vec_col).alias("_nvec")
    )
    a = normed.select(F.col("_nid").alias("id_a"), F.col("_nvec").alias("_va"))
    b = normed.select(F.col("_nid").alias("id_b"), F.col("_nvec").alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_length: float = 4.0,
    num_hash_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold — the SCALE path.

    Replaces :func:`embedding_neardup_pairs`' O(n²) crossJoin with
    LSH-restricted candidates + exact within-candidate verify:

    1. unit-normalize, so cosine ≥ t  ⇔  L2 distance ≤ sqrt(2 − 2t);
    2. BucketedRandomProjectionLSH ``approxSimilarityJoin`` at that
       distance — candidate generation is a banded EQUI-join on (table,
       bucket), shuffling only (id, vector, bucket) rows, never n²;
    3. exact cosine filter on the candidates with the SAME dot expression
       as the exact operator, so surviving pairs carry identical scores
       (which is what lets the driver query share the exact oracle).

    Misses are pairs sharing no bucket in any table: per-table collision
    for distance d is ≈ 1 − d·sqrt(2/π)/bucket_length, so the miss rate is
    its complement ^ num_hash_tables — with the defaults and d ≈ 1.14
    (t = 0.35) that is ~1e-5 per pair; raise num_hash_tables / bucket_length
    for more recall, lower bucket_length for fewer candidates. The
    reference's pair-mining equivalent is the per-query KdTree rebuild
    (embeddings.rs:402-408) — single-node, no persistence, no batch path."""
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from valentinus_spark.functions.vector import dot, l2_normalize

    normed = ensure_parallelism(df).select(
        F.col(id_col).alias("_nid"), l2_normalize(vec_col).alias("_nvec")
    )
    vecs = normed.withColumn("_features", array_to_vector(F.col("_nvec")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    # + eps: the join compares Euclidean doubles, the verify compares the
    # dot — keep borderline pairs in the candidate set, let the exact
    # cosine filter decide
    dist = math.sqrt(max(0.0, 2.0 - 2.0 * threshold)) + 1e-6
    cand = model.approxSimilarityJoin(vecs, vecs, dist, distCol="_dist")
    return (
        cand.select(
            F.col("datasetA._nid").alias("id_a"),
            F.col("datasetB._nid").alias("id_b"),
            dot(F.col("datasetA._nvec"), F.col("datasetB._nvec")).alias("cosine"),
        )
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("cosine") >= threshold))
    )


DIGEST_COL = "content_digest"


def build_digest_table(
    corpus: DataFrame,
    table: str,
    text_col: str = "text",
    buckets: int = 64,
    mode: str = "errorifexists",
) -> None:
    """Materialize the corpus content-digest artifact as a table BUCKETED
    on the digest — the one-time shuffle that makes every later
    per-crawl :func:`incremental_dedup` anti-join co-located on the
    corpus side (its scan needs no Exchange; only the small incoming
    batch shuffles to the bucket layout). Maintain it by appending the
    survivors' digests after each batch."""
    from valentinus_spark.sources.tables import write_bucketed

    d = corpus.select(
        F.md5(normalize_text(text_col)).alias(DIGEST_COL)
    ).distinct()
    # bucket-sorted so a sort-merge anti-join also skips its corpus-side sort
    write_bucketed(
        d, table, by=DIGEST_COL, buckets=buckets, sort_by=DIGEST_COL, mode=mode
    )


def incremental_dedup(
    incoming: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_digests: DataFrame | None = None,
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus: rows of ``incoming``
    whose normalized content digest appears neither in the corpus nor
    earlier (lower id) in the batch itself. The shape every append-only
    training-data pipeline runs per crawl/snapshot — dedup the delta, not
    the world. Pass raw ``corpus`` documents, or ``corpus_digests`` (a
    ``content_digest`` relation, ideally the bucketed artifact from
    :func:`build_digest_table`) to skip re-digesting the world per batch.

    Plan: digest both sides → left_anti equi-join on the digest (only the
    digests shuffle — 16 bytes/row, never the text) → min-id winner per
    surviving digest for intra-batch dups. At 100 TB the corpus side is
    the big one, but it contributes ONLY its digest column to the shuffle
    (column pruning reaches the scan) — and with the bucketed digest
    artifact its scan needs no Exchange at all (asserted in
    test_layout.py): per-crawl cost is the incoming batch alone."""
    if (corpus is None) == (corpus_digests is None):
        raise ValueError("pass exactly one of corpus / corpus_digests")
    inc = ensure_parallelism(incoming).withColumn(
        "_digest", F.md5(normalize_text(text_col))
    )
    if corpus_digests is not None:
        seen = corpus_digests.select(F.col(DIGEST_COL).alias("_digest"))
    else:
        seen = corpus.select(
            F.md5(normalize_text(text_col)).alias("_digest")
        ).distinct()
    fresh = inc.join(seen, "_digest", "left_anti")
    winners = fresh.groupBy("_digest").agg(F.min(id_col).alias(id_col)).select(id_col)
    return fresh.drop("_digest").join(winners, id_col, "semi")


def duplicated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_df: int | None = 100_000,
) -> DataFrame:
    """Per-document cross-corpus duplicated-span coverage (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): the
    fraction of a document's distinct word ``n``-gram spans that also occur
    in at least one OTHER document. High shared_frac with no full-doc
    near-dup match means boilerplate / template contamination — the signal
    fuzzy doc-level dedup misses.

    Output: (id_col, n_spans, shared_spans, shared_frac).

    Plan: row-local distinct shingles → explode to (id, xxhash64(span)) —
    8-byte keys, never span text — → span document-frequency via one
    hash-aggregate (map-side combine) → join back → per-doc re-aggregate.
    Two shuffles total, both on the hashed span key. ``max_df`` caps the
    DF table the same way ngram_jaccard_pairs does: a span in >max_df docs
    is boilerplate by definition and counts as shared without needing its
    exact count."""
    spans = (
        _shingle_sets(df, id_col, text_col, n)
        .select("_id", F.explode("_shingles").alias("_sh"))
        .select("_id", F.xxhash64("_sh").alias("_span"))
    )
    df_counts = spans.groupBy("_span").agg(F.count(F.lit(1)).alias("_df"))
    if max_df is not None:
        df_counts = df_counts.withColumn("_df", F.least(F.col("_df"), F.lit(max_df)))
    return (
        spans.join(df_counts, "_span")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("_df") > 1).cast("long")).alias("shared_spans"),
        )
        .withColumn(
            "shared_frac",
            F.round(F.col("shared_spans") / F.col("n_spans"), 4),
        )
    )


# edges per post-shuffle partition for the CC iterations. The iterative
# joins run over the (tiny, relative to the corpus) EDGE list, not the
# corpus: partitioning for them must track |E|, not the session default
# sized for corpus scans — 32 partitions over 500 edges is two orders of
# magnitude more scheduling than data.
_EDGES_PER_PARTITION = 2_000_000


def _cc_parallelism(spark, n_pairs: int) -> int:
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(1, min(cap, (2 * n_pairs) // _EDGES_PER_PARTITION + 1))


@contextmanager
def _iteration_confs(spark, nparts: int):
    """Pin shuffle width to the edge-list size and disable AQE for the
    duration of an iterative driver-synchronized loop.

    AQE costs a re-optimization round-trip per shuffle stage; on the
    per-iteration jobs here (joins over an already-materialized edge list
    whose size we KNOW — we counted it) that adaptivity buys nothing and
    measured ~2x on small graphs. At scale ``nparts`` grows with |E| and
    the static width is the right one by construction. Restores both
    confs on exit; confs are plan-time, so only queries PLANNED inside
    the block are affected."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


# below this many pairs the edge list is driver-resident by definition
# (~16 B/edge → ~16 MB at the default): run union-find on the driver and
# broadcast the labels back — the same small-side decision AQE makes when
# it broadcasts a join side. Dup-pair lists are SPARSE relative to the
# corpus (they only contain matched docs), so even 100 TB corpora often
# produce pair lists under this; the distributed rounds below are the
# guaranteed path when they don't.
_DRIVER_CC_THRESHOLD = 1_000_000


def _driver_components(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Union-find over a collected pair list → (id, cluster_id=min member).
    Bounded by ``_DRIVER_CC_THRESHOLD`` rows at the call sites."""
    rows = pairs.select(id_a, id_b).collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the min member id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(x, find(x)) for x in parent]
    id_type = pairs.schema[id_a].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("id", id_type, False), StructField("cluster_id", id_type, False)]
    )
    return pairs.sparkSession.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = _DRIVER_CC_THRESHOLD,
) -> DataFrame:
    """Connected components over an undirected pair list → (id, cluster_id)
    with cluster_id = min member id. The step pairs→clusters is what turns
    near-dup PAIRS into dedup GROUPS (transitivity: A~B, B~C ⇒ {A,B,C}
    even though A,C never matched directly).

    Iterative min-label propagation: each node takes the min label among
    itself and its neighbors until fixpoint. Pair lists at or below
    ``driver_threshold`` rows take a driver union-find fast path (see
    ``_DRIVER_CC_THRESHOLD``); above it, iterations = graph diameter,
    which for dup clusters is tiny (chains longer than a handful of docs
    are rare); each iteration is ONE job: join + agg + join, materialized
    by localCheckpoint (truncating lineage — otherwise the plan doubles
    per iteration and the optimizer chokes long before the cluster does)
    with the convergence witness folded into the same pass via
    ``Observation`` — no separate count job per round.

    The convergence witness (count of labels that strictly decreased) is
    type-agnostic on purpose — a numeric cast of the id (an earlier
    witness) throws CAST_INVALID_INPUT for string ids under ANSI mode and
    NULLs out silently with ANSI off, breaking diameter>=2 graphs.

    For adversarial diameters switch to large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce"), same join
    primitives, O(log n) rounds: :func:`connected_components_star`.
    """
    # materialize `pairs` ONCE before anything reads it: the symmetrizing
    # union scans it twice and every iteration re-joins the edges — if the
    # upstream is an expensive pipeline (a similarity join), the naive plan
    # recomputes it 2× here and again per round
    pairs = pairs.select(id_a, id_b).localCheckpoint()
    spark = pairs.sparkSession
    n_pairs = pairs.count()
    if n_pairs <= driver_threshold:
        return _driver_components(pairs, id_a, id_b)
    nparts = _cc_parallelism(spark, n_pairs)
    with _iteration_confs(spark, nparts):
        edges = (
            pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
            .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
            .distinct()  # planned at nparts-wide shuffle inside the block
            .localCheckpoint()
        )
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("cluster_id", F.col("id"))
            .localCheckpoint()
        )
        for _ in range(max_iter):
            # min label among each node's neighbors
            neighbor_min = (
                edges.join(labels, edges["dst"] == labels["id"])
                .groupBy("src")
                .agg(F.min("cluster_id").alias("_nmin"))
            )
            obs = Observation()
            updated = (
                labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
                .select(
                    "id",
                    F.least(
                        F.col("cluster_id"),
                        F.coalesce(F.col("_nmin"), F.col("cluster_id")),
                    ).alias("cluster_id"),
                    (F.coalesce(F.col("_nmin"), F.col("cluster_id")) < F.col("cluster_id"))
                    .cast("long")
                    .alias("_chg"),
                )
                .observe(obs, F.sum("_chg").alias("n_changed"))
                .localCheckpoint()
            )
            labels = updated.drop("_chg")
            if not obs.get["n_changed"]:
                break
    return labels


SHINGLE_COLS = ("doc_id", "shingle", "set_size")


def build_shingle_table(
    corpus: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    buckets: int = 64,
    mode: str = "errorifexists",
) -> None:
    """Materialize the corpus shingle artifact for
    :func:`incremental_neardup`: (doc_id, xxhash64 shingle, per-doc set
    size) BUCKETED on the shingle — the join key — so every later
    per-crawl candidate join reads the corpus side with no Exchange.
    Maintain it by appending the survivors' shingles after each batch."""
    from valentinus_spark.sources.tables import write_bucketed

    sh = (
        _shingle_sets(corpus, id_col, text_col, n)
        .select("_id", F.explode("_shingles").alias("_s"))
        .select(F.col("_id").alias("doc_id"), F.xxhash64("_s").alias("shingle"))
    )
    sized = sh.join(
        sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size")), "doc_id"
    ).select(*SHINGLE_COLS)
    write_bucketed(sized, table, by="shingle", buckets=buckets, mode=mode)


def incremental_neardup(
    incoming: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 100_000,
    corpus_shingles: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy batch-vs-corpus dedup: rows of ``incoming`` with NO corpus
    document at word-``n``-gram Jaccard ≥ ``threshold``. The companion to
    :func:`incremental_dedup` (exact digests) — a re-crawled page with a
    changed timestamp sails through exact dedup and is exactly what this
    catches. In-batch near-dups are a separate concern (run
    ngram_jaccard_pairs/dedup_clusters within the batch).

    Plan: shingle-explode BOTH sides → equi-join incoming-shingles to
    corpus-shingles on xxhash64(shingle) — only co-shingled cross pairs
    materialize, never |incoming| × |corpus| — → exact Jaccard per
    candidate pair → anti-join matched ids. The corpus side ships (8-byte
    shingle hash, id) rows; in production its shingle table is a
    pre-materialized bucketed artifact maintained alongside the corpus,
    so per-crawl cost is the incoming side + one co-located join.
    ``max_df`` caps shingle document frequency ACROSS both sides (the
    boilerplate/skew guard, exactly as in ngram_jaccard_pairs). Pass
    ``corpus_shingles`` (the bucketed artifact from
    :func:`build_shingle_table`) instead of ``corpus`` to skip
    re-shingling the world per batch — with the artifact, ``max_df``
    prunes candidate generation only (the stored per-doc set sizes stay
    exact)."""
    if (corpus is None) == (corpus_shingles is None):
        raise ValueError("pass exactly one of corpus / corpus_shingles")
    inc_sh = (
        _shingle_sets(incoming, id_col, text_col, n)
        .select("_id", F.explode("_shingles").alias("_s"))
        .select(F.col("_id").alias("_iid"), F.xxhash64("_s").alias("shingle"))
    )
    if corpus_shingles is not None:
        cor_sh = corpus_shingles.select(
            F.col("doc_id").alias("_cid"), "shingle", F.col("set_size").alias("_csz")
        )
        cor_sizes = cor_sh.select("_cid", "_csz").distinct()
        cor_sh = cor_sh.select("_cid", "shingle")
    else:
        cor_sh = (
            _shingle_sets(corpus, id_col, text_col, n)
            .select("_id", F.explode("_shingles").alias("_s"))
            .select(F.col("_id").alias("_cid"), F.xxhash64("_s").alias("shingle"))
        )
        cor_sizes = None
    if max_df is not None:
        df_counts = (
            inc_sh.select("shingle")
            .union(cor_sh.select("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        inc_sh = inc_sh.join(df_counts, "shingle", "semi")
        cor_sh = cor_sh.join(df_counts, "shingle", "semi")
    inc_sizes = inc_sh.groupBy("_iid").agg(F.count(F.lit(1)).alias("_isz"))
    if cor_sizes is None:
        cor_sizes = cor_sh.groupBy("_cid").agg(F.count(F.lit(1)).alias("_csz"))
    inter = (
        inc_sh.join(cor_sh, "shingle")
        .groupBy("_iid", "_cid")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    matched = (
        inter.join(inc_sizes, "_iid")
        .join(cor_sizes, "_cid")
        .filter(
            F.col("_i") / (F.col("_isz") + F.col("_csz") - F.col("_i")) >= threshold
        )
        .select(F.col("_iid").alias(id_col))
        .distinct()
    )
    return incoming.join(matched, id_col, "left_anti")


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    unit: str = "digest",
    n: int = 5,
) -> DataFrame:
    """Pairwise duplicate-content overlap between groups: for each group
    pair (a < b), how many distinct content units appear in BOTH — the
    "which sources mirror each other" matrix that decides dedup ordering
    and source pruning in a multi-crawl corpus. ``unit="digest"`` counts
    whole-document duplicates (strict mirroring); ``unit="span"`` counts
    shared word ``n``-gram spans (boilerplate/partial copying — the
    signal that exists long before full-document mirrors do).

    Output: (group_a, group_b, shared). Plan: distinct (group, unit)
    projection (one map-side-combined aggregate), self-equi-join on the
    unit — only co-occurring units materialize pairs, bounded by
    units × groups-per-unit², with groups numbering in the dozens."""
    if unit == "span":
        d = (
            _shingle_sets(df, group_col, text_col, n)
            .select(F.col("_id").alias("_g"), F.explode("_shingles").alias("_dg"))
            .distinct()
        )
    elif unit == "digest":
        d = (
            ensure_parallelism(df)
            .select(
                F.col(group_col).alias("_g"),
                F.md5(normalize_text(text_col)).alias("_dg"),
            )
            .distinct()
        )
    else:
        raise ValueError(f"unit must be 'digest' or 'span', got {unit!r}")
    a = d.select(F.col("_g").alias("group_a"), "_dg")
    b = d.select(F.col("_g").alias("group_b"), "_dg")
    return (
        a.join(b, "_dg")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions by content digest:
    (id_col, status) with status ∈ added | removed | modified | unchanged.
    The audit step between two crawls/exports — what changed, what needs
    re-embedding, what downstream caches to invalidate.

    Plan: digest-project both sides (16 bytes/row into the join, never the
    text), full-outer equi-join on the id. One shuffle keyed on the id —
    or zero, when both snapshots are stored bucketed by id, which is how
    the collection layout writes them."""
    o = old.select(
        F.col(id_col), F.md5(normalize_text(text_col)).alias("_od")
    )
    n = new.select(
        F.col(id_col), F.md5(normalize_text(text_col)).alias("_nd")
    )
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_od").isNull(), F.lit("added"))
        .when(F.col("_nd").isNull(), F.lit("removed"))
        .when(F.col("_od") == F.col("_nd"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
        .alias("status"),
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    driver_threshold: int = _DRIVER_CC_THRESHOLD,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    same contract as :func:`connected_components` ((id, cluster_id),
    cluster_id = min member id) but converging in O(log n) rounds instead
    of O(diameter) iterations. Use this when duplicate chains can be LONG
    (crawl mirrors of mirrors, quote-chains): min-label propagation needs
    diameter-many join rounds, which a 200-link chain already pushes past
    any sane max_iter, while the star rounds collapse it in a handful.

    Each round is two groupBy-join passes over the edge list, shuffling
    (node, neighbor) pairs only:

    - large-star: every node connects its LARGER neighbors to the minimum
      of its neighborhood (incl. itself);
    - small-star: every node connects its smaller-or-equal neighbors to
      that minimum.

    The edge set converges to stars whose centers are the component
    minima; convergence is witnessed by the edge multiset hash, checked
    exactly (count + xor of per-edge hashes — order-insensitive, no
    driver-side edge materialization). Pair lists at or below
    ``driver_threshold`` take the same driver union-find fast path as
    :func:`connected_components`. The witness rides the same job
    that materializes each round's edge set (``Observation`` on the
    localCheckpoint pass), so a round costs exactly one job."""
    pairs = pairs.select(id_a, id_b).localCheckpoint()
    spark = pairs.sparkSession
    n_pairs = pairs.count()
    if n_pairs <= driver_threshold:
        return _driver_components(pairs, id_a, id_b)
    nparts = _cc_parallelism(spark, n_pairs)

    def _neighborhoods(e: DataFrame) -> DataFrame:
        # symmetrized adjacency: for each node, its neighbor multiset
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    with _iteration_confs(spark, nparts):
        # drop self-loops, orient arbitrarily; node list remembered for output
        edges = (
            pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .localCheckpoint()
        )
        nodes = (
            pairs.select(F.col(id_a).alias("id"))
            .union(pairs.select(F.col(id_b).alias("id")))
            .distinct()
            .localCheckpoint()
        )

        sig = None
        for _ in range(max_iter):
            # ---- large-star: (v, m) for v in N(u), v > u; m = min(N(u) + u)
            adj = _neighborhoods(edges)
            mins = adj.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m")
            )
            large = (
                adj.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            # ---- small-star on the large-star output: orient u > v, group,
            # connect all smaller neighbors (and u) to the minimum
            oriented = large.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
            small = (
                oriented.join(mins2, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            )
            obs = Observation()
            edges = (
                small.filter(F.col("u") != F.col("v"))
                .distinct()
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    F.expr(
                        "bit_xor(xxhash64(least(u, v), greatest(u, v)))"
                    ).alias("x"),
                )
                .localCheckpoint()
            )
            new_sig = (obs.get["n"], obs.get["x"])
            if new_sig == sig:
                break
            sig = new_sig
        # stars: every edge now points node -> component min
        labels = (
            _neighborhoods(edges)
            .groupBy(F.col("u").alias("id"))
            .agg(F.least(F.min("v"), F.first("u")).alias("cluster_id"))
        )
        out = nodes.join(labels, "id", "left").select(
            "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
        ).localCheckpoint()
    return out


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    method: str = "star",
) -> DataFrame:
    """Assign every row of ``df`` its duplicate-cluster id: connected
    components over ``pairs`` for matched rows, self-cluster for the rest.
    Output: (id_col, cluster_id, cluster_size). ``method``: "star"
    (default — O(log n) rounds, safe for adversarial chain depths) or
    "minlabel" (O(diameter) rounds — equivalent on typical shallow dup
    clusters). Both share the driver union-find fast path for small pair
    lists, so the choice only matters above ``_DRIVER_CC_THRESHOLD``."""
    algo = connected_components_star if method == "star" else connected_components
    cc = algo(pairs, pair_a, pair_b)
    out = (
        df.select(F.col(id_col))
        .join(cc, df[id_col] == cc["id"], "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
    # cluster_size via a window — one shuffle on cluster_id instead of a
    # groupBy branch plus a join back
    return out.select(
        id_col,
        "cluster_id",
        F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).alias("cluster_size"),
    )


def cluster_canonical(
    clustered: DataFrame,
    order_by: list,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Pick each duplicate cluster's CANONICAL row — what a production
    dedup actually ships (near-dup dedup keeps the best copy, not an
    arbitrary one; cf. dedup_exact's keep="first" policy for identical
    rows). ``order_by`` is the preference order (e.g. ``[F.col("quality")
    .desc(), F.col("doc_id")]`` — most valuable first, unique tiebreak
    last so the choice is deterministic).

    Adds ``canonical_id`` (the chosen row's id) and ``is_canonical``.
    Single window pass over the existing cluster partitioning — ONE
    shuffle on cluster_col and no join-back; at 100 TB the dup-cluster
    skew is bounded because near-dup clusters are small by construction
    (banded candidate generation caps pair fan-in), so no salting is
    needed on this window.
    """
    w = (
        Window.partitionBy(cluster_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    canonical = F.first(F.col(id_col)).over(w)
    return clustered.select(
        "*",
        canonical.alias("canonical_id"),
        (F.col(id_col) == canonical).alias("is_canonical"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Duplicated-span REMOVAL (the acting half of Lee et al. 2021 —
    `duplicated_span_stats` measures, this edits): every word ``n``-gram
    occurring more than once in the corpus keeps exactly its FIRST
    occurrence (min (id, position) — deterministic, growth-stable for
    sorted ids) and every other occurrence's positions are deleted; the
    cleaned text is rebuilt from the surviving words. Overlapping
    duplicate occurrences delete the union of their positions — the
    simple closed-form rule, stated here because overlap semantics are
    where span-dedup implementations silently diverge.

    Output: (id_col, n_tokens, n_kept, clean_text) — empty/blank docs
    pass through with clean_text = ''.

    Plan: positional spans hash to 8-byte keys row-locally (token array
    materialized FIRST — the no-CSE pitfall); keeper election is one
    map-side-combinable min-aggregate on the span hash; non-keeper
    occurrences explode to covered positions (n rows per occurrence,
    span text never shuffles); surviving words re-aggregate per doc via
    sort-in-place collect. Everything is keyed on span hash or doc id —
    no all-pairs stage anywhere.
    """
    # repartition BEFORE tokenizing (pitfall #5: a projection under the
    # exchange runs on the scan's single file partition)
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        word_tokens(normalize_text(text_col)).alias("_toks"),
    ).withColumn("_len", F.size("_toks"))
    words = base.select(
        "_id", "_len", F.posexplode("_toks").alias("_pos", "_word")
    )
    spans = base.where(F.col("_len") >= n).select(
        "_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, _len - {n}), i -> "
                f"struct(i as pos, xxhash64(concat_ws(' ', slice(_toks, i + 1, {n}))) as h))"
            )
        ).alias("_s"),
    ).select("_id", F.col("_s.pos").alias("_pos"), F.col("_s.h").alias("_h"))
    keepers = spans.groupBy("_h").agg(
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_k"),
        F.count(F.lit(1)).alias("_occ"),
    )
    covered = (
        spans.join(keepers.where(F.col("_occ") > 1), "_h")
        .where((F.col("_id") != F.col("_k._id")) | (F.col("_pos") != F.col("_k._pos")))
        .select(
            "_id", F.explode(F.sequence(F.col("_pos"), F.col("_pos") + n - 1)).alias("_pos")
        )
        .distinct()
    )
    kept = words.join(covered, ["_id", "_pos"], "left_anti")
    agg = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_word"))),
                lambda s: s["_word"],
            ),
        ).alias("clean_text"),
    )
    # left join from the full doc set: blank docs AND fully-deleted docs
    # (every position covered) must still appear, with clean_text = ''
    return base.select("_id", "_len").join(agg, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.col("_len").cast("long").alias("n_tokens"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def incremental_components(
    labeling: DataFrame,
    new_pairs: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Merge a NEW pair batch into an existing (id, cluster_id) labeling
    without recomputing components over history — the clustering
    counterpart of :func:`incremental_dedup` for the append-only corpus
    loop (per-crawl near-dup pairs arrive forever; the accumulated
    labeling is the state).

    Only components TOUCHED by the delta are recomputed:

    1. seed ids = both endpoints of ``new_pairs``;
    2. affected clusters = the seeds' current labels (ids unseen by the
       labeling are their own implicit singleton clusters);
    3. the affected subgraph = every labeling row in an affected cluster,
       re-expressed as (id — cluster) edges, plus the new pairs;
    4. :func:`connected_components` over that subgraph (star edges keep
       each old component connected, so transitive merges ACROSS old
       clusters resolve correctly);
    5. untouched labeling rows pass through unchanged.

    Result invariant (pinned by tests and the driver oracle): identical
    to a full `connected_components` over (all historical pairs ∪
    new_pairs), because a component's min-id label is independent of
    which spanning structure represents it — the star edges of an old
    cluster span exactly its member set.

    Scale shape: the delta cost is |new_pairs| + Σ|touched components|,
    NOT |corpus|. The labeling joins are equi-joins on cluster_id /
    id; at 100 TB keep the labeling bucketed by cluster_id so step 3
    is a bucket-local semi-join, and the untouched pass-through is an
    anti-join that never shuffles the big side (broadcast the affected
    cluster-id set — it is delta-sized)."""
    pairs = new_pairs.select(
        F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b")
    ).localCheckpoint()
    seeds = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # seeds' current clusters (seeds absent from the labeling are
    # singletons — their "cluster" is themselves and contributes no
    # additional members)
    seed_clusters = (
        seeds.join(labeling, id_col, "left")
        .select(F.coalesce(cluster_col, F.col(id_col)).alias(cluster_col))
        .distinct()
    )
    affected = labeling.join(
        F.broadcast(seed_clusters), cluster_col, "leftsemi"
    )
    # star edges (member — cluster label) span each affected component
    star = affected.select(
        F.col(id_col).alias("id_a"), F.col(cluster_col).alias("id_b")
    ).where(F.col("id_a") != F.col("id_b"))
    merged = connected_components(star.unionByName(pairs), "id_a", "id_b")
    untouched = labeling.join(
        F.broadcast(seed_clusters), cluster_col, "left_anti"
    )
    return untouched.select(id_col, cluster_col).unionByName(
        merged.select(
            F.col("id").alias(id_col), F.col("cluster_id").alias(cluster_col)
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep_regex: str = "\\n\\s*\\n",
    join_sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide paragraph dedup — the boilerplate-removal pass between
    document dedup (whole-doc digests miss shared nav/footer text) and
    span dedup (:func:`remove_duplicated_spans` hunts n-grams; this
    hunts STRUCTURAL units, which is what web boilerplate actually is).
    Every distinct normalized paragraph keeps exactly its first
    occurrence — keeper = min (id, position), deterministic and
    growth-stable for sorted ids — and later occurrences anywhere in the
    corpus are deleted; documents are rebuilt from surviving paragraphs
    in original order.

    Output: (id_col, n_paras, n_kept, clean_text); paragraph-less docs
    pass through intact.

    Plan: posexplode paragraphs (row-local split), keeper election is
    ONE map-side-combinable min-aggregate on the paragraph digest
    (16-byte key, corpus-boilerplate skew lands on the combiner), then a
    digest-keyed join back and a per-doc rebuild via sort_array over
    collected (pos, text) structs — shuffles key on digest then id,
    both well-spread. Nothing quadratic: a paragraph repeated 10⁸
    times is one combiner cell, not a join blow-up."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), sep_regex)
        ).alias("pos", "para"),
    ).withColumn("_dg", F.sha2(F.trim(F.col("para")), 256))
    keepers = paras.groupBy("_dg").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("_k")
    )
    marked = paras.join(keepers, "_dg").withColumn(
        "_keep",
        (F.col(id_col) == F.col("_k.i")) & (F.col("pos") == F.col("_k.p")),
    )
    rebuilt = (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("pos"), F.col("para")),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                join_sep,
            ).alias("clean_text"),
        )
    )
    # docs whose text had no split matches still produce one paragraph
    # row (split returns the whole text), so every input id is present
    return rebuilt


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    DISTINCT word n-grams that appear in no other document — the
    inverse signal of the near-dup family (duplicated_span_stats
    measures how much of a doc is shared; this measures how much is
    unique to it). Low novelty + not-exact-duplicate = template/
    boilerplate family member; curation pipelines use it to pick the
    canonical copy and to score "information added" for incremental
    crawls.

    Returns (``id_col``, ``n_grams``, ``novel_grams``, ``novelty``) per
    document with ≥ 1 gram, novelty rounded to 6, ordered by id.

    Scale shape: the inverted-index skeleton — one (gram) document-
    frequency aggregate and one gram-keyed join back to the per-doc
    distinct gram list (both shuffles on the gram key, co-partitioned),
    then a doc-keyed fold. Cardinality is Σ distinct grams per doc,
    linear in corpus size; no pair enumeration anywhere (df==1 is a
    property of the gram, not of a pair).
    """
    # repartition BEFORE the shingling select — a single-file input
    # otherwise tokenizes+shingles on one core (the winnowing 13s→4s
    # cliff; measured again here: 19s→4s at 5k docs)
    toks = ensure_parallelism(df).select(
        F.col(id_col),
        word_tokens(normalize_text(text_col)).alias("_toks"),
    )
    grams = toks.select(
        id_col,
        F.explode_outer(
            F.when(F.size("_toks") == 0, F.array().cast("array<string>")).otherwise(
                shingles_from_tokens("_toks", n)
            )
        ).alias("_g"),
    ).filter(F.col("_g").isNotNull()).distinct()
    dfreq = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    return (
        grams.join(dfreq, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).alias("novel_grams"),
        )
        .select(
            id_col,
            "n_grams",
            "novel_grams",
            F.round(
                F.col("novel_grams") / F.col("n_grams").cast("double"), 6
            ).alias("novelty"),
        )
        .orderBy(id_col)
    )
