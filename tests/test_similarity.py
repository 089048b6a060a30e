"""Similarity-search operator tests vs numpy oracles (operators/similarity.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.query import cosine_topk, nearest_topk
from valentinus_spark.operators.similarity import (
    brute_force_knn_join,
    bucketed_ann_topk,
    lsh_ann_index,
)


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((80, 16)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    return df, mat


def np_topk(mat, q, k):
    sims = (mat.astype(np.float64) @ q) / (
        np.linalg.norm(mat.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    return [int(i) for i in np.argsort(-sims, kind="stable")[:k]]


def test_cosine_topk_matches_numpy(embs):
    df, mat = embs
    q = np.array(mat[7], dtype=np.float64)
    got = [r["id"] for r in cosine_topk(df, list(q), k=5).collect()]
    assert got == np_topk(mat, q, 5)
    assert got[0] == 7  # self is most similar


def test_nearest_topk_matches_numpy(embs):
    df, mat = embs
    q = np.array(mat[11], dtype=np.float64)
    got = [r["id"] for r in nearest_topk(df, list(q), k=3).collect()]
    dists = np.linalg.norm(mat.astype(np.float64) - q, axis=1)
    assert got == [int(i) for i in np.argsort(dists, kind="stable")[:3]]


def test_brute_force_knn_join(embs):
    df, mat = embs
    queries = df.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = brute_force_knn_join(df, queries, k=4, corpus_id="id").collect()
    by_q = {}
    for r in sorted(out, key=lambda r: (r["qid"], r["rank"])):
        by_q.setdefault(r["qid"], []).append(r["id"])
    for qid in range(3):
        assert by_q[qid] == np_topk(mat, mat[qid].astype(np.float64), 4)


def test_bucketed_ann_recall(embs):
    df, mat = embs
    centroids = [list(mat[i]) for i in (0, 20, 40, 60)]
    queries = df.filter(F.col("id") < 5).select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = bucketed_ann_topk(df, queries, centroids, k=5, nprobe=2, corpus_id="id")
    rows = out.collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(r["id"])
    # approximate: require decent overlap with exact top-5, and self found
    for qid in range(5):
        exact = set(np_topk(mat, mat[qid].astype(np.float64), 5))
        assert qid in got[qid]
        assert len(set(got[qid]) & exact) >= 2


def test_ivf_centroids_and_recall(embs):
    from valentinus_spark.operators.similarity import ivf_centroids

    df, mat = embs
    cents = ivf_centroids(df, n_centroids=4)
    assert len(cents) == 4 and len(cents[0]) == 16
    queries = df.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = bucketed_ann_topk(df, queries, cents, k=5, nprobe=2, corpus_id="id")
    got = {}
    for r in sorted(out.collect(), key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(r["id"])
    for qid in range(3):
        exact = set(np_topk(mat, mat[qid].astype(np.float64), 5))
        assert qid in got[qid]
        assert len(set(got[qid]) & exact) >= 3  # kmeans buckets beat random


def test_ivf_centroids_unbiased_on_sorted_corpus(spark):
    """Regression: the training slice used to be limit(max_train) = the
    FIRST rows in storage order. On a corpus sorted by topic/language that
    trains all centroids inside the first topic. With seeded random
    sampling every topic is represented: the 4 true cluster means must map
    to 4 DISTINCT learned centroids."""
    from valentinus_spark.operators.similarity import ivf_centroids

    rng = np.random.default_rng(11)
    means = np.eye(4, 16) * 10.0  # 4 well-separated cluster centers
    rows = []
    for c in range(4):  # sorted by cluster — the adversarial layout
        pts = means[c] + 0.1 * rng.standard_normal((500, 16))
        rows += [(c * 500 + i, [float(x) for x in pts[i]]) for i in range(500)]
    df = spark.createDataFrame(
        rows, "id long, embedding array<float>"
    ).coalesce(1)  # single partition preserves the sorted order end-to-end
    cents = np.array(ivf_centroids(df, n_centroids=4, max_train=400, seed=5))
    nearest = {
        int(((cents - means[c]) ** 2).sum(axis=1).argmin()) for c in range(4)
    }
    assert len(nearest) == 4  # one centroid per true cluster


def test_lsh_index_and_query(embs):
    df, mat = embs
    model, hashed = lsh_ann_index(df, id_col="id", num_hash_tables=4)
    assert hashed.count() == 80 and "_hashes" in hashed.columns
    from pyspark.ml.functions import array_to_vector

    key_df = df.filter(F.col("id") == 5).select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("v")
    )
    key = key_df.first()["v"]
    nn = model.approxNearestNeighbors(hashed, key, 3).collect()
    assert nn[0]["id"] == 5  # exact self comes back first


def test_lsh_ann_recall_at_10(spark):
    """Persisted-LSH probe recall@10 vs exact L2 top-10 at sf0.1 (2000
    vectors) under TIGHT buckets — the configuration that actually prunes
    candidates at scale must still find >= 9 of the true 10."""
    from pyspark.ml.linalg import Vectors

    df = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    mat = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    rng = np.random.default_rng(7)
    q = rng.standard_normal(64)
    q /= np.linalg.norm(q)
    exact = set(np.argsort(np.linalg.norm(mat - q, axis=1), kind="stable")[:10])

    model, hashed = lsh_ann_index(
        df, id_col="vec_id", bucket_length=1.0, num_hash_tables=6
    )
    got = {
        r["vec_id"]
        for r in model.approxNearestNeighbors(hashed, Vectors.dense(q), 10).collect()
    }
    assert len(got & exact) >= 9


def test_quantize_roundtrip_error_bounded(embs):
    from valentinus_spark.functions.vector import (
        dequantize_embedding,
        quantize_embedding,
    )

    embs, _ = embs
    df = embs.select(
        "id", "embedding", quantize_embedding("embedding").alias("qs")
    ).withColumn("back", dequantize_embedding("qs"))
    rows = df.select("embedding", "back").collect()
    for r in rows:
        orig, back = r["embedding"], r["back"]
        mx = max(abs(x) for x in orig) or 1.0
        step = mx / 127.0
        assert all(abs(a - b) <= step * 0.51 for a, b in zip(orig, back))


def test_quantized_cosine_preserves_topk(embs):
    """Cosine over int8-quantized vectors must keep >= 8/10 of the float
    top-10 (scale cancels in cosine; only rounding noise remains)."""
    from pyspark.sql import functions as F

    from valentinus_spark.functions.vector import (
        cosine_similarity,
        dequantize_embedding,
        quantize_embedding,
    )

    embs, _ = embs
    q = [r["embedding"] for r in embs.filter(F.col("id") == 0).collect()][0]
    exact = [
        r["id"]
        for r in embs.withColumn("s", cosine_similarity("embedding", q))
        .orderBy(F.desc("s"), F.asc("id")).limit(10).collect()
    ]
    quant = embs.select(
        "id", dequantize_embedding(quantize_embedding("embedding")).alias("emb_q")
    )
    approx = [
        r["id"]
        for r in quant.withColumn("s", cosine_similarity("emb_q", q))
        .orderBy(F.desc("s"), F.asc("id")).limit(10).collect()
    ]
    assert len(set(exact) & set(approx)) >= 8


def test_mmr_rerank_matches_python_oracle(embs):
    import numpy as np

    from valentinus_spark.operators.similarity import brute_force_knn_join, mmr_rerank

    df, mat = embs
    queries = df.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cands = brute_force_knn_join(df, queries, k=20, corpus_id="id").join(
        df.select(F.col("id"), F.col("embedding")), "id"
    )
    got = {}
    for r in mmr_rerank(cands, k=5, lam=0.7).collect():
        got.setdefault(r["qid"], []).append(r["id"])

    unit = mat.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    for qid in range(3):
        rows = sorted(
            [(r["id"], r["similarity"]) for r in cands.filter(F.col("qid") == qid).collect()]
        )
        ids = [i for i, _ in rows]
        rel = np.array([s for _, s in rows])
        picked, max_sim = [], np.full(len(ids), -1.0)
        for _ in range(5):
            mmr = 0.7 * rel - 0.3 * np.where(max_sim < 0, 0.0, max_sim)
            for p in picked:
                mmr[p] = -np.inf
            best = int(mmr.argmax())
            picked.append(best)
            sims = unit[ids] @ unit[ids[best]]
            max_sim = np.maximum(max_sim, sims)
        assert got[qid] == [ids[p] for p in picked], f"query {qid}"


def test_mmr_lambda_one_is_pure_relevance(embs):
    from valentinus_spark.operators.similarity import brute_force_knn_join, mmr_rerank

    df, _ = embs
    queries = df.filter(F.col("id") == 0).select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cands = brute_force_knn_join(df, queries, k=10, corpus_id="id").join(
        df.select("id", "embedding"), "id"
    )
    by_rel = [r["id"] for r in cands.orderBy(F.desc("similarity"), F.asc("id")).collect()][:5]
    mmr = [r["id"] for r in mmr_rerank(cands, k=5, lam=1.0).orderBy("mmr_rank").collect()]
    assert mmr == by_rel


def test_random_projection_shape_and_determinism(spark):
    from valentinus_spark.operators.similarity import random_projection

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = random_projection(df, vec_col="embedding", out_dim=16, seed=1)
    rows = {r["vec_id"]: r["rp_vec"] for r in out.collect()}
    assert all(len(v) == 16 for v in rows.values())
    # same seed -> identical projection; different seed -> different
    rows2 = {
        r["vec_id"]: r["rp_vec"]
        for r in random_projection(df, out_dim=16, seed=1).collect()
    }
    assert rows == rows2
    rows3 = {
        r["vec_id"]: r["rp_vec"]
        for r in random_projection(df, out_dim=16, seed=2).collect()
    }
    assert rows != rows3


def test_rp_ann_recall_on_clustered_corpus(spark):
    """JL prefilter recall on a corpus with real neighborhood structure:
    10 planted neighbors at cosine ~0.9 among 2000 random 64-d vectors.
    (On an unstructured corpus — e.g. the synthetic testdata embeddings,
    where the exact 'top-10' sit a hair above background noise — NO
    prefilter preserves the top-k; that isn't the ANN regime.)"""
    import numpy as np

    from valentinus_spark.operators.similarity import rp_ann_topk

    rng = np.random.default_rng(11)
    q = rng.standard_normal(64)
    q /= np.linalg.norm(q)
    noise = rng.standard_normal((2000, 64))
    noise /= np.linalg.norm(noise, axis=1)[:, None]
    # rows 0..9: q + perturbation (cosine ~0.9); rest: random
    mat = noise.copy()
    mat[:10] = q + 0.5 * noise[:10]
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(2000)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [float(x) for x in q])], "qid long, qvec array<double>"
    )
    got = {
        r["vec_id"]
        for r in rp_ann_topk(
            corpus, queries, k=10, corpus_id="vec_id", out_dim=16, mult=4
        ).collect()
    }
    assert len(got) == 10
    assert len(got & set(range(10))) >= 9


def test_label_cluster_stats_matches_numpy(spark):
    import numpy as np

    from valentinus_spark.operators.similarity import label_cluster_stats

    rng = np.random.default_rng(3)
    rows = []
    for lbl in (0, 1):
        base = rng.standard_normal(8)
        for i in range(20):
            v = base + 0.3 * rng.standard_normal(8)
            rows.append((lbl * 100 + i, lbl, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {
        r["label"]: (r["n_vecs"], r["avg_cos"], r["min_cos"])
        for r in label_cluster_stats(df).collect()
    }
    for lbl in (0, 1):
        mat = np.array([v for (_, l, v) in rows if l == lbl])
        cent = mat.mean(axis=0)
        cos = (mat @ cent) / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(cent)
        )
        assert got[lbl][0] == 20
        assert got[lbl][1] == pytest.approx(round(float(cos.mean()), 4), abs=1e-9)
        assert got[lbl][2] == pytest.approx(round(float(cos.min()), 4), abs=1e-9)
    # tight clusters around distinct bases: members should hug the centroid
    assert got[0][1] > 0.7 and got[1][1] > 0.7


def test_semantic_dedup_drops_planted_group(spark):
    """10 planted near-identical embeddings collapse to their min id; the
    unrelated background corpus survives intact."""
    import numpy as np

    from valentinus_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal(32)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(10):  # ids 0..9: tight near-dup group around `base`
        # 0.03·N(0,1)^32 ⇒ perturbation norm ≈ 0.17, mutual cosine ≈ 0.97
        v = base + 0.03 * rng.standard_normal(32)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    for i in range(10, 210):  # ids 10..209: random unit background
        v = rng.standard_normal(32)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {r["vec_id"] for r in semantic_dedup(df, n_centroids=4, threshold=0.9).collect()}
    assert kept == {0} | set(range(10, 210))


def test_semantic_dedup_transitive_chain(spark):
    """A~B and B~C but A~C below threshold must still collapse to one
    representative (the connected-components step, not pairwise-only)."""
    from valentinus_spark.operators.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9397, 0.342, 0.0]),   # ~20° from 0
        (2, [0.766, 0.6428, 0.0]),   # ~40° from 0, ~20° from 1
        (3, [0.0, 0.0, 1.0]),        # unrelated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # cos(20°)=0.94 ≥ 0.93 links 0-1 and 1-2; cos(40°)=0.766 does not
    kept = {r["vec_id"] for r in semantic_dedup(df, n_centroids=2, threshold=0.93).collect()}
    assert kept == {0, 3}


def test_pq_encode_and_adc_recall(spark):
    """PQ end-to-end: codebook shapes, encode determinism and
    nearest-centroid correctness vs numpy, and ADC top-k recall on a
    planted cluster (10 vectors near the query, background far) — the
    planted set must be exactly the ADC top-10 despite quantization."""
    import numpy as np

    from valentinus_spark.operators.similarity import (
        pq_ann_topk,
        pq_codebooks,
        pq_encode,
    )

    rng = np.random.default_rng(7)
    dim, n = 32, 400
    base = rng.standard_normal((n, dim)).astype(np.float32)
    qv = rng.standard_normal(dim).astype(np.float32)
    base[:10] = qv + 0.05 * rng.standard_normal((10, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "id long, embedding array<float>",
    )
    books = pq_codebooks(df, m=4, k=16, seed=3)
    assert len(books) == 4 and len(books[0]) == 16 and len(books[0][0]) == 8

    enc = pq_encode(df, books)
    rows = {r["id"]: r["pq_code"] for r in enc.collect()}
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c) for c in rows.values())
    # numpy oracle for the assignment of one row
    cb = [np.array(b) for b in books]
    for probe in (0, 57, 399):
        v = base[probe].astype(np.float64)
        expect = [
            int(((cb[j] - v[j * 8 : (j + 1) * 8]) ** 2).sum(axis=1).argmin())
            for j in range(4)
        ]
        assert rows[probe] == expect, probe

    queries = spark.createDataFrame(
        [(0, [float(x) for x in qv])], "qid long, qvec array<float>"
    )
    top = pq_ann_topk(enc, queries, books, k=10)
    got = {r["id"] for r in top.collect()}
    assert got == set(range(10))

    # m must divide dim
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pq_codebooks(df, m=5, k=8)


def test_pq_refined_matches_brute_force(spark):
    """ADC shortlist + exact re-rank must return the TRUE cosine top-k
    on smooth data (the shortlist is wide enough that quantization
    cannot evict a true neighbor) — refinement turns an approximate
    ranking into exact results at shortlist cost."""
    import numpy as np

    from valentinus_spark.operators.similarity import (
        brute_force_knn_join,
        pq_ann_topk_refined,
        pq_codebooks,
        pq_encode,
    )

    rng = np.random.default_rng(11)
    dim, n = 32, 300
    base = rng.standard_normal((n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "id long, embedding array<float>",
    )
    qv = [float(x) for x in rng.standard_normal(dim)]
    queries = spark.createDataFrame([(0, qv)], "qid long, qvec array<float>")

    books = pq_codebooks(df, m=4, k=16, seed=5)
    corpus = pq_encode(df, books)
    refined = pq_ann_topk_refined(
        corpus, queries, books, k=5, shortlist_factor=12
    )
    got = [(r["id"], round(r["similarity"], 6)) for r in refined.orderBy("rank").collect()]
    brute = brute_force_knn_join(
        df, queries, k=5, corpus_id="id", corpus_vec="embedding",
        query_id="qid", query_vec="qvec",
    )
    expect = [
        (r["id"], round(r["similarity"], 6))
        for r in brute.orderBy(F.desc("similarity"), F.asc("id")).collect()
    ]
    assert got == expect


def test_semantic_dedup_hot_cluster_pair_bound(spark):
    """Skew stress (r4 VERDICT weak item): one planted hot cluster — ALL
    vectors mutually above threshold, a single centroid — must NOT
    degenerate to C(n,2) pair work. The deterministic hash sub-split
    keeps total pairs ~<= max_cluster*n/2, and semantic_dedup still
    collapses each sub-bucket to one representative."""
    import math

    from valentinus_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    n, dim, cap = 1200, 8, 100
    rows = [
        (i, [1.0] + [0.001 * ((i * 7 + j) % 11) for j in range(dim - 1)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one_centroid = [[1.0] + [0.0] * (dim - 1)]

    pairs = semantic_dedup_pairs(
        df, centroids=one_centroid, threshold=0.5, max_cluster=cap
    )
    cnt = pairs.count()
    # unbounded would be C(1200,2) = 719_400; the bound target is
    # cap*n/2 = 60_000 with hash-split variance slack
    assert cnt < cap * n, f"pair count {cnt} not bounded by cap*n"
    assert cnt < math.comb(n, 2) / 5, "salting did not engage"

    kept = semantic_dedup(
        df, centroids=one_centroid, threshold=0.5, max_cluster=cap
    )
    n_kept = kept.count()
    # one representative per sub-bucket: ceil(n/cap) = 12 sub-buckets
    assert n_kept <= 2 * math.ceil(n / cap), f"kept {n_kept}, expected ~12 reps"

    # cap disabled -> exact within-cluster behavior: everything collapses
    # to the single min-id representative
    kept_exact = semantic_dedup(
        df, centroids=one_centroid, threshold=0.5, max_cluster=None
    )
    assert kept_exact.count() == 1


def test_kcenter_coreset_farthest_point_traversal(spark):
    """1-D points 0..16 embedded on an axis: greedy from min id picks
    0, 16, 8, then the (min-dist 4) tier with min-id tie-break -> 4,
    12. min_dist decreases monotonically after rank 2."""
    from valentinus_spark.operators.similarity import kcenter_coreset

    rows = [(i, [float(i), 0.0]) for i in range(17)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kcenter_coreset(df, k=5).collect()
    assert [(r["rank"], r["vec_id"]) for r in got] == [
        (1, 0), (2, 16), (3, 8), (4, 4), (5, 12),
    ]
    dists = [r["min_dist"] for r in got]
    assert dists[0] == 0.0 and dists[1] == 16.0 and dists[2] == 8.0
    assert dists[3] == dists[4] == 4.0

    # k larger than corpus: selection exhausts without error
    tiny = spark.createDataFrame(rows[:3], "vec_id long, embedding array<float>")
    assert kcenter_coreset(tiny, k=10).count() == 3


def test_remove_top_components_abtt(spark):
    """A shared bias direction dominates every vector; after pca + abtt
    the residual signal separates again: planted near-pairs' cosine
    margin over background recovers."""
    import numpy as np

    from valentinus_spark.operators.similarity import (
        embedding_pca,
        remove_top_components,
    )
    from valentinus_spark.functions.vector import cosine_similarity

    rng = np.random.default_rng(9)
    dim, n = 16, 200
    bias = np.zeros(dim); bias[0] = 1.0
    X = 0.15 * rng.standard_normal((n, dim)) + 5.0 * bias  # bias swamps signal
    X[1] = X[0] + 0.01 * rng.standard_normal(dim)  # planted near-pair
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    from valentinus_spark.operators.similarity import embedding_mean

    mu = embedding_mean(df)
    assert abs(mu[0] - 5.0) < 0.1  # the planted offset
    comps, ratios = embedding_pca(df, k=1)
    cleaned = remove_top_components(df, comps, mean=mu)
    # unit norm restored
    row = cleaned.where("vec_id = 5").first()
    assert abs(sum(x * x for x in row["embedding"]) - 1.0) < 1e-9
    # determinism + shape preserved
    assert cleaned.count() == n and len(row["embedding"]) == dim

    # before: EVERY pair looks similar (bias-dominated cosine ~1)
    def pairwise_cos(frame, a, b):
        va = frame.where(f"vec_id = {a}").first()["embedding"]
        return float(
            frame.where(f"vec_id = {b}")
            .select(cosine_similarity("embedding", [float(x) for x in va]).alias("c"))
            .first()["c"]
        )

    raw_bg = pairwise_cos(df, 0, 7)
    assert raw_bg > 0.95, "bias must dominate the raw space"
    clean_pair = pairwise_cos(cleaned, 0, 1)
    clean_bg = pairwise_cos(cleaned, 0, 7)
    assert clean_pair > 0.95
    assert clean_bg < 0.6, "abtt must break the bias-induced similarity"


def test_margin_mine_recovers_planted_alignment(spark):
    """Source vectors, target = copies of the first half + orthogonal
    decoys: mutual-best margin pairs must be exactly the planted identity
    alignment (cosine 1.0, margin > 1), never a decoy."""
    import numpy as np

    from valentinus_spark.operators.similarity import margin_mine

    rng = np.random.default_rng(7)
    base = rng.normal(size=(12, 16)).astype("float32")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(12)],
        "src_id long, embedding array<float>",
    )
    tgt_rows = [(100 + i, [float(x) for x in base[i]]) for i in range(8)]
    decoys = rng.normal(size=(4, 16)).astype("float32")
    decoys /= np.linalg.norm(decoys, axis=1, keepdims=True)
    tgt_rows += [(200 + j, [float(x) for x in decoys[j]]) for j in range(4)]
    tgt = spark.createDataFrame(tgt_rows, "tgt_id long, embedding array<float>")
    got = {r["src_id"]: r for r in margin_mine(src, tgt, k=3, threshold=1.05).collect()}
    assert set(got) == set(range(8))
    for i in range(8):
        assert got[i]["tgt_id"] == 100 + i
        assert got[i]["cosine"] == 1.0
        assert got[i]["margin"] > 1.05


def test_matryoshka_fidelity_planted_prefix_structure(spark):
    """Corpus where the FIRST 4 dims carry all signal: truncating to 4
    dims must preserve the full ranking (overlap 1.0); truncating to a
    noise-only prefix cannot (construction puts disagreeing info in
    dims 5-8). The full-length row is always overlap 1.0."""
    import numpy as np

    from valentinus_spark.operators import matryoshka_fidelity

    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        head = rng.rand(4) * 10.0  # dominant prefix
        tail = rng.rand(4) * 0.01  # negligible tail
        rows.append((i, [float(x) for x in np.concatenate([head, tail])]))
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(100 + j, rows[j][1]) for j in range(3)], ["qid", "qvec"]
    )
    out = {r.dim: r for r in matryoshka_fidelity(corpus, queries, [4], k=5).collect()}
    assert set(out) == {4, 8}
    assert out[8].mean_overlap == 1.0  # full vs full
    assert out[4].mean_overlap >= 0.8  # dominant prefix preserves ranking
    assert out[4].k == 5 and out[4].n_queries == 3


def test_matryoshka_fidelity_degrades_for_tail_signal(spark):
    """Mirror corpus: the signal lives in the TAIL dims, so a head-only
    truncation must lose ranking fidelity (overlap well below 1)."""
    import numpy as np

    from valentinus_spark.operators import matryoshka_fidelity

    rng = np.random.RandomState(11)
    rows = []
    for i in range(60):
        head = rng.rand(4) * 0.01
        tail = rng.rand(4) * 10.0
        rows.append((i, [float(x) for x in np.concatenate([head, tail])]))
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(100 + j, rows[j][1]) for j in range(3)], ["qid", "qvec"]
    )
    out = {r.dim: r for r in matryoshka_fidelity(corpus, queries, [4], k=5).collect()}
    assert out[4].mean_overlap < 0.8
    assert out[8].mean_overlap == 1.0


def test_matryoshka_fidelity_empty_queries(spark):
    """Degenerate input (ADVICE r8): an empty query set keeps the
    documented pre-contract EMPTY result — still the 4-column schema,
    zero rows (not a 0/0 row per dim)."""
    from valentinus_spark.operators import matryoshka_fidelity

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, 0.1]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    queries = spark.createDataFrame([], "qid long, qvec array<double>")
    out = matryoshka_fidelity(corpus, queries, [2], k=3)
    assert [f.name for f in out.schema.fields] == [
        "dim", "k", "n_queries", "mean_overlap"
    ]
    assert dict(out.dtypes)["mean_overlap"] == "double"
    assert out.count() == 0


def test_matryoshka_fidelity_empty_corpus(spark):
    """Degenerate input (ADVICE r8): an empty CORPUS used to crash
    (first() is None -> None["_d"] TypeError before the denom==0
    guard); it must return the same empty 4-column result."""
    from valentinus_spark.operators import matryoshka_fidelity

    corpus = spark.createDataFrame([], "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], ["qid", "qvec"]
    )
    out = matryoshka_fidelity(corpus, queries, [2], k=3)
    assert [f.name for f in out.schema.fields] == [
        "dim", "k", "n_queries", "mean_overlap"
    ]
    assert out.count() == 0


def test_knn_distance_outliers_planted(spark):
    """A tight 30-point cluster plus two planted far points: the far
    points must rank 1-2 with much larger k-th distances, and the
    k-th-distance values must match a numpy replay."""
    import numpy as np

    from valentinus_spark.operators import knn_distance_outliers

    rng = np.random.RandomState(3)
    pts = [(i, [float(x) for x in rng.rand(8) * 0.5]) for i in range(30)]
    pts.append((100, [50.0] * 8))
    pts.append((101, [-40.0] * 8))
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    out = knn_distance_outliers(df, k=3, topn=5).collect()
    assert [r.vec_id for r in out[:2]] == [100, 101]
    assert out[0].kth_dist > 10 * out[2].kth_dist

    X = {i: np.array(v) for i, v in pts}
    import math

    def kth(i, k=3):
        ds = sorted(
            round(float(np.linalg.norm(X[i] - X[j])), 4)
            for j in X if j != i
        )
        return ds[k - 1]

    for r in out:
        assert r.kth_dist == pytest.approx(kth(r.vec_id), abs=1e-4), r.vec_id


def test_knn_distance_outliers_undersized_corpus_falls_back(spark):
    """ADVICE r6: a corpus with n <= k rows must fall back to each
    vector's (n-1)-th neighbor distance instead of silently returning
    an empty frame (row_number never reached k)."""
    import numpy as np

    from valentinus_spark.operators import knn_distance_outliers

    pts = [(0, [0.0, 0.0]), (1, [3.0, 4.0]), (2, [6.0, 8.0])]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    out = {r.vec_id: r.kth_dist for r in knn_distance_outliers(df, k=5, topn=10).collect()}
    # every vector survives with its farthest (2nd of 2) neighbor distance
    assert set(out) == {0, 1, 2}
    X = {i: np.array(v) for i, v in pts}
    for i in X:
        want = max(round(float(np.linalg.norm(X[i] - X[j])), 4) for j in X if j != i)
        assert out[i] == pytest.approx(want, abs=1e-4)


def test_matryoshka_fidelity_undersized_corpus_full_dim_is_one(spark):
    """ADVICE r6: with fewer corpus rows than k the full-dimension
    sanity row must still report mean_overlap == 1.0 (denominator is
    the actual top-list size, not nq*k)."""
    import numpy as np

    from valentinus_spark.operators import matryoshka_fidelity

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.rand(8)]) for i in range(4)]  # 4 < k=10
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame([(100, rows[0][1])], ["qid", "qvec"])
    out = {r.dim: r for r in matryoshka_fidelity(corpus, queries, [4], k=10).collect()}
    assert out[8].mean_overlap == 1.0
    assert 0.0 <= out[4].mean_overlap <= 1.0


def test_assign_to_centroids_planted(spark):
    """Row-local nearest-centroid assignment: planted members land with
    their own centroid; an equidistant vector ties to the LOWER index."""
    from valentinus_spark.operators.similarity import assign_to_centroids

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (0, [10.0, 0.1, 0.0, 0.0]),   # -> centroid 0
        (1, [0.2, 5.0, 0.0, 0.0]),    # -> centroid 1
        (2, [1.0, 1.0, 0.0, 0.0]),    # exact tie -> lower index 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r for r in assign_to_centroids(df, cents).collect()}
    assert got[0]["cluster"] == 0 and got[1]["cluster"] == 1
    assert got[2]["cluster"] == 0  # tie-break to lowest centroid index
    assert got[0]["centroid_sim"] > 0.99

    import pytest as _pytest
    with _pytest.raises(ValueError):
        assign_to_centroids(df, [])


def test_cluster_balanced_sample_quota_and_determinism(spark):
    """sqrt-quota law: a 90/10 split samples ceil(sqrt(90))=10 vs
    ceil(sqrt(10))=4 — the big cluster cannot monopolize. The pick is
    sha-deterministic: two runs return identical rows."""
    import math

    from valentinus_spark.operators.similarity import cluster_balanced_sample

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(i, [1.0, 0.01 * (i % 7)]) for i in range(90)]
    rows += [(100 + i, [0.01, 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cluster_balanced_sample(df, cents).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r["cluster"], []).append(r)
    assert len(by_c[0]) == math.ceil(math.sqrt(90)) == 10
    assert len(by_c[1]) == math.ceil(math.sqrt(10)) == 4
    for r in by_c[0]:
        assert r["n_members"] == 90 and r["quota"] == 10 and r["vec_id"] < 90
    for r in by_c[1]:
        assert r["n_members"] == 10 and r["quota"] == 4 and r["vec_id"] >= 100
    again = cluster_balanced_sample(df, cents).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_cluster_prototypes_planted(spark):
    """The prototype must be the planted most-central member; mean_sim
    reflects the cluster's cohesion (tight cluster > loose cluster)."""
    from valentinus_spark.operators.similarity import cluster_prototypes

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    rows = [
        (0, [1.0, 0.001, 0.0]),  # essentially the centroid -> prototype
        (1, [1.0, 0.3, 0.0]),
        (2, [1.0, 0.5, 0.0]),
        (10, [0.4, 1.0, 0.0]),   # loose cluster 1
        (11, [0.0, 1.0, 0.9]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["cluster"]: r for r in cluster_prototypes(df, cents).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n_members"] == 3 and got[0]["prototype_id"] == 0
    assert got[1]["n_members"] == 2
    assert got[0]["mean_sim"] > got[1]["mean_sim"]
    assert got[0]["prototype_sim"] >= got[0]["mean_sim"]


def test_embedding_dim_stats_matches_numpy(spark):
    """Per-dimension panel vs a numpy replica on 6dp-rounded elements."""
    import numpy as np

    from valentinus_spark.operators.similarity import embedding_dim_stats

    rng = np.random.default_rng(3)
    X = rng.normal(scale=[0.1, 5.0, 1.0], size=(40, 3))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    got = {r["dim"]: r for r in embedding_dim_stats(df).collect()}
    X6 = np.round(X, 6)
    for d in range(3):
        assert got[d]["n"] == 40
        assert got[d]["mean"] == round(float(X6[:, d].mean()), 6) + 0.0
        assert abs(got[d]["std"] - float(X6[:, d].std())) < 1e-6
        assert got[d]["min_x"] == round(float(X6[:, d].min()), 6)
        assert got[d]["max_x"] == round(float(X6[:, d].max()), 6)
    # the planted scale ordering survives: dim1 (sigma=5) widest
    assert got[1]["std"] > got[2]["std"] > got[0]["std"]
