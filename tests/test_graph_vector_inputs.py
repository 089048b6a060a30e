"""Graph-shape and vector-content crash screens — two more degenerate
classes in the test_empty_inputs.py style.

1. NASTYGRAPH: self-loops, parallel (duplicate) edges, node ids at both
   ends of the int64 domain, and an isolated two-node component, fed
   through symmetric_edges (the documented entry point) into the whole
   graph family. Extreme ids stress any id arithmetic (hash, sequence,
   subtraction) and the loop/dup handling stresses degree math.
2. NASTYVEC: embedding components at +-1e300 (dot products reach +-Inf,
   norms of two huge vectors divide Inf/Inf into NaN), the zero vector,
   a subnormal-only vector whose squared norm UNDERFLOWS to 0.0 (a
   zero-division seam invisible to any zero-vector guard), NaN and Inf
   components. Every similarity/ANN/hygiene operator must survive;
   NaN/Inf SCORES in the output are acceptable, crashes are not.
"""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators import graph, similarity

LMAX = 9223372036854775807


# ---------------------------------------------------------------------------
# 1. NASTYGRAPH
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gedges(spark):
    pairs = spark.createDataFrame(
        [
            (1, 2), (1, 2), (2, 1),          # parallel duplicates, both ways
            (5, 5),                           # self-loop
            (1, 3), (2, 3),                   # triangle 1-2-3
            (LMAX, LMAX - 1),                 # extreme-id edge
            (-LMAX - 1, LMAX),                # spans the whole int64 domain
            (100, 101),                       # isolated component
            (3, LMAX),
        ],
        "src long, dst long",
    )
    return graph.symmetric_edges(pairs)


GRAPH_CASES = {
    "pagerank": lambda e: graph.pagerank(e, iterations=3),
    "triangle_count": lambda e: graph.triangle_count(e),
    "k_core": lambda e: graph.k_core(e, k=2),
    "label_propagation": lambda e: graph.label_propagation(e, rounds=2),
    "adamic_adar": lambda e: graph.adamic_adar(e, k=10),
    "jaccard_links": lambda e: graph.jaccard_link_prediction(e, k=10),
    "degree_assortativity": lambda e: graph.degree_assortativity(e),
    "clustering_coefficient": lambda e: graph.clustering_coefficient(e),
    "hits": lambda e: graph.hits(e, iterations=2),
    "ppr": lambda e: graph.personalized_pagerank(e, seeds=[1, LMAX], iterations=3),
    "bfs": lambda e: graph.bfs_distances(e, [1], max_iters=5),
    "bfs_extreme_seed": lambda e: graph.bfs_distances(e, [-LMAX - 1], max_iters=5),
    "k_truss": lambda e: graph.k_truss(e, k=3, max_iters=5),
}


@pytest.mark.parametrize("name", sorted(GRAPH_CASES))
def test_graph_survives_loops_dups_extreme_ids(spark, gedges, name):
    GRAPH_CASES[name](gedges).collect()


def test_symmetric_edges_drop_loops_and_dups(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (5, 5)], "src long, dst long"
    )
    rows = {(r.src, r.dst) for r in graph.symmetric_edges(pairs).collect()}
    assert rows == {(1, 2), (2, 1)}


def test_triangle_count_unaffected_by_parallel_input(spark, gedges):
    # the 1-2-3 triangle is the only one; loops/dups/extreme ids add none
    assert graph.triangle_count(gedges).first()["n_triangles"] == 1


# ---------------------------------------------------------------------------
# 2. NASTYVEC
# ---------------------------------------------------------------------------

NAN, INF = float("nan"), float("inf")


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.5, 0.5, 0.5, 0.5]),
        (2, [1e300, 0.0, 0.0, 0.0]),
        (3, [1e300, 1e300, 0.0, 0.0]),     # norm^2 overflows to +Inf
        (4, [1e300, 1e300, 0.0, 0.0]),     # parallel huge: cos = Inf/Inf
        (5, [0.0, 0.0, 0.0, 0.0]),         # zero vector
        (6, [5e-324, 0.0, 0.0, 0.0]),      # norm^2 underflows to 0.0
        (7, [-1e300, 1e300, -1e300, 1e300]),
        (8, [NAN, 1.0, 0.0, 0.0]),
        (9, [INF, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(df):
    return df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


VEC_CASES = {
    "brute_knn": lambda v: similarity.brute_force_knn_join(
        v, _queries(v), k=3, corpus_id="vec_id"
    ),
    "semantic_dedup_pairs": lambda v: similarity.semantic_dedup_pairs(
        v, n_centroids=2, threshold=0.9
    ),
    "semantic_dedup": lambda v: similarity.semantic_dedup(
        v, n_centroids=2, threshold=0.9
    ),
    "kcenter_coreset": lambda v: similarity.kcenter_coreset(v, k=3),
    "knn_outliers": lambda v: similarity.knn_distance_outliers(v, k=2, topn=5),
    "matryoshka": lambda v: similarity.matryoshka_fidelity(
        v, _queries(v), dims=[2, 4], k=3
    ),
}


@pytest.mark.parametrize("name", sorted(VEC_CASES))
def test_vector_ops_survive_extreme_components(spark, vecs, name):
    VEC_CASES[name](vecs).collect()


def test_embedding_mean_and_pca_survive(spark, vecs):
    similarity.embedding_mean(vecs)
    comps, ratios = similarity.embedding_pca(vecs, k=1)
    assert len(comps) == 1
    similarity.remove_top_components(vecs, comps).collect()


def test_brute_knn_clean_query_ranks_clean_corpus_first(spark, vecs):
    # q0 = [1,0,0,0]: its own copy (id 0) must outrank every
    # NaN/Inf-scored row — Spark's float total order sorts NaN above
    # +Inf, so a DESC rank with naive ordering would surface the
    # garbage rows first if scores aren't guarded
    out = similarity.brute_force_knn_join(
        vecs, _queries(vecs).filter("qid = 0"), k=1, corpus_id="vec_id"
    ).collect()
    assert out and out[0]["vec_id"] == 0
