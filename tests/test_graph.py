"""PageRank tests (operators/graph.py) against a numpy power-iteration
oracle with the same fixed-round, per-round-rounded semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.graph import (
    copurchase_edges,
    pagerank,
    symmetric_edges,
)


def _np_pagerank(edge_list, iterations=8, damping=0.85):
    nodes = sorted({x for e in edge_list for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for s, _ in edge_list:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - damping) / n)
        for s, d in edge_list:
            nxt[idx[d]] += damping * r[idx[s]] / out[s]
        r = np.round(nxt, 9)
    return {v: r[idx[v]] for v in nodes}


def test_loop_partitions_sizing(spark):
    from valentinus_spark.operators.graph import _loop_partitions

    wide = spark.range(10).repartition(64)
    narrow = spark.range(10).repartition(2)
    # tiny list on a wide layout floors at 4 useful tasks, not 64
    assert _loop_partitions(10, wide) == 4
    # a layout already below the floor passes through
    assert _loop_partitions(10, narrow) == 2
    # mid-size: ~300k rows per partition
    assert _loop_partitions(1_500_000, wide) == 5
    # at-scale row counts exceed the current layout: untouched
    assert _loop_partitions(300_000_000, wide) == 64


def test_compact_if_small_right_sizes_midsize_frames(spark):
    from valentinus_spark.operators.graph import _compact_if_small

    tiny = spark.range(1_000).repartition(32).localCheckpoint()
    got, n = _compact_if_small(tiny)
    assert n == 1_000 and got.rdd.getNumPartitions() == 1
    assert got.count() == 1_000

    mid = spark.range(150_000).repartition(64).localCheckpoint()
    got, n = _compact_if_small(mid)
    assert n == 150_000 and got.rdd.getNumPartitions() == 4
    assert got.count() == 150_000


def test_symmetric_edges_dedup_and_no_self_loops(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 1), (2, 2), (2, 3)], "src int, dst int")
    got = {(r["src"], r["dst"]) for r in symmetric_edges(pairs).collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_pagerank_matches_numpy_power_iteration(spark):
    rng = np.random.default_rng(9)
    raw = {(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2)) if a != b}
    sym = list(raw | {(b, a) for a, b in raw})
    df = spark.createDataFrame(sym, "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=8).collect()}
    exp = _np_pagerank(sym, iterations=8)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-8, v
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_pagerank_hub_ranks_highest(spark):
    # star graph: center 0 linked with every leaf (symmetric)
    pairs = spark.createDataFrame([(0, i) for i in range(1, 8)], "src int, dst int")
    ranks = {r["node"]: r["rank"] for r in pagerank(symmetric_edges(pairs)).collect()}
    assert ranks[0] == max(ranks.values())
    leaf_vals = {v for k, v in ranks.items() if k != 0}
    assert len(leaf_vals) == 1  # symmetric leaves tie exactly


def test_copurchase_edges_within_order_only(spark):
    li = spark.createDataFrame(
        [(100, 1), (100, 2), (100, 2), (200, 2), (200, 3), (300, 9)],
        "l_orderkey long, l_partkey long",
    )
    got = {(r["src"], r["dst"]) for r in copurchase_edges(li).collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}  # 9 is alone in its order


# ------------------------------------------------------ triangle count


from valentinus_spark.operators.graph import triangle_count  # noqa: E402


def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles) + a pendant edge + an isolated pair
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    edges += [(4, 5), (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_edges"] == 8  # 6 in K4 + 2 extra
    assert row["n_vertices"] == 7


def test_triangle_count_matches_naive_python(spark):
    import itertools
    import random

    rng = random.Random(7)
    es = {tuple(sorted(rng.sample(range(30), 2))) for _ in range(120)}
    df = spark.createDataFrame([(a, b) for a, b in es], "src long, dst long")
    expected = sum(
        1
        for a, b, c in itertools.combinations(range(30), 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    assert triangle_count(df).collect()[0]["n_triangles"] == expected


def test_triangle_count_direction_and_dup_insensitive(spark):
    tri = [(1, 2), (2, 3), (3, 1)]
    noisy = tri + [(b, a) for a, b in tri] + tri  # reversed + duplicated
    df = spark.createDataFrame(noisy, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert (row["n_triangles"], row["n_edges"]) == (1, 3)


def test_k_core_peels_to_planted_clique(spark):
    """Planted structure: a 6-clique (every vertex degree 5), a long
    path and pendant trees hanging off it. The 3-core must be exactly
    the clique (degree 5 inside), everything else peeled — including
    path vertices whose initial degree was >= 3 only via peeled
    neighbors (the fixpoint matters, not one pass)."""
    from valentinus_spark.operators.graph import k_core

    edges = []
    clique = list(range(6))
    for i in clique:
        for j in clique:
            if i < j:
                edges.append((i, j))
    # a path 100..110 attached to clique vertex 0
    edges.append((0, 100))
    edges += [(100 + i, 101 + i) for i in range(10)]
    # stars around path vertices (initial degree of 103 is 2+3=5, still peels)
    edges += [(103, 200 + i) for i in range(3)]
    edges += [(105, 300 + i) for i in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long")

    got = {r["id"]: r["degree"] for r in k_core(df, k=3).collect()}
    assert got == {i: 5 for i in range(6)}
    # 2-core of a clique+trees: still just the clique (trees have leaves)
    got2 = {r["id"] for r in k_core(df, k=2).collect()}
    assert got2 == set(range(6))
    # k larger than any degree -> empty
    assert k_core(df, k=6).count() == 0


def test_adamic_adar_path_and_adjacency_exclusion(spark):
    """Path 1-2-3 plus edge 3-4: AA(1,3) would score via center 2 but 1-3
    is NOT an edge → predicted; adjacent pairs are excluded; the score is
    exactly round(1/ln(deg(center)), 4)."""
    import math

    from valentinus_spark.operators.graph import adamic_adar, symmetric_edges

    e = symmetric_edges(
        spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    )
    got = {(r["node_a"], r["node_b"]): r for r in adamic_adar(e, k=10).collect()}
    # centers: deg(2)=2, deg(3)=2 → term 1/ln(2)
    assert set(got) == {(1, 3), (2, 4)}
    assert got[(1, 3)]["common_neighbors"] == 1
    assert got[(1, 3)]["aa_score"] == round(round(1.0 / math.log(2.0), 6), 4)


def test_adamic_adar_hub_cut_drops_high_degree_centers(spark):
    """Star: hub 0 connected to 1..5. Every leaf pair shares only the hub;
    with max_degree below the hub's degree nothing is predicted, without
    the cap all 10 leaf pairs are."""
    from valentinus_spark.operators.graph import adamic_adar, symmetric_edges

    e = symmetric_edges(
        spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    )
    assert adamic_adar(e, k=100, max_degree=3).count() == 0
    assert adamic_adar(e, k=100).count() == 10


def test_hits_hand_computed_star(spark):
    """Directed star: 1->3, 2->3, 3->4. Hand-replay of 1 L1-normalized
    iteration from uniform 0.25: auth_raw = {3: 0.5, 4: 0.25} -> auth =
    {3: 2/3, 4: 1/3}; hub_raw = {1: 2/3, 2: 2/3, 3: 1/3} -> hub =
    {1: 0.4, 2: 0.4, 3: 0.2}."""
    from valentinus_spark.operators import hits

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], ["src", "dst"]
    )
    out = {r.node: r for r in hits(edges, iterations=1).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[3].auth == pytest.approx(2 / 3, abs=1e-6)
    assert out[4].auth == pytest.approx(1 / 3, abs=1e-6)
    assert out[1].auth == 0.0 and out[2].auth == 0.0
    assert out[1].hub == pytest.approx(0.4, abs=1e-6)
    assert out[2].hub == pytest.approx(0.4, abs=1e-6)
    assert out[3].hub == pytest.approx(0.2, abs=1e-6)
    assert out[4].hub == 0.0


def test_hits_converges_to_principal_structure(spark):
    """Bipartite 2-hub/3-authority block plus a weak appendix: after a
    few rounds the block's authorities dominate and the appendix decays
    — the qualitative fixed point HITS exists to find. Also pins the
    invariant that both score vectors stay L1-normalized (sum to ~1)."""
    from valentinus_spark.operators import hits

    block = [(h, a) for h in (1, 2) for a in (10, 11, 12)]
    appendix = [(3, 13)]
    edges = spark.createDataFrame(block + appendix, ["src", "dst"])
    out = {r.node: r for r in hits(edges, iterations=6).collect()}
    assert sum(r.hub for r in out.values()) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.auth for r in out.values()) == pytest.approx(1.0, abs=1e-4)
    assert out[10].auth > 5 * out[13].auth
    assert out[1].hub > 5 * out[3].hub
    assert out[10].auth == pytest.approx(out[11].auth, abs=1e-6)


def test_personalized_pagerank_concentrates_near_seeds(spark):
    """Two triangles joined by one bridge edge: seeding in triangle A
    must rank A's members above B's (global pagerank would tie them by
    symmetry), and ranks still sum to ~1."""
    from valentinus_spark.operators import personalized_pagerank, symmetric_edges

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
        ["src", "dst"],
    )
    edges = symmetric_edges(pairs)
    out = {r.node: r.rank for r in personalized_pagerank(edges, seeds=[1]).collect()}
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)
    assert out[1] > out[2] > out[5]
    assert out[2] == pytest.approx(out[3] * 1.0, rel=0.5)  # same side
    assert min(out[1], out[2], out[3]) > max(out[5], out[6])


def test_personalized_pagerank_python_replica(spark):
    from valentinus_spark.operators import personalized_pagerank, symmetric_edges

    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    edges = symmetric_edges(pairs)
    got = {r.node: r.rank for r in personalized_pagerank(edges, seeds=[1, 4], iterations=6).collect()}

    es = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    nodes = [1, 2, 3, 4]
    deg = {u: sum(1 for a, _ in es if a == u) for u in nodes}
    rank = {u: (0.5 if u in (1, 4) else 0.0) for u in nodes}
    for _ in range(6):
        c = {u: 0.0 for u in nodes}
        for a, b in es:
            c[b] += rank[a] / deg[a]
        rank = {
            u: round((0.075 if u in (1, 4) else 0.0) + 0.85 * c[u], 9)
            for u in nodes
        }
    for u in nodes:
        assert got[u] == pytest.approx(rank[u], abs=1e-8), u


def test_jaccard_link_prediction_hand_graph(spark):
    """Path graph 1-2-3 plus 1-4, 3-4: candidates (1,3) share {2,4} of
    union {2,4}∪{2,4} -> J=1.0 ... hand-enumerated on a 4-node graph."""
    from valentinus_spark.operators import jaccard_link_prediction

    und = [(1, 2), (2, 3), (1, 4), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {
        (r.node_a, r.node_b): r
        for r in jaccard_link_prediction(df, k=10).collect()
    }
    # non-adjacent pairs: (1,3) N={2,4}/{2,4} J=1; (2,4) N={1,3}/{1,3} J=1
    assert set(out) == {(1, 3), (2, 4)}
    assert out[(1, 3)].common_neighbors == 2
    assert out[(1, 3)].jaccard == pytest.approx(1.0, abs=1e-9)
    assert out[(2, 4)].jaccard == pytest.approx(1.0, abs=1e-9)


def test_jaccard_vs_adamic_adar_ordering_difference(spark):
    """A fraction-heavy pair must beat a hub-mediated pair on Jaccard.
    Star hub h connects a,b plus 6 others; c,d share their only two
    neighbors x,y. Jaccard ranks (c,d)=1.0 over (a,b)=1/... ."""
    from valentinus_spark.operators import jaccard_link_prediction

    und = [("h", n) for n in ["a", "b", "o1", "o2", "o3", "o4", "o5", "o6"]]
    und += [("c", "x"), ("c", "y"), ("d", "x"), ("d", "y")]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = jaccard_link_prediction(df, k=50).collect()
    scores = {(r.node_a, r.node_b): r.jaccard for r in rows}
    assert scores[("c", "d")] == pytest.approx(1.0, abs=1e-9)
    assert scores[("a", "b")] == pytest.approx(1.0, abs=1e-9)  # deg=1 each: {h}/{h}
    # a vs c share nothing -> absent
    assert ("a", "c") not in scores


def test_bfs_distances_ring_with_tail(spark):
    """Ring 1..8 + tail 9-10 off node 5, source 1: ring distances are
    min(k-1, 9-k); tail = dist(5)+1, +2."""
    from valentinus_spark.operators import bfs_distances

    und = [(i, i + 1) for i in range(1, 8)] + [(8, 1), (5, 9), (9, 10)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.dist for r in bfs_distances(df, [1]).collect()}
    want = {k: min(k - 1, 9 - k) for k in range(1, 9)}
    want[9] = want[5] + 1
    want[10] = want[5] + 2
    assert got == want


def test_bfs_distances_multi_source_and_unreachable(spark):
    """Two sources: every node takes the nearer one; a disconnected
    component never appears."""
    from valentinus_spark.operators import bfs_distances

    und = [(1, 2), (2, 3), (3, 4), (4, 5), (100, 101)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.dist for r in bfs_distances(df, [1, 5]).collect()}
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}
    assert 100 not in got and 101 not in got


def test_bfs_distances_string_node_ids(spark):
    """String node ids are first-class across the graph family
    (k_core, label_propagation are type-agnostic); the seed frontier
    must follow the edge list's id type instead of int()-casting
    (r7 ADVICE: graph.py bfs_distances raised ValueError on 'a')."""
    from valentinus_spark.operators import bfs_distances

    und = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.dist for r in bfs_distances(df, ["a"]).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    # int seeds against an int graph still work (no behavior change)
    und2 = [(1, 2), (2, 3)]
    df2 = spark.createDataFrame(und2 + [(b, a) for a, b in und2], ["src", "dst"])
    got2 = {r.node: r.dist for r in bfs_distances(df2, [1]).collect()}
    assert got2 == {1: 0, 2: 1, 3: 2}


def test_bfs_distances_max_iters_truncates(spark):
    from valentinus_spark.operators import bfs_distances

    und = [(i, i + 1) for i in range(1, 10)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.dist for r in bfs_distances(df, [1], max_iters=3).collect()}
    assert max(got.values()) == 3 and set(got) == {1, 2, 3, 4}


def test_k_truss_clique_survives_trees_vanish(spark):
    """5-clique + hanging chains: 4-truss = exactly the clique (every
    clique edge sits in 3 triangles >= k-2=2; chain edges in 0)."""
    from itertools import combinations

    from valentinus_spark.operators import k_truss

    clique = list(combinations(range(1, 6), 2))
    chains = [(5, 10), (10, 11), (11, 12), (3, 20), (20, 21)]
    und = clique + chains
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.node_a, r.node_b): r.support for r in k_truss(df, k=4).collect()}
    assert set(got) == set(clique)
    assert all(s == 3 for s in got.values())


def test_k_truss_cascading_peel(spark):
    """Triangle fan where removing weak edges cascades: two triangles
    sharing an edge — 4-truss needs every edge in >=2 triangles; only
    the shared edge has 2, so after the outer edges (1 triangle each)
    drop, everything unravels -> empty."""
    from valentinus_spark.operators import k_truss

    und = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert k_truss(df, k=4).count() == 0
    # but 3-truss (support >= 1) keeps all five edges
    assert k_truss(df, k=3).count() == 5
