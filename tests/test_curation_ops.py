"""Round-5 curation operators: PMI collocations, robust z-scores,
calibration curves, hard-negative mining, label propagation."""

import math

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators import (
    calibration_curve,
    hard_negatives,
    label_propagation,
    pmi_collocations,
    robust_zscore,
)


def test_pmi_collocations_hand_counts(spark):
    """Hand-countable corpus: only (a,b) reaches min_count=2; its PMI is
    log2((3/6) / ((3/9)*(3/9))) = log2(4.5)."""
    docs = spark.createDataFrame(
        [("a b a b",), ("a b c",), ("c c",)], "text string"
    )
    got = pmi_collocations(docs, min_count=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["token_a"], r["token_b"]) == ("a", "b")
    assert r["pair_count"] == 3 and r["count_a"] == 3 and r["count_b"] == 3
    assert abs(r["pmi"] - math.log2(4.5)) < 1e-9


def test_pmi_collocations_apriori_prune(spark):
    """A pair of infrequent tokens can never qualify (downward closure):
    'x y' repeats 3 times but x,y each appear only 3 < min_count=4."""
    docs = spark.createDataFrame(
        [("x y",), ("x y",), ("x y",), ("a a a a a",)], "text string"
    )
    got = pmi_collocations(docs, min_count=4).collect()
    assert [(r["token_a"], r["token_b"]) for r in got] == [("a", "a")]


def test_robust_zscore_median_mad(spark):
    """[1,2,3,4,100]: median 3, MAD 1 — the outlier does not drag the
    scale estimate (the whole point vs mean/stddev)."""
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4, 100]], "v double")
    got = {r["v"]: r for r in robust_zscore(df, "v").collect()}
    assert abs(got[100]["robust_z"] - 0.6745 * 97) < 1e-9
    assert got[100]["is_outlier"]
    assert abs(got[1]["robust_z"] + 0.6745 * 2) < 1e-9
    assert not got[1]["is_outlier"]
    assert got[3]["robust_z"] == 0.0


def test_robust_zscore_grouped_and_constant_group(spark):
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 100]] + [("b", 7.0)] * 4
    df = spark.createDataFrame(rows, "g string, v double")
    got = robust_zscore(df, "v", group_col="g").collect()
    b_rows = [r for r in got if r["g"] == "b"]
    assert all(r["robust_z"] == 0.0 and not r["is_outlier"] for r in b_rows)
    a_out = [r for r in got if r["g"] == "a" and r["is_outlier"]]
    assert [r["v"] for r in a_out] == [100.0]


def test_calibration_curve_bins_and_edge(spark):
    """Two rows in bin 0 with rate 0.5; score 1.0 closes into bin 9."""
    rows = [(0.05, True), (0.05, False), (1.0, True)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r["bin"]: r for r in calibration_curve(df, "score", "label").collect()}
    assert set(got) == {0, 9}
    b0 = got[0]
    assert b0["n_rows"] == 2
    assert abs(b0["mean_score"] - 0.05) < 1e-12
    assert abs(b0["positive_rate"] - 0.5) < 1e-12
    assert abs(b0["abs_gap"] - 0.45) < 1e-12
    assert got[9]["n_rows"] == 1 and got[9]["positive_rate"] == 1.0
    with pytest.raises(ValueError):
        calibration_curve(df, "score", "label", n_bins=1)


def test_hard_negatives_excludes_positives_and_ranks(spark):
    """Anchor 0 at e0; candidates at known cosines: 1 (0.999..., but a
    positive -> excluded), 2 (0.98), 3 (0.9), 4 (orthogonal). Top-2
    negatives must be [2, 3]."""
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),
        (2, [0.98, 0.2, 0.0]),
        (3, [0.9, 0.43, 0.0]),
        (4, [0.0, 1.0, 0.0]),
    ]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    anchors = spark.createDataFrame([(0,)], "anchor_id long")
    positives = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    got = hard_negatives(corpus, anchors, positives, k=2).collect()
    assert [(r["anchor_id"], r["negative_id"], r["rank"]) for r in got] == [
        (0, 2, 1),
        (0, 3, 2),
    ]
    # reversed positive orientation excludes too
    rev = spark.createDataFrame([(1, 0)], "id_a long, id_b long")
    got2 = hard_negatives(corpus, anchors, rev, k=2).collect()
    assert [r["negative_id"] for r in got2] == [2, 3]


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two triangles joined by one bridge edge: LPA must keep them as
    TWO communities (min-label CC would merge them across the bridge),
    each labeled by its min member."""
    from valentinus_spark.operators import symmetric_edges

    pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    edges = symmetric_edges(
        spark.createDataFrame(pairs, "src long, dst long")
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, rounds=4).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10


def test_label_propagation_deterministic_across_runs(spark):
    import random

    rnd = random.Random(7)
    pairs = list({(rnd.randrange(40), rnd.randrange(40)) for _ in range(120)})
    pairs = [(a, b) for a, b in pairs if a != b]
    from valentinus_spark.operators import symmetric_edges

    edges = symmetric_edges(spark.createDataFrame(pairs, "src long, dst long"))
    a = sorted(map(tuple, label_propagation(edges, rounds=3).collect()))
    b = sorted(map(tuple, label_propagation(edges, rounds=3).collect()))
    assert a == b


def test_association_rules_hand_counts(spark):
    """4 baskets: {a,b}, {a,b}, {a,c}, {b}. With min_support=2 the only
    qualifying pair is (a,b): support 0.5, conf(a->b) = 2/3,
    conf(b->a) = 2/3, lift = (2/3)/(3/4) = 8/9."""
    from valentinus_spark.operators import association_rules

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "basket", "item", min_support_count=2).collect()
    }
    assert set(got) == {("a", "b"), ("b", "a")}
    ab = got[("a", "b")]
    assert ab["pair_baskets"] == 2 and ab["baskets_a"] == 3 and ab["baskets_b"] == 3
    assert abs(ab["support"] - 0.5) < 1e-12
    assert abs(ab["confidence"] - 2 / 3) < 1e-12
    assert abs(ab["lift"] - 8 / 9) < 1e-12
    # duplicate (basket, item) rows must not double-count
    dup = df.union(df)
    got2 = association_rules(dup, "basket", "item", min_support_count=2).collect()
    assert {(r["antecedent"], r["consequent"]) for r in got2} == {("a", "b"), ("b", "a")}


def test_markov_transitions_counts_and_rows(spark):
    """user 1: a->b->a; user 2: b->b. Transition counts: a->b 1, b->a 1,
    b->b 1; p normalizes per source row."""
    from valentinus_spark.operators import markov_transitions

    rows = [
        (1, "a", 10, 100), (1, "b", 20, 101), (1, "a", 30, 102),
        (2, "b", 10, 200), (2, "b", 20, 201),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long, event_id long")
    got = {
        (r["prev_state"], r["state"]): (r["n_transitions"], r["p"])
        for r in markov_transitions(df).collect()
    }
    assert got == {
        ("a", "b"): (1, 1.0),
        ("b", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
    }


def test_markov_transitions_same_ts_tiebreak(spark):
    """Equal timestamps sequence by the tiebreak column, deterministically."""
    from valentinus_spark.operators import markov_transitions

    rows = [(1, "x", 10, 2), (1, "y", 10, 1)]  # y precedes x by event_id
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long, event_id long")
    got = [(r["prev_state"], r["state"]) for r in markov_transitions(df).collect()]
    assert got == [("y", "x")]


def test_embedding_pca_recovers_planted_direction(spark):
    """Anisotropic corpus: variance concentrated on e0 (scale 10) with
    unit noise elsewhere — PC1 must align with e0 and dominate the
    explained variance."""
    import numpy as np

    from valentinus_spark.operators import embedding_pca

    rng = np.random.default_rng(3)
    dim, n = 16, 400
    X = rng.standard_normal((n, dim))
    X[:, 0] *= 10.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    comps, ratios = embedding_pca(df, k=2)
    pc1 = np.array(comps[0])
    assert abs(abs(pc1[0]) - 1.0) < 0.05, "PC1 not aligned with planted axis"
    assert ratios[0] > 0.75
    assert abs(np.linalg.norm(pc1) - 1.0) < 1e-6


def test_winsorize_clips_to_band(spark):
    """Values clamp to the exact [0.25, 0.75] interpolated percentiles;
    row count is preserved (the contrast with relative_outlier_filter)."""
    from valentinus_spark.operators.profile import winsorize

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 10, 20, 30, 1000]], "v double"
    )
    # quantile_cont on [0,10,20,30,1000]: p25 = 10, p75 = 30
    got = sorted(
        r["v_wins"] for r in winsorize(df, "v", lo=0.25, hi=0.75).collect()
    )
    assert got == [10.0, 10.0, 20.0, 30.0, 30.0]
    assert winsorize(df, "v").count() == 5
    import pytest as _pytest
    with _pytest.raises(ValueError):
        winsorize(df, "v", lo=0.9, hi=0.1)


def test_winsorize_grouped(spark):
    from valentinus_spark.operators.profile import winsorize

    rows = [("a", 1.0), ("a", 2.0), ("a", 100.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["v"]): r["v_wins"]
        for r in winsorize(df, "v", group_col="g", lo=0.0, hi=0.5).collect()
    }
    # per-group medians: a -> 2.0, b -> 5.5
    assert got[("a", 100.0)] == 2.0 and got[("a", 1.0)] == 1.0
    assert got[("b", 6.0)] == 5.5


def test_embedding_drift_identical_and_shifted(spark):
    """Identical corpora: cosine 1, gap 0, var ratio 1. A mean-shifted,
    variance-doubled copy moves every panel number the expected way."""
    import numpy as np

    from valentinus_spark.operators.profile import embedding_drift

    rng = np.random.default_rng(11)
    X = rng.standard_normal((300, 8)) + 5.0  # nonzero mean for cosine
    a = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    same = embedding_drift(a, a).collect()[0]
    assert same["n_a"] == same["n_b"] == 300
    assert abs(same["mean_cosine"] - 1.0) < 1e-12
    assert same["mean_l2_gap"] < 1e-12
    assert abs(same["var_ratio_mean"] - 1.0) < 1e-12

    Y = (X - 5.0) * np.sqrt(2.0) + 7.0  # shift mean 5->7, double variance
    b = spark.createDataFrame(
        [(i, [float(x) for x in Y[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    moved = embedding_drift(a, b).collect()[0]
    assert moved["mean_l2_gap"] > 4.0  # ~sqrt(8 * 2^2) = 5.66 expected
    assert 1.7 < moved["var_ratio_mean"] < 2.3
    assert moved["mean_cosine"] > 0.97  # direction roughly preserved


def test_dsir_weights_favor_target_vocabulary(spark):
    """DSIR log-weights rank target-vocabulary docs above off-target ones:
    with target docs speaking {alpha, beta} and raw background speaking
    {gamma, delta}, an unlabeled alpha-doc must outscore an unlabeled
    gamma-doc, and weights must be invariant to partitioning (the decimal
    ratio sum is accumulation-order-free)."""
    from valentinus_spark.operators.mixture import dsir_importance_weights

    rows = (
        [(i, "alpha beta alpha beta", True) for i in range(10)]
        + [(100 + i, "gamma delta gamma delta", False) for i in range(10)]
        + [(900, "alpha beta alpha", False), (901, "gamma delta gamma", False)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_importance_weights(docs, F.col("is_t")).collect()
    }
    assert w[900] > w[901]
    assert all(w[i] > w[100 + j] for i in range(10) for j in range(10))
    w2 = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_importance_weights(docs.repartition(13), F.col("is_t")).collect()
    }
    assert w == w2


def test_gumbel_sample_key_replays_sha_arithmetic(spark):
    """gumbel_sample_key is exactly logw - ln(-ln(u)) with u derived from
    sha256 — replayed here in pure Python, proving cross-engine
    reproducibility doesn't depend on Spark internals."""
    import hashlib

    from valentinus_spark.operators.mixture import gumbel_sample_key

    df = spark.createDataFrame(
        [(7, 1.25), (42, -3.5)], "doc_id long, logw double"
    )
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", gumbel_sample_key("logw", "doc_id").alias("k")
        ).collect()
    }
    for doc_id, logw in [(7, 1.25), (42, -3.5)]:
        h32 = int(
            hashlib.sha256(f"dsir-g1{doc_id}".encode()).hexdigest()[:8], 16
        )
        u = (h32 + 0.5) / 4294967296.0
        assert got[doc_id] == round(logw - math.log(-math.log(u)), 4)


def test_neyman_allocation_hand_computed(spark):
    from valentinus_spark.operators.mixture import neyman_allocation

    # stratum a: N=4, values 0/0/10/10 -> sd=5;  b: N=2, constant -> sd=0
    # c: N=2, values 0/6 -> sd=3
    rows = (
        [("a", 0.0), ("a", 0.0), ("a", 10.0), ("a", 10.0)]
        + [("b", 7.0), ("b", 7.0)]
        + [("c", 0.0), ("c", 6.0)]
    )
    df = spark.createDataFrame(rows, "s string, v double")
    got = {r.s: r for r in neyman_allocation(df, "s", "v", total_n=4).collect()}
    # weights: a = 4*5 = 20, b = 0, c = 2*3 = 6 -> total 26
    assert got["a"].stddev == 5.0 and got["b"].stddev == 0.0 and got["c"].stddev == 3.0
    assert got["a"].weight == round(20 / 26, 6)
    assert got["b"].weight == 0.0
    # exact: a = 4*20/26 = 3.076923 -> floor 3; c = 4*6/26 = 0.923077 -> floor 0
    # deficit = 4 - 3 = 1 -> goes to c (largest fraction). b gets nothing.
    assert got["a"].alloc == 3 and got["c"].alloc == 1 and got["b"].alloc == 0


def test_neyman_allocation_clamps_to_stratum_size(spark):
    from valentinus_spark.operators.mixture import neyman_allocation

    # high-variance tiny stratum: Neyman wants more than it has rows;
    # clamp and re-spread the surplus to the stratum with room
    rows = [("tiny", 0.0), ("tiny", 1000.0)] + [("big", float(i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "s string, v double")
    got = {r.s: r for r in neyman_allocation(df, "s", "v", total_n=30).collect()}
    assert got["tiny"].alloc == 2          # clamped at N_h
    assert got["big"].alloc == 28          # surplus re-spread
    assert got["tiny"].alloc + got["big"].alloc == 30


def test_neyman_allocation_validation(spark):
    import pytest
    from valentinus_spark.operators.mixture import neyman_allocation

    df = spark.createDataFrame([("a", 1.0)], "s string, v double")
    with pytest.raises(ValueError):
        neyman_allocation(df, "s", "v", total_n=0)


def _py_bt(prefs, iters=10):
    """Python MM replay mirroring bt_ranking exactly (incl. the 9dp
    per-round resync and sum-to-1 normalization)."""
    from collections import Counter

    ordered = Counter((w, l) for w, l in prefs if w != l)
    sym = Counter()
    for (w, l), n in ordered.items():
        sym[(w, l)] += n
        sym[(l, w)] += n
    items = sorted({i for i, _ in sym})
    wins = {i: 0 for i in items}
    for (w, _), n in ordered.items():
        wins[w] += n
    theta = {i: 1.0 for i in items}
    for _ in range(iters):
        new = {}
        for i in items:
            d = sum(
                n / max(theta[i] + theta[j], 1e-12)
                for (a, j), n in sym.items()
                if a == i
            )
            new[i] = wins[i] / d
        tot = sum(new.values())
        theta = {i: round(v / tot, 9) for i, v in new.items()}
    ranked = sorted(items, key=lambda i: (-theta[i], i))
    return {
        i: (round(theta[i], 6), wins[i], sum(n for (a, _), n in sym.items() if a == i),
            ranked.index(i) + 1)
        for i in items
    }


def test_bt_ranking_matches_python_mm(spark):
    from valentinus_spark.operators.preference import bt_ranking

    prefs = (
        [("a", "b")] * 8 + [("b", "a")] * 2 + [("b", "c")] * 7 + [("c", "b")] * 3
        + [("a", "c")] * 9 + [("c", "a")] * 1 + [("d", "d")] * 5   # self-pairs dropped
        + [("c", "e")] * 4                                          # e never wins
    )
    df = spark.createDataFrame(prefs, "winner string, loser string")
    got = {
        r.item: (r.theta, r.wins, r.n_comparisons, r.rank)
        for r in bt_ranking(df, iters=10).collect()
    }
    want = _py_bt([p for p in prefs], iters=10)
    assert got == want
    # planted structure: a > b > c > e; zero-win item pins to theta 0
    assert [i for i, v in sorted(got.items(), key=lambda kv: kv[1][3])] == [
        "a", "b", "c", "e"
    ]
    assert got["e"][0] == 0.0


def test_bt_ranking_validation(spark):
    import pytest
    from valentinus_spark.operators.preference import bt_ranking

    df = spark.createDataFrame([("a", "b")], "winner string, loser string")
    with pytest.raises(ValueError):
        bt_ranking(df, iters=0)


def test_rbo_overlap_identical_and_disjoint(spark):
    """Identical rankings give RBO 1 (truncated form: Σ(1-p)p^(d-1) over
    d<=k ≈ 1-p^k); disjoint heads give 0; a head swap costs more than a
    tail swap (the top-weighting Spearman lacks)."""
    import pytest

    from valentinus_spark.operators import rbo_overlap

    rows = [(i, float(100 - i), float(100 - i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, ["id", "sa", "sb"])
    out = rbo_overlap(df, "id", "sa", "sb", k=20, p=0.9).collect()[0]
    assert out.rbo == pytest.approx(1 - 0.9**20, abs=1e-6)

    # completely reversed scores -> heads disjoint until depth ~n/2
    rows2 = [(i, float(100 - i), float(i)) for i in range(1, 21)]
    df2 = spark.createDataFrame(rows2, ["id", "sa", "sb"])
    low = rbo_overlap(df2, "id", "sa", "sb", k=10, p=0.9).collect()[0].rbo
    assert low < 0.1

    # swap ranks 1<->2 vs swap ranks 9<->10: head swap hurts more
    def swapped(a, b):
        sb = {i: float(100 - i) for i in range(1, 21)}
        sb[a], sb[b] = sb[b], sb[a]
        d = spark.createDataFrame(
            [(i, float(100 - i), sb[i]) for i in range(1, 21)], ["id", "sa", "sb"]
        )
        return rbo_overlap(d, "id", "sa", "sb", k=20, p=0.9).collect()[0].rbo

    assert swapped(1, 2) < swapped(9, 10)


def test_rbo_matches_python_replica(spark):
    import pytest

    from valentinus_spark.operators import rbo_overlap

    import random

    rng = random.Random(5)
    ids = list(range(30))
    sa = {i: float(v) for i, v in zip(ids, rng.sample(range(1000), 30))}
    sb = {i: float(v) for i, v in zip(ids, rng.sample(range(1000), 30))}
    df = spark.createDataFrame(
        [(i, sa[i], sb[i]) for i in ids], ["id", "sa", "sb"]
    )
    k, p = 15, 0.85
    got = rbo_overlap(df, "id", "sa", "sb", k=k, p=p).collect()[0].rbo

    ra = [i for i, _ in sorted(sa.items(), key=lambda kv: (-kv[1], kv[0]))][:k]
    rb = [i for i, _ in sorted(sb.items(), key=lambda kv: (-kv[1], kv[0]))][:k]
    total = 0.0
    for d in range(1, k + 1):
        ov = len(set(ra[:d]) & set(rb[:d]))
        total += round(p ** (d - 1) * ov / d, 12)
    want = round((1 - p) * total, 6)
    assert got == pytest.approx(want, abs=1e-6)


def test_dp_median_lands_near_true_median(spark):
    """With eps=2 on a 1..100 grid the mechanism concentrates hard
    around the median; the replayable draw must land within a few grid
    steps. Exact true median asserted."""
    from valentinus_spark.operators import dp_median

    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], ["v"])
    r = dp_median(df, "v", epsilon=2.0).collect()[0]
    assert r.n == 100
    assert r.true_median == pytest.approx(50.5, abs=1e-9)
    assert abs(r.dp_median - 50.5) < 10
    assert r.epsilon == pytest.approx(2.0)


def test_dp_median_is_replayable_and_eps_sensitive(spark):
    """Same salt -> identical release on rerun; different salt may move
    it (the draw is the only nondeterminism and it is seeded)."""
    from valentinus_spark.operators import dp_median

    df = spark.createDataFrame([(float(v % 17),) for v in range(200)], ["v"])
    a = dp_median(df, "v", epsilon=1.0).collect()[0]
    b = dp_median(df, "v", epsilon=1.0).collect()[0]
    assert a.dp_median == b.dp_median

    import pytest as _pt

    with _pt.raises(ValueError):
        dp_median(df, "v", epsilon=0.0)


def test_dp_median_data_independent_grid(spark):
    """With public grid bounds the candidate support is the uniform
    lo..hi grid, independent of which values the data holds (r7
    ADVICE: the default's data-derived support leaks membership).
    eps=2 on 1..100 data with a [0, 128] 129-step integer grid must
    release a grid point near the median — and the released value must
    be a GRID point, not necessarily a data value."""
    from valentinus_spark.operators import dp_median

    df = spark.createDataFrame(
        [(float(v) + 0.25,) for v in range(1, 101)], ["v"]
    )
    r = dp_median(
        df, "v", epsilon=2.0, grid_lo=0.0, grid_hi=128.0, grid_steps=129
    ).collect()[0]
    assert r.true_median == pytest.approx(50.75, abs=1e-9)
    # grid points are integers; data values are x.25 — support is the grid
    assert r.dp_median == int(r.dp_median)
    assert abs(r.dp_median - 50.75) < 10
    # replayable with the same salt
    r2 = dp_median(
        df, "v", epsilon=2.0, grid_lo=0.0, grid_hi=128.0, grid_steps=129
    ).collect()[0]
    assert r2.dp_median == r.dp_median

    with pytest.raises(ValueError):
        dp_median(df, "v", grid_lo=0.0)  # hi missing
    with pytest.raises(ValueError):
        dp_median(df, "v", grid_lo=5.0, grid_hi=1.0)


def test_kfold_assign_grouped_and_stable(spark):
    """Same key -> same fold everywhere (grouping is automatic when
    keyed on the group column); folds stay stable when the corpus
    grows; k<2 rejected."""
    from valentinus_spark.functions.text import kfold_assign

    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(100)], ["id", "g"]
    )
    tagged = df.select("g", kfold_assign(F.col("g"), k=5)).distinct()
    # each of the 7 groups maps to exactly ONE fold
    assert tagged.count() == 7
    folds1 = {r.g: r.fold for r in tagged.collect()}

    bigger = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(500)], ["id", "g"]
    )
    folds2 = {
        r.g: r.fold
        for r in bigger.select("g", kfold_assign(F.col("g"), k=5)).distinct().collect()
    }
    assert folds1 == folds2  # growth-stable

    import pytest as _pt

    with _pt.raises(ValueError):
        kfold_assign(F.col("g"), k=1)
