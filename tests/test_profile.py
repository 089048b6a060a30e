"""Column profiling + deterministic sample quantiles (operators/profile.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.profile import column_profile, hash_sample_quantiles


def test_column_profile_values(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "x"), (2, None, "y"), (3, 10.0, "7"), (4, 20.0, None)],
        "a int, b double, c string",
    )
    out = {r["column"]: r for r in column_profile(df, ["a", "b", "c"]).collect()}
    assert out["a"]["n"] == 4 and out["a"]["n_null"] == 0
    assert out["a"]["n_distinct"] == 4
    assert (out["a"]["min_v"], out["a"]["max_v"]) == (1.0, 4.0)
    assert out["b"]["n_null"] == 1 and out["b"]["n_distinct"] == 2
    # strings profile through try_cast: 'x'/'y' → null, '7' → 7.0
    assert out["c"]["n_null"] == 3
    assert (out["c"]["min_v"], out["c"]["max_v"]) == (7.0, 7.0)


def test_column_profile_single_scan(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    plan = (
        column_profile(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") <= 1


def _hq(i, salt="hsq-v1"):
    return int(hashlib.sha256(f"{salt}{i}".encode()).hexdigest()[:8], 16)


def test_hash_sample_quantiles_exact_on_full_sample(spark):
    # k >= n: the "sample" is the whole table → exact order statistics
    df = spark.createDataFrame([(i, float(i)) for i in range(101)], "id int, v double")
    out = {
        r["q"]: r["quantile_value"]
        for r in hash_sample_quantiles(
            df, "v", "id", qs=[0.0, 0.25, 0.5, 1.0], k=1000
        ).collect()
    }
    assert out == {0.0: 0.0, 0.25: 25.0, 0.5: 50.0, 1.0: 100.0}


def test_hash_sample_quantiles_matches_python_replay(spark):
    df = spark.createDataFrame(
        [(i, float((i * 37) % 500)) for i in range(400)], "id int, v double"
    )
    out = {
        r["q"]: r["quantile_value"]
        for r in hash_sample_quantiles(df, "v", "id", qs=[0.5, 0.9], k=64).collect()
    }
    sample_ids = sorted(range(400), key=lambda i: (_hq(i), i))[:64]
    vals = sorted(((i * 37) % 500, i) for i in sample_ids)
    for q in (0.5, 0.9):
        assert out[q] == float(vals[int(q * 63)][0])


def test_hash_sample_quantiles_grouped_and_deterministic(spark):
    rows = [("a", i, float(i)) for i in range(200)] + [
        ("b", i, float(1000 + i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    r1 = sorted(
        map(
            tuple,
            hash_sample_quantiles(
                df, "v", "id", qs=[0.5], k=32, group_cols=["g"]
            ).collect(),
        )
    )
    r2 = sorted(
        map(
            tuple,
            hash_sample_quantiles(
                df.repartition(13), "v", "id", qs=[0.5], k=32, group_cols=["g"]
            ).collect(),
        )
    )
    assert r1 == r2 and len(r1) == 2
    # group b's median must come from group b's value range
    med_b = dict((r[0], r[2]) for r in r1)["b"]
    assert 1000 <= med_b < 1050


def test_exact_quantiles_matches_sorted_truth_with_ties(spark):
    import math

    from valentinus_spark.operators.profile import exact_quantiles

    # heavy ties + nulls: rank-at-value must stay deterministic
    data = [(float(i % 7),) for i in range(999)] + [(None,)] * 5
    df = spark.createDataFrame(data, "v double")
    qs = [0.001, 0.25, 0.5, 0.75, 1.0]
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "v", qs, n_ranges=8).collect()}
    vals = sorted(x for (x,) in data if x is not None)
    want = {q: vals[max(1, math.ceil(q * len(vals))) - 1] for q in qs}
    assert got == want


def test_exact_quantiles_single_data_exchange(spark):
    """Plan shape: ONE range exchange carries the values; ranking adds
    no further data shuffle (offsets are a broadcast)."""
    import re

    from tests.test_plans import plan_of
    from valentinus_spark.operators.profile import exact_quantiles

    df = spark.range(1000).selectExpr("cast(id as double) v")
    plan = plan_of(exact_quantiles(df, "v", [0.5]))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # every Exchange on the value side is the single rangepartitioning;
    # hashpartitioning exchanges may appear only under the tiny offsets
    # aggregation, never carrying _v
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "_v" not in m.group(1)


def test_quantile_discretize_equal_frequency_and_ties(spark):
    from valentinus_spark.operators.profile import quantile_discretize

    # distinct values -> bins within one row of equal frequency
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    sizes = {
        r["bin"]: r["n"]
        for r in quantile_discretize(df, "v", n_bins=4)
        .groupBy("bin")
        .agg(__import__("pyspark").sql.functions.count("*").alias("n"))
        .collect()
    }
    assert set(sizes) == {0, 1, 2, 3}
    assert all(24 <= n <= 26 for n in sizes.values())

    # heavy ties: one dominant value -> ties all land in ONE bin
    tied = spark.createDataFrame(
        [(5.0,)] * 90 + [(float(i),) for i in range(10)], "v double"
    )
    # all three cut points equal 5.0, and 5 > 5 is false -> the tied
    # mass sits in bin 0 (bins 1-2 empty), deterministically
    out = quantile_discretize(tied, "v", n_bins=4).where("v = 5.0").select("bin")
    assert {r["bin"] for r in out.collect()} == {0}
    above = quantile_discretize(tied, "v", n_bins=4).where("v > 5.0").select("bin")
    assert {r["bin"] for r in above.collect()} == {3}


def test_histogram_quantiles_bounded_error_and_merge_equivalence(spark):
    """histogram_quantiles: every estimate within one bin width of the
    exact quantile; the histogram's cell-wise additivity means two
    half-corpus histograms (same bounds) sum to the full one — the
    mergeability that GK/t-digest style summaries only approximate."""
    from valentinus_spark.operators.profile import (
        equi_width_histogram,
        histogram_quantiles,
    )

    n, bins = 5000, 100
    df = spark.range(n).select(((F.col("id") * 37) % 9973).cast("double").alias("v"))
    qs = [0.1, 0.5, 0.9, 1.0]
    got = {r["q"]: r["quantile_est"] for r in histogram_quantiles(df, "v", qs, n_bins=bins).collect()}
    vals = sorted(r["v"] for r in df.collect())
    bin_w = (vals[-1] - vals[0]) / bins
    for q in qs:
        exact = vals[int(q * (n - 1))]
        assert abs(got[q] - exact) <= bin_w + 1e-6, (q, got[q], exact)

    # additivity: histograms of the two halves sum cell-wise to the whole
    h_all = {r["bin"]: r["n_rows"] for r in equi_width_histogram(df, "v", 16).collect()}
    lo, hi = vals[0], vals[-1]
    halves = []
    for pred in ("id % 2 = 0", "id % 2 = 1"):
        part = spark.range(n).where(pred).select(((F.col("id") * 37) % 9973).cast("double").alias("v"))
        # pin the shared bounds by unioning two sentinel rows at min/max
        pinned = part.union(spark.createDataFrame([(lo,), (hi,)], "v double"))
        halves.append({r["bin"]: r["n_rows"] for r in equi_width_histogram(pinned, "v", 16).collect()})
    merged = {b: halves[0].get(b, 0) + halves[1].get(b, 0) for b in set(halves[0]) | set(halves[1])}
    # subtract the 4 sentinel rows (one min + one max per half)
    merged[min(merged)] -= 2
    merged[max(merged)] -= 2
    assert {b: v for b, v in merged.items() if v} == h_all

    import pytest as _pytest
    with _pytest.raises(ValueError):
        histogram_quantiles(df, "v", [1.5])


def test_poisson_bootstrap_ci_brackets_true_mean(spark):
    """The bootstrap CI of the mean must bracket the sample mean for a
    well-behaved sample, narrow with more data, and have ci_lo <= mean <=
    ci_hi by construction; weights replay deterministically (same result
    twice)."""
    from valentinus_spark.operators.profile import poisson_bootstrap_ci

    rows = [(i, "g", float(100 + (i % 21) - 10)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    r = poisson_bootstrap_ci(
        df, value_col="v", id_col="id", group_col="g", replicas=32
    ).collect()[0]
    assert r["n_replicas"] == 32
    assert r["ci_lo"] <= r["boot_mean"] <= r["ci_hi"]
    assert abs(r["boot_mean"] - 100.0) < 1.0  # true mean ~100
    assert r["ci_hi"] - r["ci_lo"] < 4.0  # tight at n=500
    r2 = poisson_bootstrap_ci(
        df, value_col="v", id_col="id", group_col="g", replicas=32
    ).collect()[0]
    assert (r["boot_mean"], r["ci_lo"], r["ci_hi"]) == (
        r2["boot_mean"],
        r2["ci_lo"],
        r2["ci_hi"],
    )


def test_poisson_cdf_constants_are_the_poisson1_cdf(spark):
    """Sanity-pin the shared constants: cdf_0 = e^-1, increments are
    e^-1/k!, the tail beyond k=7 is ~1e-5."""
    import math

    from valentinus_spark.operators.profile import POISSON1_CDF

    assert abs(POISSON1_CDF[0] - math.exp(-1)) < 1e-15
    assert abs((POISSON1_CDF[2] - POISSON1_CDF[1]) - math.exp(-1) / 2) < 1e-15
    assert 1.0 - POISSON1_CDF[-1] < 1.1e-5


def test_psi_drift_zero_for_identical_and_positive_for_shifted(spark):
    """Identical distributions → every psi_term ~0 (only smoothing
    noise); a shifted current distribution → clearly positive PSI with
    mass moved to the top bins."""
    from valentinus_spark.operators.profile import psi_drift

    ref = spark.createDataFrame([(float(i),) for i in range(1000)], "v double")
    same = psi_drift(ref, ref, "v", n_bins=10).collect()
    assert len(same) == 10
    assert sum(abs(r["psi_term"]) for r in same) < 1e-6
    cur = spark.createDataFrame([(float(i) + 800,) for i in range(1000)], "v double")
    moved = psi_drift(ref, cur, "v", n_bins=10).collect()
    psi = sum(r["psi_term"] for r in moved)
    assert psi > 0.25  # "action" territory
    top = [r for r in moved if r["bin"] == 9][0]
    assert top["n_cur"] > top["n_ref"]


def test_cohens_kappa_hand_computed(spark):
    from valentinus_spark.operators.profile import cohens_kappa

    # classic 2-rater binary example: confusion [[20,5],[10,15]]
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    # po = 35/50 = 0.7 ; pa(y)=.5, pb(y)=.6 -> pe = .5*.6+.5*.4 = 0.5
    assert r.n == 50 and r.po == 0.7 and r.pe == 0.5
    assert r.kappa == round((0.7 - 0.5) / 0.5, 6)  # 0.4


def test_cohens_kappa_null_rows_excluded_and_degenerate(spark):
    from valentinus_spark.operators.profile import cohens_kappa

    df = spark.createDataFrame(
        [("x", "x"), ("x", None), (None, "x"), ("x", "x")], "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    # only the two non-null rows count; single category -> pe=1, kappa NULL
    assert r.n == 2 and r.po == 1.0 and r.pe == 1.0 and r.kappa is None


def test_agreement_matrix_counts_and_fracs(spark):
    from valentinus_spark.operators.profile import agreement_matrix

    rows = [("a", "a")] * 3 + [("a", "b")] * 2 + [("b", "b")]
    df = spark.createDataFrame(rows, "x string, y string")
    got = {(r.label_a, r.label_b): (r.n, r.frac) for r in
           agreement_matrix(df, "x", "y").collect()}
    assert got == {
        ("a", "a"): (3, 0.5),
        ("a", "b"): (2, round(2 / 6, 6)),
        ("b", "b"): (1, round(1 / 6, 6)),
    }


def test_tail_index_recovers_planted_pareto_alpha(spark):
    """Exact Pareto order statistics x_i = (n/i)^(1/alpha): the Hill
    estimator over the top m must recover alpha closely for a planted
    alpha = 2, and a light-tailed (constant-ish) group returns a much
    larger alpha. Python replica pins the exact value."""
    import math

    import pytest

    from valentinus_spark.operators import tail_index

    n, alpha = 400, 2.0
    heavy = [("h", (n / i) ** (1.0 / alpha)) for i in range(1, n + 1)]
    light = [("l", 100.0 + i * 0.001) for i in range(1, n + 1)]
    df = spark.createDataFrame(heavy + light, ["g", "x"])
    out = {r.g: r for r in tail_index(df, "g", "x", tail_frac=0.05).collect()}
    assert out["h"].n == n and out["h"].m == 20
    assert out["h"].alpha == pytest.approx(2.0, rel=0.15)
    assert out["l"].alpha > 20 * out["h"].alpha

    # python replica of the exact fold for the heavy group
    xs = sorted((x for _, x in heavy), reverse=True)
    m = 20
    s = sum(round(math.log(xs[i] / xs[m]), 12) for i in range(m))
    assert out["h"].alpha == pytest.approx(round(m / s, 6), abs=1e-6)


def test_tail_index_small_group_null(spark):
    from valentinus_spark.operators import tail_index

    df = spark.createDataFrame([("a", float(i)) for i in range(1, 9)], ["g", "x"])
    out = tail_index(df, "g", "x").collect()[0]
    assert out.alpha is None  # n <= min_tail


def test_burrows_delta_separates_planted_styles(spark):
    """Three 'authors': A and B share a function-word style, C inverts
    it — Delta(A,B) must be far below Delta(A,C) and Delta(B,C); the
    pair matrix is symmetric-complete (a < b) and self-pairs absent."""
    from valentinus_spark.operators import burrows_delta

    def doc(style, n=40):
        if style == "the-heavy":
            return ("the cat sat on the mat and the dog " * n)
        return ("quantum flux interacts with neutrino beams rapidly " * n)

    rows = []
    for i in range(6):
        rows.append((f"A", doc("the-heavy")))
        rows.append((f"B", doc("the-heavy")))
        rows.append((f"C", doc("tech")))
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {(r.group_a, r.group_b): r.delta for r in burrows_delta(df, "source", top_n=20).collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")] < out[("A", "C")]
    assert out[("A", "B")] < out[("B", "C")]
    assert all(d >= 0 for d in out.values())


def test_burrows_delta_zero_for_identical_groups(spark):
    """Two groups with identical token distributions: every z-score
    pair coincides, Delta = 0."""
    from valentinus_spark.operators import burrows_delta

    txt = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [("X", txt), ("Y", txt), ("Z", "totally different words here now")],
        ["source", "text"],
    )
    out = {(r.group_a, r.group_b): r.delta for r in burrows_delta(df, "source", top_n=10).collect()}
    assert out[("X", "Y")] == pytest.approx(0.0, abs=1e-6)
    assert out[("X", "Z")] > 0.1


def test_hhi_concentration_bounds(spark):
    """Monoculture -> hhi 1; uniform over 4 categories -> 0.25 with
    normalized 0 and effective count 4."""
    from valentinus_spark.operators import hhi_concentration

    rows = [("mono", "en")] * 8 + [
        ("uni", c) for c in ("en", "de", "fr", "es") * 2
    ]
    out = {r.source: r for r in hhi_concentration(
        spark.createDataFrame(rows, ["source", "lang"]), "source", "lang"
    ).collect()}
    assert out["mono"].hhi == 1.0 and out["mono"].hhi_normalized is None
    assert out["uni"].hhi == pytest.approx(0.25, abs=1e-9)
    assert out["uni"].hhi_normalized == pytest.approx(0.0, abs=1e-9)
    assert out["uni"].effective_categories == pytest.approx(4.0, abs=1e-6)


def test_capture_recapture_chapman_hand(spark):
    """n1=40, n2=30, overlap=12: Chapman = 41*31/13 - 1."""
    from valentinus_spark.operators import capture_recapture

    a = spark.createDataFrame([(i,) for i in range(40)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(28, 58)], ["k"])
    r = capture_recapture(a, b, "k").collect()[0]
    assert (r.n_a, r.n_b, r.m_overlap) == (40, 30, 12)
    assert r.chapman_estimate == pytest.approx(41 * 31 / 13 - 1, abs=1e-4)
    assert r.lincoln_petersen == pytest.approx(40 * 30 / 12, abs=1e-4)


def test_capture_recapture_zero_overlap_finite(spark):
    from valentinus_spark.operators import capture_recapture

    a = spark.createDataFrame([(1,), (2,)], ["k"])
    b = spark.createDataFrame([(3,)], ["k"])
    r = capture_recapture(a, b, "k").collect()[0]
    assert r.chapman_estimate == pytest.approx(3 * 2 / 1 - 1, abs=1e-4)
    assert r.lincoln_petersen is None


def test_james_stein_shrinks_toward_grand_mean(spark):
    """Noisy per-group means with a common true center: every shrunk
    mean must lie strictly between its raw mean and the grand mean,
    same weight ordering as group size (bigger n -> less shrinkage)."""
    from valentinus_spark.operators import james_stein_means

    rows = []
    centers = {"a": 10.0, "b": 11.0, "c": 9.0, "d": 10.5, "e": 9.5}
    sizes = {"a": 4, "b": 8, "c": 16, "d": 32, "e": 64}
    for gi, (g, c) in enumerate(sorted(centers.items())):
        for i in range(sizes[g]):
            rows.append((g, c + ((i * 7 + gi) % 5 - 2) * 0.8))
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in james_stein_means(df, "g", "v").collect()}
    grand = sum(r.raw_mean for r in out.values()) / 5
    for g, r in out.items():
        assert 0 <= r.shrink_weight <= 1
        lo, hi = sorted((r.raw_mean, grand))
        assert lo - 1e-9 <= r.shrunk_mean <= hi + 1e-9
    assert out["a"].shrink_weight <= out["e"].shrink_weight + 1e-9


def test_james_stein_k_below_4_identity(spark):
    from valentinus_spark.operators import james_stein_means

    rows = [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0)]
    out = {r.g: r for r in james_stein_means(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()}
    for r in out.values():
        assert r.shrink_weight == pytest.approx(1.0, abs=1e-9)
        assert r.shrunk_mean == pytest.approx(r.raw_mean, abs=1e-9)


def test_quantile_normalize_identical_groups_identity(spark):
    """Two groups with the corpus's own distribution: every value maps
    to itself (its midrank hits its own corpus position), so
    mean_normalized == mean_raw."""
    from valentinus_spark.operators import quantile_normalize

    rows = [(g, float(v)) for g in ("a", "b") for v in range(1, 11)]
    out = {r.g: r for r in quantile_normalize(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()}
    for r in out.values():
        assert r.mean_normalized == pytest.approx(r.mean_raw, abs=1e-6)


def test_quantile_normalize_shifted_group_lands_on_corpus_scale(spark):
    """Group b = group a + 100: after normalization both estimate the
    corpus scale from the same quantile positions -> equal normalized
    means, strictly between the two raw means."""
    from valentinus_spark.operators import quantile_normalize

    a = [("a", float(v)) for v in range(1, 21)]
    b = [("b", float(v + 100)) for v in range(1, 21)]
    out = {r.g: r for r in quantile_normalize(
        spark.createDataFrame(a + b, ["g", "v"]), "g", "v"
    ).collect()}
    assert out["a"].mean_normalized == pytest.approx(
        out["b"].mean_normalized, abs=1e-6
    )
    assert out["a"].mean_raw < out["a"].mean_normalized < out["b"].mean_raw


def test_theil_atkinson_equal_values_zero(spark):
    """Perfect equality: both indices exactly 0."""
    from valentinus_spark.operators import theil_atkinson_inequality

    df = spark.createDataFrame([("a", 7.0)] * 10, ["g", "v"])
    r = theil_atkinson_inequality(df, "g", "v").collect()[0]
    assert r.theil_t == pytest.approx(0.0, abs=1e-9)
    assert r.atkinson_1 == pytest.approx(0.0, abs=1e-9)
    assert (r.n, r.n_dropped) == (10, 0)


def test_theil_atkinson_python_replica_and_drops(spark):
    import math

    from valentinus_spark.operators import theil_atkinson_inequality

    xs = [1.0, 2.0, 4.0, 8.0, 15.0]
    rows = [("a", x) for x in xs] + [("a", 0.0)]  # zero drops
    r = theil_atkinson_inequality(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    mu = sum(xs) / len(xs)
    theil = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
    atk = 1.0 - math.exp(sum(math.log(x) for x in xs) / len(xs) - math.log(mu))
    assert r.n_dropped == 1
    assert r.theil_t == pytest.approx(theil, abs=1e-6)
    assert r.atkinson_1 == pytest.approx(atk, abs=1e-6)


def test_permutation_entropy_monotone_vs_alternating(spark):
    """A strictly increasing daily volume has ONE ordinal pattern ->
    H = 0; a 2-period alternation has two patterns in equal shares ->
    H = ln2/ln6."""
    import datetime
    import math

    from valentinus_spark.operators import permutation_entropy

    base = datetime.datetime(2024, 1, 1)
    inc = []
    for d in range(20):
        inc += [(base + datetime.timedelta(days=d),)] * (d + 1)
    r = permutation_entropy(
        spark.createDataFrame(inc, ["ts"])
    ).collect()[0]
    assert (r.n_days, r.n_windows, r.n_patterns) == (20, 18, 1)
    assert r.perm_entropy == pytest.approx(0.0, abs=1e-9)

    alt = []
    for d in range(22):  # 20 windows -> the two patterns split 10/10
        alt += [(base + datetime.timedelta(days=d),)] * (5 if d % 2 else 1)
    r2 = permutation_entropy(
        spark.createDataFrame(alt, ["ts"])
    ).collect()[0]
    assert (r2.n_windows, r2.n_patterns) == (20, 2)
    assert r2.perm_entropy == pytest.approx(
        math.log(2) / math.log(6), abs=1e-6
    )


def test_correlation_matrix_known_structure(spark):
    """y = 2x exactly -> corr 1; z anti-correlates; constant w -> NULL."""
    from valentinus_spark.operators import correlation_matrix

    rows = [(float(i), 2.0 * i, 10.0 - i, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["x", "y", "z", "w"])
    out = {
        (r.col_a, r.col_b): r.corr
        for r in correlation_matrix(df, ["x", "y", "z", "w"]).collect()
    }
    assert out[("x", "y")] == pytest.approx(1.0, abs=1e-6)
    assert out[("x", "z")] == pytest.approx(-1.0, abs=1e-6)
    assert out[("x", "w")] is None
    assert len(out) == 6
