"""Hand-computed / scipy-replica oracles for the experimentation
operators (operators/experiment.py)."""

import math

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators import (
    ab_assign,
    cuped_adjust,
    srm_check,
    two_proportion_test,
    welch_means_test,
)


def _norm_sf(z):
    # exact normal survival for test reference
    return 0.5 * math.erfc(z / math.sqrt(2))


def test_two_proportion_hand_computed(spark):
    # arm0: 40/100 convert; arm1: 50/100 convert
    rows = [(0, 1)] * 40 + [(0, 0)] * 60 + [(1, 1)] * 50 + [(1, 0)] * 50
    df = spark.createDataFrame(rows, ["arm", "success"])
    out = two_proportion_test(df, "arm", "success").collect()[0]
    assert out.n_a == 100 and out.p_a == pytest.approx(0.4)
    assert out.lift == pytest.approx(0.1)
    pool = 90 / 200
    se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    z = 0.1 / se
    assert out.z == pytest.approx(z, abs=1e-4)
    # A&S polynomial is within 7.5e-8 of the exact CDF
    assert out.p_value == pytest.approx(2 * _norm_sf(z), abs=1e-5)


def test_two_proportion_degenerate_null(spark):
    rows = [(0, 1)] * 5 + [(1, 1)] * 5  # everyone converts → pooled 1.0
    df = spark.createDataFrame(rows, ["arm", "success"])
    out = two_proportion_test(df, "arm", "success").collect()[0]
    assert out.z is None and out.p_value is None


def test_welch_matches_python_replica(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.5, 3.5, 4.5, 6.5]
    rows = [(0, v) for v in a] + [(1, v) for v in b]
    df = spark.createDataFrame(rows, ["arm", "v"])
    out = welch_means_test(df, "arm", "v").collect()[0]
    import statistics

    ma, mb = statistics.mean(a), statistics.mean(b)
    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / len(a) + vb / len(b)
    t = (mb - ma) / math.sqrt(se2)
    dof = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert out.mean_a == pytest.approx(ma) and out.mean_b == pytest.approx(mb)
    assert out.t == pytest.approx(t, abs=1e-5)
    assert out.dof == pytest.approx(dof, abs=1e-4)


def test_srm_check_uniform_and_skewed(spark):
    df = spark.createDataFrame([(0,)] * 55 + [(1,)] * 45, ["arm"])
    out = {r.arm: r for r in srm_check(df, "arm").collect()}
    assert out[0].expected_n == pytest.approx(50.0)
    assert out[0].chi2_term == pytest.approx(25 / 50)
    assert out[1].chi2_term == pytest.approx(25 / 50)
    # explicit 90/10 split expectation
    out = {r.arm: r for r in srm_check(df, "arm", expected=[0.9, 0.1]).collect()}
    assert out[0].expected_n == pytest.approx(90.0)
    assert out[1].chi2_term == pytest.approx((45 - 10) ** 2 / 10)


def test_cuped_perfect_covariate(spark):
    # Y = 2X exactly → theta = 2, var_reduction = 1, adjusted means equal
    rows = [(i % 2, float(2 * i), float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, ["arm", "y", "x"])
    out = {r.arm: r for r in cuped_adjust(df, "arm", "y", "x").collect()}
    assert out[0].theta == pytest.approx(2.0)
    assert out[0].var_reduction == pytest.approx(1.0)
    # adjustment removes the assignment-correlated covariate imbalance
    assert out[0].mean_adj == pytest.approx(out[1].mean_adj, abs=1e-6)


def test_cuped_uninformative_covariate(spark):
    # constant X → var(X)=0 → theta NULL, adjusted == raw
    rows = [(i % 2, float(i), 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["arm", "y", "x"])
    out = cuped_adjust(df, "arm", "y", "x").collect()[0]
    assert out.theta is None and out.mean_adj == out.mean_raw


def test_ab_assign_deterministic_split(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["uid"])
    out = df.select(ab_assign(F.col("uid")).alias("arm")).groupBy("arm").count()
    counts = {r.arm: r["count"] for r in out.collect()}
    assert set(counts) == {0, 1}
    assert abs(counts[0] - counts[1]) < 100  # roughly balanced


def test_ab_assign_not_parity_of_id(spark):
    # the old ((uid % 1000003) * 31) % 2 mixer assigned purely by id
    # parity — all-even id allocations landed in ONE arm. The sha256
    # mixer must split an all-even population.
    df = spark.createDataFrame([(2 * i,) for i in range(500)], ["uid"])
    out = df.select(ab_assign(F.col("uid")).alias("arm")).groupBy("arm").count()
    counts = {r.arm: r["count"] for r in out.collect()}
    assert set(counts) == {0, 1}
    assert abs(counts[0] - counts[1]) < 100


def test_ab_assign_salt_draws_independent_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], ["uid"])
    both = df.select(
        ab_assign(F.col("uid")).alias("a1"),
        ab_assign(F.col("uid"), salt="ab-v2").alias("a2"),
    )
    flips = both.filter(F.col("a1") != F.col("a2")).count()
    assert 100 < flips < 300  # ~half re-assigned under a fresh salt


def test_two_proportion_empty_arm_one_row_null_inference(spark):
    # docstring contract: ONE row with NULL z/p when an arm is empty —
    # the old per-arm-frame crossJoin returned ZERO rows here
    df = spark.createDataFrame([(0, 1)] * 3 + [(0, 0)] * 2, ["arm", "success"])
    rows = two_proportion_test(df, "arm", "success").collect()
    assert len(rows) == 1
    out = rows[0]
    assert out.n_a == 5 and out.n_b == 0
    assert out.p_b is None and out.z is None and out.p_value is None
    # fully empty input still yields the one row
    empty = spark.createDataFrame([], "arm int, success int")
    rows = two_proportion_test(empty, "arm", "success").collect()
    assert len(rows) == 1 and rows[0].n_a == 0 and rows[0].z is None


def test_welch_empty_arm_one_row_null_inference(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 3.0)], ["arm", "v"])
    rows = welch_means_test(df, "arm", "v").collect()
    assert len(rows) == 1
    out = rows[0]
    assert out.n_a == 0 and out.n_b == 2
    assert out.mean_a is None and out.t is None and out.p_value is None
    # single-row arm: means defined, inference NULL (n < 2)
    df2 = spark.createDataFrame([(0, 1.0), (1, 2.0), (1, 3.0)], ["arm", "v"])
    out2 = welch_means_test(df2, "arm", "v").collect()[0]
    assert out2.n_a == 1 and out2.mean_a == pytest.approx(1.0)
    assert out2.t is None and out2.p_value is None


def test_did_hand_computed(spark):
    from valentinus_spark.operators import did_estimate

    # control: pre mean 10, post mean 12 (trend +2)
    # treated: pre mean 20, post mean 25 (trend +5) → DiD = 3
    rows = (
        [(0, 0, 10.0 + d) for d in (-1.0, 0.0, 1.0)]
        + [(0, 1, 12.0 + d) for d in (-1.0, 0.0, 1.0)]
        + [(1, 0, 20.0 + d) for d in (-1.0, 0.0, 1.0)]
        + [(1, 1, 25.0 + d) for d in (-1.0, 0.0, 1.0)]
    )
    df = spark.createDataFrame(rows, ["arm", "period", "v"])
    out = did_estimate(df, "arm", "period", "v").collect()[0]
    assert out.mean_c_pre == pytest.approx(10.0)
    assert out.mean_t_post == pytest.approx(25.0)
    assert out.did == pytest.approx(3.0)
    # each cell: var=1, n=3 → se = sqrt(4/3); z = 3/se
    se = math.sqrt(4 / 3)
    assert out.se == pytest.approx(se, abs=1e-5)
    assert out.z == pytest.approx(3 / se, abs=1e-4)


def test_did_small_cell_null_inference(spark):
    from valentinus_spark.operators import did_estimate

    rows = [(0, 0, 1.0), (0, 1, 2.0), (0, 1, 3.0), (1, 0, 4.0),
            (1, 0, 5.0), (1, 1, 6.0), (1, 1, 7.0)]  # cell (0,0) has n=1
    df = spark.createDataFrame(rows, ["arm", "period", "v"])
    out = did_estimate(df, "arm", "period", "v").collect()[0]
    assert out.se is None and out.z is None and out.p_value is None
    assert out.did is not None  # point estimate still defined


def test_mann_whitney_matches_scipy_formula(spark):
    from valentinus_spark.operators import mann_whitney_u

    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [3.0, 5.0, 6.0, 7.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    # python replica with average ranks and tie correction
    pooled = sorted(a + b)
    import collections

    counts = collections.Counter(pooled)
    ranks = {}
    pos = 0
    for v in sorted(counts):
        t = counts[v]
        ranks[v] = pos + (t + 1) / 2.0
        pos += t
    rb = sum(ranks[v] for v in b)
    nb, na = len(b), len(a)
    u = rb - nb * (nb + 1) / 2.0
    n = na + nb
    ties = sum(t**3 - t for t in counts.values())
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    assert out.u == pytest.approx(u)
    assert out.z == pytest.approx(z, abs=1e-5)
    assert out.p_value == pytest.approx(2 * _norm_sf(abs(z)), abs=1e-5)


def test_mann_whitney_identical_groups_and_all_ties(spark):
    from valentinus_spark.operators import mann_whitney_u

    rows = [("a", float(i)) for i in range(6)] + [("b", float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert out.u == pytest.approx(18.0)  # = n_a*n_b/2, perfectly mixed
    assert abs(out.z) < 1e-9 or out.z == 0.0
    # all values equal → zero variance → NULL inference
    df2 = spark.createDataFrame([("a", 1.0)] * 4 + [("b", 1.0)] * 4, ["g", "v"])
    out2 = mann_whitney_u(df2, "g", "v", "a", "b").collect()[0]
    assert out2.z is None and out2.p_value is None


def test_bh_fdr_textbook(spark):
    from valentinus_spark.operators import bh_fdr

    # classic example: m=5, alpha=0.25 — thresholds .05,.10,.15,.20,.25
    ps = [("t1", 0.01), ("t2", 0.04), ("t3", 0.16), ("t4", 0.18), ("t5", 0.9)]
    df = spark.createDataFrame(ps, ["test", "p"])
    out = {r.test: r for r in bh_fdr(df, "test", "p", alpha=0.25).collect()}
    # k* = 4 (p_(4)=0.18 ≤ 0.20) → reject t1..t4 including t3 whose own
    # threshold fails (the step-up property)
    assert out["t1"].reject and out["t2"].reject
    assert out["t3"].reject and out["t4"].reject
    assert not out["t5"].reject
    # q-values: monotone running min of p*m/rank from the bottom
    assert out["t5"].q_value == pytest.approx(0.9)
    assert out["t4"].q_value == pytest.approx(min(0.18 * 5 / 4, 0.9), abs=1e-6)
    assert out["t1"].q_value == pytest.approx(0.05)


def test_bh_fdr_none_rejected_and_null_excluded(spark):
    from valentinus_spark.operators import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.8), ("b", 0.9), ("c", None)], ["test", "p"]
    )
    out = bh_fdr(df, "test", "p", alpha=0.05).collect()
    assert len(out) == 2  # NULL p excluded from m
    assert not any(r.reject for r in out)
    assert all(r.q_value <= 1.0 for r in out)


def test_mcnemar_hand_computed(spark):
    from valentinus_spark.operators import mcnemar_test

    # 10 stable-0, 5 stable-1, b=6 (1→0), c=2 (0→1)
    rows = [(0, 0)] * 10 + [(1, 1)] * 5 + [(1, 0)] * 6 + [(0, 1)] * 2
    df = spark.createDataFrame(rows, ["before", "after"])
    out = mcnemar_test(df, "before", "after").collect()[0]
    assert out.n == 23 and out.n_10 == 6 and out.n_01 == 2
    # chi2 = (6−2)²/8 = 2 ; z = (2−6)/sqrt(8)
    assert out.chi2 == pytest.approx(2.0)
    z = (2 - 6) / math.sqrt(8)
    assert out.p_value == pytest.approx(2 * _norm_sf(abs(z)), abs=1e-5)


def test_mcnemar_no_flips_null(spark):
    from valentinus_spark.operators import mcnemar_test

    df = spark.createDataFrame([(0, 0)] * 4 + [(1, 1)] * 4, ["before", "after"])
    out = mcnemar_test(df, "before", "after").collect()[0]
    assert out.chi2 is None and out.p_value is None


def test_paired_t_matches_python_replica(spark):
    from valentinus_spark.operators import paired_t_test
    import statistics

    before = [10.0, 12.0, 9.0, 14.0, 11.0]
    after = [12.0, 13.0, 9.5, 17.0, 12.0]
    df = spark.createDataFrame(list(zip(before, after)), ["b", "a"])
    out = paired_t_test(df, "b", "a").collect()[0]
    diffs = [a - b for b, a in zip(before, after)]
    md = statistics.mean(diffs)
    t = md / (statistics.stdev(diffs) / math.sqrt(len(diffs)))
    assert out.mean_diff == pytest.approx(md)
    assert out.t == pytest.approx(t, abs=1e-5)
    assert out.p_value == pytest.approx(2 * _norm_sf(abs(t)), abs=1e-5)


def test_paired_t_constant_diff_null(spark):
    from valentinus_spark.operators import paired_t_test

    df = spark.createDataFrame([(1.0, 2.0)] * 5, ["b", "a"])
    out = paired_t_test(df, "b", "a").collect()[0]
    assert out.mean_diff == pytest.approx(1.0)
    assert out.t is None and out.p_value is None


def test_msprt_matches_python_replica_and_monotone(spark):
    import datetime

    from valentinus_spark.operators import msprt_test

    # arm 1 shifted by +2 from day 3 on: p must fall and never rise
    rows = []
    for day in range(1, 9):
        d = f"2024-05-{day:02d} 00:00:00"
        for i in range(10):
            rows.append((d, 0, 10.0 + (i % 3)))
            rows.append((d, 1, 10.0 + (i % 3) + (2.0 if day >= 3 else 0.0)))
    df = spark.createDataFrame(rows, ["s", "arm", "v"]).select(
        F.col("s").cast("timestamp").alias("ts"), "arm", "v"
    )
    out = msprt_test(df, "ts", "arm", "v", tau=0.5).collect()
    ps = [r.p_always_valid for r in out]
    assert all(ps[i + 1] <= ps[i] + 1e-9 for i in range(len(ps) - 1)), ps
    assert ps[-1] < 0.05 < ps[0]

    # python replica of the last day's log_lr
    import statistics

    vals = [v for (_, _, v) in rows]
    sigma2 = round(statistics.variance(vals), 9)
    a = [v for (_, arm, v) in rows if arm == 0]
    b = [v for (_, arm, v) in rows if arm == 1]
    na, nb = len(a), len(b)
    y = sum(b) / nb - sum(a) / na
    vv = sigma2 * (1 / na + 1 / nb)
    tau2 = 0.25
    import math

    llr = round(0.5 * math.log(vv / (vv + tau2)) + y * y * tau2 / (2 * vv * (vv + tau2)), 9)
    assert out[-1].log_lr == pytest.approx(round(llr, 6), abs=2e-6)
    assert out[-1].n_a == na and out[-1].n_b == nb


def test_msprt_null_effect_keeps_high_p(spark):
    from valentinus_spark.operators import msprt_test

    rows = []
    for day in range(1, 7):
        d = f"2024-06-{day:02d} 00:00:00"
        for i in range(20):
            rows.append((d, i % 2, float(i % 5)))
    df = spark.createDataFrame(rows, ["s", "arm", "v"]).select(
        F.col("s").cast("timestamp").alias("ts"), "arm", "v"
    )
    out = msprt_test(df, "ts", "arm", "v", tau=0.5).collect()
    # identical arms: the mixture LR stays <= 1, p pegged at 1
    assert all(r.p_always_valid == 1.0 for r in out)


def test_kruskal_wallis_matches_replica_and_detects_shift(spark):
    """No-ties replica: H computed directly from ranks; a clearly
    shifted third group must push H far above the k-1 chi2 mean."""
    from valentinus_spark.operators import kruskal_wallis

    ga = [1.1, 2.3, 3.7, 5.2, 8.1]
    gb = [2.2, 4.4, 6.6, 7.7, 9.9]
    gc = [50.0, 51.0, 52.0, 53.0, 54.0]
    rows = [("a", v) for v in ga] + [("b", v) for v in gb] + [("c", v) for v in gc]
    df = spark.createDataFrame(rows, ["grp", "v"])
    allv = sorted(v for _, v in rows)
    ranks = {v: i + 1 for i, v in enumerate(allv)}
    n = len(allv)
    s = sum(
        (sum(ranks[v] for v in g)) ** 2 / len(g) for g in (ga, gb, gc)
    )
    want_h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    r = kruskal_wallis(df, "grp", "v").collect()[0]
    assert (r.n, r.k, r.dof) == (15, 3, 2)
    assert r.h == pytest.approx(want_h, abs=1e-6)
    assert r.h_tied == pytest.approx(want_h, abs=1e-6)  # no ties
    assert r.h > 9  # far beyond chi2_2 critical ~5.99


def test_kruskal_wallis_all_equal_values_null(spark):
    """Every value identical: the tie divisor is 0, h_tied must be
    NULL rather than dividing by zero."""
    from valentinus_spark.operators import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)], ["grp", "v"]
    )
    r = kruskal_wallis(df, "grp", "v").collect()[0]
    assert r.h_tied is None


def test_cochran_q_textbook_example(spark):
    """Classic 3-treatment incidence matrix with known Q: subjects'
    hit sets chosen so Q is hand-computable."""
    from valentinus_spark.operators import cochran_q

    # subject: treatments hit
    hits = {
        1: ["A", "B"],
        2: ["A"],
        3: ["A", "B", "C"],
        4: ["A"],
        5: ["A", "B"],
        6: ["B"],
        7: ["A"],
    }
    rows = [(s, t) for s, ts in hits.items() for t in ts]
    df = spark.createDataFrame(rows, ["subj", "treat"])
    r = cochran_q(df, "subj", "treat").collect()[0]
    cj = {"A": 6, "B": 4, "C": 1}
    ri = {s: len(ts) for s, ts in hits.items()}
    k, nn = 3, sum(ri.values())
    num = sum((c - nn / k) ** 2 for c in cj.values())
    den = k * nn - sum(v * v for v in ri.values())
    want = k * (k - 1) * num / den
    assert (r.n_subjects, r.k, r.dof) == (7, 3, 2)
    assert r.q == pytest.approx(want, abs=1e-6)


def test_cochran_q_degenerate_denominator_null(spark):
    """Every subject hits every treatment: no discordance, q NULL."""
    from valentinus_spark.operators import cochran_q

    rows = [(s, t) for s in (1, 2, 3) for t in ("A", "B")]
    r = cochran_q(spark.createDataFrame(rows, ["subj", "treat"]), "subj", "treat").collect()[0]
    assert r.q is None


def test_jonckheere_planted_ordered_shift(spark):
    """Three ordered groups with a clean monotone shift: J must equal
    the hand count (all cross-pairs concordant -> J = sum of n_g*n_h),
    z large positive; reversing the order flips the sign."""
    from valentinus_spark.operators import jonckheere_terpstra

    rows = (
        [("lo", v) for v in (1.0, 2.0, 3.0)]
        + [("mid", v) for v in (10.0, 11.0, 12.0)]
        + [("hi", v) for v in (20.0, 21.0, 22.0)]
    )
    df = spark.createDataFrame(rows, ["tier", "v"])
    r = jonckheere_terpstra(df, "tier", "v", group_order=["lo", "mid", "hi"]).collect()[0]
    assert r.j_stat == 27.0  # 3*3 per ordered pair, 3 pairs, all concordant
    assert r.mean_j == pytest.approx((81 - 27) / 4, abs=1e-9)
    assert r.z is not None and r.z > 2.5
    rr = jonckheere_terpstra(df, "tier", "v", group_order=["hi", "mid", "lo"]).collect()[0]
    assert rr.j_stat == 0.0 and rr.z < -2.5


def test_jonckheere_ties_half_credit(spark):
    """Equal values across ordered groups earn exactly half credit."""
    from valentinus_spark.operators import jonckheere_terpstra

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0)], ["g", "v"]
    )
    r = jonckheere_terpstra(df, "g", "v", group_order=["a", "b"]).collect()[0]
    assert r.j_stat == pytest.approx(1.0, abs=1e-9)  # 2 tied pairs x 0.5


def test_wilcoxon_signed_rank_replica_no_ties(spark):
    """Classic small-sample hand computation: d ranks by |d|, W+ is
    the sum of positive-d ranks; python replay."""
    from valentinus_spark.operators import wilcoxon_signed_rank

    pairs = [(10.0, 12.5), (8.0, 7.0), (5.0, 9.0), (6.0, 6.5),
             (11.0, 10.8), (3.0, 8.0), (9.0, 9.0)]  # one zero diff drops
    df = spark.createDataFrame(pairs, ["before", "after"])
    ds = [round(a - b, 4) for b, a in pairs if a != b]
    order = sorted(range(len(ds)), key=lambda i: abs(ds[i]))
    ranks = {order[i]: i + 1 for i in range(len(ds))}
    w_plus = sum(r for i, r in ranks.items() if ds[i] > 0)
    r = wilcoxon_signed_rank(df, "before", "after").collect()[0]
    assert r.n_pairs == 7 and r.n_nonzero == 6
    assert r.w_plus == pytest.approx(w_plus, abs=1e-9)
    assert r.w_plus + r.w_minus == pytest.approx(6 * 7 / 2, abs=1e-9)


def test_wilcoxon_all_zero_diffs_null(spark):
    from valentinus_spark.operators import wilcoxon_signed_rank

    df = spark.createDataFrame([(5.0, 5.0), (7.0, 7.0)], ["before", "after"])
    r = wilcoxon_signed_rank(df, "before", "after").collect()[0]
    assert r.n_nonzero == 0 and r.z is None


def test_levene_detects_planted_variance_difference(spark):
    """Two groups with equal medians but 10x spread difference: F must
    be large; equal-spread groups give F near 0."""
    from valentinus_spark.operators import levene_test

    tight = [("a", 10.0 + d) for d in (-0.1, -0.05, 0.0, 0.05, 0.1) * 4]
    wide = [("b", 10.0 + d) for d in (-5.0, -2.5, 0.0, 2.5, 5.0) * 4]
    r = levene_test(
        spark.createDataFrame(tight + wide, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert (r.n, r.k, r.dof_between, r.dof_within) == (40, 2, 1, 38)
    assert r.f_stat > 10

    same = [("a", v) for _, v in wide] + [("b", v) for _, v in wide]
    r2 = levene_test(
        spark.createDataFrame(same, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert r2.f_stat == pytest.approx(0.0, abs=1e-6)


def test_runs_test_alternating_vs_blocked(spark):
    """A strictly alternating sequence maximizes runs (z >> 0); a
    blocked half/half sequence minimizes them (z << 0). Exact run
    counts hand-checked."""
    from valentinus_spark.operators import runs_test

    alt = [(i, 1.0 if i % 2 else 9.0) for i in range(20)]
    r = runs_test(
        spark.createDataFrame(alt, ["t", "v"]), "t", "v"
    ).collect()[0]
    assert (r.n_above, r.n_below, r.runs) == (10, 10, 20)
    assert r.z > 3

    blocked = [(i, 9.0 if i < 10 else 1.0) for i in range(20)]
    r2 = runs_test(
        spark.createDataFrame(blocked, ["t", "v"]), "t", "v"
    ).collect()[0]
    assert (r2.n_above, r2.n_below, r2.runs) == (10, 10, 2)
    assert r2.z < -3


def test_runs_test_median_values_drop_and_degenerate_null(spark):
    from valentinus_spark.operators import runs_test

    # median of {1,5,5,5,9} = 5: the three 5s drop, leaving 1 above/1 below
    df = spark.createDataFrame(
        [(1, 1.0), (2, 5.0), (3, 5.0), (4, 5.0), (5, 9.0)], ["t", "v"]
    )
    r = runs_test(df, "t", "v").collect()[0]
    assert (r.n_above, r.n_below, r.runs) == (1, 1, 2)

    # all-equal sequence: both sides empty -> z NULL
    same = spark.createDataFrame([(i, 4.0) for i in range(6)], ["t", "v"])
    r2 = runs_test(same, "t", "v").collect()[0]
    assert r2.n_above == 0 and r2.n_below == 0 and r2.z is None


def test_sign_test_counts_and_z(spark):
    """8 positive, 2 negative, 1 zero (drops): S+=8, n=10,
    z = (8-5)/sqrt(2.5)."""
    import math

    from valentinus_spark.operators import sign_test

    pairs = (
        [(0.0, 1.0)] * 8 + [(1.0, 0.0)] * 2 + [(3.0, 3.0)]
    )
    r = sign_test(
        spark.createDataFrame(pairs, ["before", "after"]), "before", "after"
    ).collect()[0]
    assert (r.n_pairs, r.n_nonzero, r.s_plus, r.s_minus) == (11, 10, 8, 2)
    assert r.z == pytest.approx(3.0 / math.sqrt(2.5), abs=1e-6)

    allzero = spark.createDataFrame([(1.0, 1.0)] * 3, ["before", "after"])
    r2 = sign_test(allzero, "before", "after").collect()[0]
    assert r2.n_nonzero == 0 and r2.z is None


def test_moods_median_hand_table(spark):
    """Group a all-below, group b all-above the grand median: maximal
    association, chi2 = n (for a balanced 2x2 table with empty
    off-diagonals chi2 equals the total count)."""
    from valentinus_spark.operators import moods_median_test

    rows = [("a", float(v)) for v in range(1, 11)] + [
        ("b", float(v)) for v in range(11, 21)
    ]
    r = moods_median_test(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert (r.n, r.k, r.dof) == (20, 2, 1)
    assert r.chi2 == pytest.approx(20.0, abs=1e-6)

    # no association: same distribution in both groups -> chi2 = 0
    same = [("a", float(v)) for v in range(10)] + [
        ("b", float(v)) for v in range(10)
    ]
    r2 = moods_median_test(
        spark.createDataFrame(same, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert r2.chi2 == pytest.approx(0.0, abs=1e-6)


def test_moods_median_group_on_median_nulls(spark):
    """A group whose every value sits ON the grand median has an empty
    margin -> chi2 NULL per contract."""
    from valentinus_spark.operators import moods_median_test

    rows = [("a", 5.0)] * 5 + [("b", 1.0), ("b", 9.0), ("b", 5.0)]
    r = moods_median_test(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    assert r.chi2 is None


def test_friedman_textbook_no_ties(spark):
    """Conover's classic shape: 3 treatments, 4 blocks, untied ranks.
    chi2_F = 12/(n k (k+1)) * sum Rj^2 - 3 n (k+1); python replay."""
    from valentinus_spark.operators import friedman_test

    # blocks rank treatments consistently: t3 > t2 > t1 everywhere
    data = []
    for b in range(4):
        data += [(b, "t1", 1.0 + b), (b, "t2", 2.0 + b), (b, "t3", 3.0 + b)]
    r = friedman_test(
        spark.createDataFrame(data, ["b", "t", "v"]), "b", "t", "v"
    ).collect()[0]
    assert (r.n_blocks, r.k, r.dof) == (4, 3, 2)
    # perfectly consistent ranking: Rj = (4, 8, 12), chi2 = 8.0
    n, k = 4, 3
    chi2 = 12.0 / (n * k * (k + 1)) * (16 + 64 + 144) - 3 * n * (k + 1)
    assert r.chi2 == pytest.approx(chi2, abs=1e-6)
    assert r.chi2 == pytest.approx(8.0, abs=1e-6)


def test_friedman_incomplete_blocks_drop_and_all_tied_null(spark):
    from valentinus_spark.operators import friedman_test

    data = [
        (0, "t1", 1.0), (0, "t2", 2.0), (1, "t1", 2.0), (1, "t2", 1.0),
        (2, "t1", 5.0),  # incomplete block: drops
    ]
    r = friedman_test(
        spark.createDataFrame(data, ["b", "t", "v"]), "b", "t", "v"
    ).collect()[0]
    assert (r.n_blocks, r.k) == (2, 2)
    # reversed preferences cancel: Rj = (3, 3), chi2 = 0
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)

    tied = [(b, t, 7.0) for b in range(3) for t in ("t1", "t2")]
    r2 = friedman_test(
        spark.createDataFrame(tied, ["b", "t", "v"]), "b", "t", "v"
    ).collect()[0]
    assert r2.chi2 is None  # all ranks tied -> zero denominator


def test_page_trend_perfect_order(spark):
    """Blocks always rank treatments in hypothesized order: L maximal
    = n * sum(j * j) (each R_j = n*j), z strongly positive."""
    from valentinus_spark.operators import page_trend_test

    data = []
    for b in range(6):
        data += [(b, j, float(j * 10 + b)) for j in (1, 2, 3)]
    r = page_trend_test(
        spark.createDataFrame(data, ["b", "j", "v"]), "b", "j", "v"
    ).collect()[0]
    assert (r.n_blocks, r.k) == (6, 3)
    assert r.l_stat == pytest.approx(6 * (1 + 4 + 9), abs=1e-9)
    assert r.z > 2


def test_page_trend_reversed_order_negative(spark):
    from valentinus_spark.operators import page_trend_test

    data = []
    for b in range(6):
        data += [(b, j, float(-j * 10 + b)) for j in (1, 2, 3)]
    r = page_trend_test(
        spark.createDataFrame(data, ["b", "j", "v"]), "b", "j", "v"
    ).collect()[0]
    assert r.l_stat == pytest.approx(6 * (3 + 4 + 3), abs=1e-9)  # R_j reversed
    assert r.z < -2


def test_simpsons_paradox_planted_reversal(spark):
    """Classic planted reversal: within both groups y DECREASES in x,
    but group b sits at higher x AND higher y, so pooled correlation is
    positive -> both groups flag sign_reversed."""
    from valentinus_spark.operators import simpsons_paradox_screen

    rows = []
    for i in range(20):
        rows.append(("a", float(i), 10.0 - 0.5 * i))          # x 0..19
        rows.append(("b", 100.0 + i, 200.0 - 0.5 * i))        # x 100..119
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r.g: r for r in simpsons_paradox_screen(df, "g", "x", "y").collect()}
    assert out["a"].corr < 0 and out["b"].corr < 0
    assert out["a"].pooled_corr > 0
    assert out["a"].sign_reversed and out["b"].sign_reversed


def test_simpsons_screen_degenerate_group_null(spark):
    from valentinus_spark.operators import simpsons_paradox_screen

    rows = [("a", 1.0, float(i)) for i in range(5)] + [
        ("b", float(i), float(i)) for i in range(5)
    ]
    out = {r.g: r for r in simpsons_paradox_screen(
        spark.createDataFrame(rows, ["g", "x", "y"]), "g", "x", "y"
    ).collect()}
    assert out["a"].corr is None and out["a"].sign_reversed is None
    assert out["b"].corr == pytest.approx(1.0, abs=1e-6)
