"""KMV distinct-count sketch tests (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.sketches import (
    kmv_distinct,
    kmv_hashes,
    kmv_merge_estimate,
)


@pytest.fixture(scope="module")
def vals(spark):
    # group "big": 5000 distinct values written twice (dups must not bias
    # the estimate); group "small": 10 distinct (< k → exact)
    rows = [("big", f"v{i % 5000}") for i in range(10000)] + [
        ("small", f"s{i}") for i in range(10)
    ]
    return spark.createDataFrame(rows, "g string, v string")


def test_kmv_small_group_exact(vals):
    out = {r["g"]: r for r in kmv_distinct(vals, "v", ["g"], k=64).collect()}
    assert out["small"]["n_seen"] == 10
    assert out["small"]["est_distinct"] == 10.0


def test_kmv_estimate_within_error(vals):
    # k=256 → expected relative error ~1/sqrt(254) ≈ 6.3%; allow 4 sigma
    out = {r["g"]: r for r in kmv_distinct(vals, "v", ["g"], k=256).collect()}
    est = out["big"]["est_distinct"]
    assert out["big"]["n_seen"] == 256
    assert abs(est - 5000) / 5000 < 0.25, est


def test_kmv_deterministic(vals):
    a = sorted(map(tuple, kmv_distinct(vals, "v", ["g"], k=64).collect()))
    b = sorted(map(tuple, kmv_distinct(vals, "v", ["g"], k=64).collect()))
    assert a == b


def test_kmv_global_no_groups(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(30)], "v string")
    row = kmv_distinct(df, "v", k=64).first()
    assert row["n_seen"] == 30 and row["est_distinct"] == 30.0


def test_kmv_merge_matches_union(spark):
    """Merging two shards' sketches must equal sketching the union — the
    mergeability contract that makes the sketch incrementally
    maintainable."""
    left = spark.createDataFrame([("g", f"a{i}") for i in range(500)], "g string, v string")
    right = spark.createDataFrame(
        [("g", f"a{i}") for i in range(250, 750)], "g string, v string"
    )
    merged = kmv_merge_estimate(
        kmv_hashes(left, "v", ["g"], k=64), kmv_hashes(right, "v", ["g"], k=64), k=64
    ).first()
    direct = kmv_distinct(left.union(right), "v", ["g"], k=64).first()
    assert merged["est_distinct"] == direct["est_distinct"]
    assert merged["n_seen"] == direct["n_seen"] == 64


def test_count_min_exact_at_wide_width(spark):
    """With width >> distinct values, no collisions: estimate == exact."""
    from valentinus_spark.operators.sketches import (
        count_min_estimate,
        count_min_sketch,
    )

    rows = [(f"k{i % 20}",) for i in range(200)]  # k0..k19, 10 each
    df = spark.createDataFrame(rows, "v string")
    sk = count_min_sketch(df, "v", depth=4, width=1 << 20)
    probes = spark.createDataFrame([(f"k{i}",) for i in range(20)], "v string")
    out = {r["v"]: r["est_count"] for r in count_min_estimate(sk, probes, "v", depth=4, width=1 << 20).collect()}
    assert out == {f"k{i}": 10 for i in range(20)}


def test_count_min_upper_bound_at_narrow_width(spark):
    """Collisions only ever INFLATE an estimate — never undercount."""
    from valentinus_spark.operators.sketches import (
        count_min_estimate,
        count_min_sketch,
    )

    rows = [(f"k{i % 100}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "v string")
    sk = count_min_sketch(df, "v", depth=4, width=64)  # heavy collisions
    probes = spark.createDataFrame([(f"k{i}",) for i in range(100)], "v string")
    out = count_min_estimate(sk, probes, "v", depth=4, width=64).collect()
    assert all(r["est_count"] >= 10 for r in out)


def test_count_min_weighted(spark):
    from valentinus_spark.operators.sketches import (
        count_min_estimate,
        count_min_sketch,
    )

    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "v string, w int")
    sk = count_min_sketch(df, "v", depth=2, width=1 << 16, weight_col="w")
    probes = spark.createDataFrame([("a",), ("b",), ("zz",)], "v string")
    out = {r["v"]: r["est_count"] for r in count_min_estimate(sk, probes, "v", depth=2, width=1 << 16).collect()}
    assert out["a"] == 12 and out["b"] == 1 and out["zz"] == 0


def test_bloom_no_false_negatives_and_absent_rejected(spark):
    from valentinus_spark.operators.sketches import bloom_build, bloom_might_contain

    corpus = spark.createDataFrame([(f"doc{i}",) for i in range(500)], "v string")
    bloom = bloom_build(corpus, "v", k=4, m=1 << 20)
    probes = spark.createDataFrame(
        [(f"doc{i}",) for i in range(0, 500, 50)] + [(f"absent{i}",) for i in range(10)],
        "v string",
    )
    out = {r["v"]: r["might_contain"] for r in bloom_might_contain(probes, bloom, "v", k=4, m=1 << 20).collect()}
    for i in range(0, 500, 50):
        assert out[f"doc{i}"] is True  # Bloom guarantee: no false negatives
    # at m=2^20, n=500: FP rate ~ (kn/m)^k ≈ 1e-11 — all absents reject
    assert all(out[f"absent{i}"] is False for i in range(10))


def test_bloom_bits_bounded_by_m(spark):
    from valentinus_spark.operators.sketches import bloom_build

    corpus = spark.createDataFrame([(f"x{i}",) for i in range(1000)], "v string")
    bits = bloom_build(corpus, "v", k=4, m=64)
    n = bits.count()
    assert n <= 64
    assert bits.agg({"bit": "max"}).first()[0] < 64


# ---------------------------------------------------------------- HLL


from valentinus_spark.operators.sketches import (  # noqa: E402
    hll_distinct,
    hll_estimate,
    hll_merge_estimate,
    hll_registers,
)


def test_hll_estimate_within_error(vals):
    # p=12 → m=4096, relative error ~1.04/64 ≈ 1.6%; allow 4 sigma
    out = {r["g"]: r for r in hll_distinct(vals, "v", ["g"], p=12).collect()}
    assert abs(out["big"]["est_distinct"] - 5000) / 5000 < 0.07
    assert abs(out["small"]["est_distinct"] - 10) / 10 < 0.35


def test_hll_duplicate_insensitive(vals):
    # HLL registers are a pure max over per-value rhos: feeding the
    # corpus twice must give the IDENTICAL estimate (no distinct pre-pass)
    once = sorted(map(tuple, hll_distinct(vals, "v", ["g"], p=10).collect()))
    twice = sorted(
        map(tuple, hll_distinct(vals.union(vals), "v", ["g"], p=10).collect())
    )
    assert once == twice


def test_hll_merge_equals_union(spark):
    a = spark.createDataFrame([("g", f"a{i}") for i in range(500)], "g string, v string")
    b = spark.createDataFrame(
        [("g", f"a{i}") for i in range(250, 750)], "g string, v string"
    )
    merged = hll_merge_estimate(
        hll_registers(a, "v", ["g"], p=10),
        hll_registers(b, "v", ["g"], p=10),
        p=10,
        group_cols=["g"],
    ).collect()
    direct = hll_distinct(a.union(b), "v", ["g"], p=10).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))


def test_hll_register_bounds(vals):
    regs = hll_registers(vals, "v", ["g"], p=6).collect()
    assert all(0 <= r["idx"] < 64 for r in regs)
    assert all(1 <= r["rho"] <= 55 for r in regs)
    # at most m registers per group
    import collections

    per_group = collections.Counter(r["g"] for r in regs)
    assert all(c <= 64 for c in per_group.values())


def test_cm_join_size_upper_bounds_and_approximates_truth(spark):
    from pyspark.sql import functions as F

    from valentinus_spark.operators.sketches import cm_join_size, count_min_sketch

    # skewed multiplicities on both sides
    a = spark.createDataFrame([(i % 37,) for i in range(3000)], "k long")
    b = spark.createDataFrame([(i % 53,) for i in range(2000)], "k long")
    exact = a.join(b, "k").count()
    est = cm_join_size(
        count_min_sketch(a, "k", depth=4, width=1024),
        count_min_sketch(b, "k", depth=4, width=1024),
    ).collect()[0]["est_join_size"]
    assert est >= exact  # CM inner product is an upper bound
    assert est <= exact * 1.2  # and tight at this width

    # disjoint domains -> estimate collapses to (near) zero
    c = spark.createDataFrame([(i + 10_000,) for i in range(100)], "k long")
    est0 = cm_join_size(
        count_min_sketch(a, "k", depth=4, width=1024),
        count_min_sketch(c, "k", depth=4, width=1024),
    ).collect()[0]["est_join_size"]
    assert est0 <= exact * 0.01


def test_kmv_overlap_exact_mode_and_estimation_mode(spark):
    from valentinus_spark.operators.sketches import kmv_hashes, kmv_overlap

    # exact mode: union < k -> every number exact
    a = spark.createDataFrame([(i,) for i in range(20)], "v long")
    b = spark.createDataFrame([(i,) for i in range(10, 30)], "v long")
    row = kmv_overlap(
        kmv_hashes(a, "v", k=64), kmv_hashes(b, "v", k=64), k=64
    ).collect()[0]
    assert row["n_union_seen"] == 30
    assert row["est_union"] == 30.0
    assert row["est_intersection"] == 10.0
    assert abs(row["est_jaccard"] - 10 / 30) < 1e-3

    # estimation mode: big overlapping sets, estimates near truth
    a2 = spark.createDataFrame([(i,) for i in range(3000)], "v long")
    b2 = spark.createDataFrame([(i,) for i in range(1500, 4500)], "v long")
    row2 = kmv_overlap(
        kmv_hashes(a2, "v", k=256), kmv_hashes(b2, "v", k=256), k=256
    ).collect()[0]
    assert abs(row2["est_union"] - 4500) / 4500 < 0.2
    assert abs(row2["est_intersection"] - 1500) / 1500 < 0.35


def test_heavy_hitters_exact_output_and_partition_invariance(spark):
    """Two-pass MG heavy hitters: output equals the exact
    frequency-threshold answer (values, counts, freqs) regardless of
    partition layout — candidates vary with batching, the verified
    output must not. Background: 5000 near-unique keys; planted: three
    items above the 2% threshold and one decoy just below it."""
    from valentinus_spark.operators.sketches import heavy_hitters

    rows = [(f"u{i}",) for i in range(5000)]          # unique tail
    rows += [("hot_a",)] * 400 + [("hot_b",)] * 250 + [("hot_c",)] * 150
    rows += [("decoy",)] * 100                        # just under 2% of ~5900
    df = spark.createDataFrame(rows, "k string")
    n = len(rows)

    expected = {"hot_a": 400, "hot_b": 250, "hot_c": 150}
    assert all(v > 0.02 * n for v in expected.values()) and 100 <= 0.02 * n

    for parts in (1, 7, 32):
        got = {
            r["value"]: (r["n"], r["freq"])
            for r in heavy_hitters(df.repartition(parts), "k", phi=0.02).collect()
        }
        assert {k: v[0] for k, v in got.items()} == expected, parts
        for k, (c, f) in got.items():
            assert abs(f - c / n) < 1e-6

    import pytest as _pytest
    with _pytest.raises(ValueError):
        heavy_hitters(df, "k", phi=1.5)


def test_hll_rolling_distinct_matches_window_recompute(spark):
    """The register-merge rolling estimate must EQUAL re-running the
    one-shot sketch over each window's raw rows (merge losslessness on
    the sliding window), and low-cardinality windows are exact via the
    linear-counting branch."""
    from valentinus_spark.operators.sketches import (
        hll_registers,
        hll_estimate,
        hll_rolling_distinct,
    )

    rows = []
    for day in range(1, 11):
        for u in range(day * 3):  # users 0..3d-1 active on day d
            rows.append((f"2024-03-{day:02d} 12:00:00", u))
    df = spark.createDataFrame(rows, ["s", "user_id"]).select(
        F.col("s").cast("timestamp").alias("ts"), "user_id"
    )
    out = {str(r.day): r for r in hll_rolling_distinct(df, "ts", "user_id", window_days=3, p=6).collect()}
    assert len(out) == 10
    import datetime

    for day in range(1, 11):
        lo = max(1, day - 2)
        window = df.filter(
            (F.to_date("ts") >= F.lit(datetime.date(2024, 3, lo)))
            & (F.to_date("ts") <= F.lit(datetime.date(2024, 3, day)))
        )
        oneshot = hll_estimate(
            hll_registers(window.select("user_id"), "user_id", None, p=6), p=6
        ).collect()[0]
        got = out[f"2024-03-{day:02d}"]
        assert got.est_distinct == oneshot.est_distinct, f"day {day}"
        assert got.m_seen == oneshot.m_seen


def test_hll_rolling_distinct_empty_window_and_gap_days(spark):
    from valentinus_spark.operators.sketches import hll_rolling_distinct

    # activity on day 1 and day 8 only, window 2: days 4..7 see nothing
    rows = [("2024-04-01 00:00:00", 1), ("2024-04-08 00:00:00", 2)]
    df = spark.createDataFrame(rows, ["s", "user_id"]).select(
        F.col("s").cast("timestamp").alias("ts"), "user_id"
    )
    out = {str(r.day): r for r in hll_rolling_distinct(df, "ts", "user_id", window_days=2, p=6).collect()}
    assert len(out) == 8  # dense spine
    assert out["2024-04-01"].est_distinct > 0
    assert out["2024-04-02"].est_distinct > 0  # day-1 users still in window
    assert out["2024-04-03"].est_distinct == 0.0 and out["2024-04-03"].m_seen == 0
    assert out["2024-04-08"].est_distinct > 0


def test_hll_overlap_disjoint_and_identical_sets(spark):
    """Identical sets -> intersection ~ |A|, jaccard ~ 1; disjoint sets
    -> intersection ~ 0 (clamped), jaccard ~ 0. p=10 keeps the sketch
    error ~3%, and the estimates must equal hll_distinct's on the same
    data (shared register arithmetic)."""
    from valentinus_spark.operators import hll_distinct, hll_overlap

    a = spark.range(0, 2000).selectExpr("concat('u', id) AS k")
    same = spark.range(0, 2000).selectExpr("concat('u', id) AS k")
    disj = spark.range(10000, 12000).selectExpr("concat('u', id) AS k")

    r_same = hll_overlap(a, same, "k", p=10).collect()[0]
    assert r_same.est_a == r_same.est_b == r_same.est_union
    assert r_same.est_jaccard == pytest.approx(1.0, abs=1e-6)
    base = hll_distinct(a, "k", p=10).collect()[0].est_distinct
    assert r_same.est_a == base

    r_disj = hll_overlap(a, disj, "k", p=10).collect()[0]
    assert r_disj.est_jaccard < 0.1
    assert r_disj.est_intersection >= 0.0  # clamp holds
    assert r_disj.est_union > r_disj.est_a


def test_hll_overlap_half_overlap_estimate(spark):
    """A = [0,2000), B = [1000,3000): true jaccard 1/3 — the p=10
    estimate must land within ~15% relative."""
    from valentinus_spark.operators import hll_overlap

    a = spark.range(0, 2000).selectExpr("concat('u', id) AS k")
    b = spark.range(1000, 3000).selectExpr("concat('u', id) AS k")
    r = hll_overlap(a, b, "k", p=10).collect()[0]
    assert r.est_jaccard == pytest.approx(1 / 3, rel=0.15)
    assert r.est_intersection == pytest.approx(1000, rel=0.15)


def test_ams_f2_exact_on_planted_and_unbiased_scale(spark):
    """F2 exact = sum of squared key counts; the sketch estimate must
    land within a loose relative band (deterministic hashes -> the
    value is fixed, the band just guards hash-quality regressions)."""
    from valentinus_spark.operators import ams_f2_estimate

    rows = [(k,) for k in range(100) for _ in range(1 + k % 4)]
    df = spark.createDataFrame(rows, ["k"])
    r = ams_f2_estimate(df, "k").collect()[0]
    exact = sum((1 + k % 4) ** 2 for k in range(100))
    assert r.f2_exact == pytest.approx(exact, abs=1e-6)
    assert r.n_estimators == 64
    assert r.n_rows == len(rows)
    assert r.rel_error is not None and r.rel_error < 0.5


def test_ams_f2_single_key_degenerate(spark):
    """All rows one key: F2 = n^2 and every estimator's Z = ±n, so the
    estimate is EXACTLY n^2 (sign squares away)."""
    from valentinus_spark.operators import ams_f2_estimate

    df = spark.createDataFrame([("x",)] * 50, ["k"])
    r = ams_f2_estimate(df, "k").collect()[0]
    assert r.f2_exact == pytest.approx(2500.0, abs=1e-9)
    assert r.f2_estimate == pytest.approx(2500.0, abs=1e-9)
    assert r.rel_error == pytest.approx(0.0, abs=1e-9)


def test_bloom_semijoin_row_identical_to_plain_semijoin(spark):
    """The bloom prefilter must not change the result set — plain
    semi-join equivalence on overlapping key domains (FPs removed by
    the exact join, no FNs by Bloom guarantee)."""
    from valentinus_spark.operators import bloom_semijoin

    fact = spark.createDataFrame(
        [(k % 50, k) for k in range(500)], ["key", "payload"]
    )
    dim = spark.createDataFrame([(k,) for k in range(0, 50, 7)], ["dkey"])
    got = sorted(
        (r.key, r.payload)
        for r in bloom_semijoin(fact, dim, "key", "dkey", m=256).collect()
    )
    want = sorted(
        (k % 50, k) for k in range(500) if (k % 50) % 7 == 0 and k % 50 < 50
    )
    assert got == want


def test_bloom_semijoin_empty_dim(spark):
    from valentinus_spark.operators import bloom_semijoin

    fact = spark.createDataFrame([(1, 1)], ["key", "payload"])
    dim = spark.createDataFrame([], "dkey INT")
    assert bloom_semijoin(fact, dim, "key", "dkey").count() == 0
