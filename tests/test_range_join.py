"""Range join (operators/range_join.py) and salted join (operators/skew.py)
vs pure-python / plain-join oracles."""

import pytest
from pyspark.sql import functions as F

from valentinus_spark.operators.range_join import range_join
from valentinus_spark.operators.skew import salted_join


def py_range_join(points, intervals):
    out = set()
    for pid, key, ts in points:
        for iid, ikey, s, e in intervals:
            if key == ikey and s <= ts <= e:
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("bucket_width", [1, 7, 50, 1000])
def test_range_join_matches_python(spark, bucket_width):
    points = [(i, i % 4, 13 * i % 97) for i in range(40)]
    intervals = [(100 + j, j % 4, 5 * j, 5 * j + 20) for j in range(25)]
    pdf = spark.createDataFrame(points, "pid long, k long, ts long")
    idf = spark.createDataFrame(intervals, "iid long, k long, s long, e long")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pdf, idf, key="k", point_ts="ts", start="s", end="e",
                            bucket_width=bucket_width).collect()
    }
    assert got == py_range_join(points, intervals)


def test_range_join_no_duplicate_pairs(spark):
    # one interval spanning many buckets must still match a point once
    pdf = spark.createDataFrame([(1, 0, 500)], "pid long, k long, ts long")
    idf = spark.createDataFrame([(9, 0, 0, 1000)], "iid long, k long, s long, e long")
    rows = range_join(pdf, idf, key="k", point_ts="ts", start="s", end="e",
                      bucket_width=10).collect()
    assert len(rows) == 1


def test_range_join_overlapping_colnames(spark):
    pdf = spark.createDataFrame([(1, 0, 5, 99)], "pid long, k long, ts long, v long")
    idf = spark.createDataFrame([(9, 0, 0, 10, 7)], "iid long, k long, s long, e long, v long")
    row = range_join(pdf, idf, key="k", point_ts="ts", start="s", end="e",
                     bucket_width=4).first()
    assert row["v"] == 99 and row["i_v"] == 7


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(200)], "fid long, k long, x double"
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, name string")
    plain = {(r["fid"], r["name"]) for r in fact.join(dim, "k").collect()}
    salted = {
        (r["fid"], r["name"]) for r in salted_join(fact, dim, on="k", salt_count=8).collect()
    }
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, 0), (2, 99)], "fid long, k long")
    dim = spark.createDataFrame([(0, "a")], "k long, name string")
    got = {
        r["fid"]: r["name"]
        for r in salted_join(fact, dim, on="k", salt_count=4, how="left").collect()
    }
    assert got == {1: "a", 2: None}


def test_salted_join_spreads_hot_key(spark):
    fact = spark.createDataFrame([(i, 0) for i in range(1000)], "fid long, k long")
    dim = spark.createDataFrame([(0, "hot")], "k long, name string")
    salted = salted_join(fact, dim, on="k", salt_count=16)
    # all 1000 rows survive and the salt column is gone
    assert salted.count() == 1000 and "_salt" not in salted.columns
    # the pre-join salted fact really uses >1 distinct salt for the hot key
    spread = (
        fact.withColumn("_salt", F.pmod(F.hash("fid", "k"), F.lit(16)))
        .select("_salt").distinct().count()
    )
    assert spread > 1


def test_interval_overlap_join_matches_naive(spark):
    from valentinus_spark.operators.range_join import interval_overlap_join

    rng_rows_l = [
        # (key, id, start, end)
        (0, 0, 100, 200),
        (0, 1, 150, 300),
        (0, 2, 500, 600),
        (1, 3, 100, 200),
    ]
    rng_rows_r = [
        (0, 10, 180, 250),   # overlaps l0 (tail) and l1
        (0, 11, 601, 700),   # adjacent to l2 but disjoint
        (0, 12, 90, 100),    # touches l0 exactly at the boundary
        (1, 13, 250, 400),   # disjoint from l3
    ]
    left = spark.createDataFrame(rng_rows_l, "k long, lid long, s long, e long")
    right = spark.createDataFrame(rng_rows_r, "k long, rid long, s long, e long")
    # right-side s/e collide with left names -> r_ prefix applies to the
    # OUTPUT; the operator params take the ORIGINAL right column names
    out = interval_overlap_join(
        left, right, key="k",
        left_start="s", left_end="e",
        right_start="s", right_end="e",
        bucket_width=50,
    )
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    expected = set()
    for k1, lid, s1, e1 in rng_rows_l:
        for k2, rid, s2, e2 in rng_rows_r:
            if k1 == k2 and s1 <= e2 and s2 <= e1:
                expected.add((lid, rid))
    assert got == expected
    # each overlapping pair appears exactly once even when it spans
    # multiple buckets (l1 x r10 share buckets 3..5 at width 50)
    assert out.count() == len(expected)


def test_interval_overlap_join_bucket_width_invariance(spark):
    from valentinus_spark.operators.range_join import interval_overlap_join

    left = spark.createDataFrame(
        [(0, i, i * 37, i * 37 + 120) for i in range(40)], "k long, lid long, s long, e long"
    )
    right = spark.createDataFrame(
        [(0, i, i * 53, i * 53 + 80) for i in range(30)], "k long, rid long, s long, e long"
    )
    pairs = None
    for width in (10, 100, 1000):
        out = interval_overlap_join(
            left, right, key="k",
            left_start="s", left_end="e",
            right_start="s", right_end="e",
            bucket_width=width,
        )
        got = sorted((r["lid"], r["rid"]) for r in out.collect())
        assert pairs is None or got == pairs
        pairs = got


def test_shard_assignment_deterministic_and_balanced(spark):
    from valentinus_spark.operators.packing import shard_assignment, shard_manifest

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(2000)], "doc_id long, n_chars long"
    )
    m = {r["shard"]: r["n_rows"] for r in shard_manifest(df, n_shards=16).collect()}
    assert set(m) == set(range(16))  # no empty writers
    assert max(m.values()) < 2 * min(m.values())  # roughly balanced
    # stability: a doc's shard never changes when the corpus grows
    small = df.filter(F.col("doc_id") < 100).select(
        "doc_id", shard_assignment("doc_id", 16)
    )
    big = df.select("doc_id", shard_assignment("doc_id", 16))
    sm = {r["doc_id"]: r["shard"] for r in small.collect()}
    bg = {r["doc_id"]: r["shard"] for r in big.collect()}
    assert all(bg[k] == v for k, v in sm.items())
    # totals in the manifest add up
    mm = shard_manifest(df, n_shards=16).agg(
        F.sum("n_rows").alias("r"), F.sum("total_n_chars").alias("c")
    ).collect()[0]
    assert mm["r"] == 2000 and mm["c"] == sum(i * 10 for i in range(2000))


# ---------------------------------------------------- release manifest


def test_release_manifest_checksum_semantics(spark):
    from valentinus_spark.operators.packing import release_manifest

    df = spark.createDataFrame(
        [(i, f"content-{i}") for i in range(100)], "doc_id int, text string"
    )
    base = {
        r["shard"]: r for r in release_manifest(df, "doc_id", "text", 4).collect()
    }
    assert sum(r["n_rows"] for r in base.values()) == 100
    # partitioning-independent
    again = {
        r["shard"]: r
        for r in release_manifest(df.repartition(11), "doc_id", "text", 4).collect()
    }
    assert {k: tuple(v) for k, v in base.items()} == {
        k: tuple(v) for k, v in again.items()
    }
    # altering one row flips exactly that shard's checksum
    tampered = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit("TAMPERED")).otherwise(F.col("text")),
    )
    t = {r["shard"]: r for r in release_manifest(tampered, "doc_id", "text", 4).collect()}
    diffs = [s for s in base if t[s]["content_xor"] != base[s]["content_xor"]]
    assert len(diffs) == 1
    # duplicate rows do NOT cancel: union doubles counts, changes checksum...
    doubled = release_manifest(df.union(df), "doc_id", "text", 4).collect()
    assert sum(r["n_rows"] for r in doubled) == 200


def test_radius_join_matches_brute_force(spark):
    from valentinus_spark.operators import radius_join
    import math, random

    rng = random.Random(7)
    pa = [(i, rng.uniform(0, 50), rng.uniform(0, 50)) for i in range(80)]
    pb = [(j, rng.uniform(0, 50), rng.uniform(0, 50)) for j in range(60)]
    a = spark.createDataFrame(pa, ["aid", "x", "y"])
    b = spark.createDataFrame(pb, ["bid", "x", "y"])
    r = 4.0
    got = {(row.aid, row.bid) for row in radius_join(a, b, r, ["aid"], ["bid"]).collect()}
    want = {
        (i, j)
        for i, xa, ya in pa
        for j, xb, yb in pb
        if math.hypot(xa - xb, ya - yb) <= r
    }
    assert got == want and len(want) > 10  # non-trivial fixture


def test_radius_join_boundary_and_dist(spark):
    from valentinus_spark.operators import radius_join
    import pytest as pt

    a = spark.createDataFrame([(1, 0.0, 0.0)], ["aid", "x", "y"])
    b = spark.createDataFrame(
        [(1, 3.0, 4.0), (2, 3.1, 4.0)], ["bid", "x", "y"]
    )
    out = radius_join(a, b, 5.0, ["aid"], ["bid"]).collect()
    # (3,4) at exactly dist 5 kept; (3.1,4) at 5.06… dropped
    assert len(out) == 1 and out[0].bid == 1
    assert out[0].dist == pt.approx(5.0)


def test_radius_join_no_cartesian_plan(spark):
    from valentinus_spark.operators import radius_join

    a = spark.createDataFrame([(i, float(i), float(i)) for i in range(50)], ["aid", "x", "y"])
    b = spark.createDataFrame([(i, float(i), 0.0) for i in range(50)], ["bid", "x", "y"])
    plan = radius_join(a, b, 2.0, ["aid"], ["bid"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
