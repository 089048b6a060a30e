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
