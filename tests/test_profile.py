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
