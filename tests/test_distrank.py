"""The two-phase distributed global-order device (_distrank) must be
bit-identical to the single-partition global window it replaces — that
is the whole correctness contract of the r10 scale-safety conversions
(ks_test, mann_whitney_u, kruskal_wallis, wilcoxon_signed_rank,
runs_test, moods_median_test, dp_median, wasserstein_1d,
quantile_normalize, gain_lift_chart, decile_concentration)."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from valentinus_spark.operators._distrank import (
    global_ranks,
    ntile_from_rank,
    running_totals,
)

def _w_inc():
    # built lazily: Window.orderBy needs an active session at call time
    return Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )


def _counts_frame(spark, n_vals=400, seed=11):
    rng = random.Random(seed)
    rows = [
        (float(rng.randint(0, 120)), rng.randint(0, 4), rng.randint(0, 3))
        for _ in range(n_vals)
    ]
    return (
        spark.createDataFrame(rows, ["v", "ca", "cb"])
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )


def test_running_totals_match_global_window(spark):
    df = _counts_frame(spark)
    ref = {
        r["v"]: (r["ra"], r["rb"])
        for r in df.select(
            "v",
            F.sum("ca").over(_w_inc()).alias("ra"),
            F.sum("cb").over(_w_inc()).alias("rb"),
        ).collect()
    }
    got = running_totals(df, ["v"], ["ca", "cb"], with_totals=True).collect()
    assert {r["v"]: (r["_runca"], r["_runcb"]) for r in got} == ref
    tot = df.agg(F.sum("ca"), F.sum("cb")).collect()[0]
    assert {(r["_totca"], r["_totcb"]) for r in got} == {(tot[0], tot[1])}


def test_running_totals_lead_stitches_partition_boundaries(spark):
    df = _counts_frame(spark, seed=23)
    got = running_totals(df, ["v"], ["ca"], with_lead="v").collect()
    leads = {r["v"]: r["_leadv"] for r in got}
    svals = sorted(leads)
    for i, v in enumerate(svals):
        assert leads[v] == (svals[i + 1] if i + 1 < len(svals) else None)


def test_running_totals_decimal_keeps_window_sum_type_and_values(spark):
    df = spark.createDataFrame(
        [(float(i), i) for i in range(150)], ["v", "x"]
    ).select(
        "v", F.round(F.exp(F.col("x") % 5), 12).cast("decimal(28,12)").alias("w")
    )
    ref = df.select("v", F.sum("w").over(_w_inc()).alias("c"))
    out = running_totals(df, ["v"], ["w"])
    assert (
        str(out.schema["_runw"].dataType) == str(ref.schema["c"].dataType)
    ), "decimal(38,s)+decimal(38,s) must not drop to scale s-1"
    assert {r["v"]: r["_runw"] for r in out.collect()} == {
        r["v"]: r["c"] for r in ref.collect()
    }


def test_running_totals_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "v double, ca bigint")
    assert running_totals(empty, ["v"], ["ca"], with_totals=True).count() == 0
    nul = spark.createDataFrame([(float(i),) for i in range(9)], ["v"]).select(
        "v", F.lit(None).cast("decimal(28,12)").alias("w")
    )
    rows = running_totals(nul, ["v"], ["w"], with_totals=True).collect()
    assert all(r["_runw"] is None and r["_totw"] is None for r in rows)


@pytest.mark.parametrize("n_tiles", [7, 10, 32])
def test_ntile_from_rank_matches_window_ntile(spark, n_tiles):
    rng = random.Random(n_tiles)
    base = spark.createDataFrame(
        [(rng.random(), i) for i in range(1003)], ["s", "id"]
    )
    w = Window.orderBy(F.desc("s"), F.asc("id"))
    ref = {
        r["id"]: r["t"]
        for r in base.select("id", F.ntile(n_tiles).over(w).alias("t")).collect()
    }
    ranked = global_ranks(base, [F.desc("s"), F.asc("id")])
    got = {
        r["id"]: r["t"]
        for r in ranked.select(
            "id",
            ntile_from_rank(F.col("_rank"), F.col("_n"), n_tiles)
            .cast("int")
            .alias("t"),
        ).collect()
    }
    assert got == ref


def test_ntile_from_rank_fewer_rows_than_tiles(spark):
    base = spark.createDataFrame([(1.0, 1), (2.0, 2), (3.0, 3)], ["s", "id"])
    w = Window.orderBy(F.desc("s"), F.asc("id"))
    ref = {
        r["id"]: r["t"]
        for r in base.select("id", F.ntile(10).over(w).alias("t")).collect()
    }
    ranked = global_ranks(base, [F.desc("s"), F.asc("id")])
    got = {
        r["id"]: r["t"]
        for r in ranked.select(
            "id",
            ntile_from_rank(F.col("_rank"), F.col("_n"), 10).cast("int").alias("t"),
        ).collect()
    }
    assert got == ref
