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
    running_min_exclusive,
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


def test_running_min_exclusive_matches_window(spark):
    rng = random.Random(7)
    # duplicate costs + a strictly improving tail exercise both filter
    # outcomes downstream; axis values unique (the device contract)
    base = spark.createDataFrame(
        [(float(i), float(rng.randint(0, 40))) for i in range(500)],
        ["mx", "best"],
    )
    w = Window.orderBy(F.desc("mx")).rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["mx"]: r["p"]
        for r in base.select(
            "mx", F.min("best").over(w).alias("p")
        ).collect()
    }
    got = {
        r["mx"]: r["_preminbest"]
        for r in running_min_exclusive(base, [F.desc("mx")], "best").collect()
    }
    assert got == ref  # incl. NULL on the globally first (largest-mx) row


def test_rank_scale_matches_percent_rank_window(spark):
    from valentinus_spark.operators.layout import rank_scale

    rng = random.Random(31)
    # heavy ties (41 distinct values over 600 rows) — the percent_rank
    # tie semantics are the point of the per-distinct-value device
    base = spark.createDataFrame(
        [(i, float(rng.randint(0, 40))) for i in range(600)], ["id", "x"]
    )
    w = F.percent_rank().over(Window.orderBy(F.col("x")))
    ref = {
        r["id"]: r["s"]
        for r in base.select(
            "id",
            F.least(
                F.floor(w * (1 << 16)).cast("long"), F.lit((1 << 16) - 1)
            ).alias("s"),
        ).collect()
    }
    got = {r["id"]: r["x_scaled"] for r in rank_scale(base, "x").collect()}
    assert got == ref
    # single-row frame: percent_rank defines 0.0
    one = spark.createDataFrame([(1, 5.0)], ["id", "x"])
    assert rank_scale(one, "x").collect()[0]["x_scaled"] == 0


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
