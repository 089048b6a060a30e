"""Round-9 wave-2 A/B: pagerank variants, all asserted row-identical.

V0: current operator
V1: nodes derived from deg (drops the separate nodes-distinct shuffle)
V2: V1 + e_w coalesced to ceil(m/300k) partitions before its checkpoint
V3: V1 + e_w coalesced to ceil(m/150k)

Usage: python tools/exp_pagerank2.py [sf_dir] [reps]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark.functions.util import ensure_parallelism
from valentinus_spark.operators.graph import (
    _compact_if_small,
    copurchase_edges,
    pagerank,
)
from valentinus_spark.session import get_spark


def variant(edges, iterations=8, damping=0.85, rows_per_part=None):
    e, m = _compact_if_small(
        ensure_parallelism(edges.select("src", "dst")).localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d")).localCheckpoint()
    nodes = deg.select(F.col("src").alias("node"))
    n = deg.count()
    ew = e.join(deg, "src")
    if rows_per_part:
        k = max(1, min(64, math.ceil(m / rows_per_part)))
        ew = ew.coalesce(k)
    e_w = ew.localCheckpoint()
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    small = n <= 2_000_000
    hint = F.broadcast if small else (lambda df: df)
    for i in range(iterations):
        contrib = (
            hint(ranks).join(e_w, ranks["node"] == e_w["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_d")).alias("_c"))
        )
        ranks = contrib.select(
            "node",
            F.round(
                F.lit(teleport) + F.lit(damping) * F.coalesce("_c", F.lit(0.0)), 9
            ).alias("rank"),
        )
        if (not small) or (i + 1) % 4 == 0 or (i + 1) == iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def sig(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("node", F.format_number("rank", 9)).cast("long")).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-pagerank2")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.range(1000).selectExpr("sum(id)").collect()

    variants = {
        "V0 current": lambda: pagerank(copurchase_edges(li)),
        "V1 deg-nodes": lambda: variant(copurchase_edges(li)),
        "V2 V1+300k": lambda: variant(copurchase_edges(li), rows_per_part=300_000),
        "V3 V1+150k": lambda: variant(copurchase_edges(li), rows_per_part=150_000),
    }
    sigs = {}
    for r in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            out = fn()
            s = sig(out)
            dt = time.time() - t0
            sigs.setdefault(name, s)
            print(f"rep{r} {name}: {dt:.2f}s sig={s}", file=sys.stderr)
    base = sigs["V0 current"]
    for name, s in sigs.items():
        flag = "OK" if s == base else "MISMATCH"
        print(f"{flag} {name} {s}", file=sys.stderr)


if __name__ == "__main__":
    main()
