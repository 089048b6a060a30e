"""Round-9 wave-2 A/B: hits with a right-sized edge checkpoint.

V0: current operator (e at the distinct's partition count)
Vk: e coalesced to _loop_partitions(m) (k≈2 at sf0.1) via a second
    narrow checkpoint before the loop — DECIMAL loop sums, so any
    partition layout is bit-identical by construction (still asserted).

Usage: python tools/exp_hits2.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark.operators import graph as G
from valentinus_spark.session import get_spark


def hits_rightsized(edges, iterations=4, rows_per_part=300_000):
    src, dst = "src", "dst"
    par = edges.sparkSession.sparkContext.defaultParallelism
    e, m = G._compact_if_small(
        edges.select(src, dst)
        .repartition(par, src, dst)
        .distinct()
        .localCheckpoint()
    )
    k = G._loop_partitions(m, e, rows_per_part)
    if k < e.rdd.getNumPartitions():
        e = e.coalesce(k).localCheckpoint()
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    hub = nodes.withColumn("hub", F.round(F.lit(1.0 / n), 9))
    dec = "decimal(20,9)"
    small = n <= 2_000_000
    hint = F.broadcast if small else (lambda df: df)
    auth = nodes.withColumn("auth", F.round(F.lit(1.0 / n), 9))
    from pyspark.sql import Window as _W

    def _normalize(raw, val, out):
        tot = F.sum(val).over(_W.partitionBy())
        return raw.select(
            "node",
            F.round(
                F.when(
                    tot > 0, F.col(val).cast("double") / tot.cast("double")
                ).otherwise(0.0),
                9,
            ).alias(out),
        ).localCheckpoint()

    for i in range(iterations):
        araw = (
            hint(hub)
            .join(e, hub["node"] == e[src])
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("hub").cast(dec)).alias("_a"))
        )
        auth = _normalize(araw, "_a", "auth")
        hraw = (
            hint(auth)
            .join(e, auth["node"] == e[dst])
            .groupBy(F.col(src).alias("node"))
            .agg(F.sum(F.col("auth").cast(dec)).alias("_h"))
        )
        hub = _normalize(hraw, "_h", "hub")
    return (
        nodes.join(hint(hub), "node", "left")
        .join(hint(auth), "node", "left")
        .select(
            "node",
            F.round(F.coalesce("hub", F.lit(0.0)), 6).alias("hub"),
            F.round(F.coalesce("auth", F.lit(0.0)), 6).alias("auth"),
        )
        .orderBy("node")
    )


def sig(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.hash(
                "node",
                F.format_number("hub", 6),
                F.format_number("auth", 6),
            ).cast("long")
        ).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-hits2")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_partkey") + F.lit(10_000_000)).alias("dst"),
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    variants = {
        "V0 current": lambda: G.hits(edges, iterations=4),
        "V300k": lambda: hits_rightsized(edges, rows_per_part=300_000),
        "V150k": lambda: hits_rightsized(edges, rows_per_part=150_000),
    }
    sigs = {}
    for r in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            s = sig(fn())
            dt = time.time() - t0
            sigs.setdefault(name, s)
            print(f"rep{r} {name}: {dt:.2f}s sig={s}", file=sys.stderr)
    base = sigs["V0 current"]
    for name, s in sigs.items():
        flag = "OK" if s == base else "MISMATCH"
        print(f"{flag} {name} {s}", file=sys.stderr)


if __name__ == "__main__":
    main()
