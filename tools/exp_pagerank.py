"""Round-9 optimization probe: where does pagerank_copurchase's wall
time go, and does per-round eager localCheckpoint (A) beat lazy chaining
(B) or every-4-rounds checkpointing (C) at bench scale? All variants
must produce IDENTICAL rows (asserted) — the 9-dp per-round rounding
pins the arithmetic, so only the physical execution differs.

Usage: python tools/exp_pagerank.py [sf_dir] [iterations]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark.functions.util import ensure_parallelism
from valentinus_spark.operators.graph import copurchase_edges, pagerank
from valentinus_spark.session import get_spark


def pagerank_lazy(edges, iterations=8, damping=0.85, ckpt_every=None):
    """pagerank with configurable checkpoint cadence (None = never)."""
    e = ensure_parallelism(edges.select("src", "dst")).localCheckpoint()
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    e_w = e.join(deg, "src").localCheckpoint()
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
        ranks = nodes.join(hint(contrib), "node", "left").select(
            "node",
            F.round(
                F.lit(teleport) + F.lit(damping) * F.coalesce("_c", F.lit(0.0)), 9
            ).alias("rank"),
        )
        if ckpt_every and (i + 1) % ckpt_every == 0 and i != iterations - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("exp-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # warmup
    spark.range(1000).selectExpr("sum(id)").collect()

    def timed(label, fn):
        spark.sparkContext._jvm.System.gc()
        best = float("inf")
        rows = None
        for _ in range(2):
            t0 = time.time()
            df = fn()
            rows = sorted((r["node"], r["rank"]) for r in df.collect())
            best = min(best, time.time() - t0)
            spark.sparkContext._jvm.System.gc()
        print(f"{label}: {best:.2f}s ({len(rows)} rows)")
        return rows

    # edge build alone
    spark.sparkContext.setJobDescription("edges only")
    t0 = time.time()
    ne = copurchase_edges(li).count()
    print(f"edge build+count: {time.time()-t0:.2f}s ({ne} edges)")

    spark.sparkContext.setJobDescription("A eager ckpt")
    a = timed("A current (ckpt/round)", lambda: pagerank(copurchase_edges(li), iterations=iters))
    spark.sparkContext.setJobDescription("B lazy")
    b = timed("B lazy (no round ckpt)", lambda: pagerank_lazy(copurchase_edges(li), iterations=iters, ckpt_every=None))
    spark.sparkContext.setJobDescription("C ckpt every 4")
    c = timed("C ckpt every 4", lambda: pagerank_lazy(copurchase_edges(li), iterations=iters, ckpt_every=4))

    assert a == b, "variant B diverged"
    assert a == c, "variant C diverged"
    print("all variants identical")


if __name__ == "__main__":
    main()
