"""Round-9 second-wave probe: post-cadence phase split of the remaining
big graph rows — where do pagerank / hits / adamic_adar spend their
time now? Phases are timed with the noop-equivalent trigger the
operators themselves use (localCheckpoint / count), repeated to split
cold-JIT from steady-state.

Usage: python tools/exp_phase_r09b.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark.operators.graph import (
    copurchase_edges,
    pagerank,
    hits,
    adamic_adar,
)
from valentinus_spark.session import get_spark


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s", file=sys.stderr)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-phase-r09b")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spark.range(1000).selectExpr("sum(id)").collect()

    for r in range(reps):
        print(f"== rep {r} pagerank phases ==", file=sys.stderr)
        sc = spark.sparkContext
        sc.setJobDescription("pr-edges")
        e = t("edge build (ckpt)", lambda: copurchase_edges(li)
              .select("src", "dst").localCheckpoint())
        sc.setJobDescription("pr-nodes-deg")
        nodes = t("nodes distinct (ckpt+count)", lambda: e.select(
            F.col("src").alias("node")).distinct().localCheckpoint())
        t("n count", nodes.count)
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        e_w = t("e_w join+ckpt", lambda: e.join(deg, "src").localCheckpoint())
        sc.setJobDescription("pr-full")
        t("FULL pagerank (op)", lambda: pagerank(copurchase_edges(li))
          .write.format("noop").mode("overwrite").save())

    for r in range(reps):
        print(f"== rep {r} hits phases ==", file=sys.stderr)
        sc = spark.sparkContext
        sc.setJobDescription("hits-full")
        edges = orders.select("o_orderkey", "o_custkey").join(
            li.select("l_orderkey", "l_partkey"),
            orders["o_orderkey"] == li["l_orderkey"],
        ).select(
            F.col("o_custkey").alias("src"),
            (F.col("l_partkey") + F.lit(10_000_000)).alias("dst"),
        )
        t("FULL hits (op)", lambda: hits(edges, iterations=4)
          .write.format("noop").mode("overwrite").save())

    for r in range(reps):
        print(f"== rep {r} adamic_adar phases ==", file=sys.stderr)
        sc = spark.sparkContext
        sc.setJobDescription("aa-full")
        parts = (
            spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_brand").startswith("Brand#1"))
            .select("p_partkey")
        )
        li_b = li.join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        t("FULL adamic_adar (op)", lambda: adamic_adar(
            copurchase_edges(li_b), k=100, max_degree=50)
          .write.format("noop").mode("overwrite").save())


if __name__ == "__main__":
    main()
