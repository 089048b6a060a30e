"""A/B the pagerank/ppr weighted-edge build (r10): OLD checkpoint →
degree aggregate → broadcast join → second checkpoint vs NEW degree
folded into the spreading exchange by a src-keyed window, one
checkpoint. Asserts the two (src, dst, _d) row sets are identical
(bit_xor signature over a row hash), captures both lazy subplans, and
times the materialization of each (fresh localCheckpoint per rep).

Usage: python tools/exp_pagerank_r10.py [sf_dir] [reps]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from valentinus_spark.operators.graph import copurchase_edges
from valentinus_spark.session import get_spark


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def sig(df):
    h = F.xxhash64(F.col("src"), F.col("dst"), F.col("_d"))
    r = df.select(h.alias("h")).agg(
        F.expr("bit_xor(h)").alias("x"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return (r["x"], r["n"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-pagerank-r10")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def old_build():
        e = copurchase_edges(li).localCheckpoint()
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d")).localCheckpoint()
        return e.join(deg, "src").localCheckpoint()

    def new_build():
        return (
            copurchase_edges(li)
            .withColumn("_d", F.count(F.lit(1)).over(Window.partitionBy("src")))
            .localCheckpoint()
        )

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "pagerank_ew_build_before.txt"), "w") as f:
        e = copurchase_edges(li)
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        f.write(plan_of(e.join(deg, "src")))
    with open(os.path.join(outdir, "pagerank_ew_build_after.txt"), "w") as f:
        f.write(
            plan_of(
                copurchase_edges(li).withColumn(
                    "_d", F.count(F.lit(1)).over(Window.partitionBy("src"))
                )
            )
        )
    print("# subplans captured", file=sys.stderr)

    s_old = sig(old_build())
    s_new = sig(new_build())
    assert s_old == s_new, (s_old, s_new)
    print(f"# signatures identical: xor={s_old[0]} n={s_old[1]}", file=sys.stderr)

    for label, build in [("old", old_build), ("new", new_build)] * reps:
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        build()
        print(f"{label}: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
