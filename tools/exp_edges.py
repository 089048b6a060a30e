"""Round-9 probe: copurchase_edges build variants. All must produce the
IDENTICAL symmetric distinct edge set (asserted via count + xor hash).

Usage: python tools/exp_edges.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark.functions.util import ensure_parallelism
from valentinus_spark.operators.graph import copurchase_edges
from valentinus_spark.session import get_spark


def v1_canonical_mirror(lineitem):
    """join with src<dst, distinct canonical pairs, mirror by union."""
    a = ensure_parallelism(
        lineitem.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("src"))
    )
    b = lineitem.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("dst"))
    canon = (
        a.join(b, "_o")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return canon.unionAll(canon.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def v2_keyed_repartition(lineitem):
    """canonical+mirror, but spread side a by the JOIN key."""
    spark = lineitem.sparkSession
    par = spark.sparkContext.defaultParallelism
    a = lineitem.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("src")
    ).repartition(par, "_o")
    b = lineitem.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("dst"))
    canon = (
        a.join(b, "_o")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return canon.unionAll(canon.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def v3_grouped(lineitem):
    """one groupBy to per-order item arrays, explode canonical pairs."""
    items = (
        ensure_parallelism(
            lineitem.select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("_p"))
        )
        .groupBy("_o")
        .agg(F.collect_set("_p").alias("_ps"))
    )
    pairs = items.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.array_sort("_ps"),
                    lambda x, i: F.transform(
                        F.slice(F.array_sort("_ps"), i + 2, F.size("_ps")),
                        lambda y: F.struct(x.alias("src"), y.alias("dst")),
                    ),
                )
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst").distinct()
    return pairs.unionAll(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-edges")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.range(1000).selectExpr("sum(id)").collect()

    def sig(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    def timed(label, fn):
        best, s = float("inf"), None
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            s = sig(fn(li))
            best = min(best, time.time() - t0)
        print(f"{label}: {best:.2f}s  sig={s}")
        return s

    s0 = timed("V0 current", copurchase_edges)
    s1 = timed("V1 canon+mirror", v1_canonical_mirror)
    s2 = timed("V2 keyed-repart", v2_keyed_repartition)
    s3 = timed("V3 grouped", v3_grouped)
    assert s0 == s1 == s2 == s3, (s0, s1, s2, s3)
    print("all identical")


if __name__ == "__main__":
    main()
