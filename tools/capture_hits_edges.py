"""Capture the hits() EDGE-BUILD subplan (the lazy frame feeding the
first localCheckpoint — the part the r9 keyed-repartition change moved),
for both formulations, into plans/r09/hits_edges_{before,after}.txt.
The loop body checkpoints eagerly, so hits_purchase_graph_{tag}.txt
starts at checkpoint scans and cannot show this diff.

Usage: python tools/capture_hits_edges.py [outdir] [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from valentinus_spark.functions.util import ensure_parallelism
from valentinus_spark.session import get_spark


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r09"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("plan-capture-hits-edges")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_partkey") + F.lit(10_000_000)).alias("dst"),
    )
    par = spark.sparkContext.defaultParallelism
    before = ensure_parallelism(edges.select("src", "dst")).distinct()
    after = edges.select("src", "dst").repartition(par, "src", "dst").distinct()
    with open(os.path.join(outdir, "hits_edges_before.txt"), "w") as f:
        f.write(plan_of(before))
    with open(os.path.join(outdir, "hits_edges_after.txt"), "w") as f:
        f.write(plan_of(after))
    print("captured hits_edges before/after", file=sys.stderr)


if __name__ == "__main__":
    main()
