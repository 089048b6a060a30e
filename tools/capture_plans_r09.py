"""Capture .explain('formatted') for the r9-optimization touched queries
into plans/r09/<query>_<tag>.txt. Loop operators localCheckpoint eagerly,
so their returned plan starts at the checkpoint scans — for those the
companion *_edges_<tag>.txt captures the (lazy) edge-build subplan that
the optimization actually changed.

Usage: python tools/capture_plans_r09.py <tag> <outdir> [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from valentinus_spark.session import get_spark

TOUCHED = [
    "zorder_bucket_stats",
    "ams_f2_orders",
    "link_prediction_aa",
    "copurchase_jaccard_links",
    "triangle_copurchase",
    "graph_transitivity",
    "pagerank_copurchase",
    "ppr_related_parts",
    "textrank_keywords",
    "lpa_communities",
    "hits_purchase_graph",
    "graph_assortativity",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-capture-r09")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in TOUCHED:
        df = qs[name](spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan_of(df))
        print(f"captured {name}", file=sys.stderr)
    # the edge-build subplan (lazy — the part the loop queries changed)
    from pyspark.sql import functions as F

    from valentinus_spark.operators.graph import copurchase_edges

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with open(os.path.join(outdir, f"copurchase_edges_{tag}.txt"), "w") as f:
        f.write(plan_of(copurchase_edges(li)))
    print("captured copurchase_edges", file=sys.stderr)


if __name__ == "__main__":
    main()
