"""Graph + lakehouse tour: the co-purchase graph family end-to-end and
the versioned-table MERGE lifecycle.

    lineitem → copurchase_edges → pagerank / triangle_count / k_core
    near-dup pairs → connected_components_star (distributed path)
    customers → versioned table → MERGE INTO (update+delete+insert)
    → time travel across the merge

Run: python examples/graph_and_lakehouse_example.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators.graph import (
    copurchase_edges,
    k_core,
    pagerank,
    triangle_count,
)
from valentinus_spark.sources.versioned import (
    commit_version,
    merge_into,
    read_version,
    table_history,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("graph-lakehouse-example")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = copurchase_edges(li)

    print("top parts by co-purchase PageRank:")
    pagerank(edges, iterations=5).orderBy(F.desc("rank")).show(5)

    print("triangle census:", triangle_count(edges).collect()[0].asDict())

    core = k_core(edges, k=8)
    print(f"8-core: {core.count()} parts (the densest co-purchase cluster)")

    # ---- versioned MERGE lifecycle ----
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = tempfile.mkdtemp(prefix="ex_merge_")
    v1 = commit_version(spark, path, cust, mode="overwrite")
    updates = cust.limit(50).select(
        "c_custkey",
        F.lit("UPGRADED").alias("c_mktsegment"),
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        (F.col("c_custkey") % 5 == 0).alias("is_delete"),
    )
    v2 = merge_into(spark, path, updates, on=["c_custkey"], delete_col="is_delete")
    before = read_version(spark, path, v1)
    after = read_version(spark, path, v2)
    n_up = after.where(F.col("c_mktsegment") == "UPGRADED").count()
    print(
        f"merge committed v{v2}: {before.count()} rows -> {after.count()} "
        f"({n_up} upgraded); pinned v{v1} reader still sees the pre-merge table"
    )
    table_history(spark, path).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
