"""Tour of the round-7 second-wave surfaces: frontier queries, sketch
join planning, layout-for-joins, nonparametric inference, and the
evaluation scorecard.

    parts → skyline_2d (cheapest-for-its-size Pareto frontier)
    orders → ams_f2_estimate (self-join size sketch) next to the truth
    lineitem ⋉ Brand#23 via bloom_semijoin (explicit runtime filter)
    daily revenue → runs_test / ljung_box / seasonal_mann_kendall /
                    holt_winters_forecast (the monitoring ladder)
    documents → source_tv_distance + quantile_normalize + james_stein
                (drift, comparability, winner's-curse guard)
    co-purchase graph → jaccard_link_prediction + k_truss + bfs_distances

Run: python examples/frontier_and_inference_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__ as entry
from valentinus_spark import get_spark
from valentinus_spark.operators.experiment import runs_test
from valentinus_spark.operators.graph import (
    bfs_distances,
    copurchase_edges,
    jaccard_link_prediction,
    k_truss,
)
from valentinus_spark.operators.profile import (
    james_stein_means,
    quantile_normalize,
)
from valentinus_spark.operators.quality import source_tv_distance
from valentinus_spark.operators.rollup import (
    holt_winters_forecast,
    ljung_box,
    seasonal_mann_kendall,
)
from valentinus_spark.operators.sketches import ams_f2_estimate, bloom_semijoin
from valentinus_spark.operators.skyline import skyline_2d

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("frontier-example")
    spark.sparkContext.setLogLevel("ERROR")

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = entry._events(spark, SF_DIR)

    print("== Pareto frontier: cheapest part for each size it beats ==")
    skyline_2d(
        part, "p_retailprice", "p_size", keep_cols=["p_partkey"]
    ).show(10, truncate=False)

    print("== AMS F2: sketched vs exact self-join size on o_custkey ==")
    ams_f2_estimate(orders.select("o_custkey"), "o_custkey").show(
        truncate=False
    )

    print("== Bloom semi-join: Brand#23 lineitems via explicit filter ==")
    dim = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    matched = bloom_semijoin(lineitem, dim, "l_partkey", "p_partkey")
    matched.agg(
        F.count(F.lit(1)).alias("rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("gross"),
    ).show()

    print("== Monitoring ladder over daily revenue / volume ==")
    daily = orders.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    runs_test(daily, "o_orderdate", "revenue").show()
    ljung_box(events.select("ts"), max_lag=7).show()
    seasonal_mann_kendall(events.select("ts", "value")).show()
    holt_winters_forecast(events.select("ts", "value"), period=7).show(5)

    print("== Source drift / comparability / shrinkage panel ==")
    docs = documents.select("source", "n_chars", "text")
    source_tv_distance(docs, "source", "text").show(5, truncate=False)
    quantile_normalize(docs, "source", "n_chars").show(5)
    james_stein_means(docs, "source", "n_chars").show(5)

    print("== Link prediction + cohesion on the co-purchase graph ==")
    edges = copurchase_edges(
        lineitem.join(
            F.broadcast(part.filter(F.col("p_brand").startswith("Brand#1"))
                        .select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    jaccard_link_prediction(edges, k=5, max_degree=50).show(truncate=False)
    k_truss(edges, k=4).groupBy().agg(
        F.count(F.lit(1)).alias("truss_edges"),
        F.max("support").alias("max_support"),
    ).show()
    seeds = edges.limit(1).select("src").collect()
    if seeds:
        bfs_distances(edges, [seeds[0].src], max_iters=4).groupBy("dist").count().orderBy("dist").show()

    spark.stop()


if __name__ == "__main__":
    main()
