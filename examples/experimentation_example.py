"""Experimentation-readout tour: the round-5 causal/testing operators
run in the order a real experiment review runs them.

    events
      → SRM gate                 (is the assignment even valid?)
      → conversion z-test        (did the rate move?)
      → revenue Welch t          (did the money move?)
      → CUPED                    (how much runtime does a covariate buy?)
      → difference-in-differences (the quasi-experimental fallback)
      → seasonal-naive baseline  (is the volume forecast even beatable?)

Each stage prints the one small table a reviewer reads; nothing
mutates the corpus.

Run: python examples/experimentation_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from valentinus_spark import get_spark
from valentinus_spark.operators import (
    ab_assign,
    cuped_adjust,
    did_estimate,
    seasonal_naive_eval,
    srm_check,
    two_proportion_test,
    welch_means_test,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("experimentation-example")
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    dec = F.col("value").cast("decimal(18,2)")
    users = events.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "success"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", dec).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        )
        .cast("double")
        .alias("revenue"),
        F.sum(
            F.when(F.col("event_type") == "view", dec).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        )
        .cast("double")
        .alias("views"),
    ).select(ab_assign(F.col("user_id")).alias("arm"), "success", "revenue", "views")

    print("== Gate 1: sample-ratio mismatch ==")
    srm_check(users, "arm").show()

    print("== Conversion: two-proportion z ==")
    two_proportion_test(users, "arm", "success").show()

    print("== Revenue: Welch t ==")
    welch_means_test(users, "arm", "revenue").show()

    print("== CUPED: view-value covariate ==")
    cuped_adjust(users, "arm", "revenue", "views").show()

    print("== Difference-in-differences at the corpus midpoint ==")
    ev = events.withColumn("_d", F.to_date("ts"))
    bounds = ev.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    framed = ev.crossJoin(F.broadcast(bounds)).select(
        ab_assign(F.col("user_id")).alias("arm"),
        (F.datediff("_d", "_lo") * 2 > F.datediff("_hi", "_lo"))
        .cast("int")
        .alias("period"),
        "value",
    )
    did_estimate(framed, "arm", "period", "value").show()

    print("== Volume-forecast baseline per event type ==")
    seasonal_naive_eval(events, "event_type").show()

    spark.stop()
    print("experimentation_example: OK")


if __name__ == "__main__":
    main()
