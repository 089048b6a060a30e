"""Measure the window-vs-device crossover for rfm_segments' three
global NTILE assignments (OPTIMIZATION_r10.md wave 4).

The two-phase distributed-rank device pays ~4 extra stage boundaries
per tiling (range-exchange sample pass, offset aggregate, broadcast,
join) — fixed cost, independent of n. The single-partition window pays
one task that sorts and scores ALL n rows — linear-plus in n. This
probe times both shapes on synthetic customer frames of growing n
(deterministic xxhash64-derived metrics, materialized input, noop sink
per guide §1.4), interleaving arms so ambient load cancels, and prints
the per-n medians. The crossover feeds funnel._RFM_WINDOW_ROWS.

Usage: python tools/exp_rfm_crossover.py [n1 n2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from valentinus_spark.session import get_spark
from valentinus_spark.operators._distrank import global_ranks, ntile_from_rank

N_TILES = 5


def make_base(spark, n):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("_c"),
            (F.xxhash64("id") % 4000).alias("recency_days"),
            (F.xxhash64("id", F.lit(1)) % 40 + 40).alias("frequency"),
            (F.abs(F.xxhash64("id", F.lit(2)) % 10_000_000) / 100.0).alias(
                "monetary"
            ),
        )
        .localCheckpoint()
    )


def window_arm(base):
    w_r = Window.orderBy(F.desc("recency_days"), F.asc("_c"))
    w_f = Window.orderBy(F.asc("frequency"), F.asc("_c"))
    w_m = Window.orderBy(F.asc("monetary"), F.asc("_c"))
    return base.select(
        "_c",
        F.ntile(N_TILES).over(w_r).alias("r_score"),
        F.ntile(N_TILES).over(w_f).alias("f_score"),
        F.ntile(N_TILES).over(w_m).alias("m_score"),
    )


def device_arm(base):
    def tile(metric, order_col, out):
        ranked = global_ranks(base.select("_c", metric), [order_col, F.asc("_c")])
        return ranked.select(
            "_c",
            ntile_from_rank(F.col("_rank"), F.col("_n"), N_TILES)
            .cast("int")
            .alias(out),
        )

    return (
        base.join(tile("recency_days", F.desc("recency_days"), "r_score"), "_c")
        .join(tile("frequency", F.asc("frequency"), "f_score"), "_c")
        .join(tile("monetary", F.asc("monetary"), "m_score"), "_c")
        .select("_c", "r_score", "f_score", "m_score")
    )


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [
        150_000,
        1_000_000,
        2_000_000,
        4_000_000,
        8_000_000,
    ]
    spark = get_spark("exp-rfm-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        base = make_base(spark, n)
        win, dev = [], []
        for rep in range(3):
            spark.sparkContext.setJobDescription(f"rfm window n={n} rep={rep}")
            win.append(timed(window_arm(base)))
            spark.sparkContext.setJobDescription(f"rfm device n={n} rep={rep}")
            dev.append(timed(device_arm(base)))
        win.sort()
        dev.sort()
        print(
            f"n={n:>9,}  window med {win[1]:6.2f}s (min {win[0]:.2f})"
            f"  device med {dev[1]:6.2f}s (min {dev[0]:.2f})",
            flush=True,
        )
        base.unpersist()


if __name__ == "__main__":
    main()
