"""Graph analytics: PageRank over edge lists.

The second iterative operator family beside connected components
(operators/dedup.py): rank propagation with a fixed round count. The
driver-synchronized loop is the same shape a Pregel superstep compiles
to — per round ONE join + ONE aggregation over the edge list, lineage
truncated by localCheckpoint so the plan stays round-sized; rounds are a
constant (``iterations``), not data-dependent, so the 100 TB cost model
is simply ``iterations × (edge-join + node-agg)`` with both shuffles
keyed on node id (co-partitionable end to end).

Cross-engine determinism: per-round ranks are rounded to 9 decimals on
BOTH engines, which absorbs the accumulation-order difference of double
sums (≈1e-16 relative) while leaving PageRank's 1e-4-scale signal
untouched — the same decimal-pinning trick the window-sum oracles use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from valentinus_spark.functions.util import ensure_parallelism


def symmetric_edges(
    pairs: DataFrame, a: str = "src", b: str = "dst"
) -> DataFrame:
    """Undirected pair list → symmetric directed edge list (both
    directions, deduplicated, self-loops dropped)."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.union(rev).filter(F.col("src") != F.col("dst")).distinct()


def copurchase_edges(
    lineitem: DataFrame, order_col: str = "l_orderkey", item_col: str = "l_partkey"
) -> DataFrame:
    """Item co-occurrence graph: symmetric edges between parts appearing
    in the same order. Self-equi-join on the order key — candidates only
    materialize within an order, so the blow-up is bounded by
    max-items-per-order², the usual market-basket shape."""
    a = lineitem.select(F.col(order_col).alias("_o"), F.col(item_col).alias("src"))
    b = lineitem.select(F.col(order_col).alias("_o"), F.col(item_col).alias("dst"))
    return (
        a.join(b, "_o")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 8,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank with a fixed round count over a SYMMETRIC edge list
    (every node has in- and out-edges, so no dangling-mass term — build
    input with :func:`symmetric_edges` / :func:`copurchase_edges`).
    Returns (node, rank); ranks sum to ~1.

    rank_{t+1}(v) = (1-d)/N + d · Σ_{u→v} rank_t(u) / outdeg(u),
    each round rounded to 9 decimals (see module docstring)."""
    e = ensure_parallelism(edges.select(src, dst)).localCheckpoint()
    nodes = e.select(F.col(src).alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("_d"))
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            ranks.join(e, ranks["node"] == e[src])
            .join(deg, src)
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_d")).alias("_c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport) + F.lit(damping) * F.coalesce("_c", F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
