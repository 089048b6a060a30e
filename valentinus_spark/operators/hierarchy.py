"""Hierarchical (tree) rollups: ancestor closure by pointer doubling and
subtree aggregation — the org-chart / category-taxonomy / BOM-explosion
shape every warehouse eventually needs, built so the number of Spark
rounds is O(log depth), not O(depth) (SURVEY.md §2.4 extension surface;
the same doubling trick as connected_components_star's O(log n) rounds).

Scale shape: the closure has |nodes|·depth rows — that IS the output
lower bound for subtree analytics, not overhead. Each doubling round is
one self-equi-join of the closure on the frontier-ancestor key +
distinct (paths of length ≤ 2^k after round k), localCheckpointed so
lineage stays flat. A depth-1000 pathological chain costs 10 rounds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ancestor_closure", "subtree_rollup"]


def ancestor_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = 64,
) -> DataFrame:
    """Transitive (node → ancestor) closure of a parent-pointer forest,
    by path doubling: after round k the closure holds every ancestor
    within 2^k hops, so ``ceil(log2(max_depth))`` rounds cover any tree
    of that depth. Rows where child == parent (self-loop roots) are
    ignored. Returns (``node``, ``anc``) — one row per proper
    ancestor relationship.

    ``max_depth`` is a CONTRACT bound (raise it for deeper trees): the
    loop always runs the full ceil(log2(max_depth)) rounds — no
    convergence collect — and extra rounds on a shallower tree are
    no-op joins on an already-complete closure.
    """
    c = (
        edges.filter(F.col(child_col) != F.col(parent_col))
        .select(
            F.col(child_col).alias("node"), F.col(parent_col).alias("anc")
        )
        .distinct()
        .localCheckpoint()
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_depth))))
    for _ in range(rounds):
        hop = c.select(F.col("node").alias("_m"), F.col("anc").alias("_a"))
        ext = c.join(hop, c["anc"] == hop["_m"]).select(
            "node", F.col("_a").alias("anc")
        )
        c = c.unionByName(ext).distinct().localCheckpoint()
    return c


def subtree_rollup(
    edges: DataFrame,
    values: DataFrame,
    node_col: str = "node",
    value_col: str = "value",
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = 64,
) -> DataFrame:
    """Subtree aggregation: for every node, the count and value sum of
    its ENTIRE subtree (descendants + itself) — the category-taxonomy
    rollup ("revenue under Electronics, all levels"), computed without
    per-level iteration over the fact table.

    Returns (``node``, ``subtree_n``, ``subtree_sum``) for every node
    in ``values``, ordered by node. Value sums accumulate in
    DECIMAL(38,6) so the rollup is partition-order-exact for numeric
    inputs of ≤ 6 fractional digits.

    Scale shape: the closure (O(log depth) doubling rounds) + ONE
    ancestor-keyed aggregate of the values-joined closure + a left
    join to add each node's own value. No level-by-level fact passes.
    """
    closure = ancestor_closure(edges, child_col, parent_col, max_depth)
    v = values.select(
        F.col(node_col).alias("_n"),
        F.col(value_col).try_cast("decimal(38,6)").alias("_v"),
    )
    desc_agg = (
        closure.join(v, closure["node"] == v["_n"])
        .groupBy("anc")
        .agg(
            F.count(F.lit(1)).alias("_dn"),
            F.sum("_v").alias("_dv"),
        )
    )
    return (
        v.join(desc_agg, v["_n"] == desc_agg["anc"], "left")
        .select(
            F.col("_n").alias(node_col),
            (F.coalesce("_dn", F.lit(0)) + 1).alias("subtree_n"),
            F.round(
                (
                    F.coalesce("_dv", F.lit(0).cast("decimal(38,6)"))
                    + F.col("_v")
                ).cast("double"),
                6,
            ).alias("subtree_sum"),
        )
        .orderBy(node_col)
    )
