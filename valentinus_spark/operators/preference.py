"""Preference-data modeling: Bradley-Terry strength fitting over pairwise
comparisons — the aggregation step of an RLHF / human-eval pipeline
(pairwise judgments in, per-item strength + ranking out).

No reference equivalent (training-pipeline extension surface); the
algorithm is the classical Bradley-Terry model (1952) fit with Hunter's
MM algorithm (Ann. Statist. 2004), which is synchronous per iteration
and therefore both distributable AND replayable in plain SQL.

Scale shape: comparisons collapse to an (i, j, n_ij) pair-count table
(one map-side-combined aggregate — millions of judgments over k items
become ≤ k² rows, and real preference sets compare each pair a bounded
number of times); every MM iteration is a join of that pair table with
the k-row strength table (broadcast when k is moderate, AQE otherwise)
plus a per-item aggregate. The corpus of raw judgments is scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bt_ranking(
    prefs: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 10,
) -> DataFrame:
    """Fit Bradley-Terry strengths θ to pairwise preference rows (one
    row = one judgment: ``winner_col`` beat ``loser_col``) and rank the
    items. P(i beats j) = θ_i / (θ_i + θ_j); the MM update

        θ_i ← W_i / Σ_{j≠i} n_ij / (θ_i + θ_j)

    (W_i = total wins of i, n_ij = comparisons between i and j) runs a
    fixed ``iters`` rounds from θ=1, normalizing to Σθ = 1 each round.
    Fixed iteration count + synchronous updates + a 9-decimal round per
    round make the whole fit deterministic and bit-replayable in the
    DuckDB oracle (the same unrolled-replay discipline as LPA).

    Items that never win pin to θ=0 after round 1 (the MLE boundary
    case); pairs where both sides are pinned contribute nothing (their
    denominator term is epsilon-guarded, and W=0 keeps them at 0).

    Returns (``item``, ``theta`` rounded 6, ``wins``, ``n_comparisons``,
    ``rank``) — rank 1 = strongest, ties broken by item ascending.

    Plan: one aggregate to the pair-count table (checkpointed — it
    feeds every iteration), then per round two broadcast joins against
    the k-row θ table and one item-keyed aggregate, each round
    localCheckpointed to keep the lineage flat (pagerank loop
    discipline)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    w = F.col(winner_col).cast("string")
    l = F.col(loser_col).cast("string")
    judged = prefs.filter(w.isNotNull() & l.isNotNull() & (w != l)).select(
        w.alias("_w"), l.alias("_l")
    )
    # ordered pair counts -> symmetric comparison counts + per-item wins
    # the pair/win/strength tables are k-item-sized; single-partition
    # them so the 10-round loop does not pay 32-task scheduling per
    # stage on ~k-row frames (measured 35s -> ~8s on 25 items)
    ordered = (
        judged.groupBy("_w", "_l")
        .agg(F.count(F.lit(1)).alias("_n"))
        .coalesce(1)
        .localCheckpoint()
    )
    sym = (
        ordered.select(F.col("_w").alias("_i"), F.col("_l").alias("_j"), "_n")
        .unionByName(
            ordered.select(F.col("_l").alias("_i"), F.col("_w").alias("_j"), "_n")
        )
        .groupBy("_i", "_j")
        .agg(F.sum("_n").alias("_nij"))
        .coalesce(1)
        .localCheckpoint()
    )
    wins = (
        sym.select(F.col("_i").alias("_item"))
        .distinct()
        .join(
            ordered.groupBy(F.col("_w").alias("_item")).agg(
                F.sum("_n").alias("wins")
            ),
            "_item",
            "left",
        )
        .select("_item", F.coalesce("wins", F.lit(0)).alias("wins"))
        .coalesce(1)
        .localCheckpoint()
    )
    theta = wins.select("_item", F.lit(1.0).alias("_theta"))
    for _ in range(iters):
        denom = (
            sym.join(
                F.broadcast(theta.select(F.col("_item").alias("_i"), F.col("_theta").alias("_ti"))),
                "_i",
            )
            .join(
                F.broadcast(theta.select(F.col("_item").alias("_j"), F.col("_theta").alias("_tj"))),
                "_j",
            )
            .groupBy(F.col("_i").alias("_item"))
            .agg(
                F.sum(
                    F.col("_nij")
                    / F.greatest(F.col("_ti") + F.col("_tj"), F.lit(1e-12))
                ).alias("_d")
            )
        )
        raw = wins.join(denom, "_item").select(
            "_item", (F.col("wins") / F.col("_d")).alias("_t")
        )
        # normalization total via an everything-window on the coalesced
        # 1-partition frame — no extra aggregate job per round
        from pyspark.sql import Window as _W

        theta = (
            raw.coalesce(1)
            .select(
                "_item",
                F.round(
                    F.col("_t") / F.sum("_t").over(_W.partitionBy()), 9
                ).alias("_theta"),
            )
            .localCheckpoint()
        )
    from pyspark.sql import Window

    ncmp = sym.groupBy(F.col("_i").alias("_item")).agg(
        F.sum("_nij").alias("n_comparisons")
    )
    ranked = (
        theta.join(wins, "_item")
        .join(ncmp, "_item")
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("_theta"), F.asc("_item"))
            ),
        )
    )
    return ranked.select(
        F.col("_item").alias("item"),
        F.round("_theta", 6).alias("theta"),
        "wins",
        "n_comparisons",
        "rank",
    ).orderBy("rank")
