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


def elo_ratings(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    round_col: str = "round",
    k_factor: float = 16.0,
    initial: float = 1500.0,
) -> DataFrame:
    """Batched Elo ratings over ORDERED match rounds — the sequential
    cousin of :func:`bt_ranking` (Bradley-Terry fits one static
    strength; Elo tracks drift across time, the standard for arena-style
    model leaderboards). Within a round every match is scored against
    the ratings AT ROUND START (synchronous batch update):

        E_w = 1 / (1 + 10^((R_l − R_w)/400))
        ΔR_w += K·(1 − E_w),  ΔR_l += K·(0 − (1 − E_w))

    then R ← round(R + ΔR, 9) — the 9-decimal per-round pin that makes
    the whole trajectory bit-replayable in an unrolled SQL oracle (same
    discipline as bt_ranking / pagerank / LPA). Synchronous batching is
    what makes Elo distributable at all: per-match sequential Elo is
    inherently serial, while per-round deltas are one join + one
    aggregate.

    ``round_col`` must be a coarse, calendar-bounded key (year, month,
    week): the driver collects the DISTINCT round values (bounded by
    contract — decades of weeks is still O(10³)) and unrolls one Spark
    stage batch per round; the match/ratings tables stay distributed.

    Returns (``item``, ``rating`` rounded 4, ``wins``, ``losses``,
    ``n_matches``, ``rank``), rank 1 = highest rating, ties broken by
    item ascending.

    Scale shape: one pass to per-round match lists; per round, two
    broadcast joins of the k-item rating table against that round's
    matches and one item-keyed delta aggregate, localCheckpointed so
    lineage stays flat over many rounds. Judgment volume is scanned
    once; loop cost is rounds × O(matches_in_round).
    """
    w = F.col(winner_col).cast("string")
    l = F.col(loser_col).cast("string")
    m = matches.filter(w.isNotNull() & l.isNotNull() & (w != l)).select(
        w.alias("_w"), l.alias("_l"), F.col(round_col).alias("_r")
    )
    # (round, winner, loser) counts — bounded by k² per round
    counts = (
        m.groupBy("_r", "_w", "_l")
        .agg(F.count(F.lit(1)).alias("_n"))
        .coalesce(1)
        .localCheckpoint()
    )
    rounds = [row[0] for row in counts.select("_r").distinct().orderBy("_r").collect()]
    players = (
        counts.select(F.col("_w").alias("_item"))
        .unionByName(counts.select(F.col("_l").alias("_item")))
        .distinct()
        .coalesce(1)
        .localCheckpoint()
    )
    rating = players.select("_item", F.lit(float(initial)).alias("_rt"))
    for r in rounds:
        mr = counts.filter(F.col("_r") == F.lit(r))
        scored = mr.join(
            F.broadcast(rating.select(F.col("_item").alias("_w"), F.col("_rt").alias("_rw"))),
            "_w",
        ).join(
            F.broadcast(rating.select(F.col("_item").alias("_l"), F.col("_rt").alias("_rl"))),
            "_l",
        )
        ew = 1.0 / (
            1.0 + F.pow(F.lit(10.0), (F.col("_rl") - F.col("_rw")) / 400.0)
        )
        deltas = scored.select(
            F.col("_w").alias("_item"),
            (F.lit(float(k_factor)) * F.col("_n") * (1.0 - ew)).alias("_d"),
        ).unionByName(
            scored.select(
                F.col("_l").alias("_item"),
                (-F.lit(float(k_factor)) * F.col("_n") * (1.0 - ew)).alias("_d"),
            )
        )
        delta = deltas.groupBy("_item").agg(F.sum("_d").alias("_dsum"))
        rating = (
            rating.join(delta, "_item", "left")
            .select(
                "_item",
                F.round(
                    F.col("_rt") + F.coalesce("_dsum", F.lit(0.0)), 9
                ).alias("_rt"),
            )
            .coalesce(1)
            .localCheckpoint()
        )
    # final assembly: every frame here is k-item-sized — broadcast the
    # win/loss aggregates so the assembly is exchange-free on the
    # checkpointed rating table
    wl = (
        players.join(
            F.broadcast(
                counts.groupBy(F.col("_w").alias("_item")).agg(
                    F.sum("_n").alias("wins")
                )
            ),
            "_item",
            "left",
        )
        .join(
            F.broadcast(
                counts.groupBy(F.col("_l").alias("_item")).agg(
                    F.sum("_n").alias("losses")
                )
            ),
            "_item",
            "left",
        )
        .select(
            "_item",
            F.coalesce("wins", F.lit(0)).alias("wins"),
            F.coalesce("losses", F.lit(0)).alias("losses"),
        )
    )
    from pyspark.sql import Window as _W

    out = rating.join(F.broadcast(wl), "_item").select(
        F.col("_item").alias("item"),
        F.round("_rt", 4).alias("rating"),
        "wins",
        "losses",
        (F.col("wins") + F.col("losses")).alias("n_matches"),
    )
    return out.withColumn(
        "rank",
        F.row_number().over(_W.orderBy(F.desc("rating"), F.asc("item"))),
    ).orderBy("rank")
