"""Corpus mixture planning: per-source sampling weights for pretraining.

The step BEFORE ``mixture_repeat_count`` (functions/text.py): given the
measured corpus composition, compute what each source's share of the
training stream should be, then hand the implied repeat factors to the
deterministic resampler. Two published policies:

- **Temperature scaling** (multilingual pretraining à la XLM-R:
  p_s ∝ (n_s / N)^(1/τ)): τ=1 keeps natural proportions, τ→∞ approaches
  uniform; the standard knob for keeping long-tail sources from drowning.
- **Budgeted cap**: a hard ceiling on any source's share after scaling
  (the "no more than X% from one crawl" rule), re-normalizing the rest.

No reference equivalent (training-pipeline extension surface).

Scale shape: one map-side-combined aggregate to source granularity
(thousands of rows at most), then driver-free arithmetic on that tiny
frame — no second pass over the corpus. The output is source-level, so
downstream joins broadcast it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from valentinus_spark.functions.text import normalize_text, word_tokens
from valentinus_spark.functions.util import ensure_parallelism


def temperature_mixture_weights(
    df: DataFrame,
    stratum_col: str = "source",
    size_col: str | None = "n_chars",
    tau: float = 2.0,
    cap: float | None = None,
) -> DataFrame:
    """Per-stratum mixture plan: measured share, temperature-scaled
    target share, and the repeat factor that realizes it.

    Columns: ``{stratum_col}``, ``n_rows``, ``n_size`` (summed
    ``size_col``, or row count when None), ``p_raw`` (natural share by
    size), ``p_target`` (∝ p_raw^(1/τ), optionally capped at ``cap``
    with the excess redistributed proportionally among uncapped strata
    — one waterfilling pass, exact for a single binding cap tier),
    ``repeat_factor`` (= p_target / p_raw; feed to
    ``mixture_repeat_count`` to materialize the plan). All shares are
    rounded to 6 decimals for cross-engine comparability.

    τ must be ≥ 1 (τ<1 would sharpen skew, never wanted here); cap in
    (0, 1]."""
    if tau < 1.0:
        raise ValueError(f"tau must be >= 1, got {tau}")
    if cap is not None and not (0.0 < cap <= 1.0):
        raise ValueError(f"cap must be in (0, 1], got {cap}")
    size = F.col(size_col).cast("double") if size_col else F.lit(1.0)
    agg = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(size).cast("bigint").alias("n_size"),
    )
    everything = Window.partitionBy()
    p_raw = F.col("n_size") / F.sum("n_size").over(everything)
    scaled = F.pow(p_raw, F.lit(1.0 / tau))
    p_t = scaled / F.sum(scaled).over(everything)
    out = agg.withColumn("_praw", p_raw).withColumn("_pt", p_t)
    if cap is not None:
        # Feasibility gate, in-plan so laziness is preserved: targets can
        # only sum to 1 when cap * n_strata >= 1. Below that every
        # stratum pins at cap, free_mass is NULL, and the plan would
        # silently emit targets summing to n*cap (r4 ADVICE,
        # mixture.py:66). assert_true raises at evaluation time and
        # returns NULL when the plan is feasible, so the when() below is
        # a pass-through on the happy path.
        feasible = F.lit(cap) * F.count(F.lit(1)).over(everything) >= F.lit(1.0 - 1e-9)
        guard = F.assert_true(
            feasible,
            F.lit(
                f"infeasible mixture cap {cap}: cap * n_strata < 1, "
                "no target distribution can sum to 1"
            ),
        )
        # waterfill once: capped strata pin at cap; the freed mass
        # spreads proportionally over the rest (free_mass cannot be NULL
        # once the guard holds: all-capped with sum(_pt)=1 would need
        # 1 > n*cap, exactly the rejected case)
        capped = F.col("_pt") > F.lit(cap)
        cap_mass = F.sum(F.when(capped, F.lit(cap))).over(everything)
        free_mass = F.sum(F.when(~capped, F.col("_pt"))).over(everything)
        out = out.withColumn(
            "_pt",
            F.when(
                guard.isNull(),
                F.when(capped, F.lit(cap)).otherwise(
                    F.col("_pt")
                    * (F.lit(1.0) - F.coalesce(cap_mass, F.lit(0.0)))
                    / free_mass
                ),
            ),
        )
    return out.select(
        stratum_col,
        "n_rows",
        "n_size",
        F.round("_praw", 6).alias("p_raw"),
        F.round("_pt", 6).alias("p_target"),
        F.round(F.col("_pt") / F.col("_praw"), 6).alias("repeat_factor"),
    )


def token_budget_sample(
    docs: DataFrame,
    budgets: DataFrame,
    stratum_col: str = "source",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Cut an EXACT-budget training subset: per stratum, take documents
    in deterministic pseudo-random order (sha256 of salt+id — the
    stable_split trick, content-independent and replayable) until the
    stratum's token budget is met. The materialization step after
    :func:`temperature_mixture_weights` decides the proportions: weights
    say 30% code / 70% web, this turns that into an actual row set
    summing to the budgeted tokens.

    ``budgets``: (stratum_col, budget_tokens) — tiny, broadcast. A row
    is kept while its INCLUSIVE running token sum ≤ budget, so the
    selected set is the maximal hash-order prefix within budget
    (deterministic; the first over-budget doc is dropped, not split —
    document-level sampling never splits).

    Scale shape: ONE window (cumulative sum ordered by the hash) keyed
    on the stratum — the same partitioning every per-source pass uses;
    skewed strata pay an in-partition sort, which is inherent to an
    exact sequential budget (approximate alternative: Bernoulli-sample
    at budget/total and accept ±√n tokens; this operator is the exact
    path)."""
    from pyspark.sql import Window

    h = F.sha2(F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string")), 256)
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(h)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return (
        docs.join(F.broadcast(budgets), stratum_col)
        .withColumn("_cum", cum)
        .where(F.col("_cum") <= F.col("budget_tokens"))
        .drop("_cum", "budget_tokens")
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = "dsir-v1",
) -> DataFrame:
    """Hashed n-gram importance weights for data selection (DSIR, Xie et
    al., NeurIPS 2023): score every document by how much more likely its
    hashed unigram+bigram bag is under the TARGET distribution than under
    the RAW corpus distribution —
    ``logw(d) = Σ_b count_d[b] · (ln p_target[b] − ln p_raw[b])`` with
    add-1-smoothed bucket unigram models. Selecting high-``logw`` docs
    tilts a crawl toward the target domain without training a classifier;
    ``is_target`` marks the in-corpus exemplar rows (a trusted subset, a
    language, a curated source).

    Output: (``id_col``, ``n_grams``, ``dsir_logw``) for every doc with
    ≥1 token. ``dsir_logw`` is rounded to 4 decimals; the per-bucket log
    ratios are rounded to 6 and summed in DECIMAL so the score is
    accumulation-order-free and bit-identical cross-engine.

    Plan: one corpus scan (tokenize + bigram transform, row-local) →
    explode to hashed buckets → ONE hash-aggregate to (doc, bucket,
    count) rows (≤ n_docs × n_buckets, map-side combined), checkpointed
    because both the two n_buckets-sized model aggregates and the scoring
    join consume it. The bucket-model table is n_buckets rows → broadcast
    into the scoring join; no shuffle touches raw text twice. The target
    flag rides the aggregate key (functionally dependent on the doc id —
    zero extra groups), so target and raw models come from the SAME pass,
    not a second scan or an id join."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    toks = (
        ensure_parallelism(docs.filter(F.trim(F.col(text_col)) != ""))
        .select(
            id_col,
            is_target.alias("_t"),
            word_tokens(normalize_text(text_col)).alias("_toks"),
        )
        .filter(F.size("_toks") >= 1)
    )
    bigrams = F.when(
        F.size("_toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 2),
            lambda i: F.concat_ws(
                " ", F.element_at("_toks", i + 1), F.element_at("_toks", i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select(
        id_col, "_t", F.explode(F.concat("_toks", bigrams)).alias("_g")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.sha2(F.concat(F.lit(f"{salt}:"), F.col("_g")), 256), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(n_buckets),
    )
    feats = (
        grams.select(id_col, "_t", bucket.alias("_b"))
        .groupBy(id_col, "_t", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    models = feats.groupBy("_b").agg(
        F.sum("_c").alias("_rc"),
        F.sum(F.when(F.col("_t"), F.col("_c")).otherwise(F.lit(0))).alias("_tc"),
    )
    everything = Window.partitionBy()
    b = float(n_buckets)
    ratio = models.select(
        "_b",
        F.round(
            F.log((F.col("_tc") + 1.0) / (F.sum("_tc").over(everything) + b))
            - F.log((F.col("_rc") + 1.0) / (F.sum("_rc").over(everything) + b)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("_lr"),
    )
    return (
        feats.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_grams"),
            F.round(F.sum(F.col("_c") * F.col("_lr")).cast("double"), 4).alias(
                "dsir_logw"
            ),
        )
    )


def gumbel_sample_key(
    logw_col: Column | str,
    id_col: Column | str,
    salt: str = "dsir-g1",
) -> Column:
    """Gumbel-max resampling key: ``logw + Gumbel(0,1)`` with the noise
    derived from sha256 of the row id, so ``orderBy(key desc).limit(k)``
    draws k docs with probability ∝ exp(logw) — the resampling half of
    DSIR (top-k-by-weight alone collapses onto near-duplicate maximal
    docs; Gumbel keeps diversity) — while staying deterministic and
    replayable like [weighted_sample_key]. u uses the (h+0.5)/2³² form so
    it is strictly inside (0,1): the +1 form's u=1 endpoint would make
    ``-ln(-ln(u))`` infinite. Rounded to 4 decimals so both engines rank
    the same doubles; compiles to TakeOrderedAndProject under
    orderBy+limit (per-partition heaps, no global sort)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    lw = F.col(logw_col) if isinstance(logw_col, str) else logw_col
    h32 = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt), c.cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    u = (h32 + F.lit(0.5)) / F.lit(4294967296.0)
    return F.round(lw - F.log(-F.log(u)), 4)


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934): split a
    total sample budget across strata ∝ N_h·σ_h — the allocation that
    minimizes the variance of the stratified mean estimator for a fixed
    budget. The survey-sampling complement to the share-capped
    temperature mixture: use THIS when the goal is estimating a metric
    (labeling-budget allocation, eval-set sizing, QA sampling), not
    shaping a training distribution.

    σ_h is the population standard deviation of ``value_col`` within the
    stratum. Integer allocations use the largest-remainder method with
    deterministic tie-breaks (fraction desc, stratum asc), clamped to
    the stratum size, with any clamp surplus waterfilled into the
    remaining strata's room — Σ alloc == min(total_n, Σ N_h) exactly. A
    zero-variance stratum draws nothing beyond what the floor gives it
    (one observation determines it; σ_h = 0 ⇒ weight 0). When EVERY
    stratum has zero variance (Σ N_h·σ_h = 0) Neyman is undefined and
    the allocation falls back to proportional (weight = N_h / Σ N_h) —
    the standard reduction (equal σ ⇒ Neyman ≡ proportional), and the
    only fallback that keeps weights summing to 1 so the
    largest-remainder deficit stays ≤ the stratum count and the budget
    identity above still holds.

    Returns one row per stratum: (``stratum_col``, ``n_rows``,
    ``stddev`` rounded 6, ``weight`` rounded 6, ``alloc``).

    Scale shape: one map-side-combined aggregate to per-stratum
    (count, Σx, Σx²) — strata-sized output — then every subsequent step
    (weights, floors, remainder ranks) runs on the strata table. The
    corpus is scanned once; no row-level sampling happens here (feed
    ``alloc`` into stratified_keep / corpus quota sampling for the
    draw)."""
    if total_n < 1:
        raise ValueError(f"total_n must be >= 1, got {total_n}")
    # sums keep the input column's type: feed a DECIMAL value column for
    # cross-engine-exact sums (the driver query does); double inputs get
    # the usual last-ulp partial-sum nondeterminism
    stats = (
        df.groupBy(F.col(stratum_col).alias("_s"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(value_col)).cast("double").alias("_sx"),
            F.sum(F.col(value_col) * F.col(value_col)).cast("double").alias("_sxx"),
        )
        .withColumn(
            "_var",
            F.greatest(
                F.col("_sxx") / F.col("n_rows")
                - (F.col("_sx") / F.col("n_rows")) * (F.col("_sx") / F.col("n_rows")),
                F.lit(0.0),
            ),
        )
        .withColumn("_sd", F.sqrt(F.col("_var")))
    )
    tot = stats.agg(
        F.sum(F.col("n_rows") * F.col("_sd")).alias("_tot"),
        F.sum("n_rows").alias("_totn"),
    )
    weighted = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "_w",
            F.when(F.col("_tot") > 0, F.col("n_rows") * F.col("_sd") / F.col("_tot"))
            .otherwise(F.col("n_rows").cast("double") / F.col("_totn")),
        )
        # 6dp pre-round before floor: keeps the integer boundary immune
        # to last-ulp engine drift (same guard the waterfill oracle uses)
        .withColumn("_exact", F.round(F.col("_w") * F.lit(float(total_n)), 6))
        .withColumn("_floor", F.floor(F.col("_exact")).cast("long"))
        .withColumn("_frac", F.round(F.col("_exact") - F.col("_floor"), 6))
    )
    # largest-remainder top-up: rank strata by fraction desc (stratum asc
    # ties), give +1 to the first (total_n - Σfloor) of them; then clamp
    # to the stratum size. Clamp surplus is re-spread one more rank pass
    # — beyond-pathological cases (surplus after both passes) stay
    # clamped, keeping alloc ≤ n_rows invariant.
    wrank = Window.orderBy(F.desc("_frac"), F.asc("_s"))
    wall = Window.partitionBy()
    first = (
        weighted.withColumn("_rk", F.row_number().over(wrank))
        .withColumn("_deficit", F.lit(total_n) - F.sum("_floor").over(wall))
        .withColumn(
            "_alloc0",
            F.col("_floor")
            + F.when(F.col("_rk") <= F.col("_deficit"), 1).otherwise(0),
        )
        .withColumn("_alloc1", F.least(F.col("_alloc0"), F.col("n_rows")))
    )
    # surplus re-spread is a waterfill over remaining room: walk strata
    # in (fraction desc, stratum asc) order and pour the surplus into
    # each stratum up to its room — extra_h = clamp(surplus − Σ room
    # before h, 0, room_h), so Σ extra = min(surplus, Σ room) and the
    # alloc ≤ n_rows invariant holds exactly
    wbefore = Window.orderBy(F.desc("_frac"), F.asc("_s")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    second = (
        first.withColumn("_surplus", F.sum(F.col("_alloc0") - F.col("_alloc1")).over(wall))
        .withColumn("_room", F.col("n_rows") - F.col("_alloc1"))
        .withColumn(
            "_room_before", F.coalesce(F.sum("_room").over(wbefore), F.lit(0))
        )
        .withColumn(
            "alloc",
            F.col("_alloc1")
            + F.greatest(
                F.least(
                    F.col("_surplus") - F.col("_room_before"), F.col("_room")
                ),
                F.lit(0),
            ),
        )
    )
    return second.select(
        F.col("_s").alias(stratum_col),
        "n_rows",
        F.round("_sd", 6).alias("stddev"),
        F.round("_w", 6).alias("weight"),
        "alloc",
    ).orderBy(stratum_col)
