"""Distributed sketches: KMV (k-minimum-values) distinct-count estimation.

Why not just approx_count_distinct? Spark's HLL++ is a black box: its
estimate depends on an internal hash and register layout no other engine
reproduces, so correctness checks degrade to "is it within x%?". The KMV
sketch (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") built on the engine-portable 60-bit sha hash
(functions/text.py sha_hash60) is bit-for-bit reproducible in DuckDB —
the oracle computes the SAME estimate — while keeping the properties a
100 TB pipeline wants:

- one shuffle keyed on the group column (the distinct-hash dedup), then a
  per-group top-k — no global sort;
- the sketch itself (k smallest hashes) is tiny and MERGEABLE: union two
  groups' sketches, keep the k smallest, re-estimate — the algebra
  partial aggregation needs;
- with fewer than k distinct values the sketch degenerates to an EXACT
  count (every hash is kept), so small groups are free of estimation
  error.

Estimator: (k-1) / u_k where u_k is the k-th smallest hash mapped to
(0, 1]. Expected relative error ≈ 1/sqrt(k-2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from valentinus_spark.functions.text import sha_hash60

_SPACE = float(1 << 60)  # hash space size: sha_hash60 is uniform on [0, 2^60)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` via a KMV
    sketch. Returns (group cols..., n_seen, est_distinct) where
    ``n_seen`` is the number of hashes retained (= min(k, true distinct))
    and ``est_distinct`` the estimate, rounded to 4 decimals.

    Plan: project the portable hash → per-group distinct (ONE shuffle,
    map-side combined) → per-group k smallest via row_number window over
    the already-grouped partitioning (Exchange reused) → 2-column
    aggregate. Nothing corpus-sized leaves the first shuffle.
    """
    groups = group_cols or []
    h = sha_hash60(F.col(value_col).cast("string")).alias("_h")
    hashes = df.select(*groups, h).distinct()
    if groups:
        w = Window.partitionBy(*groups).orderBy("_h")
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("_h")
    ranked = hashes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
    )
    # < k distinct → exact; else (k-1)/u_k with u_k in (0, 1]. A single
    # double division is IEEE-deterministic across engines (unlike
    # accumulation-order-dependent sums), so ROUND(…, 4) is stable.
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
        F.lit(float(k - 1)) / ((F.col("_hk") + F.lit(1)) / F.lit(_SPACE))
    )
    return agg.select(
        *groups,
        "n_seen",
        F.round(est, 4).alias("est_distinct"),
    )


def kmv_merge_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """Merge two RAW KMV hash sets (columns: group cols… , _h) and
    re-estimate — the union-then-keep-k algebra that makes the sketch
    mergeable across shards/days without rescanning either side. Inputs
    are outputs of :func:`kmv_hashes`."""
    groups = [c for c in sketch_a.columns if c != "_h"]
    both = sketch_a.union(sketch_b).distinct()
    w = (
        Window.partitionBy(*groups).orderBy("_h")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("_h")
    )
    ranked = both.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    agg = ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
    )
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
        F.lit(float(k - 1)) / ((F.col("_hk") + F.lit(1)) / F.lit(_SPACE))
    )
    return agg.select(*groups, "n_seen", F.round(est, 4).alias("est_distinct"))


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1 << 12,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch (Cormode & Muthukrishnan 2005) of the
    value column's frequency distribution: ``depth`` hash rows ×
    ``width`` counters. Returns (row, bucket, cnt) — depth·width cells at
    most, independent of corpus size.

    Plan: one projection fanning each input row into ``depth`` (row,
    bucket) cells (an inline explode of a depth-sized literal array —
    cheap), then ONE shuffle keyed on the cell with map-side combine: the
    shuffle carries at most depth·width rows per mapper, a constant.
    Row j's hash = slice j of the portable sha256 hash, so the sketch —
    and every estimate read from it — is bit-for-bit reproducible in the
    DuckDB oracle.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (_sha_slice(value_col, j) % width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.select(F.explode(cells).alias("c"), w.alias("_w"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1 << 12,
) -> DataFrame:
    """Point-frequency estimates from a Count-Min sketch: for each probe
    value, min over the depth rows of its counter — an upper bound on the
    true count (error ≤ e·N/width with prob 1-e^-depth). The sketch side
    is depth·width rows, so the probe join broadcasts it: estimates cost
    one map-side pass regardless of corpus size. ``depth``/``width`` must
    match the build call."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (_sha_slice(value_col, j) % width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probed = probes.select(
        F.col(value_col), F.explode(cells).alias("c")
    ).select(value_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    joined = probed.join(F.broadcast(sketch), ["row", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy(value_col).agg(F.min("cnt").alias("est_count"))


def bloom_build(
    df: DataFrame, value_col: str, k: int = 4, m: int = 1 << 20
) -> DataFrame:
    """Columnar Bloom filter: the DISTINCT set bit positions of a k-hash,
    m-bit filter over the value column — one row per set bit (≤ m rows
    total, independent of corpus size). Hash j = portable sha slice j
    mod m, so unlike Spark's builtin bloom_filter_agg the filter is
    reproducible in DuckDB and portable across engines/restarts.

    Plan: fan each value into k positions (inline array explode), one
    DISTINCT shuffle bounded by m. Persist the result next to a corpus
    digest table: the membership probe then prefilters a batch-vs-corpus
    anti-join to rows whose k positions are all present — at 100 TB the
    probe touches an ≤ m-row broadcast table instead of the corpus."""
    cells = F.array(*[(_sha_slice(value_col, j) % m) for j in range(k)])
    return (
        df.select(F.explode(cells).alias("bit"))
        .distinct()
    )


def bloom_might_contain(
    probes: DataFrame, bloom: DataFrame, value_col: str, k: int = 4, m: int = 1 << 20
) -> DataFrame:
    """Membership probe: adds ``might_contain`` (true ⇔ ALL k bit
    positions are set — no false negatives, false-positive rate
    ≈ (1-e^(-kn/m))^k). The filter side broadcasts; the probe is one
    map-side semi-join + count compare, no corpus access."""
    cells = F.array(*[(_sha_slice(value_col, j) % m) for j in range(k)])
    exploded = probes.select(
        F.col(value_col), F.explode(cells).alias("bit")
    )
    hits = (
        exploded.join(F.broadcast(bloom), "bit", "semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        probes.join(hits, value_col, "left")
        .select(
            value_col,
            (F.coalesce("_hits", F.lit(0)) == k).alias("might_contain"),
        )
    )


def _sha_slice(col: str, j: int) -> Column:
    """Hash row j for the CM sketch: 15-hex slice (j%4) of
    sha256((j//4) || ':' || value) — four independent 60-bit hashes per
    digest (the minhash sha-variant scheme), salted past depth 4; codegen
    CSE shares each digest across its slices."""
    digest = F.sha2(F.concat(F.lit(f"{j // 4}:"), F.col(col).cast("string")), 256)
    return F.conv(F.substring(digest, 1 + 15 * (j % 4), 15), 16, 10).cast("long")


def kmv_hashes(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """The raw per-group sketch: the k smallest distinct portable hashes
    (group cols…, _h). Persist this (it is k rows per group) to make
    distinct counts incrementally maintainable: union tomorrow's sketch,
    :func:`kmv_merge_estimate`, never rescan history."""
    groups = group_cols or []
    h = sha_hash60(F.col(value_col).cast("string")).alias("_h")
    hashes = df.select(*groups, h).distinct()
    w = (
        Window.partitionBy(*groups).orderBy("_h")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("_h")
    )
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(*groups, "_h")
    )


def _hll_alpha(m: int) -> float:
    """Bias-correction constant from Flajolet et al. 2007 (HyperLogLog:
    the analysis of a near-optimal cardinality estimation algorithm)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog registers (Flajolet et al. 2007) over the
    engine-portable 60-bit sha hash: register index = top ``p`` hash
    bits, register value = max leading-zero rank rho of the remaining
    ``60-p`` bits. Returns (group cols…, idx, rho) — at most ``2**p``
    rows per group, the persistable/mergeable sketch state.

    Scale shape: unlike KMV this needs NO distinct pre-pass — rho is a
    pure function of the value, so duplicate inputs collapse in the
    max-aggregate. ONE shuffle keyed on (groups, idx) with map-side
    combine; the shuffle carries at most ``2**p`` rows per mapper per
    group, a constant independent of corpus size.

    Portability: rho is computed from the bit length of the residual
    hash via ``length(bin(x))`` — ``bin`` prints the minimal binary
    string identically in Spark and DuckDB, so the oracle rebuilds the
    registers bit-for-bit.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    groups = group_cols or []
    w = 60 - p
    h = sha_hash60(F.col(value_col).cast("string"))
    idx = F.shiftright(h, w)
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rest))
    )
    return (
        df.select(*groups, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, p: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate from HLL registers: the harmonic-mean raw
    estimator with the standard small-range linear-counting correction
    (raw <= 2.5m with empty registers -> m*ln(m/V)).

    Cross-engine determinism: the harmonic sum Σ 2^-rho is computed in
    EXACT integer arithmetic, scaled by 2^(w+1) — every term
    ``1 << (w+1-rho)`` is an integer and the total is < 2^61, so the
    one double division at the end (IEEE, order-free) is bit-for-bit
    reproducible in the DuckDB oracle; only the ln() in the small-range
    branch leans on libm agreement, absorbed by ROUND(…, 4).
    """
    groups = group_cols or []
    m = 1 << p
    w = 60 - p
    scale = 1 << (w + 1)  # term for an empty register (rho = 0)
    numer = float(_hll_alpha(m) * m * m * scale)
    agg = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("m_seen"),
        F.sum(F.expr(f"shiftleft(1L, {w + 1} - rho)")).alias("_s"),
    )
    s_total = F.col("_s") + (F.lit(m) - F.col("m_seen")) * F.lit(scale).cast("long")
    raw = F.lit(numer) / s_total.cast("double")
    v = F.lit(m) - F.col("m_seen")  # empty-register count
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*groups, "m_seen", F.round(est, 4).alias("est_distinct"))


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Convenience: registers + estimate in one call. Relative error
    ≈ 1.04/sqrt(2^p) (p=12 → ~1.6%). Prefer this over
    ``approx_count_distinct`` when the estimate must be reproducible
    outside Spark (HLL++ register layout is engine-private)."""
    return hll_estimate(hll_registers(df, value_col, group_cols, p), p, group_cols)


def hll_merge_estimate(
    regs_a: DataFrame, regs_b: DataFrame, p: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge two register sets (max per register — the HLL union is
    lossless: merged registers EQUAL the registers of the unioned
    inputs) and re-estimate. Persist per-shard/per-day registers, merge
    on read, never rescan history."""
    groups = group_cols or []
    merged = (
        regs_a.union(regs_b)
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_estimate(merged, p, groups)


def cm_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Equi-join SIZE estimate from two Count-Min sketches (the AMS-style
    inner product, Cormode & Muthukrishnan 2005 §4.2): |A ⋈ B| on the
    sketched key ≈ min over hash rows j of Σ_bucket cntA[j]·cntB[j] — an
    upper bound, within e·N_A·N_B/width of truth with prob 1−e^−depth.

    THE cardinality-estimation primitive a planner wants at 100 TB:
    both sides compress to depth·width cells (constant, shuffle-free to
    combine), so join-size forecasting — pick broadcast vs shuffle,
    pre-size shuffle partitions, veto a runaway join — costs two sketch
    scans instead of running the join. Sketches must share depth/width
    (and this module's portable sha hashing makes the estimate
    reproducible anywhere, including the DuckDB oracle).

    Returns one row: (est_join_size). Inner product per row via one
    broadcast-sized join of the two cell tables; rows with zero bucket
    overlap contribute 0 (left join from the row ids, not dropped)."""
    prod = (
        sketch_a.alias("a")
        .join(sketch_b.alias("b"), ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("_p"))
    )
    rows = sketch_a.select("row").distinct()
    return (
        rows.join(prod, "row", "left")
        .select(F.coalesce("_p", F.lit(0)).alias("_p"))
        .agg(F.min("_p").alias("est_join_size"))
    )


def kmv_overlap(
    hashes_a: DataFrame, hashes_b: DataFrame, k: int = 64
) -> DataFrame:
    """Set-algebra estimates from two UNGROUPED raw KMV sketches
    (:func:`kmv_hashes` outputs, column ``_h``): distinct union,
    distinct intersection and Jaccard — the theta-sketch trick
    (Dasgupta et al. 2016): threshold θ = the k-th smallest hash of the
    COMBINED sketch; below θ every survivor is an unbiased uniform
    sample of the union, so |A∩B| ≈ union_est · (survivors in both) / k
    and J ≈ (survivors in both) / k.

    Audience-overlap analytics at 100 TB without a join of the raw
    sets: both inputs are ≤ k rows, everything here is sketch-sized.
    Degenerates to EXACT when the union has < k distinct hashes (the
    survivor set is then the whole union). Deterministic given the
    portable hash, so a SQL oracle reproduces every number. Returns one
    row: (n_union_seen, est_union, est_intersection, est_jaccard)."""
    a = hashes_a.select(F.col("_h").alias("_h"))
    b = hashes_b.select(F.col("_h").alias("_h"))
    both = a.unionByName(b).distinct()
    w = Window.partitionBy(F.lit(1)).orderBy("_h")
    surv = both.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    marked = (
        surv.join(a.withColumn("_ina", F.lit(1)), "_h", "left")
        .join(b.withColumn("_inb", F.lit(1)), "_h", "left")
    )
    agg = marked.agg(
        F.count(F.lit(1)).alias("n_union_seen"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
        F.sum(
            (F.col("_ina").isNotNull() & F.col("_inb").isNotNull()).cast("long")
        ).alias("_nboth"),
    )
    exact_mode = F.col("n_union_seen") < k
    est_union = F.when(
        exact_mode, F.col("n_union_seen").cast("double")
    ).otherwise(F.lit(float(k - 1)) / ((F.col("_hk") + F.lit(1)) / F.lit(_SPACE)))
    frac_both = F.col("_nboth").cast("double") / F.when(
        exact_mode, F.col("n_union_seen")
    ).otherwise(F.lit(k)).cast("double")
    return agg.select(
        "n_union_seen",
        F.round(est_union, 4).alias("est_union"),
        F.round(est_union * frac_both, 4).alias("est_intersection"),
        F.round(frac_both, 4).alias("est_jaccard"),
    )

def heavy_hitters(
    df: DataFrame,
    value_col: str,
    phi: float = 0.01,
    slack: int = 4,
) -> DataFrame:
    """Exact phi-heavy-hitters via the two-pass Misra-Gries recipe
    (Misra & Gries 1982; the MapReduce adaptation in Berinde et al.):
    pass 1 runs an MG(k) summary PER ARROW BATCH (k = slack/phi
    counters), pass 2 exactly counts only the surviving candidates.

    Soundness by pigeonhole: an item with global frequency > phi·n must
    exceed (batch_n)·phi/slack… more precisely exceed batch_n/k in at
    least one batch (if it stayed ≤ n_b/k in every batch, summing gives
    ≤ n/k = phi·n/slack < phi·n), so the union of per-batch summaries
    contains every true heavy hitter and the exact second pass makes
    the OUTPUT deterministic — candidates vary with partitioning, the
    returned (value, n, freq) rows never do.

    Scale shape: the full-cardinality groupBy a naive count needs never
    happens — pass 1 shuffles at most k rows per batch (map-side
    summaries), pass 2 shuffles only rows matching the candidate set
    (broadcast semi-join). This is the distinct-key-explosion escape
    hatch: frequency of the top talkers over 10^11 mostly-unique keys
    with bounded state everywhere."""
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    k = max(2, int(slack / phi))

    def _mg(batches):
        import pandas as pd

        for pdf in batches:
            counters: dict = {}
            for v in pdf[value_col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in dead:
                        del counters[key]
                    for key in list(counters):
                        counters[key] -= 1
            yield pd.DataFrame({"candidate": list(counters.keys())})

    cand = (
        df.select(value_col)
        .mapInPandas(_mg, f"candidate {dict(df.dtypes)[value_col]}")
        .distinct()
    )
    total = df.where(F.col(value_col).isNotNull()).count()
    exact = (
        df.join(
            F.broadcast(cand), F.col(value_col) == F.col("candidate"), "leftsemi"
        )
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > phi * total)
        .select(
            F.col(value_col).alias("value"),
            "n",
            F.round(F.col("n") / F.lit(float(total)), 6).alias("freq"),
        )
    )
    return exact



def hll_rolling_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
    p: int = 6,
) -> DataFrame:
    """Rolling ``window_days``-day distinct count per day from persisted
    DAILY HLL registers — the N-day-active-users metric computed the way
    a 100 TB pipeline must: the raw corpus is scanned ONCE (one daily
    register aggregate); every day's rolling window is then a register
    MERGE (max per cell — the lossless HLL union of
    :func:`hll_merge_estimate`), never a rescan of N days of history.
    An exact rolling distinct would need per-day user SETS (unbounded
    state, N-fold rescan or giant dedup shuffle); register state is
    days × 2^p rows forever.

    Returns one row per day of the dense [min_day, max_day] spine:
    (``day``, ``m_seen``, ``est_distinct``) — the estimate of distinct
    ``value_col`` over days [day-window_days+1, day] — rounded to 4,
    ordered by day; days whose whole window is empty estimate 0.

    Scale shape: one corpus aggregate, then an explode of the register
    table by window_days (days × 2^p × N rows — sketch-sized) and a
    (day, idx) max-merge. Same exact-integer harmonic sum as
    :func:`hll_estimate`, so the DuckDB oracle replays it cell-exact.
    """
    ev = df.select(F.to_date(ts_col).alias("_d"), value_col)
    regs = hll_registers(ev, value_col, ["_d"], p)
    return hll_rolling_from_registers(regs, window_days, p, day_col="_d")


def hll_rolling_from_registers(
    regs: DataFrame,
    window_days: int = 7,
    p: int = 6,
    day_col: str = "day",
) -> DataFrame:
    """The rolling-merge tail of :func:`hll_rolling_distinct`, exposed
    so a PERSISTED daily register table — including one maintained
    incrementally by ``streaming.pipeline.stream_hll_registers`` with a
    day group — feeds the same window merge without touching raw
    events: the streaming-actives path is batch-register path +
    this, and their equality is the losslessness gate."""
    regs = regs.select(F.col(day_col).alias("_d"), "idx", "rho")
    bounds = regs.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    # day d's registers contribute to windows ending on d .. d+N-1
    contrib = (
        regs.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(
                F.sequence(
                    F.col("_d"),
                    F.least(F.date_add("_d", window_days - 1), F.col("_hi")),
                )
            ).alias("day"),
            "idx",
            "rho",
        )
    )
    merged = contrib.groupBy("day", "idx").agg(F.max("rho").alias("rho"))
    est = hll_estimate(merged, p, ["day"])
    spine = bounds.select(
        F.explode(F.sequence("_lo", "_hi")).alias("day")
    )
    m = 1 << p
    return (
        spine.join(est, "day", "left")
        .select(
            "day",
            F.coalesce("m_seen", F.lit(0)).cast("bigint").alias("m_seen"),
            # empty window: linear counting with V = m gives m·ln(1) = 0
            F.coalesce("est_distinct", F.lit(0.0)).alias("est_distinct"),
        )
        .orderBy("day")
    )


def hll_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Audience overlap from HyperLogLog registers via inclusion-
    exclusion (Flajolet et al. 2007 unions are lossless; the
    intersection estimate is the standard |A|+|B|−|A∪B| — noisier than
    the KMV/theta route in :func:`kmv_overlap`, but computable from
    ALREADY-PERSISTED per-segment HLL registers with no access to the
    raw sets, which is how overlap dashboards actually run: registers
    are maintained per day/segment, raw ids are long gone).

    Returns ONE row: (``est_a``, ``est_b``, ``est_union``,
    ``est_intersection``, ``est_jaccard``) — estimates rounded to 4
    (jaccard to 6), intersection clamped at 0 (inclusion-exclusion can
    go slightly negative for near-disjoint sets).

    Determinism: registers and estimates are the engine-portable
    :func:`hll_registers`/:func:`hll_estimate` arithmetic (exact
    integer harmonic sums), and the inclusion-exclusion runs on the
    already-4-dp-rounded estimates — every number replays in SQL.

    Scale shape: two register builds (ONE shuffle each, ≤ 2^p rows) +
    a register merge; the overlap arithmetic is three single-row
    frames. At 100 TB: persist the registers, run only the merge.
    """
    # each register set feeds its own estimate AND the union merge —
    # localCheckpoint so each corpus scan runs once (≤ 2^p rows each)
    ra = hll_registers(df_a, value_col, p=p).localCheckpoint()
    rb = hll_registers(df_b, value_col, p=p).localCheckpoint()
    ea = hll_estimate(ra, p).select(F.col("est_distinct").alias("est_a"))
    eb = hll_estimate(rb, p).select(F.col("est_distinct").alias("est_b"))
    eu = hll_merge_estimate(ra, rb, p).select(
        F.col("est_distinct").alias("est_union")
    )
    j = ea.crossJoin(eb).crossJoin(eu)
    inter = F.greatest(
        F.lit(0.0), F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4)
    )
    return j.select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.round(
            F.when(F.col("est_union") > 0, inter / F.col("est_union")).otherwise(
                0.0
            ),
            6,
        ).alias("est_jaccard"),
    )


def ams_f2_estimate(
    df: DataFrame,
    key_col: str,
    n_means: int = 8,
    per_mean: int = 8,
) -> DataFrame:
    """AMS second-moment (F₂) sketch (Alon-Matias-Szegedy 1996) — the
    join-size planner's other half: F₂ = Σ_k c_k² is EXACTLY the
    self-join size on ``key_col``, and the per-key-pair generalization
    is what :func:`cm_join_size` upper-bounds with Count-Min. AMS is
    unbiased where CM only overestimates. Each estimator keeps ONE
    counter Z_j = Σ_rows ±1(key); Z_j² is unbiased for F₂; variance
    drops by averaging ``per_mean`` estimators and the median of
    ``n_means`` group means gives exponential concentration
    (median-of-means).

    Returns ONE row: (``n_rows``, ``n_estimators``, ``f2_estimate``,
    ``f2_exact``, ``rel_error``) — the exact F₂ is recomputed from the
    raw keys every run, so the sketch's losslessness claim is
    re-proven, not assumed (the hll_daily_rollup convention).

    Determinism: the ±1 signs come from ONE engine-portable sha256
    digest per row — sign_j is the top bit of hex nibble j of
    sha256('ams:' || key), so 64 estimators cost 64 nibble probes of a
    single digest instead of 16 digests via :func:`_sha_slice` (the
    r7-verdict 16× hashing cut; codegen CSE shares the digest across
    all 64 CASE branches). Counters and Z² sums are exact
    BIGINT/DECIMAL; the median of means follows the repo's
    exact-median convention (average of the two middles on the
    decimal grid).

    Scale shape: ONE pass over the corpus emitting ``n_means ×
    per_mean`` conditional sums (map-side combined into a single
    64-counter row per partition — no shuffle of raw rows); the exact
    F₂ is one hash-agg. At 100 TB the sketch column of a sharded
    corpus is 64 BIGINTs per shard, mergeable by addition.
    """
    total = n_means * per_mean
    base = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("_k")
    )
    # sign_j(key) = top bit of hex nibble j of ONE per-row digest
    # (a hex char >= '8' has its 8-bit set; string compare on the
    # lowercase hex alphabet orders exactly like the nibble value).
    # The digests are projected BELOW the aggregate so each is hashed
    # exactly once per row — the 64 sign probes are substr+compare on
    # the shared column, not 64 aggregate-side sha2 expressions. A
    # sha256 digest carries 64 nibbles; estimator counts beyond 64
    # roll to further salted digests (never hit by the 8x8 default).
    n_digests = (total + 63) // 64
    hashed = base.select(
        *[
            F.sha2(F.concat(F.lit(f"ams{i}:"), F.col("_k")), 256).alias(f"_d{i}")
            for i in range(n_digests)
        ]
    )
    # The counters are aggregated ROW-WISE (explode estimator index →
    # groupBy _j → 64-row Z table → groupBy group id → n_means-row mean
    # table) instead of as one 64-buffer aggregate: the single-row
    # formulation generated a janino compilation unit so large that
    # EVERY fresh run paid ~3 s of codegen compile before touching data
    # (the generated-code cache only helps re-executions of the same
    # DataFrame, and the bench/driver build a fresh plan per run). The
    # exploded rows are map-side combined into ≤ total counters per
    # partition, so the shuffle stays sketch-sized; every decimal op
    # below repeats the former chain exactly (decimal arithmetic is
    # exact and commutative, so row order cannot move a bit).
    darr = F.array(*[F.col(f"_d{i}") for i in range(n_digests)])
    ex = hashed.select(
        darr.alias("_ds"),
        F.explode(F.sequence(F.lit(0), F.lit(total - 1))).alias("_j"),
    )
    # sign_j = top bit of hex nibble (j % 64) of digest (j // 64)
    sign = F.when(
        F.substring(
            F.element_at("_ds", (F.col("_j") / 64).cast("int") + 1),
            (F.col("_j") % 64).cast("int") + 1,
            1,
        )
        >= "8",
        1,
    ).otherwise(-1)
    zs = ex.groupBy("_j").agg(F.sum(sign).alias("_z"))
    means = (
        zs.groupBy((F.col("_j") / per_mean).cast("int").alias("_g"))
        .agg(
            F.sum(
                (
                    F.col("_z").cast("decimal(19,0)")
                    * F.col("_z").cast("decimal(19,0)")
                ).cast("decimal(38,0)")
            ).alias("_zsq")
        )
        .select((F.col("_zsq").cast("decimal(38,6)") / per_mean).alias("_m"))
    )
    # exact median of the n_means group means (tiny, fixed-size table):
    # sort the means as an array and average the two middles
    arr = F.array_sort(F.collect_list("_m"))
    # F.get (null-safe) instead of getItem: an empty input collects an
    # empty array, where ANSI getItem would raise INVALID_ARRAY_INDEX —
    # the degenerate case must yield a NULL estimate like the old
    # fixed-width array-of-NULLs did
    sk = means.agg(arr.alias("_arr")).select(
        (
            (
                F.get(F.col("_arr"), (n_means - 1) // 2)
                + F.get(F.col("_arr"), n_means // 2)
            ).cast("double")
            / 2.0
        ).alias("_est")
    )
    # n_rows = Σ per-key counts — same number as the former count(1),
    # computed on the exact-F2 pass so no extra corpus scan is added
    exact = (
        base.groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.coalesce(F.sum("_c"), F.lit(0).cast("long")).alias("n_rows"),
            F.sum(
                (
                    F.col("_c").cast("decimal(19,0)")
                    * F.col("_c").cast("decimal(19,0)")
                ).cast("decimal(38,0)")
            ).cast("double").alias("_f2"),
        )
    )
    j = exact.crossJoin(F.broadcast(sk))
    return j.select(
        "n_rows",
        F.lit(total).alias("n_estimators"),
        F.round("_est", 4).alias("f2_estimate"),
        F.round("_f2", 4).alias("f2_exact"),
        F.round(
            F.when(
                F.col("_f2") > 0,
                F.abs(F.col("_est") - F.col("_f2")) / F.col("_f2"),
            ),
            6,
        ).alias("rel_error"),
    )


def bloom_semijoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    k: int = 4,
    m: int = 1 << 16,
) -> DataFrame:
    """Bloom-prefiltered semi-join — the runtime-filter pattern made
    explicit: build the portable Bloom filter over the (small,
    selective) dim side, prefilter the fact scan to bloom-positive
    keys, THEN run the exact semi-join on the survivors only. No false
    negatives (Bloom guarantees), no false positives in the OUTPUT
    (the exact join removes them) — the result is row-identical to a
    plain semi-join, which is exactly what the driver oracle asserts
    with a plain JOIN.

    Returns the fact rows whose ``fact_key`` is truly in dim.

    Why not Spark's own runtime row-level filters: those fire only
    when the optimizer's selectivity estimate crosses its threshold
    and are not portable; this operator makes the decision explicit
    and the filter reproducible (sha positions — replayable in any
    engine, persistable next to the data for reuse across queries).

    Scale shape: the bloom is ≤ m rows REGARDLESS of dim size and
    broadcasts; the prefilter is a map-side semi-join on the exploded
    bit positions of the DISTINCT fact keys (bounded by |fact key
    domain|, not |fact|); only bloom-positive keys reach the exact
    dim join, so at a 0.1 % selective dim the fact shuffle carries
    ~0.1 % (+FP rate) of the rows a plain shuffle join would move.
    """
    bloom = bloom_build(dim.select(F.col(dim_key)), dim_key, k=k, m=m)
    keys = fact.select(F.col(fact_key)).distinct()
    flagged = bloom_might_contain(keys, bloom, fact_key, k=k, m=m)
    positive = flagged.filter(F.col("might_contain")).select(fact_key)
    candidates = fact.join(F.broadcast(positive), fact_key, "semi")
    true_keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return candidates.join(F.broadcast(true_keys), fact_key, "semi")
