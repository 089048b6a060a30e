"""Table statistics and deterministic sampling-based estimators.

The ANALYZE-TABLE half of an engine: column profiles for planning and
data-quality review, and quantile estimation from a deterministic
hash-rank sample (the replayable alternative to reservoir sampling and
to engines' private t-digest/GK sketches — the estimate is bit-for-bit
reproducible anywhere the hash is, including the DuckDB oracle).

No reference equivalent (/root/reference is a vector store with no
statistics surface); extension per the training-pipeline mandate.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format numeric column profile: one row per column with
    ``(column, n, n_null, n_distinct, min_v, max_v)``, values coerced to
    double (``try_cast`` — non-numeric strings profile as null under
    ANSI mode instead of throwing).

    ONE scan: per-column aggregates computed in a single agg (Spark
    plans multi-distinct aggregates with one Expand — acceptable for
    profile-sized column lists; at very wide tables run in column
    batches), then unpivoted driver-free via an inline stack. n_distinct
    counts non-null distinct values (exact — swap in hll_distinct per
    column when 2% error is acceptable at corpus scale)."""
    aggs = []
    for c in cols:
        v = F.col(c).try_cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(v.isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.count_distinct(v).alias(f"{c}__nd"),
            F.min(v).alias(f"{c}__min"),
            F.max(v).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"{c}__n").alias("n"),
                    F.col(f"{c}__nn").alias("n_null"),
                    F.col(f"{c}__nd").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_v"),
                    F.col(f"{c}__max").alias("max_v"),
                )
                for c in cols
            ]
        )
    )
    return wide.select(stack.alias("p")).select("p.*")


def hash_sample_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    qs: list[float],
    k: int = 1024,
    group_cols: list[str] | None = None,
    salt: str = "hsq-v1",
) -> DataFrame:
    """Approximate quantiles of ``value_col`` from a DETERMINISTIC
    uniform row sample: the ``k`` rows with the smallest
    sha256(salt || id) per group (the id hash is independent of the
    value, so the sample is uniform over rows — unlike KMV's
    distinct-value sample). Quantile rule over the sorted sample of
    size n: element at index floor(q * (n-1)) — a plain order statistic,
    no interpolation, so the result is an actual data value and the
    DuckDB oracle reproduces it exactly.

    Sampling error ~ O(1/sqrt(k)) in rank space. Versus
    percentile_approx: reproducible across engines/runs/partitionings
    (auditable pipelines can replay the exact sample), mergeable by
    re-ranking the unioned samples on the same hash.

    Plan: one group-keyed shuffle for the sample window, then a
    group-sized sort of k rows per group — nothing corpus-sized moves.
    Returns (group cols…, q, quantile_value)."""
    groups = group_cols or []
    bucket = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(salt), F.col(id_col).cast("string")), 256), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = (
        Window.partitionBy(*groups).orderBy(bucket, F.col(id_col))
        if groups
        else Window.partitionBy(F.lit(1)).orderBy(bucket, F.col(id_col))
    )
    sample = (
        df.select(*groups, F.col(id_col), F.col(value_col))
        .withColumn("_hrn", F.row_number().over(w))
        .filter(F.col("_hrn") <= k)
    )
    vw = (
        Window.partitionBy(*groups).orderBy(F.col(value_col), F.col(id_col))
        if groups
        else Window.partitionBy(F.lit(1)).orderBy(F.col(value_col), F.col(id_col))
    )
    ranked = sample.select(
        *groups,
        F.col(value_col),
        (F.row_number().over(vw) - 1).alias("_i"),
        F.count(F.lit(1)).over(Window.partitionBy(*groups) if groups else Window.partitionBy(F.lit(1))).alias("_n"),
    )
    # one pass for every requested quantile: explode the q list against
    # the ranked sample and keep rows sitting at their target index —
    # the sample window is computed once, not once per q
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        ranked.select(
            *groups, F.col(value_col), "_i", "_n", F.explode(qarr).alias("q")
        )
        .filter(F.col("_i") == F.floor(F.col("q") * (F.col("_n") - 1)).cast("int"))
        .select(*groups, "q", F.col(value_col).alias("quantile_value"))
    )


def equi_width_histogram(
    df: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Exact equi-width histogram of a numeric column: ``n_bins`` rows of
    (bin, lo, hi, n_rows), bins spanning [min, max] with the max value
    folded into the last bin (the ANALYZE-statistics / optimizer-
    selectivity shape).

    Two scans by necessity (bounds, then binning) but both are
    map-side-combinable aggregates; the bounds row is a broadcast-sized
    crossJoin, so the second pass stays a single shuffle of n_bins
    groups. Bin assignment is pure double arithmetic evaluated in one
    fixed association order — ``(v - min) * n_bins / (max - min)`` —
    which is what lets a SQL oracle reproduce bin edges bit-for-bit
    (IEEE doubles are deterministic; the FORMULA, not the engine, is
    the contract). Degenerate min==max collapses to one bin."""
    bounds = df.agg(
        F.min(col).cast("double").alias("_mn"),
        F.max(col).cast("double").alias("_mx"),
    )
    binned = (
        df.select(F.col(col).cast("double").alias("_v"))
        .where(F.col("_v").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(n_bins - 1),
                    F.floor(
                        (F.col("_v") - F.col("_mn"))
                        * F.lit(float(n_bins))
                        / (F.col("_mx") - F.col("_mn"))
                    ),
                )
            )
            .cast("long")
            .alias("bin"),
            F.col("_mn"),
            F.col("_mx"),
        )
    )
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(n_bins))
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.first("_mn").alias("_mn"),
            F.first("_mx").alias("_mx"),
        )
        .select(
            "bin",
            F.round(F.col("_mn") + F.col("bin") * width, 6).alias("lo"),
            F.round(F.col("_mn") + (F.col("bin") + 1) * width, 6).alias("hi"),
            "n_rows",
        )
        .orderBy("bin")
    )


def histogram_quantiles(
    df: DataFrame, col: str, qs: list[float], n_bins: int = 256
) -> DataFrame:
    """Approximate quantiles from the exact equi-width histogram:
    linear interpolation inside the bin holding each target rank. The
    MERGEABLE approximate-quantile path the sketch family was missing —
    equi-width histograms over fixed [min, max] bounds add cell-wise
    (partitions, micro-batches, shards), unlike GK/t-digest summaries
    whose merges are heuristic — with deterministic error bounded by one
    bin width (range/n_bins), and every step plain double arithmetic a
    SQL oracle replays bit-for-bit.

    Rank convention: target rank q·(n-1) (the same zero-based convention
    as exact_quantiles); the answer interpolates within the bin as if
    its mass were uniform. Two scans (bounds, then binning) and
    n_bins-sized state — at 100 TB the histogram is the only shuffled
    object. Returns (q, quantile_est) rounded to 6 decimals."""
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    hist = equi_width_histogram(df, col, n_bins=n_bins)
    # cumulative mass per bin boundary — n_bins rows, one tiny window
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bin",
        "lo",
        "hi",
        "n_rows",
        F.coalesce(F.sum("n_rows").over(w), F.lit(0)).alias("below"),
        F.sum("n_rows").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    probes = F.array(*[F.lit(float(q)) for q in qs])
    out = (
        cum.select(
            "*", F.explode(probes).alias("q")
        )
        .withColumn("target", F.col("q") * (F.col("total") - 1))
        .where(
            (F.col("target") >= F.col("below"))
            & (F.col("target") < F.col("below") + F.col("n_rows"))
            | (
                # q == 1 boundary: the final bin owns target == total-1
                (F.col("q") == 1.0)
                & (F.col("below") + F.col("n_rows") == F.col("total"))
            )
        )
        .withColumn(
            "frac",
            (F.col("target") - F.col("below")) / F.col("n_rows"),
        )
        .select(
            "q",
            F.round(
                F.col("lo") + (F.col("hi") - F.col("lo")) * F.col("frac"), 6
            ).alias("quantile_est"),
        )
    )
    # a target can satisfy two bins at the exact boundary; keep the first
    wq = Window.partitionBy("q").orderBy("quantile_est")
    return (
        out.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("q")
    )


def exact_quantiles(
    df: DataFrame, value_col: str, qs: list[float], n_ranges: int = 64
) -> DataFrame:
    """EXACT global quantiles via two-phase distributed ranking — the
    order-statistics shape that works when `percentile()` (which buffers
    every value in one aggregation state) and a single-partition global
    window cannot:

    1. range-repartition the (pruned, single-column) values into
       ``n_ranges`` sorted, non-overlapping partitions — the ONLY
       exchange that carries data;
    2. intra-partition index for free from
       ``monotonically_increasing_id`` evaluated ABOVE the partition
       sort (its contract: partition_id·2^33 + row-index-within-
       partition, both recoverable by bit ops — no window, no second
       shuffle);
    3. per-partition counts → prefix offsets, a ``n_ranges``-row table
       broadcast back (sketch-sized, not data-sized); global rank =
       offset + local index;
    4. keep only rows whose rank equals a target ``ceil(q*n)`` (the
       lower-rank / "disc" convention: smallest value with cumulative
       count ≥ q·n).

    Ties are harmless: equal values occupy adjacent ranks, so the value
    AT a rank is deterministic regardless of their internal order.
    Returns ``(q, value)``.
    """
    vals = (
        df.select(F.col(value_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .repartitionByRange(n_ranges, F.col("_v"))
        .sortWithinPartitions("_v")
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn(
            "_rn", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1)
        )
    )
    # partition counts are tiny; broadcast their running offsets back
    offsets = (
        vals.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy()))
    )
    ranked = vals.join(
        F.broadcast(offsets.select("_pid", "_offset", "_n")), "_pid"
    ).withColumn("_rank", F.col("_offset") + F.col("_rn"))
    targets = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"),
                F.greatest(
                    F.lit(1).cast("long"), F.ceil(F.lit(float(q)) * F.col("_n"))
                ).alias("r"),
            )
            for q in qs
        ]
    )
    return (
        ranked.select("_v", "_rank", F.explode(targets).alias("_t"))
        .where(F.col("_rank") == F.col("_t.r"))
        .select(F.col("_t.q").alias("q"), F.col("_v").alias("value"))
    )


def zipf_profile(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Power-law fit of the corpus word distribution: least-squares
    slope/intercept of ln(freq) over ln(rank) for the top-``k`` words —
    the one-row corpus health check (natural text: slope ≈ −1; templated
    or deduplicated-to-death corpora drift shallower or cliff at the
    template vocabulary).

    Scale shape: the word count is the single corpus-sized shuffle
    (map-side combined, |vocab| rows); the top-k is a
    TakeOrderedAndProject; the regression runs over k rows with the
    closed-form sums — no iteration, no driver math. Deterministic
    tiebreak (freq desc, word asc) so rank — and therefore the fit — is
    reproducible cross-engine. Returns (n_top, slope, intercept).
    """
    from valentinus_spark.operators.tokenizer import word_frequencies

    top = (
        word_frequencies(df, text_col=text_col)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(k)
    )
    pts = top.select(
        F.log(
            F.row_number()
            .over(Window.orderBy(F.col("freq").desc(), F.col("word").asc()))
            .cast("double")
        ).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    # a 0/1-word vocabulary has zero x-variance: no fit (NULL), not an
    # ANSI divide-by-zero (found by the property layer)
    slope = F.when(
        denom != 0, (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    )
    intercept = F.when(
        slope.isNotNull(), (F.col("sy") - slope * F.col("sx")) / n
    )
    return agg.select(
        F.col("n").alias("n_top"),
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    )


def quantile_discretize(
    df: DataFrame, value_col: str, n_bins: int = 10, out_col: str = "bin"
) -> DataFrame:
    """Equal-frequency feature binning (the ML QuantileDiscretizer shape,
    built on EXACT cut points instead of approxQuantile's engine-private
    sketch): cut points are :func:`exact_quantiles` at i/n_bins for
    i = 1..n_bins-1; a row's bin = number of cut points strictly below
    its value (ties fall to the LOWER bin, so the rule — and therefore
    every bin id — is deterministic and engine-reproducible).

    The n_bins-1 cuts collapse to a sorted array broadcast onto one
    map-side pass over the data: beyond the quantile computation's own
    single range exchange, binning adds NO shuffle. Heavy ties simply
    produce empty bins (equal cut points) rather than nondeterministic
    splits."""
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = (
        exact_quantiles(df, value_col, qs)
        .agg(F.sort_array(F.collect_list("value")).alias("_cuts"))
    )
    v = F.col(value_col).cast("double")
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(
            out_col, F.size(F.filter("_cuts", lambda c: v > c)).cast("long")
        )
        .drop("_cuts")
    )


def robust_zscore(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    threshold: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Per-row robust z-scores via median/MAD — the outlier detector that
    survives the outliers it is hunting (mean/stddev get dragged by the
    exact heavy tail a crawl exhibits; Iglewicz & Hoaglin 1993's modified
    z-score = 0.6745·(x−median)/MAD does not).

    Adds ``robust_z`` (0.0 when the group's MAD is 0 — a constant group
    has no outliers by this test) and ``is_outlier`` (|z| > threshold).

    Complements :func:`valentinus_spark.operators.quality.
    relative_outlier_filter`: that trims fixed percentile BANDS, this
    SCORES each row so downstream curation can rank, audit, or
    soft-weight instead of hard-dropping.

    Scale shape: two percentile aggregates to group granularity (groups
    are languages/sources — tiny output), then the per-group stats
    broadcast back. No window over the raw rows, so a hot group costs a
    scan, not a single-partition sort. Exact ``percentile`` keeps the
    score engine-portable (Spark and standard SQL ``quantile_cont``
    interpolate identically) but buffers each group's values in the
    aggregation state — fine to ~10⁸ rows/group; at 100 TB pass
    ``approx=True`` for ``percentile_approx`` (bounded GK-sketch state,
    map-side combinable) and accept ±ε on the cut, or feed
    :func:`histogram_quantiles` thresholds instead."""
    keys = [group_col] if group_col else []

    def med_of(col):
        if approx:
            return F.percentile_approx(col, F.lit(0.5), F.lit(10000))
        return F.percentile(col, F.lit(0.5))

    med = df.groupBy(*keys).agg(med_of(F.col(value_col)).alias("_med"))
    joined = df.join(F.broadcast(med), on=keys) if keys else df.crossJoin(
        F.broadcast(med)
    )
    mad = joined.groupBy(*keys).agg(
        med_of(F.abs(F.col(value_col) - F.col("_med"))).alias("_mad")
    )
    scored = joined.join(F.broadcast(mad), on=keys) if keys else joined.crossJoin(
        F.broadcast(mad)
    )
    z = F.when(
        F.col("_mad") > 0,
        F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad"),
    ).otherwise(F.lit(0.0))
    return (
        scored.withColumn("robust_z", z)
        .withColumn("is_outlier", F.abs(F.col("robust_z")) > F.lit(threshold))
        .drop("_med", "_mad")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
    approx: bool = False,
) -> DataFrame:
    """Clip ``value_col`` to its group's [lo, hi] percentile band — the
    soft companion to :func:`valentinus_spark.operators.quality.
    relative_outlier_filter` (that DROPS band-outliers; this CAPS them,
    preserving row count for aggregates that must stay unbiased in
    coverage, e.g. per-source token budgets where dropping the tail
    would undercount a source).

    Adds ``out_col`` (default ``{value_col}_wins``). Same scale shape as
    :func:`robust_zscore`: percentile aggregates to group granularity,
    broadcast join-back, row-local clamp — no window over raw rows;
    ``approx=True`` swaps in percentile_approx for unbounded groups."""
    if not (0.0 <= lo < hi <= 1.0):
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    out = out_col or f"{value_col}_wins"
    keys = [group_col] if group_col else []

    def pct(q):
        if approx:
            return F.percentile_approx(F.col(value_col), F.lit(q), F.lit(10000))
        return F.percentile(F.col(value_col), F.lit(q))

    bounds = df.groupBy(*keys).agg(
        pct(lo).alias("_plo"), pct(hi).alias("_phi")
    )
    joined = df.join(F.broadcast(bounds), on=keys) if keys else df.crossJoin(
        F.broadcast(bounds)
    )
    return joined.withColumn(
        out,
        F.least(F.greatest(F.col(value_col), F.col("_plo")), F.col("_phi")),
    ).drop("_plo", "_phi")


def embedding_drift(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Distribution-shift summary between two embedding corpora (model
    upgrade, new crawl snapshot, domain mix change): per-dimension means
    and variances of both sides, their mean-vector cosine, the L2 gap
    between mean vectors, and the mean per-dimension variance ratio —
    the cheap first-order drift panel run before trusting an index or a
    semantic-dedup threshold across snapshots (full MMD needs kernels;
    in practice mean/variance drift catches model swaps and domain
    shifts, cf. Rabanser et al. 2019, "Failing Loudly").

    Returns ONE row: (n_a, n_b, mean_cosine, mean_l2_gap,
    var_ratio_mean). Moments accumulate as element-wise array
    aggregates — two single-scan, map-side-combinable passes (one per
    corpus) producing dim-sized rows; all comparison arithmetic runs on
    those two tiny rows. Nothing about this operator depends on n."""
    # element-wise sums via explode+posexplode keeps everything
    # combinable without driver-side arrays
    def dim_moments(df: DataFrame, tag: str):
        v = F.col(vec_col).cast("array<double>")
        return (
            df.select(F.posexplode(v).alias("i", "x"))
            .groupBy("i")
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum("x").alias(f"s_{tag}"),
                F.sum(F.col("x") * F.col("x")).alias(f"q_{tag}"),
            )
        )

    a = dim_moments(corpus_a, "a")
    b = dim_moments(corpus_b, "b")
    j = a.join(b, "i")
    per_dim = j.select(
        "i",
        (F.col("s_a") / F.col("n_a")).alias("ma"),
        (F.col("s_b") / F.col("n_b")).alias("mb"),
        (F.col("q_a") / F.col("n_a") - (F.col("s_a") / F.col("n_a")) ** 2).alias("va"),
        (F.col("q_b") / F.col("n_b") - (F.col("s_b") / F.col("n_b")) ** 2).alias("vb"),
        "n_a",
        "n_b",
    )
    return per_dim.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        (
            F.sum(F.col("ma") * F.col("mb"))
            / (
                F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
            )
        ).alias("mean_cosine"),
        F.sqrt(F.sum((F.col("ma") - F.col("mb")) ** 2)).alias("mean_l2_gap"),
        F.avg(
            F.when(F.col("va") > 0, F.col("vb") / F.col("va"))
        ).alias("var_ratio_mean"),
    )


# cumulative Poisson(1) CDF for k = 0..7, computed ONCE here so the Spark
# literals and the DuckDB oracle replay share bit-identical thresholds
# (the oracle builder interpolates repr() of these into its SQL)
POISSON1_CDF: tuple[float, ...] = tuple(
    sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1))
    for k in range(8)
)


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str | None = None,
    replicas: int = 32,
    alpha: float = 0.05,
    salt: str = "boot-v1",
) -> DataFrame:
    """Bootstrap confidence interval for the per-group MEAN via the
    Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
    massive data streams") — THE bootstrap that distributes: instead of
    resampling n rows with replacement (which needs global coordination),
    every row independently receives a Poisson(1) replication weight per
    replica, which converges to multinomial resampling for large n and
    needs only one streaming pass.

    Weights are deterministic — u = sha256(salt‖replica‖id)-derived
    uniform, inverted through the Poisson(1) CDF (capped at 8, truncating the top
    ~1e-5 quantile) — so the "random" resample is exactly replayable
    cross-engine and across runs. Values accumulate in DECIMAL; each
    replica mean is rounded to 6, the interval endpoints to 4.

    Output per group: ``n_replicas``, ``boot_mean`` (decimal-averaged
    replica means), ``ci_lo`` / ``ci_hi`` (exact percentile at α/2 and
    1−α/2 across replica means — replicas are few, so the percentile
    state is tiny).

    Scale shape: one explode (×replicas fan-out in the map stage, no
    extra scan), ONE shuffle to (group × replica) partial sums — hot
    groups spread across replica sub-keys — then a groups-sized final
    aggregate. No driver collect, no global sort."""
    if replicas < 2:
        raise ValueError(f"replicas must be >= 2, got {replicas}")
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    from valentinus_spark.functions.util import ensure_parallelism

    keys = [group_col] if group_col else []
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("_rep")
    # repartition BEFORE the replica explode: a single-file input would
    # otherwise run the full rows x replicas hash/weight computation in
    # ONE task (measured 7.8s -> ~1s at sf0.1; same cliff as shingling)
    base = ensure_parallelism(df).select(*keys, F.col(id_col).alias("_id"),
                     F.col(value_col).try_cast("decimal(18,6)").alias("_v"), rep)
    h32 = F.conv(
        F.substring(
            F.sha2(
                F.concat(
                    F.lit(salt),
                    F.col("_rep").cast("string"),
                    F.lit(":"),
                    F.col("_id").cast("string"),
                ),
                256,
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h32 + F.lit(0.5)) / F.lit(4294967296.0)
    w = reduce(
        lambda a, c: a + F.when(u > F.lit(c), 1).otherwise(0),
        POISSON1_CDF,
        F.lit(0),
    )
    partials = (
        base.withColumn("_w", w)
        .groupBy(*keys, "_rep")
        .agg(
            F.sum(F.col("_w") * F.col("_v")).alias("_swv"),
            F.sum("_w").alias("_sw"),
        )
        .filter(F.col("_sw") > 0)
        .withColumn(
            "_mean",
            F.round(F.col("_swv").cast("double") / F.col("_sw"), 6),
        )
    )
    return partials.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_replicas"),
        F.round(
            F.sum(F.col("_mean").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("boot_mean"),
        F.round(F.percentile(F.col("_mean"), F.lit(alpha / 2.0)), 4).alias("ci_lo"),
        F.round(F.percentile(F.col("_mean"), F.lit(1.0 - alpha / 2.0)), 4).alias(
            "ci_hi"
        ),
    )


def psi_drift(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    distribution of one numeric column — the standard "did my feature
    drift" monitor (rule of thumb: <0.1 stable, 0.1–0.25 shifting, >0.25
    action): ``PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref)`` over the
    reference's equal-frequency bins. Complements
    :func:`embedding_drift` (vector panels) with the scalar-feature path.

    Bins are the reference's exact quantile cuts (interpolation is
    engine-portable); proportions are add-1-smoothed so empty bins stay
    finite. Returns one row per bin: (``bin``, ``n_ref``, ``n_cur``,
    ``p_ref``, ``p_cur``, ``psi_term`` rounded to 6) — sum psi_term for
    the index, inspect rows for WHERE the shift lives.

    Scale shape: one percentile aggregate on the reference (exact
    percentile buffers values — swap to approx at 10⁹+ rows, same cuts
    contract), then each side is a single scan binned by broadcast cut
    literals into an n_bins-sized aggregate. Nothing corpus-sized
    shuffles."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts_row = reference.agg(
        F.percentile(F.col(value_col).cast("double"), F.array(*[F.lit(q) for q in qs])).alias("c")
    ).first()
    if cuts_row["c"] is None:
        raise ValueError(
            "psi_drift: reference has no non-null values — no quantile "
            "cuts can be derived"
        )
    cuts = [float(x) for x in cuts_row["c"]]

    def _binned(side: DataFrame, name: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = reduce(
            lambda acc, c: acc + F.when(v > F.lit(c), 1).otherwise(0),
            cuts,
            F.lit(0),
        )
        return (
            side.where(v.isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )
    ref = _binned(reference, "n_ref")
    cur = _binned(current, "n_cur")
    # n_bins-sized frames: the full-outer + window-total arithmetic is
    # post-aggregate, never corpus-sized
    joined = (
        ref.join(cur, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    everything = Window.partitionBy()
    bl = float(n_bins)
    p_ref = (F.col("n_ref") + 1.0) / (F.sum("n_ref").over(everything) + bl)
    p_cur = (F.col("n_cur") + 1.0) / (F.sum("n_cur").over(everything) + bl)
    return joined.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    ).orderBy("bin")


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between two categorical label columns —
    chance-corrected inter-annotator agreement, the standard QA gate for
    labeling pipelines (and for scoring a weak heuristic against gold
    labels before trusting it to filter a corpus):

        κ = (p_o − p_e) / (1 − p_e)

    with p_o the observed agreement rate and p_e = Σ_c p_a(c)·p_b(c) the
    agreement expected from each rater's marginal distribution alone.
    Rule of thumb: <0.2 slight, 0.2–0.4 fair, 0.4–0.6 moderate, 0.6–0.8
    substantial, >0.8 near-perfect. Rows where either label is NULL are
    excluded (both-missing carries no agreement information).

    Returns ONE row: (``n``, ``po``, ``pe``, ``kappa``), ratios rounded
    to 6. κ is NULL when p_e = 1 (a single shared category — agreement
    is vacuous and the statistic is undefined).

    Scale shape: one pass to the per-(a,b) confusion counts (shuffle key
    space = |categories|², tiny), then marginals and the scalar fold are
    category-sized aggregates. No driver collect."""
    pairs = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(F.col(rater_a).alias("_a"), F.col(rater_b).alias("_b"))
    conf = pairs.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_n"))
    # marginals from the confusion table (no second corpus pass)
    ma = conf.groupBy("_a").agg(F.sum("_n").alias("_na"))
    mb = conf.groupBy("_b").agg(F.sum("_n").alias("_nb"))
    tot = conf.agg(
        F.sum("_n").alias("_tot"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(0)).alias(
            "_agree"
        ),
    )
    pe = (
        ma.join(mb, ma["_a"] == mb["_b"])
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("_na") / F.col("_tot")) * (F.col("_nb") / F.col("_tot"))
            ).alias("_pe")
        )
    )
    # raters sharing NO category: the marginal join is empty and the
    # sum NULL, but the formula says p_e = 0 (agreement by chance is
    # impossible) and kappa = p_o — coalesce under a rows-present gate
    # (hypothesis-found; empty input keeps the all-NULL row)
    pe0 = F.when(
        F.col("_tot").isNotNull(), F.coalesce(F.col("_pe"), F.lit(0.0))
    )
    return (
        tot.crossJoin(F.broadcast(pe))
        .select(
            F.col("_tot").alias("n"),
            F.round(F.col("_agree") / F.col("_tot"), 6).alias("po"),
            F.round(pe0, 6).alias("pe"),
            F.round(
                F.when(
                    pe0 < 1.0,
                    (F.col("_agree") / F.col("_tot") - pe0) / (1.0 - pe0),
                ),
                6,
            ).alias("kappa"),
        )
    )


def agreement_matrix(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Confusion matrix between two label columns: (``label_a``,
    ``label_b``, ``n``, ``frac``) rows, frac of the non-null total,
    ordered by count desc then labels — the drill-down companion to
    :func:`cohens_kappa` (WHERE do the raters disagree). One
    confusion-table aggregate plus a broadcast total."""
    pairs = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(F.col(rater_a).alias("label_a"), F.col(rater_b).alias("label_b"))
    conf = pairs.groupBy("label_a", "label_b").agg(F.count(F.lit(1)).alias("n"))
    tot = conf.agg(F.sum("n").alias("_tot"))
    return (
        conf.crossJoin(F.broadcast(tot))
        .select(
            "label_a",
            "label_b",
            "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("frac"),
        )
        .orderBy(F.desc("n"), "label_a", "label_b")
    )


def rank_normalize(
    df: DataFrame,
    group_col: str,
    score_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Per-group percent-rank normalization of a score column:

        pct = (rank − 1) / (n_group − 1)    ∈ [0, 1]

    — the cross-source calibration step before applying ONE global
    threshold to scores whose raw scales differ per source (a quality
    classifier trained per domain, length distributions per crawl): a
    0.9 means "top decile WITHIN its group" everywhere. Ties share the
    minimum rank (SQL PERCENT_RANK semantics, identical across
    engines); single-row groups get 0.0. Appends ``out_col`` (rounded
    to 6) to the input columns.

    Scale shape: one window pass partitioned by the group key — the
    per-group sort is the inherent cost of ranking; skewed groups pay
    an in-partition sort, nothing shuffles twice. The arithmetic is
    integer rank over integer count: exact, no float-ordering drift.
    """
    w = Window.partitionBy(group_col).orderBy(score_col)
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 6))


def benford_profile(
    df: DataFrame,
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Benford's-law first-digit profile of a positive numeric column —
    the classic synthetic-data / fabrication detector: organically
    grown magnitudes follow P(d) = log10(1 + 1/d); uniform generators,
    truncation bugs, and hand-typed numbers don't. Returns one row per
    leading digit 1-9 — ALWAYS all nine, via a constant digit spine, so
    a digit with zero occurrences still contributes its full chi² term
    N·p_d (dropping it understated the statistic exactly on the
    degenerate/fabricated inputs this detector targets): (``digit``,
    ``n``, ``observed_frac``, ``expected_frac``, ``chi2_term``),
    fractions rounded to 6, ordered by digit — Σ chi2_term is the test
    statistic (8 dof). The frac/chi2 columns are NULL when the input
    has no positive values (no distribution to test).

    Digit extraction is STRING-based on the value scaled to integer
    units (``decimals`` fixed-point digits, round-then-cast) — exact
    and engine-portable, where float log10 at power-of-ten boundaries
    is famously not (log10(1000) = 2.9999… in some libms).

    Scale shape: one map + a 9-key aggregate; the total arrives as a
    broadcast single-row frame. Trivially parallel.
    """
    scale = 10 ** decimals
    v = F.col(value_col)
    # finite positives only: NaN/+Inf sort ABOVE 0 in Spark's total
    # order, so a bare v > 0 lets them through into the ANSI bigint
    # cast (CAST_OVERFLOW); same for finite magnitudes past ~9.2e18
    finite_pos = (v > 0) & ~F.isnan(v) & (v < F.lit(float("inf")))
    units = F.round(v * scale, 0).try_cast("bigint")
    digit_units = F.substring(units.cast("string"), 1, 1).cast("int")
    # scaled magnitude past bigint range: the double's string form is
    # scientific ("3.7E19"), whose first char is still the lead digit
    digit_sci = F.substring(v.cast("string"), 1, 1).try_cast("int")
    digit = F.coalesce(digit_units, digit_sci)
    digits = df.filter(finite_pos).select(digit.alias("digit"))
    observed = digits.filter(F.col("digit").between(1, 9)).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    # Constant 1-9 spine left-joined to the observed counts: unseen
    # digits keep n = 0 so every chi2 term is present (9-row join of
    # 9-row frames — free).
    spine = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    counts = spine.join(observed, "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("_tot"))
    obs = F.when(F.col("_tot") > 0, F.col("n").cast("double") / F.col("_tot"))
    exp_ = F.when(F.col("_tot") > 0, F.log10(1.0 + 1.0 / F.col("digit")))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed_frac"),
            F.round(exp_, 6).alias("expected_frac"),
            F.round(
                F.col("_tot") * (obs - exp_) * (obs - exp_) / exp_, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def gini_coefficient(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative value column — the
    inequality fingerprint: G = 0 everyone equal, G → 1 one row holds
    everything. In curation: Gini of per-source doc lengths or token
    counts flags sources where a few giant documents dominate the
    byte budget (sampling and packing both care).

        G = (2 Σ_i i·x_(i) − (n+1) Σx) / (n Σx)    (x sorted ascending)

    Ties take arbitrary order — Σ i·x is tie-invariant since tied x are
    equal. Returns (``group_col``, ``n``, ``total``, ``gini``) rounded
    to 6; NULL when the group total is 0.

    Scale shape: one group-keyed window (row_number over the in-group
    sort — the inherent cost of an order statistic) and a group-sized
    fold; Σ i·x accumulates as exact BIGINT for integer inputs.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(value_col))
    ranked = df.filter(F.col(value_col) >= 0).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_x"),
        F.row_number().over(w).alias("_i"),
    )
    agg = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("total"),
        F.sum(F.col("_i") * F.col("_x")).alias("_ix"),
    )
    nn = F.col("n").cast("double")
    g = (
        2.0 * F.col("_ix").cast("double")
        - (nn + 1.0) * F.col("total").cast("double")
    ) / (nn * F.col("total").cast("double"))
    return agg.select(
        F.col("_g").alias(group_col),
        "n",
        "total",
        F.round(F.when(F.col("total") > 0, g), 6).alias("gini"),
    ).orderBy(group_col)


def tail_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tail_frac: float = 0.05,
    min_tail: int = 10,
) -> DataFrame:
    """Hill estimator of the power-law tail index per group (Hill 1975)
    over a positive value column — the heavy-tail fingerprint
    :func:`zipf_profile` gives for term frequencies, here for corpus
    SIZE distributions (doc lengths, per-user event counts): α ≲ 2
    means a few giant rows dominate the byte budget (packing,
    sampling, and shuffle sizing all care); α large = light tail.

        1/α̂ = (1/m) Σ_{i=1..m} ln( X_(i) / X_(m+1) )

    over the m largest values, threshold X_(m+1); m = max(``min_tail``,
    ⌊tail_frac·n⌋), capped at n−1. Returns one row per group:
    (``group_col``, ``n``, ``m``, ``x_min``, ``alpha``), alpha rounded
    to 6, ordered by group; NULL when the group is too small
    (n ≤ min_tail), the threshold is 0, or all tail values tie.

    Determinism: the log ratios round to 12 dp and sum as exact
    DECIMAL(16,12) (the heaps_law lesson — raw double sums let
    partition order flip near-zero results); ties at the threshold
    take the value, not the rank, so engines can't disagree on which
    duplicates land in the tail.

    Scale shape: one per-group window rank (the inherent cost of order
    statistics) + a tail-sized fold; groups process in parallel.
    """
    from pyspark.sql import Window

    ranked = (
        df.filter(F.col(value_col) > 0)
        .select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_x"),
        )
        .withColumn("_r", F.row_number().over(Window.partitionBy("_g").orderBy(F.desc("_x"))))
    )
    sizes = ranked.groupBy("_g").agg(F.count(F.lit(1)).alias("n"))
    m_expr = F.least(
        F.greatest(F.lit(min_tail), F.floor(F.lit(float(tail_frac)) * F.col("n")).cast("int")),
        (F.col("n") - 1).cast("int"),
    )
    sized = sizes.select("_g", "n", m_expr.alias("m"))
    j = ranked.join(F.broadcast(sized), "_g")
    thresh = j.filter(F.col("_r") == F.col("m") + 1).select(
        "_g", F.col("_x").alias("_xmin")
    )
    tail = (
        j.filter(F.col("_r") <= F.col("m"))
        .join(F.broadcast(thresh), "_g")
        .select(
            "_g",
            F.when(
                F.col("_xmin") > 0,
                F.round(F.log(F.col("_x") / F.col("_xmin")), 12).cast(
                    "decimal(16,12)"
                ),
            ).alias("_lr"),
        )
    )
    agg = tail.groupBy("_g").agg(F.sum("_lr").alias("_s"))
    out = (
        sized.join(agg, "_g", "left")
        .join(thresh, "_g", "left")
        .select(
            F.col("_g").alias(group_col),
            "n",
            "m",
            F.col("_xmin").alias("x_min"),
            F.round(
                F.when(
                    (F.col("n") > min_tail)
                    & (F.col("_s").isNotNull())
                    & (F.col("_s") > 0),
                    F.col("m").cast("double") / F.col("_s").cast("double"),
                ),
                6,
            ).alias("alpha"),
        )
    )
    return out.orderBy(group_col)


def burrows_delta(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Burrows' Delta stylometric distance (Burrows 2002; Evert et al.
    2017) between groups (sources/authors): z-score each group's
    relative frequency of the ``top_n`` corpus-wide most frequent
    tokens, then Delta(a,b) = mean |z_a − z_b| over those tokens — the
    standard authorship / style-drift measure. In a training-data
    pipeline it flags a source whose register shifted (scraper started
    pulling a different site section) and clusters sources by style
    before mixture planning. No reference equivalent (SURVEY.md §2.4).

    Returns one row per unordered group pair (a < b lexicographically):
    (``group_a``, ``group_b``, ``delta``) rounded to 6, ordered by
    (group_a, group_b).

    Determinism: relative frequencies are 9-dp-pinned; per-token
    mean/std across groups use exact DECIMAL sums — (18,9)² = (37,18)
    stays under the 38-digit cap — and the final |z| differences
    accumulate as DECIMAL(18,6) (z is 6-dp-pinned, so differences are
    exact), making the mean independent of partition order. The top_n
    cut orders by (count DESC, token ASC) so both engines pick the
    identical token set.

    Scale shape: one corpus-sized (group, token) count aggregate
    (map-side combined); everything after is (groups × top_n) rows —
    the z-matrix and the pair join are dashboard-sized.
    """
    from valentinus_spark.functions.text import normalize_text, word_tokens

    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(word_tokens(normalize_text(text_col))).alias("_t"),
    )
    # freq feeds three consumers (top-n cut, group totals, the rel
    # spine) — localCheckpoint so the corpus-sized tokenize+aggregate
    # runs ONCE instead of per consumer (the winnow_spans lesson);
    # freq itself is corpus-SUMMARY-sized (groups × vocab)
    freq = (
        toks.groupBy("_g", "_t")
        .agg(F.count(F.lit(1)).alias("_f"))
        .localCheckpoint()
    )
    top = (
        freq.groupBy("_t")
        .agg(F.sum("_f").alias("_tot"))
        .orderBy(F.desc("_tot"), F.asc("_t"))
        .limit(top_n)
        .select("_t")
    )
    gtot = freq.groupBy("_g").agg(F.sum("_f").alias("_gn"))
    # dense group × top-token spine: a missing (group, token) is
    # relative frequency 0, not an absent row
    spine = gtot.crossJoin(F.broadcast(top))
    rel = (
        spine.join(freq, ["_g", "_t"], "left")
        .select(
            "_g",
            "_t",
            F.round(
                F.coalesce(F.col("_f"), F.lit(0)).cast("double")
                / F.col("_gn").cast("double"),
                9,
            )
            .cast("decimal(18,9)")
            .alias("_r"),
        )
    )
    stats = rel.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_gc"),
        F.sum("_r").cast("double").alias("_s1"),
        F.sum((F.col("_r") * F.col("_r")).cast("decimal(38,18)"))
        .cast("double")
        .alias("_s2"),
    )
    gc = F.col("_gc").cast("double")
    mean = F.col("_s1") / gc
    # guard on the VARIANCE (not the std): float error can push an
    # all-equal token's variance to -1e-18, where Spark's sqrt yields
    # NaN silently but DuckDB's raises — branching before the sqrt
    # keeps both engines on the same path
    var = F.col("_s2") / gc - mean * mean
    z = rel.join(F.broadcast(stats), "_t").select(
        "_g",
        "_t",
        F.when(
            var > 0,
            F.round((F.col("_r").cast("double") - mean) / F.sqrt(var), 6),
        )
        .otherwise(0.0)
        .alias("_z"),
    )
    a = z.select(
        F.col("_g").alias("group_a"), "_t", F.col("_z").alias("_za")
    )
    b = z.select(
        F.col("_g").alias("group_b"), "_t", F.col("_z").alias("_zb")
    )
    pairs = a.join(b, "_t").filter(F.col("group_a") < F.col("group_b"))
    return (
        pairs.groupBy("group_a", "group_b")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("_za") - F.col("_zb")).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("delta")
        )
        .orderBy("group_a", "group_b")
    )


def hhi_concentration(
    df: DataFrame,
    group_col: str,
    category_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group: Σ share²
    over the categories inside each group (1/k for a uniform spread,
    1.0 for a monoculture), plus the normalized form
    (HHI − 1/k)/(1 − 1/k) and the effective category count 1/HHI —
    the one-number "is this source dominated by a single domain /
    language / template" panel next to gini_coefficient (which ranks
    VALUE inequality; HHI ranks MEMBERSHIP concentration).

    Returns one row per group: (``group_col``, ``n``, ``n_categories``,
    ``hhi``, ``hhi_normalized``, ``effective_categories``) rounded to
    6, ordered by group; hhi_normalized NULL for single-category
    groups (the normalizer degenerates).

    Determinism: HHI = Σ c² / n² is exact integer arithmetic up to one
    final division. Scale shape: one (group, category) count aggregate
    — map-side combined — then a group-sized fold.
    """
    per = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(category_col).isNotNull()
        )
        .groupBy(F.col(group_col).alias("_g"), F.col(category_col).alias("_c"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    agg = per.groupBy("_g").agg(
        F.sum("_n").alias("n"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.col("_n") * F.col("_n")).alias("_s2"),
    )
    nn = F.col("n").cast("double")
    hhi = F.col("_s2").cast("double") / (nn * nn)
    kk = F.col("n_categories").cast("double")
    norm = F.when(
        F.col("n_categories") >= 2, (hhi - 1.0 / kk) / (1.0 - 1.0 / kk)
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n",
        "n_categories",
        F.round(hhi, 6).alias("hhi"),
        F.round(norm, 6).alias("hhi_normalized"),
        F.round(1.0 / hhi, 6).alias("effective_categories"),
    ).orderBy(group_col)


def capture_recapture(
    sample_a: DataFrame,
    sample_b: DataFrame,
    key_col: str,
) -> DataFrame:
    """Chapman capture-recapture estimator (1951) of an unseen
    population size from two overlapping samples:

        N̂ = (n₁+1)(n₂+1)/(m+1) − 1,   m = |A ∩ B|

    The crawl-ops question it answers: "two independent crawls caught
    n₁ and n₂ pages with m in common — how big is the site/corpus we
    are sampling from?" (also: dedup-universe estimation from two
    shards' key overlap). Chapman's +1 correction keeps the estimate
    finite at m = 0 and unbiased-ish at small m — the raw
    Lincoln-Petersen n₁n₂/m is reported alongside (NULL when m = 0).

    Returns ONE row: (``n_a``, ``n_b``, ``m_overlap``,
    ``chapman_estimate``, ``lincoln_petersen``) — estimates rounded
    to 4. Keys are deduplicated inside each sample (capture lists are
    sets by definition).

    Determinism: exact BIGINT counts; two float divisions.

    Scale shape: two distinct aggregates + one semi-join on the key —
    all map-side combined; no raw-row shuffle beyond the key sets.
    """
    a = sample_a.select(F.col(key_col).alias("_k")).filter(
        F.col("_k").isNotNull()
    ).distinct()
    b = sample_b.select(F.col(key_col).alias("_k")).filter(
        F.col("_k").isNotNull()
    ).distinct()
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    m = a.join(b, "_k", "semi").agg(F.count(F.lit(1)).alias("m_overlap"))
    j = na.crossJoin(nb).crossJoin(m)
    n1 = F.col("n_a").cast("double")
    n2 = F.col("n_b").cast("double")
    mm = F.col("m_overlap").cast("double")
    chapman = (n1 + 1.0) * (n2 + 1.0) / (mm + 1.0) - 1.0
    lp = F.when(F.col("m_overlap") > 0, n1 * n2 / mm)
    return j.select(
        "n_a",
        "n_b",
        "m_overlap",
        F.round(chapman, 4).alias("chapman_estimate"),
        F.round(lp, 4).alias("lincoln_petersen"),
    )


def james_stein_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Positive-part James-Stein shrinkage (1961) of per-group means
    toward the grand mean — the winner's-curse guard for "which
    source/segment has the best average" readouts: with many groups,
    the top raw mean is mostly noise, and JS dominates it uniformly
    for k ≥ 4. Unequal group sizes use the standard per-group
    variance-of-the-mean extension:

        θ̂_i = x̄ + (1 − (k−3)·v_i / S)₊ · (x̄_i − x̄),
        v_i = s²_pooled/n_i,   S = Σ_j (x̄_j − x̄)²

    with s²_pooled the within-group pooled variance and x̄ the
    unweighted mean of group means (the exchangeability prior over
    GROUPS, not rows). Returns per group: (``group_col``, ``n``,
    ``raw_mean``, ``shrunk_mean``, ``shrink_weight``) rounded to 6,
    ordered by group — shrink_weight = 0 means fully pooled, 1 means
    no shrinkage; everything NULL-guarded when k < 4 or S = 0 (then
    shrunk = raw, weight = 1, the identity fallback).

    Determinism: group moments accumulate in DECIMAL (the cronbach
    (17,4)/(38,8) discipline); per-group means/variances are rounded
    to 9 dp before the k-sized folds; S itself is a 9-dp-pinned
    DECIMAL sum.

    Scale shape: one (group) moment aggregate over the corpus
    (map-side combined), then k-row folds and one broadcast join back.
    """
    base = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        # try_cast: finite values past the (17,4) grid join NaN in the
        # excluded-NULL class instead of an ANSI raise
        F.col(value_col).try_cast("decimal(17,4)").alias("_v"),
    )
    sq = lambda c: (c * c).cast("decimal(38,8)")  # noqa: E731
    g = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_v").cast("decimal(38,8)")).cast("double").alias("_s1"),
        F.sum(sq(F.col("_v"))).cast("double").alias("_s2"),
    )
    mean_i = F.round(F.col("_s1") / F.col("_n").cast("double"), 9)
    # within-group sum of squared deviations (computational form, 9dp)
    ssw_i = F.round(
        F.col("_s2")
        - F.col("_s1") * F.col("_s1") / F.col("_n").cast("double"),
        9,
    )
    g2 = g.select(
        "_g", "_n", mean_i.alias("_m"), ssw_i.alias("_ssw")
    )
    tot = g2.agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_n").alias("_ntot"),
        # try_cast: squared deviations inherit the squared ingress
        # domain (~1e26 at the (17,4) grid edge) and can exceed this
        # fold's (28,9) range; unrepresentable -> NULL, never a raise
        F.sum(F.col("_m").try_cast("decimal(28,9)")).cast("double").alias("_sm"),
        F.sum(F.col("_ssw").try_cast("decimal(28,9)")).cast("double").alias("_ssw_tot"),
    )
    withg = g2.crossJoin(F.broadcast(tot))
    grand = F.round(F.col("_sm") / F.col("_k").cast("double"), 9)
    j2 = withg.select(
        "_g",
        "_n",
        "_m",
        "_k",
        grand.alias("_grand"),
        F.round(
            F.when(
                F.col("_ntot") > F.col("_k"),
                F.col("_ssw_tot")
                / (F.col("_ntot") - F.col("_k")).cast("double"),
            ),
            9,
        ).alias("_s2pool"),
    )
    dev = F.round(
        (F.col("_m") - F.col("_grand")) * (F.col("_m") - F.col("_grand")), 9
    )
    s_tot = j2.groupBy().agg(
        F.sum(dev.cast("decimal(38,9)")).cast("double").alias("_S")
    )
    j3 = j2.crossJoin(F.broadcast(s_tot))
    vi = F.col("_s2pool") / F.col("_n").cast("double")
    w_raw = F.when(
        (F.col("_k") >= 4) & (F.col("_S") > 0) & F.col("_s2pool").isNotNull(),
        F.greatest(
            F.lit(0.0),
            1.0 - (F.col("_k").cast("double") - 3.0) * vi / F.col("_S"),
        ),
    ).otherwise(F.lit(1.0))
    shrunk = F.col("_grand") + w_raw * (F.col("_m") - F.col("_grand"))
    return j3.select(
        F.col("_g").alias(group_col),
        F.col("_n").alias("n"),
        F.round(F.col("_m"), 6).alias("raw_mean"),
        F.round(shrunk, 6).alias("shrunk_mean"),
        F.round(w_raw, 6).alias("shrink_weight"),
    ).orderBy(group_col)


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Quantile normalization of a per-group value distribution onto
    the whole-corpus reference distribution (the microarray-era
    standard, Bolstad 2003, applied to corpus curation): each group
    value maps to the corpus value at the SAME quantile, so
    cross-group comparisons ("is source A's doc length p50 above
    source B's?") happen on one common scale regardless of each
    group's marginal shape.

    Mapping rule (exact, no interpolation): a group value with
    midrank fraction p maps to the smallest corpus value whose
    cumulative count fraction ≥ p. The comparison is done by BIGINT
    cross-multiplication — ``2·C_cum·n_g ≥ (2·cum_before + c + 1)·N``
    — so the mapping is EXACT rational arithmetic end to end.

    Returns per group: (``group_col``, ``n``, ``mean_raw``,
    ``mean_normalized``) rounded to 6, ordered by group —
    mean_normalized converging across groups is the "one common
    scale" sanity readout (each group's normalized mean estimates the
    corpus mean from that group's quantile positions).

    Scale shape: one (group, value) count aggregate (the only
    corpus-sized shuffle), per-group cumulative windows on the VALUE
    GRID (|group|×|distinct values| rows), and a grid×grid mapping
    join (both sides corpus-summary-sized — thousands of rows for
    bounded domains like lengths/scores, independent of corpus rows).
    """
    from pyspark.sql import Window

    vals = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).try_cast("decimal(17,4)").alias("_v"),
    )
    gc = vals.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    wg = Window.partitionBy("_g").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ggrid = gc.select(
        "_g",
        "_v",
        "_c",
        (F.sum("_c").over(wg) - F.col("_c")).alias("_before"),
        F.sum("_c").over(Window.partitionBy("_g")).alias("_ng"),
    )
    cgrid = gc.groupBy("_v").agg(F.sum("_c").alias("_cc"))
    # corpus-grid cumulative counts via the two-phase distributed device
    # (no single-partition window over the distinct-value table; the
    # per-GROUP windows above stay partitioned by _g, i.e. distributed)
    from valentinus_spark.operators._distrank import running_totals

    cgrid = running_totals(cgrid, ["_v"], ["_cc"], with_totals=True).select(
        F.col("_v").alias("_cv"),
        F.col("_run_cc").alias("_ccum"),
        F.col("_tot_cc").alias("_n"),
    )
    # exact rational threshold: corpus cumfrac >= group midrank fraction
    cond = (
        F.col("_ccum") * F.col("_ng") * 2
        >= (F.col("_before") * 2 + F.col("_c") + 1) * F.col("_n")
    )
    mapped = (
        ggrid.join(cgrid, cond)
        .groupBy("_g", "_v", "_c", "_ng")
        .agg(F.min("_cv").alias("_vnorm"))
    )
    agg = mapped.groupBy("_g").agg(
        F.max("_ng").alias("n"),
        (
            F.sum((F.col("_v") * F.col("_c")).cast("decimal(38,4)"))
            .cast("double")
            / F.max("_ng").cast("double")
        ).alias("_mraw"),
        (
            F.sum((F.col("_vnorm") * F.col("_c")).cast("decimal(38,4)"))
            .cast("double")
            / F.max("_ng").cast("double")
        ).alias("_mnorm"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n",
        F.round("_mraw", 6).alias("mean_raw"),
        F.round("_mnorm", 6).alias("mean_normalized"),
    ).orderBy(group_col)


def theil_atkinson_inequality(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Theil-T index (1967) + Atkinson index (ε=1, 1970) of value
    inequality per group — the decomposable / welfare-weighted
    members of the inequality panel next to gini_coefficient (Gini
    weights the middle, Theil the top, Atkinson-1 the bottom; reading
    all three tells you WHERE a source's length inequality lives):

        T = (1/N) Σ (x_i/μ)·ln(x_i/μ)
        A₁ = 1 − geomean(x)/μ = 1 − exp[(1/N) Σ ln(x_i) − ln μ]

    Zero/negative values drop (both indices need x > 0 — documented;
    ``n_dropped`` reports how many). Returns per group: (group_col,
    ``n``, ``n_dropped``, ``theil_t``, ``atkinson_1``) rounded to 6,
    ordered by group; NULL indices when n = 0 after the drop.

    Determinism: μ is an exact DECIMAL-sum / count double; each ln
    term is 12-dp-rounded and DECIMAL-accumulated (the brier/js
    convention), so partition order cannot move either index.

    Scale shape: one pre-aggregate on the (group, value) grid (values
    repeat heavily in length-like columns), then grid-sized folds —
    the corpus is scanned once.
    """
    base = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).try_cast("decimal(17,4)").alias("_v"),
    )
    grid = base.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    pos = grid.filter(F.col("_v") > 0)
    stats = pos.groupBy("_g").agg(
        F.sum("_c").alias("n"),
        F.sum((F.col("_v") * F.col("_c")).cast("decimal(38,4)"))
        .cast("double")
        .alias("_s"),
    )
    dropped = grid.groupBy("_g").agg(
        F.sum(F.when(F.col("_v") <= 0, F.col("_c")).otherwise(0)).alias(
            "n_dropped"
        )
    )
    withmu = pos.join(F.broadcast(stats), "_g").select(
        "_g",
        "_v",
        "_c",
        (F.col("_s") / F.col("n").cast("double")).alias("_mu"),
        "n",
    )
    x = F.col("_v").cast("double")
    # try_cast: x/mu ratios are unbounded (tiny mu, huge x), so the
    # 12-dp term can exceed the (28,12) grid; unrepresentable -> NULL
    theil_term = F.round(
        F.col("_c").cast("double") * ((x / F.col("_mu")) * F.log(x / F.col("_mu"))),
        12,
    ).try_cast("decimal(28,12)")
    ln_term = F.round(
        F.col("_c").cast("double") * F.log(x), 12
    ).try_cast("decimal(28,12)")
    agg = withmu.groupBy("_g").agg(
        F.max("n").alias("n"),
        F.max("_mu").alias("_mu"),
        F.sum(theil_term).cast("double").alias("_tsum"),
        F.sum(ln_term).cast("double").alias("_lsum"),
    )
    nn = F.col("n").cast("double")
    theil = F.when(F.col("n") > 0, F.col("_tsum") / nn)
    atkinson = F.when(
        F.col("n") > 0,
        1.0 - F.exp(F.col("_lsum") / nn - F.log(F.col("_mu"))),
    )
    # ``dropped`` is the group spine (every input group); a group whose
    # values are ALL non-positive must still emit its (n = 0,
    # NULL indices) row — with agg as the left side it vanished
    # (hypothesis-found doc/behavior mismatch)
    out = dropped.join(F.broadcast(agg), "_g", "left").select(
        F.col("_g").alias(group_col),
        F.coalesce("n", F.lit(0)).alias("n"),
        "n_dropped",
        F.round(theil, 6).alias("theil_t"),
        F.round(atkinson, 6).alias("atkinson_1"),
    )
    return out.orderBy(group_col)


def permutation_entropy(
    events: DataFrame,
    ts_col: str = "ts",
    order: int = 3,
) -> DataFrame:
    """Permutation entropy (Bandt & Pompe 2002) of the daily event
    volume at embedding order m — the model-free complexity gauge of
    the monitoring panel: ~1 for noise-like series, low for
    regular/periodic ones, and robust to monotone transforms because
    only ORDINAL patterns of m consecutive days count:

        H = −Σ_π p(π)·ln p(π) / ln(m!)   over the m! ordinal patterns

    Ties inside a window break by position (the standard convention).
    Returns ONE row: (``n_days``, ``n_windows``, ``n_patterns``,
    ``perm_entropy``) rounded to 6 — NULL when fewer than m days.

    Determinism: patterns are exact integer encodings (Lehmer-style
    rank concatenation) over the zero-filled day spine; counts are
    BIGINT; each −p·ln p term is 12-dp DECIMAL-pinned; one final
    division by ln(m!).

    Scale shape: one corpus-sized daily aggregate; the lead() windows
    and pattern counting run on the bounded day spine.
    """
    import math

    from pyspark.sql import Window

    if order != 3:
        raise ValueError("permutation_entropy currently supports order=3")
    base = events.select(F.to_date(ts_col).alias("_d"))
    daily = base.groupBy("_d").agg(F.count(F.lit(1)).alias("_n"))
    bounds = base.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    spine = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    dense = spine.join(daily, "_d", "left").select(
        "_d", F.coalesce("_n", F.lit(0)).cast("bigint").alias("_x")
    )
    w = Window.orderBy("_d")
    tri = dense.select(
        "_x",
        F.lead("_x", 1).over(w).alias("_y"),
        F.lead("_x", 2).over(w).alias("_z"),
    ).filter(F.col("_z").isNotNull())
    # ordinal pattern of (x, y, z) with positional tie-break: rank of
    # each element among the three (strictly-less count + earlier-equal
    # count) concatenated in base 3 — 6 distinct codes for order 3
    xx, yy, zz = F.col("_x"), F.col("_y"), F.col("_z")
    rx = (
        F.when(yy < xx, 1).otherwise(0) + F.when(zz < xx, 1).otherwise(0)
    )
    ry = (
        F.when(xx <= yy, 1).otherwise(0) + F.when(zz < yy, 1).otherwise(0)
    )
    rz = (
        F.when(xx <= zz, 1).otherwise(0) + F.when(yy <= zz, 1).otherwise(0)
    )
    pat = rx * 9 + ry * 3 + rz
    counts = tri.groupBy(pat.alias("_p")).agg(F.count(F.lit(1)).alias("_c"))
    tot = counts.agg(
        F.sum("_c").alias("n_windows"),
        F.count(F.lit(1)).alias("n_patterns"),
    )
    withtot = counts.crossJoin(F.broadcast(tot))
    p = F.col("_c").cast("double") / F.col("n_windows").cast("double")
    term = F.round(-(p * F.log(p)), 12).cast("decimal(28,12)")
    hsum = withtot.agg(
        F.max("n_windows").alias("n_windows"),
        F.max("n_patterns").alias("n_patterns"),
        F.sum(term).cast("double").alias("_h"),
    )
    ndays = dense.agg(F.count(F.lit(1)).alias("n_days"))
    j = ndays.crossJoin(hsum)
    h = F.when(
        F.col("n_windows") > 0,
        F.col("_h") / float(math.log(math.factorial(order))),
    )
    return j.select(
        "n_days",
        F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
        F.coalesce("n_patterns", F.lit(0)).alias("n_patterns"),
        F.round(h, 6).alias("perm_entropy"),
    )


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Pairwise Pearson correlation panel over numeric columns in ONE
    corpus scan — the first look at any new table's numeric structure
    (which features are redundant, which move together), and the input
    a feature-pruning pass actually wants:

        r_xy = (Σxy − ΣxΣy/n) / √[(Σx²−(Σx)²/n)(Σy²−(Σy)²/n)]

    Returns one row per unordered pair: (``col_a``, ``col_b``, ``n``,
    ``corr``) rounded to 6, ordered by (col_a, col_b) — corr NULL when
    either variance is degenerate. Rows with a NULL in ANY panel
    column drop (listwise — one shared n keeps the matrix consistent).

    Determinism: every moment (Σx, Σx², Σxy for all pairs)
    accumulates as exact DECIMAL in a single aggregate; each r is one
    pinned double formula.

    Scale shape: ONE map-side-combined aggregate emitting
    k + k(k+1)/2 sums; everything after is a k²-sized local fold. The
    corpus is scanned once regardless of pair count.
    """
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least 2 columns")
    cond = None
    for c in cols:
        cnd = F.col(c).isNotNull()
        cond = cnd if cond is None else (cond & cnd)
    base = df.filter(cond).select(
        *[F.col(c).try_cast("decimal(17,4)").alias(f"_c{i}") for i, c in enumerate(cols)]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(cols)):
        aggs.append(
            F.sum(F.col(f"_c{i}").cast("decimal(38,8)")).alias(f"_s{i}")
        )
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(
                    (F.col(f"_c{i}") * F.col(f"_c{j}")).cast("decimal(38,8)")
                ).alias(f"_p{i}_{j}")
            )
    m = base.agg(*aggs)
    rows = []
    nn = F.col("n").cast("double")
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            si = F.col(f"_s{i}").cast("double")
            sj = F.col(f"_s{j}").cast("double")
            cov = F.col(f"_p{i}_{j}").cast("double") - si * sj / nn
            vi = F.col(f"_p{i}_{i}").cast("double") - si * si / nn
            vj = F.col(f"_p{j}_{j}").cast("double") - sj * sj / nn
            r = F.when((vi > 0) & (vj > 0), cov / F.sqrt(vi * vj))
            rows.append(
                F.struct(
                    F.lit(cols[i]).alias("col_a"),
                    F.lit(cols[j]).alias("col_b"),
                    F.col("n").alias("n"),
                    F.round(r, 6).alias("corr"),
                )
            )
    return (
        m.select(F.explode(F.array(*rows)).alias("_r"))
        .select("_r.col_a", "_r.col_b", "_r.n", "_r.corr")
        .orderBy("col_a", "col_b")
    )


def decile_concentration(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Lorenz-curve deciles: units ranked by total value, bucketed into
    ``n_tiles`` equal-count tiles, each reporting its share of the
    total — "the top decile of users is X % of revenue", the
    actionable readout behind :func:`gini_coefficient`'s one number
    (same curve, kept as a table). Tiles are exact NTILE buckets on
    (value DESC, unit ASC) — deterministic under ties.

    Output per tile: (``tile``, ``n_units``, ``tile_value``,
    ``value_share``, ``cum_share``) with tile 1 = top; shares rounded
    to 6.

    Determinism: per-unit totals and tile sums accumulate in DECIMAL;
    NTILE over an exact total ordering; the cumulative share is a
    DECIMAL running sum divided once.

    Scale shape: one unit-keyed aggregate (the corpus shuffle), one
    ordered window over UNITS (the unavoidable rank — units, not raw
    rows), tile-sized folds.
    """
    from pyspark.sql import Window

    per = (
        df.filter(F.col(unit_col).isNotNull())
        .groupBy(unit_col)
        .agg(
            F.sum(F.col(value_col).try_cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("_v")
        )
    )
    # NTILE over (value DESC, unit ASC) via two-phase distributed
    # ranking (the zorder_bucket_stats device) — no single-partition
    # window over the unit table; the ordering key is total (units are
    # unique after the groupBy), so the closed-form bucket is
    # bit-identical to the window ntile
    from valentinus_spark.operators._distrank import global_ranks, ntile_from_rank

    ranked = global_ranks(per, [F.desc("_v"), F.asc(unit_col)])
    tiled = ranked.select(
        ntile_from_rank(F.col("_rank"), F.col("_n"), n_tiles)
        .cast("int")
        .alias("tile"),
        "_v",
    )
    agg = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_v").cast("decimal(38,2)").alias("_tv"),
    )
    tot = agg.agg(F.sum("_tv").cast("decimal(38,2)").alias("_tot"))
    wc = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = agg.crossJoin(F.broadcast(tot)).select(
        "tile",
        "n_units",
        F.round(F.col("_tv").cast("double"), 2).alias("tile_value"),
        F.round(
            F.when(
                F.col("_tot") != 0,
                F.col("_tv").cast("double") / F.col("_tot").cast("double"),
            ),
            6,
        ).alias("value_share"),
        F.round(
            F.when(
                F.col("_tot") != 0,
                F.sum("_tv").over(wc).cast("double")
                / F.col("_tot").cast("double"),
            ),
            6,
        ).alias("cum_share"),
    )
    return out.orderBy("tile")
