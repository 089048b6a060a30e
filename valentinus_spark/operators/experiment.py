"""Experimentation analytics: A/B assignment, proportion and mean
tests, sample-ratio-mismatch, and CUPED variance reduction — the
online-experiment readout stack, built engine-portable (every fold,
including the normal CDF, is an explicit arithmetic formula that
replays identically in ANSI SQL; no SciPy).

The reference has no experimentation surface (SURVEY.md §2.4 extension
family, like funnel/retention). Scale shapes are uniform: one
unit-keyed aggregate collapses the event stream to per-unit rows, then
arm-sized moment folds — the corpus is scanned once per readout.

Normal CDF: Abramowitz & Stegun 26.2.17 (|err| < 7.5e-8). Both engines
evaluate the same polynomial, so p-values agree bit-for-bit at the
6-decimal rounding regardless of the approximation error itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ab_assign",
    "two_proportion_test",
    "welch_means_test",
    "srm_check",
    "cuped_adjust",
    "did_estimate",
    "mann_whitney_u",
    "bh_fdr",
    "mcnemar_test",
    "msprt_test",
    "paired_t_test",
]


def ab_assign(unit: Column, n_arms: int = 2, salt: str = "ab-v1") -> Column:
    """Deterministic arm assignment from a unit id via the same
    sha256-derived bucketing the repo's seeded samplers use (see
    functions/text.py::stable_split): the first 8 hex chars of
    ``sha256(salt || ':' || unit)`` as an integer, reduced mod
    ``n_arms``. Engine-portable (DuckDB replay:
    ``(('0x' || substr(sha256(salt || ':' || unit::VARCHAR), 1, 8))::UBIGINT
    % n_arms)::BIGINT``) and free of arithmetic structure — the prior
    small-modulus mixer ``((unit % 1000003) * 31 + salt) % 2``
    degenerated to id PARITY for n_arms=2 (31 and 1000003 are odd), so
    any even/odd pattern in id allocation leaked into the arms. Change
    ``salt`` to draw a fresh independent assignment."""
    bucket = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(salt), F.lit(":"), unit.cast("string")), 256),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (bucket % n_arms).cast("bigint")


def _phi_upper(z: Column) -> Column:
    """P(Z > z) for z ≥ 0 — A&S 26.2.17 polynomial (|err| < 7.5e-8)."""
    t = 1.0 / (1.0 + 0.2316419 * z)
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    pdf = F.exp(-z * z / 2.0) / 2.5066282746310002  # sqrt(2*pi)
    return pdf * poly


def two_sided_p(z: Column) -> Column:
    """Two-sided normal p-value 2·P(Z > |z|), engine-portable. NULL z
    stays NULL (Spark's ``least`` skips NULLs, which would otherwise
    turn an undefined statistic into p = 1.0)."""
    return F.when(
        z.isNotNull(), F.least(F.lit(1.0), 2.0 * _phi_upper(F.abs(z)))
    )


def two_proportion_test(
    df: DataFrame,
    arm_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test (pooled SE) between arms 0 and 1 — the
    conversion-rate readout. ``success_col`` is 0/1 per unit. Returns
    ONE row: (``n_a``, ``n_b``, ``p_a``, ``p_b``, ``lift``, ``z``,
    ``p_value``), rounded to 6; z/p NULL when either arm is empty or
    the pooled rate is degenerate (0 or 1 — no variance).

    Scale shape: one conditional-sum aggregate over the whole frame
    (no per-arm subframes — a single agg emits its one row even when an
    arm, or the entire input, is empty, where the previous
    per-arm-frame crossJoin returned ZERO rows and broke the one-row
    contract). The corpus is scanned once.
    """
    arm = F.col(arm_col)
    s = F.col(success_col).cast("bigint")
    agg = df.filter(arm.isin([0, 1])).agg(
        F.count(F.when(arm == 0, F.lit(1))).alias("n_a"),
        F.count(F.when(arm == 1, F.lit(1))).alias("n_b"),
        F.sum(F.when(arm == 0, s)).alias("_sa"),
        F.sum(F.when(arm == 1, s)).alias("_sb"),
    )
    j = agg
    pa = F.when(F.col("n_a") > 0, F.col("_sa").cast("double") / F.col("n_a"))
    pb = F.when(F.col("n_b") > 0, F.col("_sb").cast("double") / F.col("n_b"))
    pool = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        (F.col("_sa") + F.col("_sb")).cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double"),
    )
    se = F.sqrt(
        pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    z = F.when((pool > 0) & (pool < 1), (pb - pa) / se)
    return j.select(
        "n_a",
        "n_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(pb - pa, 6).alias("lift"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def welch_means_test(
    df: DataFrame,
    arm_col: str,
    value_col: str,
) -> DataFrame:
    """Welch's unequal-variance t-test between arms 0 and 1 on a
    continuous metric — the revenue-per-user readout. Returns ONE row:
    (``n_a``, ``n_b``, ``mean_a``, ``mean_b``, ``diff``, ``t``,
    ``dof``, ``p_value``) rounded to 6 — dof via Welch-Satterthwaite;
    the p-value uses the NORMAL approximation (stated, accurate for
    the n ≫ 30 regime experiments run in). t/p NULL when either arm
    has < 2 units or both variances are 0.

    Determinism: value sums and sum-of-squares accumulate in
    DECIMAL(38,8) — exact regardless of partition order — and only the
    final scalar formula is float.
    """
    arm = F.col(arm_col)
    v = F.col(value_col).try_cast("decimal(38,8)")
    # (17,4)^2 = (35,8) — exact under Spark's 38-digit cap; (19,4)^2
    # would be adjusted to (38,7), truncating the 8th decimal digit the
    # oracle's native DECIMAL(38,8) product keeps.
    vv = (
        F.col(value_col).try_cast("decimal(17,4)")
        * F.col(value_col).try_cast("decimal(17,4)")
    ).cast("decimal(38,8)")
    # One conditional-sum aggregate over the whole frame: a single agg
    # emits its one row even when an arm (or the entire input) is empty,
    # where the previous per-arm-frame crossJoin returned ZERO rows and
    # broke the one-row contract.
    j = df.filter(arm.isin([0, 1])).agg(
        F.count(F.when(arm == 0, F.lit(1))).alias("n_a"),
        F.count(F.when(arm == 1, F.lit(1))).alias("n_b"),
        F.sum(F.when(arm == 0, v)).cast("double").alias("_sa"),
        F.sum(F.when(arm == 0, vv)).cast("double").alias("_ssa"),
        F.sum(F.when(arm == 1, v)).cast("double").alias("_sb"),
        F.sum(F.when(arm == 1, vv)).cast("double").alias("_ssb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.when(F.col("n_a") > 0, F.col("_sa") / na)
    mb = F.when(F.col("n_b") > 0, F.col("_sb") / nb)
    # variances guarded on n >= 2 (ANSI mode: x/0 raises, and CaseWhen
    # evaluates branches lazily, so the guard is also the safety)
    va = F.when(F.col("n_a") >= 2, (F.col("_ssa") - na * ma * ma) / (na - 1.0))
    vb = F.when(F.col("n_b") >= 2, (F.col("_ssb") - nb * mb * mb) / (nb - 1.0))
    sa2, sb2 = va / na, vb / nb
    se2 = sa2 + sb2
    t = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0),
        (mb - ma) / F.sqrt(se2),
    )
    dof = F.when(
        t.isNotNull() & (se2 > 0) & ((sa2 > 0) | (sb2 > 0)),
        (se2 * se2)
        / (
            F.when(F.col("n_a") > 1, sa2 * sa2 / (na - 1.0)).otherwise(0.0)
            + F.when(F.col("n_b") > 1, sb2 * sb2 / (nb - 1.0)).otherwise(0.0)
        ),
    )
    return j.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(mb - ma, 6).alias("diff"),
        F.round(t, 6).alias("t"),
        F.round(dof, 6).alias("dof"),
        F.round(two_sided_p(t), 6).alias("p_value"),
    )


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected: list[float] | None = None,
) -> DataFrame:
    """Sample-ratio-mismatch check: χ² of observed arm counts against
    the intended split (default: uniform over observed arms) — the
    first gate on any experiment readout; an SRM means the assignment
    or logging is broken and every downstream p-value is garbage.
    Returns one row per arm (``arm``, ``n``, ``expected_n``,
    ``chi2_term``) plus exact counts so the 1-dof total is Σ terms;
    rounded to 6, ordered by arm.

    Scale shape: one arm-keyed count (k rows) + broadcast total.
    """
    counts = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("_k")
    )
    j = counts.crossJoin(F.broadcast(tot))
    if expected is None:
        exp_n = F.col("_tot").cast("double") / F.col("_k")
    else:
        m = F.create_map(
            *[x for i, w in enumerate(expected) for x in (F.lit(i), F.lit(float(w)))]
        )
        exp_n = F.col("_tot").cast("double") * m[F.col("arm")]
    d = F.col("n").cast("double") - exp_n
    return j.select(
        "arm",
        "n",
        F.round(exp_n, 6).alias("expected_n"),
        F.round(d * d / exp_n, 6).alias("chi2_term"),
    ).orderBy("arm")


def cuped_adjust(
    df: DataFrame,
    arm_col: str,
    metric_col: str,
    covariate_col: str,
) -> DataFrame:
    """CUPED (Deng et al. 2013): variance-reduced treatment-effect
    readout using a pre-experiment covariate X:

        θ  = cov(X, Y) / var(X)          (pooled, both arms)
        Y' = Y − θ·(X − mean(X))

    Per arm: raw and adjusted means, plus the variance-reduction
    fraction 1 − var(Y')/var(Y) = ρ² — how much experiment runtime the
    covariate buys. Returns one row per arm: (``arm``, ``n``,
    ``mean_raw``, ``mean_adj``, ``theta``, ``var_reduction``), rounded
    to 6; θ NULL (and adjusted = raw) when var(X) = 0.

    Determinism: all sums and cross-products accumulate in
    DECIMAL(38,8); floats appear only in the final scalar folds.

    Scale shape: one arm-keyed moment aggregate (Σy, Σx, Σxy, Σx², Σy²
    per arm — 2 rows), pooled scalars from those two rows, then
    per-arm arithmetic. One corpus scan.
    """
    # (17,4) operands keep every product (35,8) — exact under Spark's
    # 38-digit cap (a (19,4) product is adjusted to (38,7), truncating
    # the 8th decimal digit the oracle's DECIMAL(38,8) products keep).
    dec = lambda c: F.col(c).try_cast("decimal(17,4)")  # noqa: E731
    big = lambda e: e.cast("decimal(38,8)")  # noqa: E731
    agg = df.filter(F.col(arm_col).isin([0, 1])).groupBy(
        F.col(arm_col).alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(big(dec(metric_col))).alias("_sy"),
        F.sum(big(dec(covariate_col))).alias("_sx"),
        F.sum(big(dec(metric_col) * dec(covariate_col))).alias("_sxy"),
        F.sum(big(dec(covariate_col) * dec(covariate_col))).alias("_sxx"),
        F.sum(big(dec(metric_col) * dec(metric_col))).alias("_syy"),
    )
    pool = agg.agg(
        F.sum("n").alias("_N"),
        F.sum("_sy").cast("double").alias("_Sy"),
        F.sum("_sx").cast("double").alias("_Sx"),
        F.sum("_sxy").cast("double").alias("_Sxy"),
        F.sum("_sxx").cast("double").alias("_Sxx"),
        F.sum("_syy").cast("double").alias("_Syy"),
    )
    nn = F.col("_N").cast("double")
    mx = F.col("_Sx") / nn
    my = F.col("_Sy") / nn
    varx = F.col("_Sxx") / nn - mx * mx
    vary = F.col("_Syy") / nn - my * my
    covxy = F.col("_Sxy") / nn - mx * my
    theta = F.when(varx > 0, covxy / varx)
    var_red = F.when(
        theta.isNotNull() & (vary > 0), covxy * covxy / (varx * vary)
    )
    pooled = pool.select(
        mx.alias("_mx"),
        theta.alias("_theta"),
        var_red.alias("_vr"),
    )
    j = agg.crossJoin(F.broadcast(pooled))
    n_arm = F.col("n").cast("double")
    mean_raw = F.col("_sy").cast("double") / n_arm
    mean_x = F.col("_sx").cast("double") / n_arm
    mean_adj = F.when(
        F.col("_theta").isNotNull(),
        mean_raw - F.col("_theta") * (mean_x - F.col("_mx")),
    ).otherwise(mean_raw)
    return j.select(
        "arm",
        "n",
        F.round(mean_raw, 6).alias("mean_raw"),
        F.round(mean_adj, 6).alias("mean_adj"),
        F.round("_theta", 6).alias("theta"),
        F.round("_vr", 6).alias("var_reduction"),
    ).orderBy("arm")


def did_estimate(
    df: DataFrame,
    arm_col: str,
    period_col: str,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences: the 2×2 causal readout when
    randomization wasn't available — (treated post − treated pre) −
    (control post − control pre) removes both the group baseline and
    the common time trend (parallel-trends assumption, state it in the
    writeup). ``arm_col`` ∈ {0 control, 1 treated}; ``period_col`` ∈
    {0 pre, 1 post}.

    Returns ONE row: the four cell means (``mean_c_pre``,
    ``mean_c_post``, ``mean_t_pre``, ``mean_t_post``), ``did``, a
    large-sample ``se`` (√Σ cell var/n), ``z`` and normal ``p_value``,
    rounded to 6 — NULL inference when any cell has < 2 rows.

    Determinism: cell sums and squares accumulate in DECIMAL(38,8);
    only the 4-cell scalar fold is float. Scale shape: one
    (arm, period) aggregate — 4 rows out of any corpus — then scalar
    arithmetic.
    """
    # (17,4)^2 = (35,8) — exact under Spark's 38-digit cap (see msprt).
    dec = F.col(value_col).try_cast("decimal(17,4)")
    agg = (
        df.filter(F.col(arm_col).isin([0, 1]) & F.col(period_col).isin([0, 1]))
        .groupBy(
            F.col(arm_col).alias("_a"), F.col(period_col).alias("_p")
        )
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec.cast("decimal(38,8)")).cast("double").alias("_s"),
            F.sum((dec * dec).cast("decimal(38,8)")).cast("double").alias("_ss"),
        )
    )
    cell = agg.select(
        F.concat(F.col("_a").cast("string"), F.col("_p").cast("string")).alias(
            "_c"
        ),
        "_n",
        "_s",
        "_ss",
    )
    pivot = cell.groupBy().pivot("_c", ["00", "01", "10", "11"]).agg(
        F.first("_n").alias("n"), F.first("_s").alias("s"), F.first("_ss").alias("ss")
    )

    def mean(c):
        return F.col(f"{c}_s") / F.col(f"{c}_n")

    def var_over_n(c):
        n = F.col(f"{c}_n").cast("double")
        m = mean(c)
        return (F.col(f"{c}_ss") - n * m * m) / (n - 1.0) / n

    ok = (
        F.col("00_n").isNotNull() & (F.col("00_n") >= 2)
        & F.col("01_n").isNotNull() & (F.col("01_n") >= 2)
        & F.col("10_n").isNotNull() & (F.col("10_n") >= 2)
        & F.col("11_n").isNotNull() & (F.col("11_n") >= 2)
    )
    did = (mean("11") - mean("10")) - (mean("01") - mean("00"))
    se = F.sqrt(
        var_over_n("00") + var_over_n("01") + var_over_n("10") + var_over_n("11")
    )
    z = F.when(ok & (se > 0), did / se)
    return pivot.select(
        F.round(mean("00"), 6).alias("mean_c_pre"),
        F.round(mean("01"), 6).alias("mean_c_post"),
        F.round(mean("10"), 6).alias("mean_t_pre"),
        F.round(mean("11"), 6).alias("mean_t_post"),
        F.round(did, 6).alias("did"),
        F.round(F.when(ok, se), 6).alias("se"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between two groups — the
    nonparametric alternative to Welch when the metric is heavy-tailed
    (revenue with whales): compares rank sums, so one outlier moves the
    statistic by one rank, not by its magnitude. Normal approximation
    with the tie-corrected variance; no continuity correction
    (documented choice — keeps both engines' arithmetic identical).

    Returns ONE row: (``n_a``, ``n_b``, ``u``, ``z``, ``p_value``),
    rounded to 6 — U is the B-side statistic (U > n_a·n_b/2 means B
    ranks higher); z/p NULL when a group is empty or all values tie.

    Scale shape: identical to ks_test — the corpus collapses to
    DISTINCT-VALUE counts per group (one map-side-combined shuffle),
    average ranks come from ONE ordered window over the distinct-value
    table, and the rank sum / tie spectrum are exact arithmetic over
    that table (average ranks live on the .5 grid, so sums are exact
    in double far beyond any realistic N).
    """
    from valentinus_spark.operators._distrank import running_totals

    vals = df.filter(
        F.col(group_col).isin([group_a, group_b]) & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).alias("_v"),
        F.when(F.col(group_col) == F.lit(group_a), 1).otherwise(0).alias("_ia"),
    )
    per_val = vals.groupBy("_v").agg(
        F.sum("_ia").alias("_ca"),
        F.sum(1 - F.col("_ia")).alias("_cb"),
    )
    cnt = F.col("_ca") + F.col("_cb")
    # rank prefix counts via the two-phase distributed device (no
    # single-partition window over the distinct-value table)
    ranked = running_totals(
        per_val.select("_v", "_cb", cnt.alias("_t")), ["_v"], ["_t"]
    ).select(
        "_cb",
        "_t",
        (F.col("_run_t") - F.col("_t")).alias("_before"),
    )
    # average rank of every element at this value: before + (t+1)/2
    avg_rank = F.col("_before") + (F.col("_t") + 1) / 2.0
    agg = ranked.agg(
        F.sum(F.col("_cb") * avg_rank).alias("_rb"),
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")).alias("_ties"),
        # both groups empty -> the empty-aggregate sums are NULL; counts
        # report 0 (the ks_test empty-group convention), inference NULL
        F.coalesce(F.sum(F.col("_t") - F.col("_cb")), F.lit(0)).alias("n_a"),
        F.coalesce(F.sum("_cb"), F.lit(0)).alias("n_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    nn = na + nb
    u = F.col("_rb") - nb * (nb + 1.0) / 2.0
    mu = na * nb / 2.0
    var = (
        na * nb / 12.0
        * ((nn + 1.0) - F.col("_ties").cast("double") / (nn * (nn - 1.0)))
    )
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0),
        (u - mu) / F.sqrt(var),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(u, 6).alias("u"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def bh_fdr(
    tests: DataFrame,
    test_col: str,
    p_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction over a battery of tests — the
    multiple-comparisons gate for metric dashboards and per-segment
    scans (20 segments at α=.05 expect one fake winner; BH bounds the
    FALSE-DISCOVERY RATE instead of nuking power like Bonferroni):

        reject all tests with rank ≤ k*,  k* = max{k : p_(k) ≤ k·α/m}

    Returns one row per test: (``test_col``, ``p_value``, ``rank``,
    ``bh_threshold``, ``reject``, ``q_value``) ordered by rank —
    q_value is the step-up adjusted p (monotone running min of
    p·m/rank from the largest rank down), the quantity to report.
    NULL p-values are excluded (they carry no evidence and would
    corrupt m).

    Scale shape: one ordered window over the TEST battery (m rows — a
    dashboard, not a corpus; the corpus-sized work happened inside
    each upstream test). Ties in p break by test name so the ranking
    is engine-deterministic.
    """
    from pyspark.sql import Window

    t = tests.filter(F.col(p_col).isNotNull()).select(
        F.col(test_col).alias("_t"), F.col(p_col).alias("_p")
    )
    wo = Window.orderBy("_p", "_t")
    m = Window.partitionBy()
    ranked = t.select(
        "_t",
        "_p",
        F.row_number().over(wo).alias("rank"),
        F.count(F.lit(1)).over(m).alias("_m"),
    )
    thr = F.col("rank") * alpha / F.col("_m")
    # k* = max rank whose p ≤ threshold; reject everything at rank ≤ k*
    kstar = F.max(F.when(F.col("_p") <= thr, F.col("rank")).otherwise(0)).over(m)
    qraw = F.col("_p") * F.col("_m") / F.col("rank")
    qmin = F.min(qraw).over(
        Window.orderBy(F.desc("rank")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return ranked.select(
        F.col("_t").alias(test_col),
        F.round("_p", 6).alias("p_value"),
        "rank",
        F.round(thr, 6).alias("bh_threshold"),
        (F.col("rank") <= kstar).alias("reject"),
        F.round(F.least(F.lit(1.0), qmin), 6).alias("q_value"),
    ).orderBy("rank")


def mcnemar_test(
    df: DataFrame,
    before_col: str,
    after_col: str,
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes (same units before and
    after a change): only the discordant cells carry information —
    b = 1→0 flips, c = 0→1 flips, χ² = (b−c)²/(b+c), 1 dof — the
    correct readout for launch-to-same-users rollouts where a
    two-sample test double-counts the stable population. Normal
    p-value from z = (c−b)/√(b+c) via the shared A&S polynomial; no
    continuity correction (documented, keeps engines identical).

    Returns ONE row: (``n``, ``n_00``, ``n_01``, ``n_10``, ``n_11``,
    ``chi2``, ``p_value``), rounded to 6; inference NULL when b+c = 0
    (no flips — nothing to test).

    Scale shape: one 4-cell aggregate over the paired-unit frame, then
    scalar arithmetic. One scan.
    """
    b = F.col(before_col).cast("int")
    a = F.col(after_col).cast("int")
    agg = df.filter(b.isin([0, 1]) & a.isin([0, 1])).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((1 - b) * (1 - a))).alias("n_00"),
        F.sum(((1 - b) * a)).alias("n_01"),
        F.sum((b * (1 - a))).alias("n_10"),
        F.sum((b * a)).alias("n_11"),
    )
    disc = (F.col("n_01") + F.col("n_10")).cast("double")
    z = F.when(
        disc > 0,
        (F.col("n_01") - F.col("n_10")).cast("double") / F.sqrt(disc),
    )
    return agg.select(
        "n",
        "n_00",
        "n_01",
        "n_10",
        "n_11",
        F.round(F.when(disc > 0, z * z), 6).alias("chi2"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def paired_t_test(
    df: DataFrame,
    before_col: str,
    after_col: str,
) -> DataFrame:
    """Paired t-test on continuous before/after metrics (same units) —
    the within-subject companion to :func:`mcnemar_test`: testing the
    per-unit DIFFERENCES removes all between-unit variance, which is
    why paired designs need far fewer units than two-sample ones.

        d_i = after_i − before_i,   t = mean(d) / (sd(d)/√n)

    Normal-approximation p (shared A&S polynomial; accurate in the
    n ≫ 30 regime, stated). Returns ONE row: (``n``, ``mean_before``,
    ``mean_after``, ``mean_diff``, ``t``, ``p_value``) rounded to 6 —
    inference NULL when n < 2 or the differences are constant.

    Determinism: difference sums and squares accumulate in
    DECIMAL(38,8); only the final scalar fold is float. One scan.
    """
    # (17,4) operands: d is (18,4), so d*d = (37,8) — exact under
    # Spark's 38-digit cap ((20,4)^2 would lose scale to the adjuster).
    d = (
        F.col(after_col).try_cast("decimal(17,4)")
        - F.col(before_col).try_cast("decimal(17,4)")
    )
    agg = df.filter(
        F.col(before_col).isNotNull() & F.col(after_col).isNotNull()
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(before_col).try_cast("decimal(38,8)")).cast("double").alias("_sb"),
        F.sum(F.col(after_col).try_cast("decimal(38,8)")).cast("double").alias("_sa"),
        F.sum(d.cast("decimal(38,8)")).cast("double").alias("_sd"),
        F.sum((d * d).cast("decimal(38,8)")).cast("double").alias("_sdd"),
    )
    nn = F.col("n").cast("double")
    md = F.col("_sd") / nn
    var = (F.col("_sdd") - nn * md * md) / (nn - 1.0)
    t = F.when((F.col("n") >= 2) & (var > 0), md / F.sqrt(var / nn))
    return agg.select(
        "n",
        F.round(F.col("_sb") / nn, 6).alias("mean_before"),
        F.round(F.col("_sa") / nn, 6).alias("mean_after"),
        F.round(md, 6).alias("mean_diff"),
        F.round(t, 6).alias("t"),
        F.round(two_sided_p(t), 6).alias("p_value"),
    )


def msprt_test(
    df: DataFrame,
    ts_col: str,
    arm_col: str,
    value_col: str,
    tau: float = 0.5,
    sigma2: float | None = None,
) -> DataFrame:
    """Mixture Sequential Probability Ratio Test (mSPRT — Johari, Koomen,
    Pekelis & Walsh, KDD 2017 "Peeking at A/B tests"): the always-valid
    p-value that stays correct no matter how often the dashboard is
    refreshed mid-experiment — the fixed-n tests above (two_proportion /
    welch) inflate false positives badly under continuous monitoring.

    Two-sample normal mixture form, day-granular monitoring: with
    cumulative arm means x̄_a, x̄_b through day d, Y = x̄_b − x̄_a,
    V = σ²(1/n_a + 1/n_b), and mixture variance τ²:

        ln Λ_d = ½·ln(V/(V+τ²)) + Y²τ² / (2·V·(V+τ²))
        p_d    = min(1, exp(−max_{k≤d} ln Λ_k))      (non-increasing)

    σ² defaults to the pooled population variance of ``value_col`` over
    the whole frame (a documented plug-in; pass a known ``sigma2`` for
    the textbook known-variance form). Returns one row per day:
    (``day``, ``n_a``, ``n_b``, ``mean_diff``, ``log_lr``,
    ``p_always_valid``), rounded to 6, ordered by day; inference NULL
    until both arms have data.

    Determinism: daily sums accumulate in DECIMAL(38,8) and the
    cumulative window sums stay DECIMAL (exact, association-free); ln Λ
    is rounded to 9 dp before the running max so the one libm-dependent
    step (exp) sees identical inputs in both engines.

    Scale shape: one (day, arm) aggregate over the corpus; everything
    after runs on the day series (a window over #days rows — monitoring
    granularity, not row granularity).
    """
    from pyspark.sql import Window

    arm = F.col(arm_col)
    dec = F.col(value_col).try_cast("decimal(19,4)").cast("decimal(38,8)")
    daily = (
        df.filter(arm.isin([0, 1]))
        .groupBy(F.to_date(ts_col).alias("day"))
        .agg(
            F.count(F.when(arm == 0, F.lit(1))).alias("_na"),
            F.count(F.when(arm == 1, F.lit(1))).alias("_nb"),
            F.sum(F.when(arm == 0, dec)).alias("_sa"),
            F.sum(F.when(arm == 1, dec)).alias("_sb"),
        )
    )
    if sigma2 is None:
        # (17,4)^2 = (35,8) stays under Spark's 38-digit cap, so the
        # square is EXACT; (19,4)^2 would be adjusted to (38,7),
        # truncating the 8th decimal digit the DuckDB oracle's native
        # DECIMAL(38,8) product keeps (e.g. 0.0003^2 = 9e-8).
        dd = F.col(value_col).try_cast("decimal(17,4)")
        stats = df.filter(arm.isin([0, 1])).agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dd.cast("decimal(38,8)")).cast("double").alias("_s"),
            F.sum((dd * dd).cast("decimal(38,8)")).cast("double").alias("_ss"),
        )
        # round INSIDE Spark (HALF_UP, same as SQL ROUND) — Python's
        # banker's round() could diverge from the oracle at a boundary
        r = stats.select(
            F.when(
                F.col("_n") > 1,
                F.round(
                    (
                        F.col("_ss")
                        - F.col("_n") * (F.col("_s") / F.col("_n")) * (F.col("_s") / F.col("_n"))
                    )
                    / (F.col("_n") - 1.0),
                    9,
                ),
            ).alias("_s2")
        ).collect()[0]
        sigma2 = float(r["_s2"]) if r["_s2"] is not None else 1.0
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    zero = F.lit(0).cast("decimal(38,8)")
    cum = daily.select(
        "day",
        F.sum("_na").over(w).alias("n_a"),
        F.sum("_nb").over(w).alias("n_b"),
        F.sum(F.coalesce("_sa", zero)).over(w).alias("_csa"),
        F.sum(F.coalesce("_sb", zero)).over(w).alias("_csb"),
    )
    tau2 = float(tau) * float(tau)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    y = F.col("_csb").cast("double") / nb - F.col("_csa").cast("double") / na
    v = F.lit(float(sigma2)) * (1.0 / na + 1.0 / nb)
    log_lr = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (v > 0),
        F.round(
            0.5 * F.log(v / (v + F.lit(tau2)))
            + y * y * F.lit(tau2) / (2.0 * v * (v + F.lit(tau2))),
            9,
        ),
    )
    scored = cum.select(
        "day",
        "n_a",
        "n_b",
        F.round(F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), y), 6).alias(
            "mean_diff"
        ),
        log_lr.alias("_llr"),
    )
    wmax = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return scored.select(
        "day",
        "n_a",
        "n_b",
        "mean_diff",
        F.round("_llr", 6).alias("log_lr"),
        F.round(
            F.when(
                F.col("_llr").isNotNull(),
                F.least(F.lit(1.0), F.exp(-F.max("_llr").over(wmax))),
            ),
            6,
        ).alias("p_always_valid"),
    ).orderBy("day")


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Kruskal-Wallis one-way rank ANOVA (Kruskal & Wallis 1952) — the
    k-group generalization of mann_whitney_u: are the value
    distributions of k segments shifted relative to each other, with no
    normality assumption. Returns ONE row: (``n``, ``k``, ``h``,
    ``h_tied``, ``dof``) — H, the tie-corrected H' (divide by
    1 − Σ(t³−t)/(N³−N)), and dof = k−1; compare H' against a χ²_{k−1}
    table (the statistic-only convention of chi_squared — no igamma
    dependency). h_tied NULL when the tie divisor is 0 (all values
    equal).

    Determinism: mann_whitney_u's distinct-value skeleton — ONE
    map-side-combined (value, group) count aggregate, one ordered
    window for average ranks (exact .5-grid), exact BIGINT tie
    spectrum; the k per-group terms R²/n are 9-dp-pinned and
    DECIMAL-summed so the k-row fold is partition-order-free.

    Scale shape: one corpus-sized aggregate; everything after runs on
    |distinct values| and k rows.
    """
    from valentinus_spark.operators._distrank import running_totals

    per = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"), F.col(group_col).alias("_g"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    tot = per.groupBy("_v").agg(F.sum("_c").alias("_t"))
    # ranked_vals feeds the rank join AND the tie spectrum — checkpoint
    # so the corpus aggregate + the distributed rank pass run once
    # (|distinct values| rows); prefix counts come from the two-phase
    # device, not a single-partition window
    ranked_vals = running_totals(tot, ["_v"], ["_t"]).select(
        "_v",
        "_t",
        (F.col("_run_t") - F.col("_t")).alias("_before"),
    ).localCheckpoint()
    avg_rank = F.col("_before") + (F.col("_t") + 1) / 2.0
    joined = per.join(ranked_vals, "_v").select(
        "_g", "_c", (F.col("_c") * avg_rank).alias("_r")
    )
    groups = joined.groupBy("_g").agg(
        F.sum("_c").alias("_ng"), F.sum("_r").alias("_rg")
    )
    gagg = groups.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_ng").alias("n"),
        F.sum(
            F.round(
                F.col("_rg") * F.col("_rg") / F.col("_ng").cast("double"), 9
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("_s"),
    )
    ties = ranked_vals.agg(
        F.coalesce(
            F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")),
            F.lit(0),
        ).alias("_ties")
    )
    j = gagg.crossJoin(ties)
    nn = F.col("n").cast("double")
    h = 12.0 / (nn * (nn + 1.0)) * F.col("_s") - 3.0 * (nn + 1.0)
    # n = 1 makes the tie divisor n^3 - n an exact 0 (ANSI divide-by-
    # zero, property-layer find); the degenerate single-observation
    # test reports NULL h_tied like the all-values-tie case
    div = F.when(
        nn * nn * nn - nn > 0,
        1.0 - F.col("_ties").cast("double") / (nn * nn * nn - nn),
    )
    return j.select(
        "n",
        "k",
        F.round(h, 6).alias("h"),
        F.round(F.when(div > 0, h / div), 6).alias("h_tied"),
        (F.col("k") - 1).alias("dof"),
    )


def cochran_q(
    df: DataFrame,
    subject_col: str,
    treatment_col: str,
) -> DataFrame:
    """Cochran's Q test (Cochran 1950) over a binary subject × treatment
    incidence matrix: do the k treatments (event types, feature flags,
    labeling passes) differ in their per-subject hit rate, paired
    within subject — the k-treatment generalization of McNemar. A
    subject "hits" a treatment when at least one (subject, treatment)
    row exists; subjects with no rows at all are (necessarily) absent.

        Q = k(k−1) Σ_j (C_j − N/k)² / (k·ΣR_i − ΣR_i²)

    with C_j the treatment totals, R_i the subject totals, N = ΣR_i.
    Returns ONE row: (``n_subjects``, ``k``, ``q``, ``dof``) — Q
    compared against χ²_{k−1}; NULL q when the denominator is 0 (every
    subject hit all or none of the treatments — no discordance).

    Determinism: everything except the final division is exact BIGINT
    counting (the k numerator terms are 9-dp-pinned and DECIMAL-summed).
    Scale shape: one (subject, treatment) distinct aggregate — map-side
    combined — then subject-sized and k-sized folds.
    """
    # the incidence frame feeds three consumers (k, column totals, row
    # totals) — localCheckpoint so the corpus-sized DISTINCT runs once;
    # inc is subjects × treatments at most
    inc = (
        df.filter(
            F.col(subject_col).isNotNull() & F.col(treatment_col).isNotNull()
        )
        .select(
            F.col(subject_col).alias("_s"), F.col(treatment_col).alias("_t")
        )
        .distinct()
        .localCheckpoint()
    )
    k_df = inc.select("_t").distinct().agg(F.count(F.lit(1)).alias("k"))
    cols = inc.groupBy("_t").agg(F.count(F.lit(1)).alias("_cj"))
    rows = inc.groupBy("_s").agg(F.count(F.lit(1)).alias("_ri"))
    row_agg = rows.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("_ri").alias("_sr"),
        F.sum(F.col("_ri") * F.col("_ri")).alias("_sr2"),
    )
    j0 = k_df.crossJoin(row_agg)
    num = (
        cols.crossJoin(F.broadcast(j0))
        .select(
            F.round(
                (
                    F.col("_cj").cast("double")
                    - F.col("_sr").cast("double") / F.col("k").cast("double")
                )
                * (
                    F.col("_cj").cast("double")
                    - F.col("_sr").cast("double") / F.col("k").cast("double")
                ),
                9,
            )
            .cast("decimal(38,9)")
            .alias("_term")
        )
        .agg(F.sum("_term").cast("double").alias("_num"))
    )
    j = j0.crossJoin(num)
    kk = F.col("k").cast("double")
    denom = kk * F.col("_sr").cast("double") - F.col("_sr2").cast("double")
    q = F.when(
        denom > 0, kk * (kk - 1.0) * F.col("_num") / denom
    )
    return j.select(
        "n_subjects",
        "k",
        F.round(q, 6).alias("q"),
        (F.col("k") - 1).alias("dof"),
    )


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_order: list | None = None,
) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test (Jonckheere
    1954; Terpstra 1952): when the k groups carry a natural ORDER
    (priority tiers, dose levels, seniority bands), JT tests for a
    monotone shift ACROSS that order — strictly more powerful there
    than Kruskal-Wallis, which ignores the ordering.

        J = Σ_{g<h ordered} [ #{x_g < x_h} + ½·#{x_g = x_h} ]
        E[J] = (N² − Σ n_g²)/4
        Var  = [N²(2N+3) − Σ n_g²(2n_g+3)]/72   (no-tie form, stated)

    ``group_order`` lists the groups smallest-first; None orders them
    by their natural sort. Returns ONE row: (``n``, ``k``, ``j_stat``,
    ``mean_j``, ``z``, ``p_value``) — j_stat exact on the ½ grid, z/p
    NULL when Var = 0 (fewer than two non-empty groups).

    Determinism: pair counts come from per-group distinct-value count
    tables with windowed cumulative counts — exact integers plus a ½
    grid, no per-row rank shuffle; z/p are the one final float formula
    (A&S Φ polynomial, engine-portable).

    Scale shape: one corpus-sized (group, value) count aggregate; the
    cumulative window and the ordered-pair join run on
    |distinct values| × k rows (corpus-summary-sized).
    """
    from functools import reduce as _reduce

    from pyspark.sql import Window

    per = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"), F.col(group_col).alias("_g"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    if group_order is not None:
        rank_expr = None
        for i, g in enumerate(group_order):
            rank_expr = (
                F.when(F.col("_g") == F.lit(g), F.lit(i))
                if rank_expr is None
                else rank_expr.when(F.col("_g") == F.lit(g), F.lit(i))
            )
        per = per.withColumn("_go", rank_expr).filter(F.col("_go").isNotNull())
    else:
        ranks = (
            per.select("_g")
            .distinct()
            .withColumn(
                "_go",
                F.row_number().over(Window.orderBy("_g")) - 1,
            )
        )
        per = per.join(F.broadcast(ranks), "_g")
    # dense (group, value) spine so cumulative-below counts exist for
    # every value any group carries
    vals = per.select("_v").distinct()
    grps = per.select("_g", "_go").distinct()
    spine = vals.crossJoin(F.broadcast(grps))
    dense = spine.join(per, ["_g", "_go", "_v"], "left").select(
        "_g",
        "_go",
        "_v",
        F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
    )
    w = Window.partitionBy("_g").orderBy("_v")
    cum = dense.select(
        "_g",
        "_go",
        "_v",
        "_c",
        (F.sum("_c").over(w) - F.col("_c")).alias("_below"),
    ).localCheckpoint()
    lo = cum.select(
        F.col("_go").alias("_oa"),
        F.col("_v").alias("_va"),
        F.col("_c").alias("_ca"),
        F.col("_below").alias("_belowa"),
    )
    hi = cum.select(
        F.col("_go").alias("_ob"),
        F.col("_v").alias("_vb"),
        F.col("_c").alias("_cb"),
    )
    j_agg = (
        hi.join(lo, (F.col("_oa") < F.col("_ob")) & (F.col("_va") == F.col("_vb")))
        .agg(
            F.sum(
                F.col("_cb").cast("double")
                * (
                    F.col("_belowa").cast("double")
                    + 0.5 * F.col("_ca").cast("double")
                )
            ).alias("_j")
        )
        .select(F.coalesce("_j", F.lit(0.0)).alias("j_stat"))
    )
    gstats = cum.groupBy("_g").agg(F.sum("_c").alias("_ng"))
    moments = gstats.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_ng").alias("n"),
        F.sum(F.col("_ng") * F.col("_ng")).alias("_sn2"),
        F.sum(
            F.col("_ng") * F.col("_ng") * (2 * F.col("_ng") + 3)
        ).alias("_sn23"),
    )
    j = moments.crossJoin(j_agg)
    nn = F.col("n").cast("double")
    mean_j = (nn * nn - F.col("_sn2").cast("double")) / 4.0
    var_j = (
        nn * nn * (2.0 * nn + 3.0) - F.col("_sn23").cast("double")
    ) / 72.0
    z = F.when(var_j > 0, (F.col("j_stat") - mean_j) / F.sqrt(var_j))
    return j.select(
        "n",
        "k",
        F.round("j_stat", 6).alias("j_stat"),
        F.round(mean_j, 6).alias("mean_j"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    before_col: str,
    after_col: str,
) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) on paired
    before/after values — the non-parametric companion to
    paired_t_test (completes the grid: mann_whitney_u for independent
    pairs, kruskal_wallis for k groups, jonckheere_terpstra for
    ordered groups, this for within-subject pairs). Zero differences
    drop (the standard convention); |d| ranks use average ranks; the
    normal approximation carries the tie correction:

        W⁺ = Σ ranks of positive d,   E[W⁺] = n(n+1)/4
        Var = n(n+1)(2n+1)/24 − Σ(t³−t)/48

    Returns ONE row: (``n_pairs``, ``n_nonzero``, ``w_plus``,
    ``w_minus``, ``z``, ``p_value``) — W on the exact ½ grid, z/p NULL
    when Var = 0 (all |d| tie into one group of everything).

    Determinism: differences are computed on DECIMAL(17,4) operands
    (exact), |d| grouping and the rank window run on the decimal grid
    (mann_whitney_u's distinct-value skeleton — exact ½-grid rank
    sums, BIGINT tie spectrum), and only the final z/Φ is float.

    Scale shape: one unit-keyed scan to differences, one
    map-side-combined |d| count aggregate, one ordered window over
    |distinct |d|| rows.
    """
    from valentinus_spark.operators._distrank import running_totals

    d = (
        F.col(after_col).try_cast("decimal(17,4)")
        - F.col(before_col).try_cast("decimal(17,4)")
    )
    diffs = df.filter(
        F.col(before_col).isNotNull() & F.col(after_col).isNotNull()
    ).select(d.alias("_d"))
    n_pairs = diffs.agg(F.count(F.lit(1)).alias("n_pairs"))
    nz = diffs.filter(F.col("_d") != 0).select(
        F.abs(F.col("_d")).alias("_a"),
        F.when(F.col("_d") > 0, 1).otherwise(0).alias("_pos"),
    )
    per = nz.groupBy("_a").agg(
        F.count(F.lit(1)).alias("_t"), F.sum("_pos").alias("_np")
    )
    # rank prefix counts via the two-phase distributed device (no
    # single-partition window over the distinct-|d| table)
    ranked = running_totals(per, ["_a"], ["_t"]).select(
        "_t",
        "_np",
        (F.col("_run_t") - F.col("_t")).alias("_before"),
    )
    avg_rank = F.col("_before") + (F.col("_t") + 1) / 2.0
    agg = ranked.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).alias("n_nonzero"),
        F.coalesce(F.sum(F.col("_np") * avg_rank), F.lit(0.0)).alias("w_plus"),
        F.coalesce(
            F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")),
            F.lit(0),
        ).alias("_ties"),
    )
    j = n_pairs.crossJoin(agg)
    nn = F.col("n_nonzero").cast("double")
    total = nn * (nn + 1.0) / 2.0
    mean_w = nn * (nn + 1.0) / 4.0
    var_w = (
        nn * (nn + 1.0) * (2.0 * nn + 1.0) / 24.0
        - F.col("_ties").cast("double") / 48.0
    )
    z = F.when(var_w > 0, (F.col("w_plus") - mean_w) / F.sqrt(var_w))
    return j.select(
        "n_pairs",
        "n_nonzero",
        F.round("w_plus", 6).alias("w_plus"),
        F.round(total - F.col("w_plus"), 6).alias("w_minus"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def levene_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Brown-Forsythe / Levene variance-equality test (Levene 1960;
    Brown & Forsythe 1974 median-centered form — the robust variant):
    one-way ANOVA F on the absolute deviations from each group's
    MEDIAN. The pre-flight for every equal-variance assumption (pooled
    t, ANOVA) and a drift detector for variance changes the mean tests
    miss. Returns ONE row: (``n``, ``k``, ``f_stat``, ``dof_between``,
    ``dof_within``) — the statistic-only convention (compare against
    F tables; no incomplete-beta dependency), f_stat NULL when any
    variance term degenerates (k < 2 or zero within-group spread).

    Determinism: group medians follow the repo's exact-median
    convention (floor-rank lower/upper middles of the 4-dp value grid);
    deviations are exact decimal differences; the ANOVA moments are
    9-dp-pinned DECIMAL sums.

    Scale shape: one (group, value) count aggregate drives the median
    (no per-row rank shuffle), one deviation scan, k-sized moment fold.
    """
    from pyspark.sql import Window

    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).try_cast("decimal(17,4)").alias("_v"),
    )
    per = vals.groupBy("_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    wg = Window.partitionBy("_g").orderBy("_v")
    cum = per.select(
        "_g",
        "_v",
        "_c",
        F.sum("_c").over(wg).alias("_cum"),
        F.sum("_c").over(Window.partitionBy("_g")).alias("_ng"),
    )
    # exact median on the value grid: lower middle = floor((n+1)/2),
    # upper middle = floor(n/2)+1 (the theil_sen convention) — the
    # value whose cumulative count covers each rank
    lo_rank = F.floor((F.col("_ng") + 1) / 2)
    hi_rank = F.floor(F.col("_ng") / 2) + 1
    med = (
        cum.select(
            "_g",
            F.min(
                F.when(F.col("_cum") >= lo_rank, F.col("_v"))
            ).over(Window.partitionBy("_g")).alias("_mlo"),
            F.min(
                F.when(F.col("_cum") >= hi_rank, F.col("_v"))
            ).over(Window.partitionBy("_g")).alias("_mhi"),
        )
        .groupBy("_g")
        .agg(
            (
                (F.max("_mlo") + F.max("_mhi")).cast("double") / 2.0
            ).alias("_med")
        )
    )
    dev = vals.join(F.broadcast(med), "_g").select(
        "_g",
        F.round(
            F.abs(F.col("_v").cast("double") - F.col("_med")), 9
        ).alias("_z"),
    )
    # try_cast: deviations inherit the ingress domain (~1e13) and
    # can exceed this narrower grid; unrepresentable -> NULL
    zz = F.col("_z").try_cast("decimal(18,9)")
    gstats = dev.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_ng"),
        F.sum(zz).cast("double").alias("_s1"),
        F.sum((zz * zz).cast("decimal(38,18)")).cast("double").alias("_s2"),
    )
    tot = gstats.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_ng").alias("n"),
        F.sum(F.col("_s1").cast("decimal(38,9)")).cast("double").alias("_S"),
        F.sum(
            F.round(
                F.col("_s1") * F.col("_s1") / F.col("_ng").cast("double"), 9
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("_sb"),
        F.sum(F.col("_s2").cast("decimal(38,18)")).cast("double").alias("_ss"),
    )
    nn = F.col("n").cast("double")
    kk = F.col("k").cast("double")
    grand = F.col("_S") * F.col("_S") / nn
    ss_between = F.col("_sb") - grand
    ss_within = F.col("_ss") - F.col("_sb")
    f = F.when(
        (F.col("k") >= 2) & (ss_within > 0),
        (ss_between / (kk - 1.0)) / (ss_within / (nn - kk)),
    )
    return tot.select(
        "n",
        "k",
        F.round(f, 6).alias("f_stat"),
        (F.col("k") - 1).alias("dof_between"),
        (F.col("n") - F.col("k")).alias("dof_within"),
    )


def runs_test(
    df: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Wald-Wolfowitz runs test (1940) for randomness of a sequence
    around its median — "is this series trending/oscillating or
    i.i.d.?", the sequence-order companion to the location
    (mann_whitney_u) and spread (levene_test) drift tests, which are
    order-blind. Values are dichotomized against the exact grand
    median (values ON the median drop, the standard convention); a
    run is a maximal block of same-side values in ``order_col``
    order:

        E[R] = 1 + 2·n1·n2/n,
        Var  = 2·n1·n2·(2·n1·n2 − n) / (n²·(n−1)),  n = n1+n2

    Returns ONE row: (``n_above``, ``n_below``, ``runs``, ``z``,
    ``p_value``), z/p NULL when either side is empty (Var = 0).

    Determinism: the median follows the repo's exact-median
    convention (floor-rank middles on the DECIMAL(17,4) value grid);
    run counting is pure integer work on the ordered spine; only the
    final z/Φ is float.

    Scale shape: intended for BOUNDED sequences (a daily/hourly
    aggregate spine, not raw rows) — the run count is inherently
    sequential, so the ordered window runs on the small aggregated
    frame. One (value, count) aggregate drives the median without a
    per-row rank shuffle.
    """
    from pyspark.sql import Window

    from valentinus_spark.operators._distrank import running_totals

    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(
        F.col(order_col).alias("_o"),
        F.col(value_col).try_cast("decimal(17,4)").alias("_v"),
    )
    per = vals.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    # median rank sweep via the two-phase distributed device (no
    # single-partition window over the distinct-value table); the
    # sequential part of this test is only the RUN COUNT below, which
    # runs on the bounded ordered spine by design
    cum = running_totals(per, ["_v"], ["_c"], with_totals=True).select(
        "_v",
        F.col("_run_c").alias("_cum"),
        F.col("_tot_c").alias("_n"),
    )
    lo_rank = F.floor((F.col("_n") + 1) / 2)
    hi_rank = F.floor(F.col("_n") / 2) + 1
    med = cum.agg(
        (
            (
                F.min(F.when(F.col("_cum") >= lo_rank, F.col("_v")))
                + F.min(F.when(F.col("_cum") >= hi_rank, F.col("_v")))
            ).cast("double")
            / 2.0
        ).alias("_med")
    )
    signed = (
        vals.crossJoin(F.broadcast(med))
        .filter(F.col("_v").cast("double") != F.col("_med"))
        .select(
            "_o",
            F.when(F.col("_v").cast("double") > F.col("_med"), 1)
            .otherwise(0)
            .alias("_s"),
        )
    )
    wo = Window.orderBy("_o")
    runs = signed.select(
        "_s",
        F.when(
            F.lag("_s").over(wo).isNull()
            | (F.lag("_s").over(wo) != F.col("_s")),
            1,
        )
        .otherwise(0)
        .alias("_new_run"),
    )
    agg = runs.agg(
        F.coalesce(F.sum("_s"), F.lit(0)).alias("n_above"),
        F.coalesce(F.sum(1 - F.col("_s")), F.lit(0)).alias("n_below"),
        F.coalesce(F.sum("_new_run"), F.lit(0)).alias("runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    n = n1 + n2
    mean_r = 1.0 + 2.0 * n1 * n2 / n
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    )
    z = F.when(
        (F.col("n_above") > 0) & (F.col("n_below") > 0) & (var_r > 0),
        (F.col("runs").cast("double") - mean_r) / F.sqrt(var_r),
    )
    return agg.select(
        "n_above",
        "n_below",
        "runs",
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def sign_test(
    df: DataFrame,
    before_col: str,
    after_col: str,
) -> DataFrame:
    """Paired sign test — the assumption-free floor of the paired
    family (paired_t_test needs normality, wilcoxon_signed_rank needs
    symmetric differences; the sign test needs nothing but a sign).
    Zero differences drop (the standard convention); the normal
    approximation to Binomial(n, ½) gives

        z = (S⁺ − n/2) / sqrt(n/4)

    (no continuity correction — documented so the oracle replays the
    identical formula). Returns ONE row: (``n_pairs``, ``n_nonzero``,
    ``s_plus``, ``s_minus``, ``z``, ``p_value``); z/p NULL when every
    difference is zero.

    Determinism: differences are exact DECIMAL(17,4); everything up
    to z is integer counting.

    Scale shape: one conditional-count aggregate over the paired
    frame — a single map-side-combined scan, no shuffle beyond the
    one-row agg.
    """
    d = (
        F.col(after_col).try_cast("decimal(17,4)")
        - F.col(before_col).try_cast("decimal(17,4)")
    )
    diffs = df.filter(
        F.col(before_col).isNotNull() & F.col(after_col).isNotNull()
    ).select(d.alias("_d"))
    agg = diffs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("_d") > 0, 1).otherwise(0)), F.lit(0)
        ).alias("s_plus"),
        F.coalesce(
            F.sum(F.when(F.col("_d") < 0, 1).otherwise(0)), F.lit(0)
        ).alias("s_minus"),
    )
    nn = (F.col("s_plus") + F.col("s_minus")).cast("double")
    z = F.when(
        nn > 0,
        (F.col("s_plus").cast("double") - nn / 2.0) / F.sqrt(nn / 4.0),
    )
    return agg.select(
        "n_pairs",
        (F.col("s_plus") + F.col("s_minus")).alias("n_nonzero"),
        "s_plus",
        "s_minus",
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def moods_median_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Mood's median test — k-group location test on the 2×k
    above/below-the-grand-median contingency table. The blunt,
    outlier-immune sibling of kruskal_wallis (only the side of the
    median matters, not the rank), useful when heavy tails make even
    rank statistics unstable. Values ON the grand median drop (the
    convention that keeps the table exactly 2×k). Pearson χ² on the
    table:

        χ² = Σ_cells (O − E)² / E,   E = row_total·col_total / n

    Returns ONE row: (``n``, ``k``, ``chi2``, ``dof``); chi2 NULL
    when any group margin or side margin is empty (some E = 0).

    Determinism: the grand median follows the repo's exact-median
    convention on the DECIMAL(17,4) grid; O/E come from BIGINT
    margins; each cell's χ² term is rounded to 12 dp and summed as
    DECIMAL so group iteration order cannot wiggle the total.

    Scale shape: one (value, count) aggregate for the median, one
    (group → above/below counts) aggregate, k-row fold. Two scans,
    both map-side combined.
    """
    from pyspark.sql import Window

    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(value_col).try_cast("decimal(17,4)").alias("_v"),
    )
    per = vals.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    # grand-median rank sweep via the two-phase distributed device (no
    # single-partition window over the distinct-value table); the wt
    # window below runs on the k-group contingency table, not data
    from valentinus_spark.operators._distrank import running_totals

    cum = running_totals(per, ["_v"], ["_c"], with_totals=True).select(
        "_v",
        F.col("_run_c").alias("_cum"),
        F.col("_tot_c").alias("_n"),
    )
    lo_rank = F.floor((F.col("_n") + 1) / 2)
    hi_rank = F.floor(F.col("_n") / 2) + 1
    med = cum.agg(
        (
            (
                F.min(F.when(F.col("_cum") >= lo_rank, F.col("_v")))
                + F.min(F.when(F.col("_cum") >= hi_rank, F.col("_v")))
            ).cast("double")
            / 2.0
        ).alias("_med")
    )
    tbl = (
        vals.crossJoin(F.broadcast(med))
        .filter(F.col("_v").cast("double") != F.col("_med"))
        .groupBy("_g")
        .agg(
            F.sum(
                F.when(F.col("_v").cast("double") > F.col("_med"), 1).otherwise(0)
            ).alias("_a"),
            F.sum(
                F.when(F.col("_v").cast("double") < F.col("_med"), 1).otherwise(0)
            ).alias("_b"),
        )
    )
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells = tbl.select(
        "_g",
        "_a",
        "_b",
        F.sum("_a").over(wt).alias("_ta"),
        F.sum("_b").over(wt).alias("_tb"),
        (F.sum("_a").over(wt) + F.sum("_b").over(wt)).alias("_nn"),
    )
    ea = (
        (F.col("_a") + F.col("_b")).cast("double")
        * F.col("_ta").cast("double")
        / F.col("_nn").cast("double")
    )
    eb = (
        (F.col("_a") + F.col("_b")).cast("double")
        * F.col("_tb").cast("double")
        / F.col("_nn").cast("double")
    )
    term = F.round(
        (F.col("_a").cast("double") - ea) * (F.col("_a").cast("double") - ea) / ea
        + (F.col("_b").cast("double") - eb) * (F.col("_b").cast("double") - eb) / eb,
        12,
    ).cast("decimal(28,12)")
    ok = (
        (F.col("_ta") > 0)
        & (F.col("_tb") > 0)
        & ((F.col("_a") + F.col("_b")) > 0)
    )
    agg = cells.agg(
        F.coalesce(F.sum(F.col("_a") + F.col("_b")), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.min(F.when(ok, 1).otherwise(0)).alias("_ok"),
        F.sum(F.when(ok, term)).cast("double").alias("_chi2"),
    )
    return agg.select(
        "n",
        "k",
        F.round(
            F.when((F.col("_ok") == 1) & (F.col("k") >= 2), F.col("_chi2")), 6
        ).alias("chi2"),
        (F.col("k") - 1).alias("dof"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman test (1937) — the within-block k-treatment rank test:
    kruskal_wallis controls for nothing, paired tests handle k = 2;
    Friedman ranks the k treatments INSIDE each block (subject) and
    asks whether the rank totals diverge. Blocks missing any
    treatment drop (listwise, the cronbach_alpha convention). The
    tie-corrected general form (reduces to the textbook 1937
    statistic when ranks are untied):

        χ² = (k−1)·[Σ_j R_j² − n²k(k+1)²/4] / [Σ_ij r_ij² − nk(k+1)²/4]

    Returns ONE row: (``n_blocks``, ``k``, ``chi2``, ``dof``); chi2
    NULL when no complete blocks, k < 2, or every block ranks all
    treatments identically (denominator 0).

    Determinism: within-block average ranks live on the exact ½ grid
    (DECIMAL(12,1)); R_j sums, rank squares (DECIMAL exact), and all
    margins are exact; only the final ratio is float.

    Scale shape: one (block, value)-grouped rank window partitioned
    BY BLOCK (parallel across blocks, k rows each), one treatment agg,
    k-row fold. No global ordering anywhere.
    """
    from pyspark.sql import Window

    vals = df.filter(
        F.col(value_col).isNotNull()
        & F.col(block_col).isNotNull()
        & F.col(treatment_col).isNotNull()
    ).select(
        F.col(block_col).alias("_b"),
        F.col(treatment_col).alias("_t"),
        F.col(value_col).try_cast("decimal(17,4)").alias("_v"),
    )
    k_total = vals.select("_t").distinct().count()
    sizes = vals.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_nb"),
        F.countDistinct("_t").alias("_kt"),
    )
    complete = sizes.filter(
        (F.col("_kt") == F.lit(k_total)) & (F.col("_nb") == F.lit(k_total))
    ).select("_b")
    rows = vals.join(complete, "_b")
    wb = Window.partitionBy("_b").orderBy("_v")
    # average rank on the exact ½ grid: (2·(rank-1) + t + 1)/2 where
    # rank is the first position of the tie group and t its size
    ranked = rows.select(
        "_b",
        "_t",
        (
            (
                (F.rank().over(wb) * 2 + F.count(F.lit(1)).over(
                    Window.partitionBy("_b", "_v")
                ) - 1).cast("decimal(12,1)")
            )
            / 2
        ).alias("_r"),
    )
    per_t = ranked.groupBy("_t").agg(
        F.sum("_r").cast("decimal(38,1)").alias("_rj"),
        F.sum((F.col("_r") * F.col("_r")).cast("decimal(24,2)")).alias("_rsq"),
        F.count(F.lit(1)).alias("_nj"),
    )
    agg = per_t.agg(
        F.count(F.lit(1)).alias("k"),
        F.coalesce(F.min("_nj"), F.lit(0)).alias("n_blocks"),
        F.sum(
            (F.col("_rj") * F.col("_rj")).cast("decimal(38,2)")
        ).cast("double").alias("_sum_rj2"),
        F.sum(F.col("_rsq")).cast("double").alias("_sum_r2"),
    )
    nn = F.col("n_blocks").cast("double")
    kk = F.col("k").cast("double")
    num = (kk - 1.0) * (
        F.col("_sum_rj2") - nn * nn * kk * (kk + 1.0) * (kk + 1.0) / 4.0
    )
    den = F.col("_sum_r2") - nn * kk * (kk + 1.0) * (kk + 1.0) / 4.0
    chi2 = F.when((F.col("n_blocks") > 0) & (F.col("k") >= 2) & (den > 0), num / den)
    return agg.select(
        "n_blocks",
        "k",
        F.round(chi2, 6).alias("chi2"),
        (F.col("k") - 1).alias("dof"),
    )


def page_trend_test(
    df: DataFrame,
    block_col: str,
    treatment_rank_col: str,
    value_col: str,
) -> DataFrame:
    """Page's trend test (1963) — the ORDERED-alternatives member of
    the within-block family: friedman_test asks "do the k treatments
    differ at all"; Page asks "do they increase in THIS hypothesized
    order" (``treatment_rank_col`` = 1..k), which buys real power when
    the direction is known (dose levels, priority tiers, model sizes):

        L = Σ_j j·R_j,   E[L] = n·k·(k+1)²/4,
        Var = n·k²·(k+1)·(k²−1)/144

    Within-block average ranks and listwise-complete blocks follow the
    friedman_test conventions exactly (same rank grid — the two
    statistics are computed from the same matrix). The classical
    no-tie variance is used (the standard practice; ties make z
    slightly conservative — documented, deterministic). Returns ONE
    row: (``n_blocks``, ``k``, ``l_stat``, ``z``, ``p_value``); z/p
    NULL when no complete blocks or k < 2.

    Scale shape: identical to friedman_test — per-block rank windows
    (parallel across blocks), one treatment fold, one-row combine.
    """
    from pyspark.sql import Window

    vals = df.filter(
        F.col(value_col).isNotNull()
        & F.col(block_col).isNotNull()
        & F.col(treatment_rank_col).isNotNull()
    ).select(
        F.col(block_col).alias("_b"),
        F.col(treatment_rank_col).cast("int").alias("_j"),
        F.col(value_col).try_cast("decimal(17,4)").alias("_v"),
    )
    k_total = vals.select("_j").distinct().count()
    sizes = vals.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_nb"),
        F.countDistinct("_j").alias("_kt"),
    )
    complete = sizes.filter(
        (F.col("_kt") == F.lit(k_total)) & (F.col("_nb") == F.lit(k_total))
    ).select("_b")
    rows = vals.join(complete, "_b")
    wb = Window.partitionBy("_b").orderBy("_v")
    ranked = rows.select(
        "_b",
        "_j",
        (
            (
                (F.rank().over(wb) * 2 + F.count(F.lit(1)).over(
                    Window.partitionBy("_b", "_v")
                ) - 1).cast("decimal(12,1)")
            )
            / 2
        ).alias("_r"),
    )
    per_j = ranked.groupBy("_j").agg(
        F.sum("_r").cast("decimal(38,1)").alias("_rj"),
        F.count(F.lit(1)).alias("_nj"),
    )
    agg = per_j.agg(
        F.count(F.lit(1)).alias("k"),
        F.coalesce(F.min("_nj"), F.lit(0)).alias("n_blocks"),
        F.sum(
            (F.col("_j").cast("decimal(19,1)") * F.col("_rj")).cast(
                "decimal(38,1)"
            )
        ).cast("double").alias("_l"),
    )
    nn = F.col("n_blocks").cast("double")
    kk = F.col("k").cast("double")
    mean_l = nn * kk * (kk + 1.0) * (kk + 1.0) / 4.0
    var_l = nn * kk * kk * (kk + 1.0) * (kk * kk - 1.0) / 144.0
    z = F.when(
        (F.col("n_blocks") > 0) & (F.col("k") >= 2) & (var_l > 0),
        (F.col("_l") - mean_l) / F.sqrt(var_l),
    )
    return agg.select(
        "n_blocks",
        "k",
        F.round(F.col("_l"), 6).alias("l_stat"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    )


def simpsons_paradox_screen(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Simpson's-paradox screen: the Pearson correlation of (x, y)
    WITHIN each group next to the POOLED correlation, flagging sign
    reversals — the aggregation trap every per-segment metric readout
    should clear before anyone acts on the pooled number (a positive
    pooled trend built from all-negative segments is a composition
    artifact, not a finding).

    Returns one row per group: (``group_col``, ``n``, ``corr``,
    ``pooled_corr``, ``sign_reversed``) rounded to 6 — corr NULL when
    either variance is degenerate within the group, sign_reversed
    NULL when either correlation is NULL, true when the group's sign
    contradicts a non-zero pooled sign.

    Determinism: all five moment sums (Σx, Σy, Σxy, Σx², Σy²)
    accumulate as exact DECIMALs per group ((17,4) operands, (35,8)
    products — the msprt discipline); the pooled moments are exact
    sums OF the group moments; correlations are one pinned double
    formula each.

    Scale shape: ONE corpus-sized moment aggregate (map-side
    combined), a group-sized fold for the pooled row, broadcast join
    back. The corpus is scanned once.
    """
    base = df.filter(
        F.col(group_col).isNotNull()
        & F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(x_col).try_cast("decimal(17,4)").alias("_x"),
        F.col(y_col).try_cast("decimal(17,4)").alias("_y"),
    )
    p = lambda a, b: (a * b).cast("decimal(38,8)")  # noqa: E731
    g = base.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x").cast("decimal(38,8)")).alias("_sx"),
        F.sum(F.col("_y").cast("decimal(38,8)")).alias("_sy"),
        F.sum(p(F.col("_x"), F.col("_y"))).alias("_sxy"),
        F.sum(p(F.col("_x"), F.col("_x"))).alias("_sxx"),
        F.sum(p(F.col("_y"), F.col("_y"))).alias("_syy"),
    )

    def corr_of(n, sx, sy, sxy, sxx, syy):
        nn = n.cast("double")
        cov = sxy.cast("double") - sx.cast("double") * sy.cast("double") / nn
        vx = sxx.cast("double") - sx.cast("double") * sx.cast("double") / nn
        vy = syy.cast("double") - sy.cast("double") * sy.cast("double") / nn
        return F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))

    pooled = g.agg(
        F.sum("n").alias("pn"),
        F.sum("_sx").alias("px"),
        F.sum("_sy").alias("py"),
        F.sum("_sxy").alias("pxy"),
        F.sum("_sxx").alias("pxx"),
        F.sum("_syy").alias("pyy"),
    ).select(
        F.round(
            corr_of(
                F.col("pn"), F.col("px"), F.col("py"),
                F.col("pxy"), F.col("pxx"), F.col("pyy"),
            ),
            6,
        ).alias("pooled_corr")
    )
    out = g.select(
        "_g",
        "n",
        F.round(
            corr_of(
                F.col("n"), F.col("_sx"), F.col("_sy"),
                F.col("_sxy"), F.col("_sxx"), F.col("_syy"),
            ),
            6,
        ).alias("corr"),
    ).crossJoin(F.broadcast(pooled))
    reversed_ = F.when(
        F.col("corr").isNotNull() & F.col("pooled_corr").isNotNull(),
        (F.col("corr") * F.col("pooled_corr") < 0),
    )
    return out.select(
        F.col("_g").alias(group_col),
        "n",
        "corr",
        "pooled_corr",
        reversed_.alias("sign_reversed"),
    ).orderBy(group_col)
