"""Data-quality expectations: declarative validation over DataFrames.

The observability piece of a production pipeline: before a 100 TB corpus
feeds training, assert the invariants (non-null keys, value ranges,
uniqueness, referential integrity) and get a per-rule violation count —
the Great-Expectations / dbt-test shape, expressed as Spark aggregates.

Scale shapes:
- :func:`check_expectations` — ALL row-level rules in ONE scan: each
  rule compiles to a conditional-sum aggregate, so 20 rules cost the
  same single pass as one (no per-rule jobs). The result is rule-count
  rows, unpivoted JVM-side.
- :func:`uniqueness_violations` — one count-distinct aggregate (map-side
  partial) per key set.
- :func:`fk_violations` — anti-join child→parent on the key: broadcast
  when the parent is dimension-sized, shuffle-hash otherwise (AQE
  decides); returns orphaned-row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, checks: list[tuple[str, Column]]
) -> DataFrame:
    """Evaluate row-level expectations in a single scan.

    ``checks`` = [(rule_name, boolean Column that should hold per row)].
    Returns (check, n_violations) — rows where the predicate is FALSE or
    NULL count as violations (an unexpected NULL is a failure, not a
    pass; wrap with ``.isNull() | cond`` to allow NULLs explicitly)."""
    if not checks:
        raise ValueError("no checks given")
    aggs = [
        # coalesce the aggregate itself: an EMPTY table has 0 violations,
        # not NULL (empty-aggregate sums are NULL — property-layer find)
        F.coalesce(
            F.sum(
                F.when(
                    F.coalesce(cond.cast("boolean"), F.lit(False)), 0
                ).otherwise(1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias(name)
        for name, cond in checks
    ]
    wide = df.agg(*aggs)
    names = [name for name, _ in checks]
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) as (check, n_violations)"
    )


def uniqueness_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """(check, n_violations) where violations = rows beyond the first per
    key tuple (0 ⇔ the key set is unique)."""
    name = "unique(" + ",".join(key_cols) + ")"
    # struct wrapper: bare count_distinct(a, b) silently DROPS rows where
    # any key column is NULL (two (3, NULL) rows would pass as unique);
    # a struct is never NULL even when its fields are, so NULL keys
    # participate in uniqueness like any other value
    agg = df.agg(
        (
            F.count(F.lit(1))
            - F.count_distinct(F.struct(*[F.col(c) for c in key_cols]))
        )
        .cast("long")
        .alias("n_violations")
    )
    return agg.select(F.lit(name).alias("check"), "n_violations")


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """(check, n_violations): child rows whose key has no parent row
    (NULL child keys are orphans too — declare nullable FKs explicitly
    by filtering first)."""
    name = f"fk({child_key}->{parent_key})"
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="anti",
    )
    agg = orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    return agg.select(F.lit(name).alias("check"), "n_violations")


def validation_report(parts: list[DataFrame]) -> DataFrame:
    """Union per-family reports into one (check, n_violations) table."""
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Groups of quasi-identifier values shared by FEWER than ``k`` rows
    — the re-identification risk surface of a release (Sweeney 2002,
    k-anonymity). Returns (quasi cols…, group_size) for each violating
    combination. NULL quasi-values group together (standard groupBy
    semantics — a null birthdate is itself an identifying pattern).

    ONE shuffle keyed on the quasi-identifier columns, map-side
    combined; output is bounded by the number of rare combinations."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def k_anonymity_stats(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """One-row k-anonymity audit summary: total rows/groups, violating
    groups, rows at re-identification risk (members of groups smaller
    than ``k``), and the smallest group size (the dataset's actual
    anonymity level). Same single-shuffle group-count, then a 1-row
    aggregate — the release gate a privacy review reads."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("group_size"))
    return groups.agg(
        F.sum("group_size").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("group_size") < k, 1).otherwise(0)).alias(
            "violating_groups"
        ),
        F.sum(
            F.when(F.col("group_size") < k, F.col("group_size")).otherwise(0)
        ).alias("rows_at_risk"),
        F.min("group_size").alias("min_group_size"),
    )

def l_diversity_stats(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """One-row l-diversity audit (Machanavajjhala et al. 2007): a
    k-anonymous release still leaks when everyone in a quasi-identifier
    group shares the sensitive value — homogeneity attack — so each
    group must carry at least ``l`` DISTINCT sensitive values. Reports
    total rows/groups, groups below ``l`` distinct sensitive values,
    rows inside them, and the dataset's actual diversity level
    (min distinct per group).

    Plan: one shuffle to (quasi, sensitive) granularity with map-side
    combine, a second map-side-combinable rollup to quasi granularity,
    then a 1-row aggregate — group cardinality never reaches the
    driver, so it audits a 100 TB release the same as a test table."""
    per_value = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    groups = per_value.groupBy(*quasi_cols).agg(
        F.sum("_n").alias("group_size"),
        F.count(F.lit(1)).alias("n_sensitive"),
    )
    return groups.agg(
        F.sum("group_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n_sensitive") < l, 1).otherwise(0))
        .cast("long")
        .alias("violating_groups"),
        F.sum(
            F.when(F.col("n_sensitive") < l, F.col("group_size")).otherwise(0)
        )
        .cast("long")
        .alias("rows_at_risk"),
        F.min("n_sensitive").cast("long").alias("min_diversity"),
    )


def dp_group_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp-v1",
    clamp_nonneg: bool = True,
) -> DataFrame:
    """ε-differentially-private group counts via the two-sided geometric
    mechanism (Ghosh/Roughgarden/Sundararajan 2009 — the discrete,
    utility-optimal Laplace): ``dp_count = count + (G₁ − G₂)`` with
    ``G ~ Geom(1−e^(−ε))`` sampled by inversion, ``G = floor(ln(u)/−ε)``.
    The release-side counterpart of the k-anonymity/l-diversity audits:
    publish aggregate counts whose noise provably hides any single row.

    Noise uniforms derive from sha256(salt‖group key), which makes the
    release REPLAYABLE (same mechanism, same noise — the property every
    other seeded sampler in this repo has, and what lets the oracle
    verify the mechanism end-to-end). For a real privacy deployment the
    salt must be a SECRET: a public salt lets anyone recompute the noise
    (the ε accounting is per-release either way — this operator
    implements the mechanism; key management is the caller's).

    Output: (group_cols…, ``dp_count``), clamped at 0 by default
    (post-processing never degrades DP). One shuffle: the group count
    itself; noise is per-GROUP arithmetic on the aggregated table.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])

    def _geom(tag: str) -> Column:
        h32 = F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(f"{salt}:{tag}:"), key), 256), 1, 8
            ),
            16,
            10,
        ).cast("long")
        u = (h32 + F.lit(0.5)) / F.lit(4294967296.0)
        return F.floor(F.log(u) / F.lit(-epsilon)).cast("long")

    noisy = counts.withColumn("_dp", F.col("_n") + _geom("a") - _geom("b"))
    out = F.greatest(F.col("_dp"), F.lit(0)) if clamp_nonneg else F.col("_dp")
    return noisy.select(*group_cols, out.alias("dp_count"))


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the ``value_col``
    distributions of two groups — the standard "did this feed's
    distribution shift" gate, sharper than binned PSI because it needs
    no bin design:

        D = sup_x |F_a(x) − F_b(x)|
        p ≈ 2·exp(−2 D² n_a n_b / (n_a + n_b))   (asymptotic, 1-term)

    Returns ONE row: (``n_a``, ``n_b``, ``d_stat``, ``p_value``),
    rounded to 6. NULL D when either group is empty.

    Scale shape: the corpus first collapses to DISTINCT-VALUE counts
    per group (one map-side-combined aggregate — the only corpus-sized
    shuffle); the ECDF sweep is ONE ordered window over the distinct-
    value table, which is bounded by the value domain, not the row
    count. For unbounded continuous domains at extreme scale, quantize
    first (quantile_discretize) — the ordered sweep is inherent to
    exact KS. Cumulative counts are exact BIGINTs; floats appear only
    in the final |Fa−Fb| comparison.
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
    # ECDF running counts via the two-phase distributed device (no
    # single-partition window over the distinct-value table); the grand
    # totals ride the same broadcast offset join, replacing the former
    # crossJoin(broadcast(agg)) branch
    cum = running_totals(
        per_val, ["_v"], ["_ca", "_cb"], with_totals=True
    ).select(
        F.col("_run_ca").alias("_cuma"),
        F.col("_run_cb").alias("_cumb"),
        F.col("_tot_ca").alias("_na"),
        F.col("_tot_cb").alias("_nb"),
    )
    # guard INSIDE the max: with an empty group the ECDF division is
    # 0/0 and ANSI mode would raise before the outer NULL-gate ever
    # ran (hypothesis-found); both-groups-present rows are unchanged,
    # so the oracle stays in lockstep
    d = cum.agg(
        F.max(
            F.when(
                (F.col("_na") > 0) & (F.col("_nb") > 0),
                F.abs(
                    F.col("_cuma").cast("double") / F.col("_na")
                    - F.col("_cumb").cast("double") / F.col("_nb")
                ),
            )
        ).alias("_d"),
        # coalesce: with NO rows in either group the sums are NULL —
        # report 0 counts (hypothesis-found asymmetry vs the filter)
        F.coalesce(F.first("_na"), F.lit(0)).alias("n_a"),
        F.coalesce(F.first("_nb"), F.lit(0)).alias("n_b"),
    )
    nab = F.col("n_a").cast("double") * F.col("n_b") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    return d.select(
        "n_a",
        "n_b",
        F.round(F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("_d")), 6).alias(
            "d_stat"
        ),
        F.round(
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.least(
                    F.lit(1.0),
                    2.0 * F.exp(-2.0 * F.col("_d") * F.col("_d") * nab),
                ),
            ),
            6,
        ).alias("p_value"),
    )


def chi_squared(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-squared independence test between two categorical
    columns, plus Cramér's V effect size — the significance companion
    to evaluation.mutual_information (MI says how MUCH information is
    shared; χ² says whether the association beats sampling noise):

        χ² = Σ_cells (o − e)²/e  with e = n_a·n_b/n
           = n · (Σ_observed o²/(n_a·n_b) − 1)     ← zero-cells exact,
        V  = sqrt(χ² / (n · (min(|A|,|B|) − 1)))     no |A|×|B| expansion

    Returns ONE row: (``n``, ``dof``, ``chi2``, ``cramers_v``), rounded
    to 6; NULL V when either column is constant (dof factor 0).

    Scale shape: identical skeleton to mutual_information — one (a, b)
    joint-count aggregate, marginals derived from it, category-sized
    folds. The o=0 cells are folded algebraically (Σ_all o²/e − n), so
    the plan never materializes the full contingency rectangle.
    """
    pairs = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    joint = pairs.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_n"))
    ma = joint.groupBy("_a").agg(F.sum("_n").alias("_na"))
    mb = joint.groupBy("_b").agg(F.sum("_n").alias("_nb"))
    tot = joint.agg(F.sum("_n").alias("_tot"))
    ka = ma.agg(F.count(F.lit(1)).alias("_ka"))
    kb = mb.agg(F.count(F.lit(1)).alias("_kb"))
    terms = (
        joint.join(ma, "_a")
        .join(mb, "_b")
        .agg(
            F.sum(
                F.col("_n").cast("double") * F.col("_n")
                / (F.col("_na").cast("double") * F.col("_nb"))
            ).alias("_s")
        )
    )
    out = (
        tot.crossJoin(F.broadcast(terms))
        .crossJoin(F.broadcast(ka))
        .crossJoin(F.broadcast(kb))
    )
    chi2 = F.col("_tot") * (F.col("_s") - 1.0)
    mink = F.least(F.col("_ka"), F.col("_kb")) - 1
    return out.select(
        F.col("_tot").alias("n"),
        ((F.col("_ka") - 1) * (F.col("_kb") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.when(mink > 0, F.sqrt(F.greatest(chi2, F.lit(0.0)) / (F.col("_tot") * mink))),
            6,
        ).alias("cramers_v"),
    )


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between two
    groups' value distributions: W₁ = ∫|F_a(x) − F_b(x)| dx — the
    drift metric that, unlike KS's sup norm, weights HOW FAR the mass
    moved (a 1% tail excursion to 100× the median dominates W₁ but
    barely moves D). Pairs with psi_drift (binned) and ks_test (sup)
    as the exact-transport member of the drift panel.

    Returns ONE row: (``n_a``, ``n_b``, ``w1``) rounded to 6 — the sum
    of |F_a − F_b|·Δx over consecutive distinct values.

    Scale shape: same skeleton as ks_test — corpus collapses to
    distinct-value counts (one shuffle), then one ordered window over
    the distinct-value table (lead(x) supplies Δx). Exact integer
    cumulative counts; quantize unbounded domains first at extreme
    scale.
    """
    from valentinus_spark.operators._distrank import running_totals

    vals = df.filter(
        F.col(group_col).isin([group_a, group_b]) & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).cast("double").alias("_v"),
        F.when(F.col(group_col) == F.lit(group_a), 1).otherwise(0).alias("_ia"),
    )
    per_val = vals.groupBy("_v").agg(
        F.sum("_ia").alias("_ca"),
        F.sum(1 - F.col("_ia")).alias("_cb"),
    )
    # ECDF running counts + global lead (Δx) via the two-phase
    # distributed device — the lead is stitched across range-partition
    # boundaries from the offset table's per-partition minima, so no
    # single-partition window touches the distinct-value table
    cum = running_totals(
        per_val, ["_v"], ["_ca", "_cb"], with_totals=True, with_lead="_v"
    ).select(
        "_v",
        F.col("_run_ca").alias("_cuma"),
        F.col("_run_cb").alias("_cumb"),
        F.col("_lead_v").alias("_nx"),
        F.col("_tot_ca").alias("_na"),
        F.col("_tot_cb").alias("_nb"),
    )
    return (
        cum
        .agg(
            F.coalesce(F.first("_na"), F.lit(0)).alias("n_a"),
            F.coalesce(F.first("_nb"), F.lit(0)).alias("n_b"),
            # same empty-group guard as ks_test: the ECDF division must
            # sit under the (na, nb > 0) gate or ANSI mode raises 0/0
            # before the result could ever go NULL (hypothesis-found)
            F.sum(
                F.when(
                    F.col("_nx").isNotNull()
                    & (F.col("_na") > 0)
                    & (F.col("_nb") > 0),
                    F.abs(
                        F.col("_cuma").cast("double") / F.col("_na")
                        - F.col("_cumb").cast("double") / F.col("_nb")
                    )
                    * (F.col("_nx") - F.col("_v")),
                ).otherwise(0.0)
            ).alias("_w1"),
        )
        .select(
            "n_a",
            "n_b",
            F.round(
                F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("_w1")),
                6,
            ).alias("w1"),  # NULL when a group is empty (ks_test convention)
        )
    )


def sequence_gaps(
    df: DataFrame,
    id_col: str,
) -> DataFrame:
    """Gap (missing-range) detection in an integer id sequence — the
    completeness audit for ingest pipelines with monotonically assigned
    ids (Kafka offsets, snapshot row ids, event counters): every
    contiguous missing run is reported once, so 'ids 4_001-4_097 never
    arrived' is one row, not 97.

    Returns (``gap_start``, ``gap_end``, ``n_missing``) per gap,
    ordered by gap_start; empty output = the sequence is contiguous.

    Scale shape: distinct ids (one map-side-combined shuffle), then the
    global lead() comes from the two-phase distributed device
    (operators/_distrank.py): range exchange on the id, partition-local
    lead, and the boundary value stitched from the partition-count
    offset table's per-partition minima — no distinct-id-sized
    ``Exchange SinglePartition`` anywhere; the within-partition pass is
    embarrassingly parallel at any scale.
    """
    from valentinus_spark.operators._distrank import running_totals

    ids = df.select(F.col(id_col).cast("bigint").alias("_id")).filter(
        F.col("_id").isNotNull()
    ).distinct()
    # materialize the distinct stream once: the device's range exchange
    # SAMPLES its input to pick boundaries, which would otherwise replay
    # the whole distinct aggregate a second time (measured +0.5 s at
    # sf0.1; with the checkpoint the sample pass reads the materialized
    # rows) — the same discipline as the graph loops' score tables
    ids = ids.localCheckpoint()
    return (
        running_totals(ids, ["_id"], [], with_lead="_id")
        .select("_id", F.col("_lead_id").alias("_nx"))
        .filter(F.col("_nx") > F.col("_id") + 1)
        .select(
            (F.col("_id") + 1).alias("gap_start"),
            (F.col("_nx") - 1).alias("gap_end"),
            (F.col("_nx") - F.col("_id") - 1).alias("n_missing"),
        )
        .orderBy("gap_start")
    )


def t_closeness_stats(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """Per-group t-closeness audit (Li, Li & Venkatasubramanian, ICDE
    2007) — the third rung of the release-privacy ladder after
    :func:`k_anonymity_stats` and :func:`l_diversity_stats`: a group can
    be k-anonymous AND l-diverse yet still leak when its sensitive
    distribution is far from the table's (skewness attack: "everyone in
    this zip is in the top salary band"). For an ORDERED sensitive
    attribute, distance = the normalized Earth Mover's Distance with
    ordered ground distance:

        EMD(P, Q) = (1 / (m-1)) · Σ_{i=1..m-1} | Σ_{j<=i} (p_j - q_j) |

    over the GLOBAL ordered value spine v_1..v_m (a group's missing
    value participates with p = 0 — dropping it understates exactly the
    skew this audit hunts). Returns one row per quasi-identifier group:
    (*quasi_cols, ``n``, ``emd``, ``exceeds_t``), emd rounded to 6,
    ordered by group; m = 1 (constant sensitive column) gives emd 0.

    Cross-engine determinism: per-cell deviations p - q round to 12 dp
    and the running EMD sum accumulates in DECIMAL(26,12) — window sums
    of raw doubles differ between engines in the last ulp (segment-tree
    vs sequential association), which a .xx5 rounding then amplifies.

    Scale shape: one (quasi, sensitive) shuffle with map-side combine,
    a broadcast m-row global spine crossed with the G-row group list
    (G×m cells — audit granularity, not row granularity), and one
    group-keyed ordered window over m cells per group. Row data never
    reaches the driver.
    """
    from pyspark.sql import Window

    sens = F.col(sensitive_col)
    cells = df.groupBy(*quasi_cols, sens.alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    groups = cells.groupBy(*quasi_cols).agg(F.sum("_c").alias("n"))
    glob = cells.groupBy("_v").agg(F.sum("_c").alias("_gc"))
    tot = glob.agg(F.sum("_gc").alias("_N"), F.count(F.lit(1)).alias("_m"))
    # dense spine: every (group, value) cell exists, absent ones at c=0
    spine = groups.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(tot))
    filled = spine.join(cells, [*quasi_cols, "_v"], "left").select(
        *quasi_cols,
        "n",
        "_v",
        "_m",
        F.round(
            F.coalesce(F.col("_c"), F.lit(0)).cast("double") / F.col("n")
            - F.col("_gc").cast("double") / F.col("_N"),
            12,
        )
        .cast("decimal(26,12)")
        .alias("_r"),
    )
    w = Window.partitionBy(*quasi_cols).orderBy("_v")
    cum = filled.select(
        *quasi_cols,
        "n",
        "_m",
        "_v",
        F.sum("_r")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_cum"),
        F.row_number().over(w).alias("_i"),
    )
    emd = (
        # the last cumulative term is ~0 by construction and excluded
        # (Σ over i = 1..m-1)
        cum.filter(F.col("_i") < F.col("_m"))
        .groupBy(*quasi_cols)
        .agg(
            F.first("n").alias("n"),
            F.first("_m").alias("_m"),
            F.sum(F.abs(F.col("_cum"))).alias("_s"),
        )
        .select(
            *quasi_cols,
            "n",
            F.round(
                F.col("_s").cast("double") / (F.col("_m") - 1).cast("double"), 6
            ).alias("emd"),
        )
    )
    # m = 1: the filter above leaves no rows — restore those groups at 0
    out = groups.join(emd.drop("n"), quasi_cols, "left").select(
        *quasi_cols,
        "n",
        F.coalesce(F.col("emd"), F.lit(0.0)).alias("emd"),
    )
    return out.select(
        *quasi_cols,
        "n",
        "emd",
        (F.col("emd") > t).alias("exceeds_t"),
    ).orderBy(*quasi_cols)


def dp_median(
    df: DataFrame,
    value_col: str,
    epsilon: float = 1.0,
    salt: str = "dpmed-v1",
    grid_lo: float | None = None,
    grid_hi: float | None = None,
    grid_steps: int = 257,
) -> DataFrame:
    """Exponential-mechanism median (McSherry & Talwar 2007) — an
    ε-ACCOUNTING DEMONSTRATION, not a deployable private release. Two
    gaps separate it from a real DP deployment (r7 ADVICE): (1) the
    selection draw is a deterministic sha256(salt) uniform so the
    release replays for the oracle gate — actual DP needs fresh
    physical randomness; (2) without ``grid_lo``/``grid_hi`` the
    candidate domain is the data's own distinct values, so the output
    SUPPORT is data-dependent and itself leaks membership. Pass
    ``grid_lo``/``grid_hi`` (+ ``grid_steps``, default 257) to score a
    data-INDEPENDENT uniform candidate grid — with public bounds that
    closes gap (2); the mechanism then carries the textbook guarantee
    modulo the replayable draw:

        u(v) = −| #(x < v) − n/2 |        (sensitivity 1)
        P(v) ∝ exp(ε·u(v)/2)

    Returns ONE row: (``n``, ``true_median``, ``dp_median``,
    ``epsilon``) — the true median is computed alongside so the
    release's utility is visible to the auditor holding the raw data.

    Determinism: ranks are exact BIGINTs on the DECIMAL(17,4) value
    grid; each candidate weight is 12-dp-rounded and DECIMAL-cumsummed
    (no float-order drift); selection is the smallest candidate whose
    cumulative weight crosses u₀·total.

    Scale shape: one (value, count) aggregate (the only corpus-sized
    shuffle), then candidate-grid-sized windows — same skeleton as the
    exact-median operators.
    """
    import hashlib

    from valentinus_spark.operators._distrank import running_totals

    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    u0 = (
        int(hashlib.sha256(salt.encode()).hexdigest()[:8], 16) + 0.5
    ) / 4294967296.0
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).try_cast("decimal(17,4)").alias("_v")
    )
    grid = vals.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    # cumulative counts over the value grid via the two-phase
    # distributed device (no single-partition window; the grand total
    # rides the broadcast offset join)
    cum = running_totals(grid, ["_v"], ["_c"], with_totals=True).select(
        "_v",
        "_c",
        (F.col("_run_c") - F.col("_c")).alias("_below"),
        F.col("_run_c").alias("_cum"),
        F.col("_tot_c").alias("_n"),
    )
    if (grid_lo is None) != (grid_hi is None):
        raise ValueError("grid_lo and grid_hi must be given together")
    if grid_lo is None:
        # demonstration default: candidates = the data's own distinct
        # values (data-dependent support — see the docstring caveat)
        cand = cum
    else:
        if grid_steps < 2 or float(grid_hi) <= float(grid_lo):
            raise ValueError(
                f"need grid_steps >= 2 and grid_hi > grid_lo, got "
                f"steps={grid_steps} lo={grid_lo} hi={grid_hi}"
            )
        # data-INDEPENDENT uniform candidate grid over public bounds;
        # #(x < v) per candidate via a merge of the (value, count)
        # aggregate with the grid: candidates sort BEFORE an equal
        # data value (desc on the flag), so the running count at a
        # candidate row is the strictly-below mass.
        step = (float(grid_hi) - float(grid_lo)) / (grid_steps - 1)
        cand_vals = (
            df.sparkSession.range(grid_steps)
            .select(
                (F.lit(float(grid_lo)) + F.col("id") * F.lit(step))
                .cast("decimal(17,4)")
                .alias("_v")
            )
            .distinct()
        )
        un = grid.select("_v", "_c", F.lit(0).alias("_cand")).unionByName(
            cand_vals.select(
                "_v",
                F.lit(0).cast("long").alias("_c"),
                F.lit(1).alias("_cand"),
            )
        )
        # _cdata is NULL on candidate rows: its grand total replays the
        # former conditional wall-window exactly (NULL — not 0 — when no
        # data rows exist); the running count can use plain _c because
        # candidate rows contribute an exact 0 to it
        un = un.withColumn("_cdata", F.when(F.col("_cand") == 0, F.col("_c")))
        cand = running_totals(
            un,
            [F.asc("_v"), F.desc("_cand")],
            ["_c", "_cdata"],
            with_totals=True,
        ).select(
            "_v",
            "_cand",
            F.col("_run_c").alias("_below"),
            F.col("_tot_cdata").alias("_n"),
        ).filter(F.col("_cand") == 1)
    util = -F.abs(
        F.col("_below").cast("double") - F.col("_n").cast("double") / 2.0
    )
    wgt = F.round(
        F.exp(F.lit(float(epsilon)) * util / 2.0), 12
    ).cast("decimal(28,12)")
    # cumulative DECIMAL weight over the candidate support, same device.
    # Weight NULLness is UNIFORM per query (it depends only on _n, which
    # is global), so the device's skip-NULL partial sums cannot diverge
    # from the single-partition window's prefix semantics.
    scored = running_totals(
        cand.select("_v", wgt.alias("_w")), ["_v"], ["_w"], with_totals=True
    ).select(
        "_v",
        F.col("_run_w").alias("_wcum"),
        F.col("_tot_w").alias("_wtot"),
    )
    # true grid median (floor-rank middles convention)
    lo_rank = F.floor((F.col("_n") + 1) / 2)
    hi_rank = F.floor(F.col("_n") / 2) + 1
    med = cum.agg(
        (
            (
                F.min(F.when(F.col("_cum") >= lo_rank, F.col("_v")))
                + F.min(F.when(F.col("_cum") >= hi_rank, F.col("_v")))
            ).cast("double")
            / 2.0
        ).alias("true_median"),
        F.max("_n").alias("n"),
    )
    pick = scored.filter(
        F.col("_wcum").cast("double") >= F.lit(u0) * F.col("_wtot").cast("double")
    ).agg(F.min("_v").cast("double").alias("dp_median"))
    return med.crossJoin(pick).select(
        "n",
        F.round("true_median", 6).alias("true_median"),
        F.round("dp_median", 6).alias("dp_median"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
