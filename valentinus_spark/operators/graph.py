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
    directions, deduplicated, self-loops dropped).

    Built canonical-first: orient each pair low→high, dedup THAT (half
    the rows through the only shuffle), then mirror with a shuffle-free
    union. The former fwd ∪ rev formulation also re-evaluated the
    upstream pair pipeline once per union branch (textrank's tokenizer
    ran twice); canonical-first reads it once. Same output set: the
    symmetric closure is orientation-invariant, and null-bearing pairs
    collapse to self-loops that the filter drops exactly as before."""
    canon = (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("src"),
            F.greatest(F.col(a), F.col(b)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def copurchase_canonical_pairs(
    lineitem: DataFrame, order_col: str = "l_orderkey", item_col: str = "l_partkey"
) -> DataFrame:
    """Canonical (src < dst) distinct co-occurrence pairs — the half-size
    representation :func:`copurchase_edges` mirrors into a symmetric
    list. Exposed separately so orientation-invariant consumers
    (triangle_count, clustering_coefficient — which re-canonicalize
    whatever they get) can skip building and re-deduplicating the
    mirrored half: the distinct shuffles HALF the pair rows.

    Self-equi-join on the order key — candidates only materialize
    within an order, so the blow-up is bounded by max-items-per-order²,
    the usual market-basket shape."""
    # spread the probe side BY THE JOIN KEY: a keyless round-robin
    # repartition paid a shuffle that bought only parallelism, while the
    # keyed one doubles as the join-side exchange (reused when the build
    # side shuffles, irrelevant when AQE broadcasts it) — measured
    # 2.30 s → 1.28 s on the sf0.1 build. Without any repartition the
    # AQE-broadcast join would leave the k²-per-order fan-out and the
    # partial distinct above it on the SCAN's file-count partitions.
    par = lineitem.sparkSession.sparkContext.defaultParallelism
    a = lineitem.select(
        F.col(order_col).alias("_o"), F.col(item_col).alias("src")
    ).repartition(par, "_o")
    b = lineitem.select(F.col(order_col).alias("_o"), F.col(item_col).alias("dst"))
    return (
        a.join(b, "_o")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def copurchase_edges(
    lineitem: DataFrame, order_col: str = "l_orderkey", item_col: str = "l_partkey"
) -> DataFrame:
    """Item co-occurrence graph: symmetric edges between parts appearing
    in the same order. Built as canonical (src < dst) distinct pairs
    mirrored by a shuffle-free union — the distinct (the only
    data-sized exchange here) carries half the rows of the former
    both-directions formulation, and the mirrored halves are disjoint
    so no second dedup is needed."""
    canon = copurchase_canonical_pairs(lineitem, order_col, item_col)
    return canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


# Shared broadcast gate for the two-column long edge/adjacency frames
# (triangle closing set, adamic_adar/jaccard adjacency): an explicit
# F.broadcast hint BYPASSES autoBroadcastJoinThreshold, so the gate must
# itself keep the built relation inside executor+driver budgets. The
# byte math: 8M rows × 2 longs ≈ 128 MB raw, a few hundred MB as a built
# hash relation — fine on this deployment's 8 GB driver, near the
# ceiling for memory-tight ones; scale the constant with available
# memory (rows × row-width vs budget), not just row count, if retuning.
_EDGE_BROADCAST_ROWS = 8_000_000


def _loop_partitions(m: int, e: DataFrame, rows_per_part: int = 300_000) -> int:
    """Partition count for a checkpointed loop edge list, derived from
    its MEASURED row count (m): ~300k edge rows per partition, floored
    at 1, capped at the list's current partition count. The rank loops
    stream the full list every round, and each round's node aggregate
    ships up to #partitions × #nodes partial rows — at bench scale the
    inherited 64-partition layout (37k rows each) paid an ~8×-inflated
    partial shuffle per round for no extra parallelism (measured flat
    k2..k8, all faster than 64; hits' smaller list measured best at 4).
    Floored at 4 (when that many partitions exist) so a mid-size list
    never collapses below useful task parallelism. At 100 TB m/300k
    far exceeds the cap so the layout passes through untouched —
    scale-adaptive, not a local[32] constant."""
    cur = e.rdd.getNumPartitions()
    return max(1, min(cur, 4), min(cur, -(-m // rows_per_part)))


def _compact_if_small(df: DataFrame, threshold: int = 100_000):
    """(frame, n_rows) with the frame collapsed to ONE partition when it
    is tiny. An iterative loop over a k-row graph otherwise pays
    #partitions tasks of pure scheduling per round (textrank's 29-node
    co-occurrence graph inherited 64 twelve-row partitions from the
    distinct that built it — 8 rounds × 64 near-empty tasks dominated
    the whole query). The input must already be localCheckpointed; the
    coalesce twin is checkpointed again, which is one narrow copy of at
    most ``threshold`` rows. Above the gate the frame is right-sized to
    :func:`_loop_partitions` (and passed through untouched when already
    at or below that count — the case for every at-scale graph);
    bt_ranking's unconditional coalesce(1), made size-adaptive."""
    n = df.count()
    if n <= threshold:
        return df.coalesce(1).localCheckpoint(), n
    k = _loop_partitions(n, df)
    if k < df.rdd.getNumPartitions():
        # same one-narrow-copy deal as the tiny path, at the measured
        # row target instead of 1 — the loops stream this list every
        # round, so the copy is paid once and the right-sized layout
        # is read ``iterations`` times
        return df.coalesce(k).localCheckpoint(), n
    return df, n


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
    each round rounded to 9 decimals (see module docstring).

    CONTRACT: the edge list must be SYMMETRIC (src set == dst set). A
    directed or contract-violating input does not merely lose a
    dangling-mass term — nodes with no out-edges are silently ABSENT
    from the output (the node set derives from the out-degree pass),
    and their teleport mass is lost after round 1. Build input with
    :func:`symmetric_edges` / :func:`copurchase_edges`."""
    from pyspark.sql import Window as _W

    # out-degree is loop-invariant and folded into the SAME exchange
    # that spreads the edge list: a src-keyed window attaches outdeg
    # during the one shuffle, where the former chain materialized the
    # m-row list twice (checkpoint → degree aggregate → broadcast join
    # → second checkpoint) to produce the same (src, dst, _d) rows
    # (guide §2.4 — remove shuffles/materializations outright). The
    # contribution stays rank/_d so the float accumulation order, and
    # with it the oracle's 9-dp hash, is unchanged; window count(*) per
    # src is the same BIGINT the groupBy count attached. At scale this
    # checkpointed src-partitioned list is the structure you'd
    # co-partition once and reuse for every round's join.
    e_w, m = _compact_if_small(
        edges.select(src, dst)
        .withColumn("_d", F.count(F.lit(1)).over(_W.partitionBy(src)))
        .localCheckpoint()
    )
    # symmetric contract: every node occurs as src, so the node set
    # falls out of the weighted list; node-sized materialization (the
    # ranks init and round-1 join both read it)
    nodes = e_w.select(F.col(src).alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    if n == 0:
        # empty edge list (e.g. textrank over a corpus with no qualifying
        # co-occurrences): no nodes to rank — same guard as hits()
        return nodes.select("node", F.lit(0.0).alias("rank"))
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    # When the rank/contrib tables (n rows each) are broadcast-sized,
    # hint them explicitly: the checkpointed edge list then never
    # shuffles or sorts inside the loop — each round is two map-side
    # joins plus one combinable aggregation whose shuffle carries at
    # most (#partitions × #nodes) partial rows. Above the threshold
    # (rank table too big to ship) the joins fall back to co-partitioned
    # shuffle joins, which is the correct plan at that size.
    small = n <= 2_000_000
    hint = F.broadcast if small else (lambda df: df)
    for i in range(iterations):
        contrib = (
            hint(ranks).join(e_w, ranks["node"] == e_w[src])
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_d")).alias("_c"))
        )
        # the SYMMETRIC-edge-list contract means every node has in-edges,
        # so contrib already covers every node: the former
        # nodes-left-join re-attach was one broadcast + one join per
        # round of pure overhead (same rows, same values — the oracle
        # replay is unchanged)
        ranks = contrib.select(
            "node",
            F.round(
                F.lit(teleport) + F.lit(damping) * F.coalesce("_c", F.lit(0.0)),
                9,
            ).alias("rank"),
        )
        # Under the broadcast gate, chain 4 rounds per localCheckpoint:
        # the chained rounds pipeline their join+agg in ONE job (three
        # job boundaries and three 20k-row materializations saved per
        # block) while the plan stays 4-round-bounded. The arithmetic is
        # untouched — every round still rounds to 9 dp, so the oracle
        # replay is unchanged. Big graphs keep the per-round checkpoint:
        # their joins are shuffle joins, and re-executing a chained
        # round would replay edge-sized work per broadcast build.
        if (not small) or (i + 1) % 4 == 0 or (i + 1) == iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count, degree-oriented (the
    "compact-forward" scheme of Latapy 2008; same orientation trick as
    Suri & Vassilvitskii 2011's MapReduce counter): orient every
    undirected edge from lower to higher (degree, id) rank, count
    wedges only at each edge's LOW-rank endpoint, and close them with a
    semi-join probe.

    Why not the naive a<b<c three-way join: its wedge stage explodes on
    high-degree vertices (a celebrity node of degree d contributes d²
    wedges). Orientation bounds every out-degree by O(sqrt m), so the
    wedge join materializes O(m^1.5) rows worst-case — the classical
    bound — and the skew the naive plan hits at 100 TB never forms.
    The count itself is orientation-invariant, so the DuckDB oracle
    checks it with the naive formulation.

    Plan: degree agg (one shuffle) → orient (broadcastable degree
    join) → wedge self-join keyed on the low endpoint → semi-join probe
    of the closing edge. Returns one row: (n_vertices, n_edges,
    n_triangles)."""
    # e feeds three consumers (degree agg, orientation join, edge count)
    # and oriented feeds three (both wedge sides, the closing-edge probe):
    # without lineage truncation each reference replays the whole
    # upstream subtree (76 pre-AQE Exchanges at sf0.1; AQE reuse saves
    # only what lands in one stage). Two localCheckpoints make the plan
    # read each O(m) table once — the plan you'd want at 100 TB, not the
    # one the optimizer happens to rescue.
    e = _canonical_edges(edges)
    return _triangle_count_from(e)


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge frame (a < b, distinct, no loops),
    localCheckpointed — shared by triangle_count and
    clustering_coefficient so the upstream edge EXPANSION (e.g. the
    co-purchase self-join) materializes once, not once per consumer."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )


def _degrees(e: DataFrame) -> DataFrame:
    """(v, d) undirected degree table of a canonical edge frame,
    localCheckpointed: every consumer (the orientation join's two
    probes, n_vertices, clustering_coefficient's wedge sum) otherwise
    re-aggregates the 2m endpoint rows per reference — the node-sized
    materialization is the same discipline as the rank loops' score
    tables."""
    return (
        e.select(F.col("a").alias("v"))
        .union(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )


def _triangle_count_from(e: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    if deg is None:
        deg = _degrees(e)
    er = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    ra = F.struct(F.col("da").alias("d"), F.col("a").alias("v"))
    rb = F.struct(F.col("db").alias("d"), F.col("b").alias("v"))
    oriented = er.select(
        F.when(ra < rb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ra < rb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ra < rb, rb).otherwise(ra).alias("rv"),
    ).localCheckpoint()
    wedges = (
        oriented.alias("x")
        .join(oriented.alias("y"), "u")
        .filter(F.col("x.rv") < F.col("y.rv"))
        .select(F.col("x.v").alias("p"), F.col("y.v").alias("q"))
    )
    # the wedge table is the big side (O(m^1.5) rows — 41M at sf0.1 vs
    # 1.2M edges): when the CLOSING edge set fits, broadcast it so the
    # semi probe is map-side and the wedges never shuffle (measured
    # 6.3 s → sub-second on the probe stage). Same size-gated broadcast
    # device as the pagerank/hits rank tables; above the gate the
    # shuffled semi join is the correct plan anyway. e is already
    # localCheckpointed by every caller, so the count is a cheap
    # metadata-sized job, and its value doubles as the exact n_edges
    # output column (saving the former whole-table count aggregate).
    m = e.count()
    closing = oriented.select(F.col("u").alias("p"), F.col("v").alias("q"))
    if m <= _EDGE_BROADCAST_ROWS:
        closing = F.broadcast(closing)
    closed = wedges.join(closing, ["p", "q"], "semi")
    # deg is checkpointed, so its driver-side count is a metadata-cheap
    # job — same device as n_edges; the former crossJoin(count-agg)
    # replayed the whole deg subtree as a second plan branch
    n_vertices = deg.count()
    return closed.agg(F.count(F.lit(1)).alias("n_triangles")).select(
        F.lit(n_vertices).cast("long").alias("n_vertices"),
        F.lit(m).cast("long").alias("n_edges"),
        "n_triangles",
    )

def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Vertices of the k-core — the (unique) maximal subgraph in which
    every vertex has degree >= k — by iterative peeling: drop all
    vertices with current degree < k, restrict the edge set, repeat to
    fixpoint. The standard coreness building block for graph-based
    corpus curation (dense duplicate neighborhoods, citation/link spam
    cores).

    Each round is one degree aggregate + one semi-join restriction over
    the surviving edges, with localCheckpoint truncating lineage per
    round (the pagerank/CC loop discipline); rounds <= the peeling
    depth, which is tiny for real degree distributions. Deterministic —
    the k-core is unique, so the result is order- and partitioning-
    independent (what makes the planted driver oracle exact). Returns
    (id, degree) with the degree INSIDE the core."""
    # per-round _compact_if_small: the peel is monotone decreasing, so a
    # survivor set that has shrunk under the gate stops paying
    # #initial-partitions near-empty scheduling tasks per remaining
    # round (the rank loops' right-sizing device applied per iteration);
    # the count it needs doubles as the fixpoint check
    e, n_prev = _compact_if_small(
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        if n_prev == 0:
            break
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("u")
        e, n_now = _compact_if_small(
            e.join(keep, on="u", how="semi")
            .join(keep.select(F.col("u").alias("v")), on="v", how="semi")
            .select("u", "v")
            .localCheckpoint()
        )
        if n_now == n_prev:
            break
        n_prev = n_now
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
        .select(F.col("u").alias("id"), "degree")
    )



def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over a
    SYMMETRIC edge list, with the two determinism fixes that make the
    result engine-replayable:

    - every node casts ONE self-vote alongside its neighbors' votes
      (breaks the bipartite oscillation synchronous LPA is known for),
    - the per-node winner is (max vote count, then MIN label) — no
      random tie-break, so a fixed round count yields a fixed labeling.

    Returns (node, label) after exactly ``rounds`` rounds (labels start
    as node ids). Communities are nodes sharing a label — the cheap
    modularity-free alternative to connected components when near-dup
    clusters are linked by spurious bridges CC would merge across.

    Scale shape: per round ONE (labels ⋈ edges) join + ONE two-level
    aggregation, both keyed on node id — identical cost model to
    :func:`pagerank` (rounds × (join + agg), co-partitionable), lineage
    truncated per round by localCheckpoint. The vote table is bounded by
    the edge count; no per-node state beyond the single current label.
    """
    e, _ = _compact_if_small(
        ensure_parallelism(edges.select(src, dst)).localCheckpoint()
    )
    labels = (
        e.select(F.col(src).alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        neighbor_votes = (
            e.join(labels, e[src] == labels["node"])
            .select(F.col(dst).alias("node"), "label")
        )
        votes = neighbor_votes.unionByName(labels.select("node", "label"))
        counts = votes.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("l"))
                ).alias("_w")
            )
            .select("node", F.col("_w.l").alias("label"))
            .localCheckpoint()
        )
    return labels


def adamic_adar(
    edges: DataFrame,
    k: int = 100,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Link prediction over a SYMMETRIC edge list: the top-k NON-adjacent
    pairs by Adamic-Adar score, ``AA(a,b) = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z)``
    — the classic common-neighbor index that discounts hub-mediated
    evidence (Adamic & Adar 2003). "You two share an obscure mutual
    friend" counts for much more than "you both know the biggest hub".

    Output: (``node_a``, ``node_b``, ``common_neighbors``, ``aa_score``),
    node_a < node_b, score rounded to 4, ordered (score desc, a, b),
    limited to k. Per-wedge terms are rounded to 6 decimals and summed in
    DECIMAL, so the score is accumulation-order-free and identical in any
    engine. A common neighbor z is adjacent to both endpoints, so
    deg(z) ≥ 2 and 1/ln(deg z) is always finite.

    Scale shape: wedge enumeration is ONE self-equi-join on the center
    node z — candidate pairs only materialize within a neighborhood, a
    Σ deg_z² blow-up. ``max_degree`` caps it: centers above the cap are
    dropped BEFORE the join (the standard hub cut — a hub contributes
    ~1/ln(huge)≈0 per pair yet deg² pairs, the worst ratio in the whole
    computation). With the cap, fan-out is ≤ max_degree × edges. The
    existing-edge exclusion is a left-anti equi-join on the canonical
    pair, and top-k compiles to TakeOrderedAndProject (per-partition
    heaps, no global sort)."""
    e = ensure_parallelism(edges.select(src, dst)).localCheckpoint()
    # deg-1 centers can never be COMMON neighbors — and ln(1)=0 would
    # divide by zero under ANSI mode — so they exit before the term
    deg = e.groupBy(F.col(dst).alias("_z")).agg(F.count(F.lit(1)).alias("_deg"))
    deg = deg.filter(F.col("_deg") >= 2)
    if max_degree is not None:
        deg = deg.filter(F.col("_deg") <= max_degree)
    # attach the center's AA term once, before the wedge join fans out
    star = e.join(
        deg.select(
            "_z",
            F.round(F.lit(1.0) / F.log(F.col("_deg").cast("double")), 6)
            .cast("decimal(18,6)")
            .alias("_term"),
        ),
        F.col(dst) == F.col("_z"),
    ).select(F.col(src).alias("_n"), "_z", "_term")
    other = star.select(F.col("_n").alias("_m"), "_z")
    wedges = star.join(other, "_z").filter(F.col("_n") < F.col("_m"))
    pairs = wedges.groupBy("_n", "_m").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.round(F.sum("_term").cast("double"), 4).alias("aa_score"),
    )
    # existing-edge exclusion: the adjacency is the BIG side (m rows vs
    # the hub-cut-bounded candidate pairs) — when it fits, broadcast it
    # so the anti probe is map-side and neither side shuffles (same
    # size-gated device as the pagerank/hits score tables; above the
    # gate the shuffled anti join is the right plan)
    adjacent = e.select(F.col(src).alias("_n"), F.col(dst).alias("_m"))
    if e.count() <= _EDGE_BROADCAST_ROWS:
        adjacent = F.broadcast(adjacent)
    return (
        pairs.join(adjacent, ["_n", "_m"], "left_anti")
        .select(
            F.col("_n").alias("node_a"),
            F.col("_m").alias("node_b"),
            "common_neighbors",
            "aa_score",
        )
        .orderBy(F.desc("aa_score"), "node_a", "node_b")
        .limit(k)
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation between the degrees at the two ends of each edge —
    positive for hub-to-hub graphs (social), negative for hub-to-leaf
    (web, co-purchase catalogs). The one-number structural fingerprint
    to record alongside PageRank/k-core when profiling a graph build.

    ``edges`` is a symmetric (src, dst) list (both directions present,
    as :func:`copurchase_edges` emits); each directed row contributes
    one (deg_src, deg_dst) sample, which is exactly Newman's
    edge-endpoint formulation on an undirected graph. Returns ONE row:
    (``n_edges``, ``r``), r rounded to 6 and NULL when either endpoint
    degree is constant (zero variance — correlation undefined).

    Scale shape: one degree aggregate (node-keyed shuffle), two
    degree-attach joins co-partitioned on the node key, then a scalar
    sum fold. All moment sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    exact BIGINTs — the Pearson fold touches doubles only in the final
    scalar formula, so the statistic is deterministic at any partition
    count (no float-sum ordering drift).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d")).select(
        F.col("src").alias("_node"), "_d"
    )
    ds = deg.select(F.col("_node").alias("src"), F.col("_d").alias("_dx"))
    dd = deg.select(F.col("_node").alias("dst"), F.col("_d").alias("_dy"))
    samples = edges.join(ds, "src").join(dd, "dst")
    m = samples.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dx").alias("_sx"),
        F.sum("_dy").alias("_sy"),
        F.sum(F.col("_dx") * F.col("_dy")).alias("_sxy"),
        F.sum(F.col("_dx") * F.col("_dx")).alias("_sxx"),
        F.sum(F.col("_dy") * F.col("_dy")).alias("_syy"),
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return m.select(
        F.col("_n").alias("n_edges"),
        F.round(
            F.when(
                (varx > 0) & (vary > 0),
                (n * sxy - sx * sy) / F.sqrt(varx * vary),
            ),
            6,
        ).alias("r"),
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient (transitivity): C = 3·triangles /
    wedges — what fraction of open two-paths close. With
    :func:`degree_assortativity` and :func:`triangle_count` it
    completes the one-row structural fingerprint of a graph build
    (C ≈ 0 bipartite-ish/random, C ≫ random = community structure).

    Returns ONE row: (``n_vertices``, ``n_edges``, ``n_triangles``,
    ``n_wedges``, ``transitivity``), rounded to 6; NULL when the graph
    has no wedges.

    Scale shape: rides :func:`triangle_count`'s degree-oriented counter
    (O(m^1.5) worst case, skew-proof) plus one degree aggregate for the
    wedge sum Σ d(d−1)/2 — exact BIGINT arithmetic until the final
    ratio.
    """
    e = _canonical_edges(edges)
    # ONE degree table feeds the triangle counter's orientation join,
    # its n_vertices count AND the wedge sum below — the former second
    # identical union-aggregate re-shuffled the 2m endpoint rows for
    # numbers the checkpointed table already holds
    deg = _degrees(e)
    tri = _triangle_count_from(e, deg)
    wedges = deg.agg(
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("bigint").alias("n_wedges")
    )
    return (
        tri.crossJoin(F.broadcast(wedges))
        .select(
            "n_vertices",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    3.0 * F.col("n_triangles") / F.col("n_wedges").cast("double"),
                ),
                6,
            ).alias("transitivity"),
        )
    )


def hits(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) on a
    DIRECTED edge list — the complementary centrality to
    :func:`pagerank` for bipartite-ish behavior graphs (buyers → items,
    crawlers → hosts): a good HUB points at many good authorities, a
    good AUTHORITY is pointed at by many good hubs.

        auth_t(v) = Σ_{u→v} hub_{t-1}(u)     then L1-normalize
        hub_t(u)  = Σ_{u→v} auth_t(v)        then L1-normalize

    L1 (sum) normalization instead of the textbook L2 — a documented
    choice: the fixed point's RANKING is identical and it keeps the
    arithmetic engine-portable (no sqrt in the loop). Returns
    (``node``, ``hub``, ``auth``) over ALL nodes (union of both edge
    endpoints; a node with no out-edges has hub 0, no in-edges auth 0),
    rounded to 6, ordered by node.

    Cross-engine determinism goes one step beyond pagerank's 9-dp
    rounding: the per-node sums AND the global normalization totals
    accumulate in DECIMAL(20,9) over the previous round's 9-dp-rounded
    scores — EXACT regardless of partition/merge order — and only the
    final normalize division is float. The DuckDB oracle replays every
    round bit-for-bit.

    Scale shape: same as pagerank — ``iterations`` × (two edge joins +
    two node aggregations), every shuffle keyed on a node id, lineage
    cut per round by localCheckpoint; the normalization total is a
    single-row broadcast. 100 TB: co-partition the checkpointed edge
    list by src once (bucketed write) and both per-round joins stay
    exchange-free on the edge side.
    """
    # spread by the DISTINCT key instead of round-robin: the former
    # ensure_parallelism(...)  paid a keyless repartition (plus its
    # sort-before-repartition of every row) only to buy parallelism,
    # and the distinct then shuffled the rows AGAIN by (src, dst). The
    # keyed repartition doubles as the distinct's exchange (same key,
    # same partition count → ENSURE_REQUIREMENTS elides the second
    # one), so the edge build pays ONE shuffle — the copurchase_edges
    # keyed-exchange device applied to the dedup instead of a join.
    par = edges.sparkSession.sparkContext.defaultParallelism
    e, _ = _compact_if_small(
        edges.select(src, dst)
        .repartition(par, src, dst)
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )
    # F.round (HALF_UP) on the IEEE double 1/n — Python round() would
    # banker's-round and could diverge from the SQL oracle's ROUND
    hub = nodes.withColumn("hub", F.round(F.lit(1.0 / n), 9))
    dec = "decimal(20,9)"
    # same broadcast gate as pagerank: node-sized score tables ship to
    # the edge join while they fit; above it, co-partitioned shuffle
    # joins are the right plan anyway
    small = n <= 2_000_000
    hint = F.broadcast if small else (lambda df: df)
    # Inside the loop the score tables stay SPARSE: a node absent from
    # araw/hraw has score exactly 0 and contributes nothing to any sum
    # or normalization total, so re-attaching the full node set every
    # round (two nodes-left-joins + two full-width checkpoints per
    # round) was pure overhead. The zeros are materialized ONCE by the
    # final left joins — same values, same rounding, same output rows.
    auth = nodes.withColumn("auth", F.round(F.lit(1.0 / n), 9))

    from pyspark.sql import Window as _W

    # the everything-window normalize gate is the COMPACTION gate
    # (≤100k rows — the score table is then one partition, so the
    # single-partition window is free by construction), NOT the 2M
    # broadcast gate: 2M rows through one window task is a mid-scale
    # wart even when broadcasting them is fine (r9 verdict item 3).
    # Between 100k and 2M the scalar-aggregate + broadcast shape runs.
    win_small = n <= 100_000

    def _normalize(raw: DataFrame, val: str, out: str) -> DataFrame:
        """L1-normalize the sparse score column. Tiny graphs (the
        one-partition compaction gate) fold the total in an
        everything-window, saving one aggregate job + one replay of the
        contribution subtree per half-round; everything else keeps the
        scalar-aggregate + broadcast shape, where a single-partition
        window would be a scale-killer. The total is an exact DECIMAL
        sum either way — same value in any order, so the 9-dp per-round
        pin is unchanged."""
        if win_small:
            tot = F.sum(val).over(_W.partitionBy())
            return raw.select(
                "node",
                F.round(
                    F.when(
                        tot > 0,
                        F.col(val).cast("double") / tot.cast("double"),
                    ).otherwise(0.0),
                    9,
                ).alias(out),
            ).localCheckpoint()
        t = raw.agg(F.sum(val).alias("_t"))
        return (
            raw.crossJoin(F.broadcast(t))
            .select(
                "node",
                F.round(
                    F.when(
                        F.col("_t") > 0,
                        F.col(val).cast("double") / F.col("_t").cast("double"),
                    ).otherwise(0.0),
                    9,
                ).alias(out),
            )
            .localCheckpoint()
        )

    for i in range(iterations):
        araw = (
            hint(hub)
            .join(e, hub["node"] == e[src])
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("hub").cast(dec)).alias("_a"))
        )
        # NOTE (r9 A/B): chaining the mid-round auth lazily into the hub
        # half-round — the pagerank 4-rounds-per-checkpoint device —
        # measured SLOWER here (6.1-6.3 s vs 5.6 s isolated): the
        # everything-window then runs mid-chain over the wide sparse
        # frame instead of over a 20k-row checkpoint. Per-half-round
        # checkpoints stay.
        auth = _normalize(araw, "_a", "auth")
        hraw = (
            hint(auth)
            .join(e, auth["node"] == e[dst])
            .groupBy(F.col(src).alias("node"))
            .agg(F.sum(F.col("auth").cast(dec)).alias("_h"))
        )
        hub = _normalize(hraw, "_h", "hub")
    return (
        nodes.join(hint(hub), "node", "left")
        .join(hint(auth), "node", "left")
        .select(
            "node",
            F.round(F.coalesce("hub", F.lit(0.0)), 6).alias("hub"),
            F.round(F.coalesce("auth", F.lit(0.0)), 6).alias("auth"),
        )
        .orderBy("node")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    iterations: int = 8,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank (the random walk restarts at the SEED set
    instead of teleporting uniformly — Haveliwala 2002's topic-sensitive
    variant): ranks measure proximity to the seeds, which is the
    related-items / recommendations readout on a co-occurrence graph
    where global :func:`pagerank` measures popularity.

        rank_{t+1}(v) = (1-d)·1[v ∈ seeds]/|seeds| + d·Σ_{u→v} rank_t(u)/outdeg(u)

    with rank_0 = 1[v ∈ seeds]/|seeds|. Same SYMMETRIC-edge-list
    contract as :func:`pagerank` — including its sharp edge: a
    non-symmetric input silently DROPS zero-out-degree nodes from the
    output — plus the same per-round 9-dp pinning, window-folded
    weighted edge list, broadcast gate, and localCheckpoint lineage
    discipline — one join + one aggregation per round, both keyed on
    node id. Returns (node, rank); ranks sum to ~1.
    """
    from pyspark.sql import Window as _W

    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    # degree folded into the spreading exchange + deg-derived node set —
    # see pagerank
    e_w, m = _compact_if_small(
        edges.select(src, dst)
        .withColumn("_d", F.count(F.lit(1)).over(_W.partitionBy(src)))
        .localCheckpoint()
    )
    nodes = e_w.select(F.col(src).alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    seed_arr = F.array(*[F.lit(s) for s in seeds])
    seed_mass = F.when(
        F.array_contains(seed_arr, F.col("node")), F.lit(1.0 / len(seeds))
    ).otherwise(0.0)
    teleport = F.when(
        F.array_contains(seed_arr, F.col("node")),
        F.lit((1.0 - damping) / len(seeds)),
    ).otherwise(0.0)
    ranks = nodes.withColumn("rank", seed_mass)
    small = n <= 2_000_000
    hint = F.broadcast if small else (lambda df: df)
    for i in range(iterations):
        contrib = (
            hint(ranks).join(e_w, ranks["node"] == e_w[src])
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_d")).alias("_c"))
        )
        # symmetric-contract shortcut (see pagerank): contrib covers all
        # nodes, so the nodes-left-join re-attach is skipped
        ranks = contrib.select(
            "node",
            F.round(
                teleport + F.lit(damping) * F.coalesce("_c", F.lit(0.0)),
                9,
            ).alias("rank"),
        )
        # 4-rounds-per-checkpoint under the broadcast gate — see pagerank
        if (not small) or (i + 1) % 4 == 0 or (i + 1) == iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def jaccard_link_prediction(
    edges: DataFrame,
    k: int = 100,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Link prediction by neighborhood Jaccard — :func:`adamic_adar`'s
    normalized sibling on the same symmetric edge list: the top-k
    NON-adjacent pairs by

        J(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
               = common / (deg a + deg b − common)

    AA rewards sharing OBSCURE neighbors; Jaccard rewards sharing a
    large FRACTION of the neighborhood — a low-degree pair with 3 of 4
    friends shared outranks a hub pair with 30 of 3000. Recording both
    is the standard link-prediction baseline panel (Liben-Nowell &
    Kleinberg 2003).

    Output: (``node_a``, ``node_b``, ``common_neighbors``,
    ``jaccard``), node_a < node_b, jaccard rounded to 6, ordered
    (jaccard DESC, a, b), limited to k. Counts are exact BIGINTs; the
    single ratio is the only float — deterministic at any parallelism.

    Scale shape: same wedge enumeration as adamic_adar — one
    self-equi-join on the center node with the same ``max_degree`` hub
    cut bounding fan-out to ≤ max_degree × edges (a hub center
    contributes deg² candidate pairs but tiny Jaccard mass); the
    denominator degrees arrive by two node-keyed broadcast-sized
    joins; existing-edge exclusion is a left-anti join; top-k is
    TakeOrderedAndProject.
    """
    e = ensure_parallelism(edges.select(src, dst)).localCheckpoint()
    full_deg = e.groupBy(F.col(src).alias("_node")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    centers = e.groupBy(F.col(dst).alias("_z")).agg(
        F.count(F.lit(1)).alias("_zdeg")
    )
    # deg-1 centers cannot be COMMON neighbors; hubs are cut pre-join
    centers = centers.filter(F.col("_zdeg") >= 2)
    if max_degree is not None:
        centers = centers.filter(F.col("_zdeg") <= max_degree)
    star = e.join(centers, F.col(dst) == F.col("_z")).select(
        F.col(src).alias("_n"), "_z"
    )
    other = star.select(F.col("_n").alias("_m"), "_z")
    wedges = star.join(other, "_z").filter(F.col("_n") < F.col("_m"))
    pairs = wedges.groupBy("_n", "_m").agg(
        F.count(F.lit(1)).alias("common_neighbors")
    )
    da = full_deg.select(F.col("_node").alias("_n"), F.col("_deg").alias("_da"))
    db = full_deg.select(F.col("_node").alias("_m"), F.col("_deg").alias("_db"))
    scored = (
        pairs.join(da, "_n")
        .join(db, "_m")
        .select(
            "_n",
            "_m",
            "common_neighbors",
            F.round(
                F.col("common_neighbors").cast("double")
                / (
                    F.col("_da") + F.col("_db") - F.col("common_neighbors")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    # same size-gated broadcast of the big adjacency side as adamic_adar
    adjacent = e.select(F.col(src).alias("_n"), F.col(dst).alias("_m"))
    if e.count() <= _EDGE_BROADCAST_ROWS:
        adjacent = F.broadcast(adjacent)
    return (
        scored.join(adjacent, ["_n", "_m"], "left_anti")
        .select(
            F.col("_n").alias("node_a"),
            F.col("_m").alias("node_b"),
            "common_neighbors",
            "jaccard",
        )
        .orderBy(F.desc("jaccard"), "node_a", "node_b")
        .limit(k)
    )


def bfs_distances(
    edges: DataFrame,
    source_ids,
    max_iters: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS over a SYMMETRIC edge list: shortest hop count
    from the nearest source to every reachable node — the primitive
    under closeness/eccentricity readouts and "how far is everything
    from the seed set" audits (e.g. how many hops from any trusted
    domain is each crawled host). Unreachable nodes are absent from
    the output (distance ∞), the standard sparse convention.

    Returns (``node``, ``dist``), dist in 0..max_iters.

    Algorithm: level-synchronous frontier expansion — the loop the
    pagerank/PPR/HITS family already uses, with the same discipline:
    per round ONE keyed equi-join (frontier × edges), a left-anti
    against the settled set, per-round ``localCheckpoint`` lineage
    truncation, and an O(1)-row driver emptiness check to stop early.
    ``max_iters`` bounds the worst case (graph diameter).

    Scale shape: each round shuffles only the FRONTIER joined to its
    incident edges, not the whole graph; the settled set stays
    partitioned on the node key across rounds. Determinism: distances
    are exact integers (min over arrival rounds is level-synchronous,
    so first arrival IS the shortest); no floats anywhere.
    """
    e, _ = _compact_if_small(
        ensure_parallelism(edges.select(src, dst)).localCheckpoint()
    )
    spark = edges.sparkSession
    # seed node-id type follows the edge list (graphs with string ids
    # are first-class everywhere else in this family — no int() cast)
    frontier = (
        spark.createDataFrame([(s,) for s in source_ids], ["node"])
        .select(F.col("node").cast(e.schema[src].dataType).alias("node"))
        .distinct()
    )
    settled = frontier.select("node", F.lit(0).alias("dist")).localCheckpoint()
    frontier = settled.select("node")
    for it in range(1, max_iters + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e[src])
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        settled = settled.unionByName(
            nxt.select("node", F.lit(it).alias("dist"))
        ).localCheckpoint()
        frontier = nxt
    return settled.orderBy("dist", "node")


def k_truss(
    edges: DataFrame,
    k: int,
    max_iters: int = 30,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-truss decomposition (Cohen 2008) — the edge-strength
    sharpening of :func:`k_core`: keep only edges that sit in at least
    k−2 triangles WITHIN the kept subgraph, to a fixed point. A k-core
    can be held together by one promiscuous hub; a k-truss demands
    every EDGE be triangle-reinforced, so it isolates genuinely cohesive
    communities (the standard spam-ring / co-purchase-clique extractor).

    Input is a SYMMETRIC edge list; output is the canonical
    (``node_a`` < ``node_b``) surviving edge set with its final
    ``support`` (triangle count in the truss).

    Algorithm: iterative support-and-prune — per round ONE
    degree-oriented wedge join over the canonical edges (the
    triangle_count plan: orient low→high so fan-out is bounded by
    O(√m) out-degree, count each triangle once, credit all 3 edges),
    filter support < k−2, ``localCheckpoint`` the survivor set, stop
    on a fixed point (edge count unchanged — an O(1) driver check) or
    ``max_iters``. Determinism: pure integer counting.

    Scale shape: each round's wedge join is the O(m^1.5)-bounded
    triangle plan over the CURRENT (shrinking) edge set; rounds are
    monotone decreasing, and most graphs stabilize in a handful of
    rounds (all acyclic mass vanishes in round one).
    """
    # per-round right-sizing, same rationale as k_core: the truss peel
    # shrinks monotonically and the compaction count doubles as the
    # fixpoint check
    cur, n_prev = _compact_if_small(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iters):
        e1 = cur.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = cur.select(F.col("a").alias("y"), F.col("b").alias("z"))
        e3 = cur.select(F.col("a").alias("x"), F.col("b").alias("z"))
        tri = (
            e1.join(e2, "y")
            .join(e3, ["x", "z"])
            .select("x", "y", "z")
        )
        support = (
            tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
            .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
            .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        cur, n_now = _compact_if_small(
            cur.select("a", "b")
            .join(support, ["a", "b"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select(
                "a", "b", F.coalesce(F.col("support"), F.lit(0)).alias("support")
            )
            .localCheckpoint()
        )
        if n_now == n_prev or n_now == 0:
            break
        n_prev = n_now
    return cur.select(
        F.col("a").alias("node_a"),
        F.col("b").alias("node_b"),
        "support",
    ).orderBy("node_a", "node_b")
