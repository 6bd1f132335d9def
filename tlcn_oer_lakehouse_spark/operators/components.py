"""Distributed connected components over near-duplicate pair graphs —
the cluster-resolution step that turns pairwise dedup output
(minhash/simhash/embedding pairs) into an actually deduplicated corpus:
each component keeps one canonical document, the rest are dropped or
soft-linked.  The reference stops at exact-fingerprint groups
(transformer.py:310-337); near-dup clustering is the scale-pipeline
extension (SlimPajama/RefinedWeb-style cluster dedup).

Algorithm: iterative minimum-label propagation on DataFrames — each
round every node adopts the smallest label in its closed neighborhood
(one symmetric-edge join + one min-aggregate per round, both keyed
shuffles), converging in O(graph diameter) rounds.  Near-dup components
are overwhelmingly small and star-shaped (copies of one source), so the
diameter is tiny; for adversarial long-path graphs the documented
production upgrade is the large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14), which
converges in O(log² n) rounds with the same per-round join shape.

The convergence check is one tiny aggregate per round (count of changed
labels) — a scalar to the driver, never data."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _symmetric_edges(pairs: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Both orientations of every pair from ONE pass over the input.

    The naive ``p ∪ swap(p)`` union references the pair subtree twice,
    and the pair input to these operators is typically an expensive,
    deliberately un-cached pipeline (the full MinHash near-dup plan for
    the dedup_clusters family) — so the union form paid that pipeline
    twice per materialization (r11 census: the doubled subtree, not the
    iterations, dominated dedup_clusters).  Exploding a 2-element
    struct array emits the same row multiset with a single upstream
    reference (guide §1.2: don't compute things twice)."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(src_col).alias("u"), F.col(dst_col).alias("v")),
                F.struct(F.col(dst_col).alias("u"), F.col(src_col).alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id reachable from the node."""
    edges = _symmetric_edges(pairs, src_col, dst_col).distinct().persist()
    # localCheckpoint, not persist: persist truncates recomputation but
    # NOT lineage — after k rounds the logical plan nests k join+agg
    # layers and AQE's plan-tree handling (re-optimization, tree-string
    # logging) grows superlinearly, which can exhaust a small driver
    # heap long before the data does.  Checkpointing each round keeps
    # every plan one-round shallow.  On a cluster with executor churn,
    # swap for reliable checkpoints (spark.sparkContext.setCheckpointDir
    # on durable storage) — same call shape.
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Silently returning unconverged labels mislabels every node
        # farther than max_iterations hops from its component minimum
        # (a 40-node path with the default budget splits into phantom
        # components).  Near-dup graphs converge in a handful of rounds,
        # so hitting this means the graph isn't the star-shaped kind
        # this propagation is for — use connected_components_star,
        # which needs O(log² n) rounds on any topology.
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (graph diameter exceeds the budget); use "
            "connected_components_star for deep/path-like graphs"
        )
    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))


def duplicate_clusters(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    cc=None,
) -> DataFrame:
    """One row per near-dup cluster: canonical (minimum) id, members as
    a sorted CSV string (driver-canonicalizer-safe), and size.  ``cc``
    swaps the component algorithm (default min-label propagation;
    pass :func:`connected_components_star` for deep graphs)."""
    comp = (cc or connected_components)(pairs, src_col, dst_col)
    return (
        comp.groupBy("component")
        .agg(
            F.min("node").alias("canonical_id"),
            F.concat_ws(",", F.sort_array(F.collect_list("node"))).alias(
                "member_ids_csv"
            ),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select("canonical_id", "member_ids_csv", "cluster_size")
    )


def deduplicated_corpus(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The cluster-dedup apply step: drop every non-canonical member of
    every near-dup cluster; untouched documents pass through.  One
    left-anti join against the (small) non-canonical member set."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def pagerank(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    n_iter: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected pair graph as iterative DataFrame
    algebra — the graph-centrality companion to connected components
    (e.g. ranking canonical candidates inside near-dup clusters by how
    networked they are).  Per iteration: one edge⋈rank equi-join keyed
    on the source + one per-node aggregate — the same bounded per-round
    shape as min-label propagation; the driver holds only the iteration
    counter.

    Determinism contract (mirrors the k-means recipe): contributions are
    summed as exact DECIMAL(38,18) (order-independent — float summation
    would drift with partition order), ranks round to 12 dp per
    iteration; symmetric edges mean every node has in- and out-edges, so
    there is no dangling-mass term to redistribute."""
    # the shared frames (edges, deg) and each iteration's ranks are
    # localCheckpoint'd — without it every reference replays the pair
    # derivation and the plan nests per iteration (measured 239
    # Exchange nodes and 9.2 s at sf0.01 for n_iter=2; 5 exchanges and
    # ~1 s after), the same plan-depth rationale as
    # connected_components
    edges = _symmetric_edges(pairs, src_col, dst_col).distinct().localCheckpoint()
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    nodes = edges.select(F.col("u").alias("node")).distinct()
    nst = nodes.agg(F.count(F.lit(1)).alias("n")).localCheckpoint()
    ranks = nodes.crossJoin(F.broadcast(nst)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "u"), "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("s")
        )
        ranks = sums.crossJoin(F.broadcast(nst)).select(
            "node",
            F.round(
                F.lit(1.0 - damping) / F.col("n") + F.lit(damping) * F.col("s"),
                12,
            ).alias("rank"),
        ).localCheckpoint()
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def triangle_counts(
    pairs: DataFrame,
    src_col: str = "u",
    dst_col: str = "v",
) -> DataFrame:
    """Per-node triangle counts over an undirected pair graph via
    degree-ordered edge orientation — the MapReduce-classic fix for "the
    curse of the last reducer" (Suri & Vassilvitskii, WWW'11): every
    undirected edge is oriented from its lower-(degree, id) endpoint to
    the higher one, so wedge enumeration fans out from each node's
    *lower-degree* endpoints only.  A hub of degree d contributes
    O(#edges-to-higher-degree-nodes²) wedges instead of O(d²) — total
    work is O(m^1.5) regardless of skew, the bound hand-partitioned
    hash schemes can't beat.

    Plan shape: degree aggregate → two broadcast-or-shuffle equi-joins
    to attach endpoint degrees → self-join of the oriented edge list on
    the wedge apex → one equi-join closing the wedge against the edge
    list → explode each triangle's three corners → count per node.  No
    inequality-only (nested-loop) joins anywhere: the closing edge is
    looked up by exact (lo, hi) key, which the total (degree, id) order
    makes canonical.
    """
    # checkpointed: the (often expensive) pair derivation would
    # otherwise replay per reference — degrees + both degree-attach
    # joins read it (r11; same guide-§1.2 rationale as `ori` below)
    p = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .distinct()
        .localCheckpoint()
    )
    # undirected degree without doubling the edge rows: every pair
    # contributes one endpoint row per side of the SAME physical row
    deg = (
        p.select(F.explode(F.array("u", "v")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        p.join(deg.select(F.col("u").alias("_u"), F.col("d").alias("du")),
               F.col("u") == F.col("_u")).drop("_u")
        .join(deg.select(F.col("u").alias("_v"), F.col("d").alias("dv")),
              F.col("v") == F.col("_v")).drop("_v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # the oriented edge list feeds three joins (both wedge sides + the
    # closing lookup) — checkpoint it once or the pair derivation and
    # degree joins replay per reference (measured 63 Exchange nodes
    # before, 7 after, at sf0.001)
    ori = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    ).localCheckpoint()
    e1 = ori.select(F.col("s"), F.col("t").alias("b"), F.col("dt").alias("db"))
    e2 = ori.select(F.col("s"), F.col("t").alias("c"), F.col("dt").alias("dc"))
    wedges = e1.join(e2, "s").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = ori.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tris = wedges.join(closing, ["b", "c"]).select(
        F.col("s").alias("a"), "b", "c"
    )
    corners = tris.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def k_core(
    pairs: DataFrame,
    k: int,
    src_col: str = "u",
    dst_col: str = "v",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, core_degree) for the k-core of an undirected pair graph —
    the maximal subgraph where every node keeps degree ≥ k — via
    iterative peeling: drop all nodes with current degree < k, restrict
    the edge set to survivors, repeat until the surviving-node count is
    stable.  O(diameter-ish) rounds; each round is one degree aggregate
    plus two semi-join edge restrictions, with a per-round
    ``localCheckpoint`` for the same plan-depth reason documented in
    :func:`connected_components`.  The fixpoint is unique (the k-core is
    well-defined), so ANY peeling order — including an oracle that
    unrolls more rounds than needed — converges to the identical node
    set and degrees, which is what makes the operator SQL-replayable.
    """
    p = pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v")).distinct()
    edges = _symmetric_edges(p, "u", "v").localCheckpoint()
    prev_nodes = -1
    deg = None
    for _ in range(max_rounds):
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("core_degree"))
        keep = deg.filter(F.col("core_degree") >= k).select("u")
        n = keep.count()
        if n == prev_nodes:
            break
        prev_nodes = n
        keep_v = keep.select(F.col("u").alias("v"))
        edges = (
            edges.join(keep, "u", "left_semi")
            .join(keep_v, "v", "left_semi")
            .localCheckpoint()
        )
    else:
        # Silently returning pre-fixpoint degrees would over-report the
        # core (same failure mode connected_components raises on).  Each
        # peel removes ≥1 node, so rounds are bounded by the node count;
        # hitting the budget means the caller sized max_rounds too small
        # for the graph, not that the loop cannot finish.
        raise RuntimeError(
            f"k_core did not reach its fixpoint in {max_rounds} rounds; "
            "raise max_rounds (each round removes at least one node, so "
            "the fixpoint is at most n rounds away)"
        )
    return (
        deg.filter(F.col("core_degree") >= k)
        .select(F.col("u").alias("node"), "core_degree")
    )


def connected_components_star(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = 30,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log² n)-round upgrade over min-label propagation's
    O(diameter) for long-path graphs, with the same per-round shape (one
    neighborhood min-aggregate + one keyed join), so it is the
    documented production swap for :func:`connected_components` when
    components may be deep chains rather than near-dup stars.

    - large-star: every node links its LARGER neighbors to the minimum
      of its closed neighborhood;
    - small-star: every node links its ≤ neighbors (and itself) to that
      minimum.

    Both preserve connectivity and strictly shrink potential; the
    fixpoint is a star forest whose centers are component minima.
    Convergence is detected with an order-independent edge-set signature
    (count + sum of per-edge hashes — one 1-row aggregate per round);
    a hash collision could only end the loop one round early on a
    changed-but-same-signature set, and the pinned equivalence test
    against min-label propagation guards exactly that."""
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("big"), F.least("u", "v").alias("small"))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = (
        edges.select(F.col("big").alias("node"))
        .unionByName(edges.select(F.col("small").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def signature(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("big", "small").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.select(F.col("big").alias("u"), F.col("small").alias("v")).unionByName(
            e.select(F.col("small").alias("u"), F.col("big").alias("v"))
        )
        m = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("mn"), F.col("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("big"), F.col("m").alias("small"))
            .filter(F.col("big") != F.col("small"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # neighbors ≤ u arrive oriented big→small already
        m = e.groupBy("big").agg(F.min("small").alias("mn")).select(
            "big", F.least(F.col("mn"), F.col("big")).alias("m")
        )
        linked = (
            e.join(m, "big")
            .select(F.col("small").alias("node"), F.col("m"))
            .unionByName(m.select(F.col("big").alias("node"), F.col("m")))
        )
        return (
            linked.filter(F.col("node") != F.col("m"))
            .select(F.col("node").alias("big"), F.col("m").alias("small"))
            .distinct()
        )

    sig = signature(edges)
    for _ in range(max_rounds):
        edges = small_star(large_star(edges)).localCheckpoint()
        new_sig = signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    labels = edges.select(F.col("big").alias("node"), F.col("small").alias("component"))
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def label_propagation(
    pairs: DataFrame,
    src_col: str = "u",
    dst_col: str = "v",
    max_rounds: int = 10,
) -> DataFrame:
    """(node, label) via synchronous label propagation (Raghavan et al.
    2007) run UNTIL CONVERGENCE: every node adopts its neighbors' most
    frequent label each round (count ties → smallest label), stopping
    at the first round that changes zero labels.  This is the operator
    a user reaches for — the fixed-round trajectory variant
    (queries/textops.py:g_label_propagation) exists as an oracle-exact
    replay, but its result is only meaningful if the round count covers
    the graph's actual mixing time.

    Per round: one symmetric-edge join + one (node, label) count + one
    per-node argmax window + one changed-label count — all keyed
    shuffles, linear in edges, with a per-round ``localCheckpoint``
    (same plan-depth rationale as :func:`connected_components`).  The
    changed count is an O(1) driver scalar per round, k-means-shaped.

    Synchronous LPA can oscillate on symmetric structures (a lone edge
    flips its two labels forever), so a fixpoint is not guaranteed in
    general: like :func:`connected_components`, budget exhaustion
    RAISES rather than returning a mid-oscillation labeling.
    """
    p = pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v")).distinct()
    edges = _symmetric_edges(p, "u", "v").localCheckpoint()
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        counts = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(F.col("u"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("u").orderBy(
            F.col("cnt").desc(), F.col("label").asc()
        )
        new_labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("node"), "label")
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"label_propagation did not converge in {max_rounds} rounds — "
            "the graph's mixing time exceeds the budget, or synchronous "
            "updates are oscillating; raise max_rounds, or use the "
            "fixed-round trajectory variant if a bounded-round labeling "
            "is acceptable"
        )
    return labels


def strongly_connected_components(
    edges_df: DataFrame,
    src_col: str = "u",
    dst_col: str = "v",
    max_peel_rounds: int = 20,
    max_prop_rounds: int = 40,
    trim_rounds: int = 3,
) -> DataFrame:
    """(node, scc_id) for every node of a DIRECTED edge set; scc_id is
    the minimum node id in the strongly connected component — the
    coloring / FW-BW algorithm (Orzan 2004; Slota et al. 2014
    "MultiStep"), the standard label-propagation SCC for vertex-centric
    engines:

    per peel round, on the still-unassigned subgraph:
      0. bounded TRIM: nodes with no in-edges or no out-edges are
         singleton SCCs — assign and drop them (cheap DAG peeling; a
         bounded optimization, correctness never depends on it).
      1. forward MAX-color fixpoint: color(v) = max id that reaches v
         (monotone, converges in diameter rounds; raises past the
         budget like every iterative operator here).
      2. roots are nodes with color(c) = c.  A BACKWARD reached-root
         flag fixpoint restricted to same-color edges marks
         {v : v →* c within color class c} — provably exactly SCC(c):
         color(v) = c already implies c →* v, and every node on a
         v →* c path shares the color (a higher-id ancestor of a path
         node would reach c, contradicting color(c) = c).
      3. assign each flagged class scc_id = min member id; peel.

    Every step is an equi-join + combinable aggregate; per-round
    ``localCheckpoint`` keeps plans one-round shallow (see
    connected_components).  Adversarial id-orderings (a decreasing-id
    path of singleton SCCs) need O(chain) peel rounds — the bounded-trim
    prelude handles the common DAG tendrils, and the budget raise is the
    documented contract for pathological condensation chains."""
    raw = edges_df.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    # nodes come from the UNFILTERED input: a node appearing only in
    # self-loops is a singleton SCC, not a disappearance
    nodes = (
        raw.select(F.explode(F.array("u", "v")).alias("node"))
        .distinct()
        .localCheckpoint()
    )
    edges0 = (
        raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    )
    assigned_parts: list[DataFrame] = []
    active_nodes = nodes
    active_edges = edges0
    for _ in range(max_peel_rounds):
        if active_nodes.isEmpty():
            break
        # 0. bounded trim of in-degree-0 / out-degree-0 nodes
        for _ in range(trim_rounds):
            has_out = active_edges.select(F.col("u").alias("node")).distinct()
            has_in = active_edges.select(F.col("v").alias("node")).distinct()
            core = has_out.join(has_in, "node").localCheckpoint()
            trimmed = active_nodes.join(core, "node", "left_anti")
            if trimmed.isEmpty():
                break
            assigned_parts.append(
                trimmed.select("node", F.col("node").alias("scc_id"))
                .localCheckpoint()
            )
            active_nodes = active_nodes.join(core, "node").localCheckpoint()
            active_edges = (
                active_edges.join(
                    active_nodes.select(F.col("node").alias("u")), "u"
                )
                .join(active_nodes.select(F.col("node").alias("v")), "v")
                .select("u", "v")
                .localCheckpoint()
            )
        if active_nodes.isEmpty():
            break
        # 1. forward MAX-color fixpoint
        colors = active_nodes.withColumn("color", F.col("node")).localCheckpoint()
        for _ in range(max_prop_rounds):
            in_max = (
                active_edges.join(
                    colors.select(F.col("node").alias("u"), "color"), "u"
                )
                .groupBy("v")
                .agg(F.max("color").alias("in_color"))
            )
            new_colors = (
                colors.join(in_max, colors.node == in_max.v, "left")
                .select(
                    "node",
                    F.greatest(
                        F.col("color"),
                        F.coalesce(F.col("in_color"), F.col("color")),
                    ).alias("color"),
                )
                .localCheckpoint()
            )
            changed = (
                new_colors.alias("n")
                .join(colors.alias("o"), "node")
                .filter(F.col("n.color") != F.col("o.color"))
                .count()
            )
            colors = new_colors
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"scc color propagation did not converge in "
                f"{max_prop_rounds} rounds (graph diameter exceeds the "
                "budget)"
            )
        # 2. backward reached-root flag fixpoint within color classes
        flags = colors.withColumn(
            "flag", F.col("color") == F.col("node")
        ).localCheckpoint()
        # same-color directed edges only
        for _ in range(max_prop_rounds):
            fwd_flag = (
                active_edges.join(
                    flags.select(
                        F.col("node").alias("v"),
                        F.col("color").alias("v_color"),
                        F.col("flag").alias("v_flag"),
                    ),
                    "v",
                )
                .filter(F.col("v_flag"))
                .select("u", "v_color")
                .distinct()
            )
            new_flags = (
                flags.join(
                    fwd_flag,
                    (flags.node == fwd_flag.u)
                    & (flags.color == fwd_flag.v_color),
                    "left",
                )
                .select(
                    "node",
                    "color",
                    (F.col("flag") | F.col("u").isNotNull()).alias("flag"),
                )
                .localCheckpoint()
            )
            changed = (
                new_flags.alias("n")
                .join(flags.alias("o"), "node")
                .filter(F.col("n.flag") != F.col("o.flag"))
                .count()
            )
            flags = new_flags
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"scc backward propagation did not converge in "
                f"{max_prop_rounds} rounds"
            )
        members = flags.filter(F.col("flag")).select("node", "color")
        scc_min = members.groupBy("color").agg(F.min("node").alias("scc_id"))
        assigned_parts.append(
            members.join(scc_min, "color").select("node", "scc_id")
            .localCheckpoint()
        )
        active_nodes = active_nodes.join(
            members.select("node"), "node", "left_anti"
        ).localCheckpoint()
        active_edges = (
            active_edges.join(
                active_nodes.select(F.col("node").alias("u")), "u"
            )
            .join(active_nodes.select(F.col("node").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint()
        )
        if active_nodes.isEmpty():
            break
    else:
        raise RuntimeError(
            f"scc peeling did not finish in {max_peel_rounds} rounds — "
            "the condensation chain exceeds the budget"
        )
    if not assigned_parts:
        # empty edge set → no nodes: a correctly-typed empty frame, not
        # an IndexError
        return nodes.select("node", F.col("node").alias("scc_id"))
    out = assigned_parts[0]
    for part in assigned_parts[1:]:
        out = out.unionByName(part)
    return out
