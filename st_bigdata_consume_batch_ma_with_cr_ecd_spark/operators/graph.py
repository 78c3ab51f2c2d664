"""Connected components over an edge list (beyond reference).

The missing last step of every near-dedup pipeline: LSH/Jaccard emit
candidate PAIRS, but retention policy needs CLUSTERS ("keep one doc
per group of mutual near-dups"). Pairs -> components is a graph
problem; this is min-label propagation expressed in DataFrame ops:

- every node starts labeled with itself;
- each round, a node's label becomes the min of its own and its
  neighbors' labels (one join edges x labels + one groupBy min);
- converged when no label changed (checked with a cheap limit(1)
  probe, not a full count).

Rounds needed = component diameter, and near-dup clusters are
near-cliques (diameter 2-3), so 3-4 rounds settle real corpora. Each
round is eagerly ``localCheckpoint``-ed: without it the loop builds an
exponentially deep lineage that chokes the planner long before data
size matters.

For extreme scale / pathological diameters,
:func:`connected_components_star` implements the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): O(log diameter) rounds, each star op a
``groupBy.min`` + equi join (never per-node neighbor lists).
Property-tested equivalent to propagation on arbitrary graphs.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 20,
    edges_distinct: bool = False,
) -> DataFrame:
    """Label each node of the (undirected) pair graph with the smallest
    node id reachable from it. Returns ``(node, label)`` — rows only
    for nodes that appear in some edge; singletons are their own
    cluster by definition (coalesce on the consumer side).

    ``edges_distinct=True`` skips the dedup shuffle on the symmetrized
    edge list — safe when the input pairs are already distinct with
    src < dst (LSH candidate pairs are); duplicate edges would only
    inflate the per-round join, never change the result.
    """
    # checkpoint the DIRECTED edges BEFORE symmetrizing: the union's
    # two branches would otherwise each evaluate the upstream pair
    # pipeline (shuffle reuse does not always cover both sides), so an
    # expensive generator (FastSS blocking, LSH banding) ran twice
    # before round 0 — measured ~1.4x on the ER capstone (r5 bench).
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if not edges_distinct:
        # the distinct shuffles the doubled edge list; materialize it
        # so the per-round joins replay in-memory blocks, not the plan
        sym = sym.distinct().localCheckpoint(eager=True)

    # each round's aggregate carries the node's previous label through
    # as __own, so the convergence probe is a filter over the freshly
    # checkpointed round output — no extra join job per round.
    null_label = F.when(F.lit(False), F.col("label"))  # typed NULL matching the node type
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    converged = False
    for it in range(max_iter):
        own = labels.select("node", "label", F.col("label").alias("__own"))
        # explicit sort-merge hint: BOTH sides of the round join are
        # data-sized (2 rows per edge, 1 per node), so broadcast is
        # never the right strategy at scale — and Catalyst's size
        # estimate for explode-generated pair plans (grouped-bucket
        # generators) is a severe UNDERestimate, which otherwise makes
        # AQE broadcast the entire edge list every round (measured 2x
        # slower per round at sf0.1, an OOM at 100 TB).
        neighbor_labels = sym.hint("merge").join(
            labels.withColumnRenamed("node", "dst"), on="dst"
        ).select(F.col("src").alias("node"), "label", null_label.alias("__own"))
        new_labels = (
            own.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("__own").alias("__own"))
        )
        # LAZY checkpoint: the convergence probe right below is the
        # materializing action, so checkpoint + probe share ONE
        # scheduled job per round instead of two (r13: 4.9 -> 4.5 s on
        # the 6-round ER closure; the win repeats for every closure
        # consumer). Lineage stays flat one round behind — each probe
        # finalizes its round's blocks (Spark computes any partitions
        # the limit(1) short-circuit skipped when it finalizes a local
        # checkpoint), and round 0, which is never probed, nests
        # exactly one un-materialized level into round 1's job.
        new_labels = new_labels.localCheckpoint(eager=False)
        # round 0 always changes something when any edge exists — skip
        # the convergence probe (one fewer job per call)
        if it > 0:
            changed = new_labels.where(F.col("label") < F.col("__own")).limit(1).count()
            if changed == 0:
                converged = True
                labels = new_labels.select("node", "label")
                break
        labels = new_labels.select("node", "label")
    if not converged and max_iter > 0:
        warnings.warn(
            f"connected_components: label propagation did not converge in "
            f"{max_iter} rounds — a component with diameter > {max_iter} may "
            "carry non-minimal labels. Raise max_iter or use "
            "connected_components_star (O(log diameter) rounds).",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("node", "label")


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the extreme-scale alternative to min-label
    propagation: rounds needed are O(log diameter), not O(diameter),
    so chain-shaped components (pathological for propagation) settle
    in a handful of rounds.

    Both star operations are expressed WITHOUT per-node neighbor lists
    (a ``collect_list`` would melt on super-nodes): each is one
    ``groupBy.min`` + one equi join —

    - large-star: for every node u with m(u) = min(Γ(u) ∪ {u}),
      re-point each STRICTLY LARGER neighbor v > u at m(u);
    - small-star: with m⁻(u) = min over smaller-or-equal neighbors,
      re-point each v ≤ u (and u itself) at m⁻(u).

    Every intermediate edge (a, b) keeps the invariant b < a (parent
    pointers toward smaller ids). Convergence = the edge multiset is
    stable; checked with a (count, sum-of-hashes) fingerprint — two
    longs to the driver per round. Returns (node, label) like
    :func:`connected_components`.
    """
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # self-loop nodes carry no connectivity but ARE nodes of the graph —
    # they come back as their own roots at the end
    selfies = raw.where(F.col("a") == F.col("b")).select(F.col("a").alias("node")).distinct()
    e = raw.where(F.col("a") != F.col("b"))
    # parent-pointer form: b < a
    cur = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).distinct()
    cur = cur.localCheckpoint(eager=True)

    def fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64(F.col("a"), F.col("b"))), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def large_star(df: DataFrame) -> DataFrame:
        # symmetric neighborhoods
        sym = df.unionByName(df.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = sym.groupBy("a").agg(F.least(F.min("b"), F.col("a")).alias("m"))
        # v > u re-points at m(u); output in parent-pointer form (m < v).
        # merge hint: m is node-sized (data-sized at scale) and pair-
        # generator plans underestimate sizes, so an AQE broadcast of m
        # would OOM at 100 TB (same guard as connected_components).
        out = (
            sym.where(F.col("b") > F.col("a"))
            .join(m.hint("merge"), "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        return out.where(F.col("a") != F.col("b")).distinct()

    def small_star(df: DataFrame) -> DataFrame:
        # df already has b < a: Γ⁻ neighborhoods are exactly the edges
        m = df.groupBy("a").agg(F.min("b").alias("m"))
        with_m = df.join(m.hint("merge"), "a")
        # each smaller neighbor b re-points at m(a)...
        repoint = with_m.select(F.col("b").alias("a"), F.col("m").alias("b"))
        # ...and a keeps its pointer to m(a)
        keep = with_m.select("a", F.col("m").alias("b"))
        out = repoint.unionByName(keep)
        return out.where(F.col("a") != F.col("b")).distinct()

    converged = False
    fp = fingerprint(cur)
    for _ in range(max_iter):
        prev = cur
        nxt = small_star(large_star(cur)).localCheckpoint(eager=True)
        nfp = fingerprint(nxt)
        cur = nxt
        if nfp == fp:
            # fingerprint equality is necessary, not sufficient (a
            # (count, sum-of-xxhash64) collision could stop a round
            # early) — confirm EXACTLY on the candidate final round
            # only: counts match, so one-directional exceptAll empty
            # <=> the edge multisets are equal. On a non-converged
            # exit a node could appear as both child and root with
            # two conflicting labels, so this must be certain.
            if cur.exceptAll(prev).isEmpty():
                converged = True
                break
        fp = nfp
    if not converged and max_iter > 0:
        warnings.warn(
            f"connected_components_star: edge set did not stabilize in "
            f"{max_iter} rounds — labels may be non-minimal and a node can "
            "carry conflicting child/root rows. Raise max_iter.",
            RuntimeWarning,
            stacklevel=2,
        )
    # converged: every edge points a -> component minimum
    labels = cur.select(F.col("a").alias("node"), F.col("b").alias("label"))
    roots = cur.select(F.col("b").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    base = labels.unionByName(roots).distinct()
    # a self-loop node that also has real edges already carries its
    # component label — only truly lone ones label themselves.
    # merge pin: base is NODE-sized off checkpoint-inherited estimates
    # — an estimate-driven broadcast of it would OOM at 100 TB (r6
    # hazard sweep; SCALE.md round 6)
    lone = selfies.join(base.select("node").hint("merge"), "node", "left_anti").withColumn(
        "label", F.col("node")
    )
    return base.unionByName(lone)


def assign_cluster_ids(
    items: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str,
    pair_b: str,
    *,
    max_iter: int = 20,
    pairs_distinct: bool = False,
) -> DataFrame:
    """Items + near-dup pairs -> one ``cluster_id`` per item (its
    component's min id; singletons cluster with themselves). The
    retention policy "keep one per cluster" is then a trivial
    ``where(id == cluster_id)``."""
    comps = connected_components(
        pairs, pair_a, pair_b, max_iter=max_iter, edges_distinct=pairs_distinct
    )
    # merge hint for the same reason as the closure's round join: comps
    # is node-sized (data-sized at scale), and its size estimate is
    # inherited from the pair generator's plan, which grouped-bucket
    # generators UNDERestimate — an unguarded AQE broadcast of the
    # whole component map is an OOM at 100 TB.
    joined = items.join(
        comps.hint("merge").withColumnRenamed("node", id_col), on=id_col, how="left"
    )
    return joined.withColumn(
        "cluster_id", F.coalesce(F.col("label"), F.col(id_col))
    ).drop("label")


def cluster_sizes(
    assigned: DataFrame, cluster_col: str = "cluster_id"
) -> DataFrame:
    """Attach each row's cluster multiplicity as ``cluster_size`` with
    ONE exchange: ``count(*)`` over a cluster-partitioned window. The
    previous idiom at every call site — ``groupBy(cluster).count()``
    then join back onto ``assigned`` — pays two assigned-sized
    exchanges plus a sort-merge join for the same rows (r13 §2.4);
    the window count over the full partition frame equals the joined
    group count row for row, and a hot cluster lands on one task under
    either shape (identical skew profile). No ``orderBy`` on purpose:
    the frame is the whole partition, so the window needs only the
    partitioning, not a sort order.

    NULL-key semantics differ from the join idiom this replaced (r13
    ADVICE): the old inner join DROPPED rows with a NULL cluster key
    (NULL never equi-joins), while the window KEEPS them and counts
    the NULL partition. Every current caller coalesces the cluster id
    to the row id before calling (``assign_cluster_ids``), so no NULLs
    reach this today — new callers porting off the join idiom must
    filter NULL keys first if they relied on the implicit drop."""
    from pyspark.sql.window import Window

    return assigned.withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy(cluster_col))
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``rounds`` peel steps toward the k-core of a SYMMETRIC edge list
    (every undirected edge present in both directions): each round
    drops nodes whose current degree is below ``k``, which lowers their
    neighbors' degrees and cascades into the next round — pendant
    chains peel one node per round, so ``rounds`` bounds the cascade
    depth exactly like the fixed iteration budget on PageRank
    (monotone: state only ever shrinks, so per-round cost falls).

    Per round: one map-side-combined degree aggregate plus two
    equi-joins of the edge list against the shrinking keep-set, with an
    eager ``localCheckpoint`` to keep lineage flat (the iterative-loop
    contract shared with :func:`connected_components`). Returns the
    surviving edge list (same columns, still symmetric).
    """
    if k < 1 or rounds < 0:
        raise ValueError("kcore_peel requires k >= 1 and rounds >= 0")
    for _ in range(rounds):
        keep = (
            edges.groupBy(src)
            .agg(F.count(F.lit(1)).alias("__deg"))
            .where(F.col("__deg") >= k)
            .select(F.col(src).alias("__node"))
        )
        # merge hints: the round-1 keep-set is nearly node-sized (only
        # later rounds shrink it), and library callers can feed
        # explode-generated edge lists whose size estimates are bogus
        # underestimates (see connected_components) — a mis-broadcast
        # of the keep-set is an OOM at 100 TB.
        edges = (
            edges.join(keep.select(F.col("__node").alias(src)).hint("merge"), src)
            .join(keep.select(F.col("__node").alias(dst)).hint("merge"), dst)
            .select(src, dst)
            .localCheckpoint(eager=True)
        )
    return edges


def oriented_triangle_count(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Exact triangle count over an UNDIRECTED distinct edge list
    (one row per edge, ``u < v``), returned as a single row
    ``(n_nodes, n_edges, n_triangles)``.

    The join runs on DEGREE-ORIENTED edges — each edge points from its
    (degree, id)-smaller endpoint — which bounds every node's
    out-degree by O(sqrt(edges)) and kills the wedge explosion at hub
    nodes (the standard compact-forward scheme; cf. Suri & Vassilvitskii
    2011 for the MapReduce formulation). Exactly one node of each
    triangle owns both wedge edges under the acyclic orientation, and
    ``a < b`` dedups the two orderings of that wedge, so every triangle
    is counted exactly once.

    The edge list is lazily checkpointed: it feeds degrees, orientation,
    and the closing join, and re-deriving a generated pair list three
    times would triple the dominant cost (and re-expose the
    explode-underestimate AQE hazard — see SCALE.md round 5).

    Every join pins ``hint("merge")``: all four build sides (degree
    vectors, the second wedge leg, the closing edge list) are node- or
    edge-sized — data-sized at scale by definition — while Catalyst's
    estimate for the explode-generated, checkpoint-inherited edge list
    is bogusly tiny (the r5 mis-broadcast class), so an unpinned plan
    BROADCASTS the edge list and dies at 100 TB. Measured at sf0.1 the
    pins are also simply faster (~6.6s -> ~5.3s warm): shuffling the
    wedge join beats rebuilding four hashed relations of the same edge
    data (SCALE.md round 6)."""
    e = edges.select(F.col(u).alias("u"), F.col(v).alias("v")).localCheckpoint(
        eager=False
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    with_deg = e.join(du.hint("merge"), "u").join(dv.hint("merge"), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    w1 = oriented.select("src", F.col("dst").alias("a"))
    w2 = oriented.select("src", F.col("dst").alias("b"))
    wedges = w1.join(w2.hint("merge"), "src").where(F.col("a") < F.col("b"))
    closing = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    tri = wedges.join(closing.hint("merge"), ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = e.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    # explicit broadcasts: keyless aggregates are exactly 1 row by
    # construction — saying so in code (rather than letting the
    # estimate decide) keeps the hazard sweep's signal clean
    return (
        nodes.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``rounds`` SYNCHRONOUS label-propagation steps over a symmetric
    edge list: every node starts labeled with itself; each round it
    adopts the modal label among its neighbors, ties to the SMALLEST
    label. The tie rule is the determinism contract — free-tie LPA is
    famously run-dependent, but min-tie synchronous LPA is a pure
    function of the graph, so fixed-round results replay bit-for-bit
    on any engine or partitioning.

    Per round: one shuffle for the (node, label) vote counts (edge
    list joined to the label vector, map-side combined) plus a
    WindowGroupLimit argmax, localCheckpointed to keep the iterative
    lineage flat. Returns (node, lab). Isolated nodes never appear in
    a symmetric edge list, so every node has >= 1 neighbor vote."""
    from .dedup import top_n_per_group

    if rounds < 0:
        raise ValueError("label_propagation requires rounds >= 0")
    labels = (
        edges.select(F.col(src).alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        # merge hint on the node-sized label vector — same
        # mis-broadcast guard as connected_components' round join
        votes = (
            edges.join(labels.withColumnRenamed("node", dst).hint("merge"), dst)
            .groupBy(F.col(src).alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        labels = (
            top_n_per_group(votes, ["node"], [F.col("__c").desc(), F.col("lab").asc()])
            .select("node", "lab")
            .localCheckpoint(eager=True)
        )
    return labels
