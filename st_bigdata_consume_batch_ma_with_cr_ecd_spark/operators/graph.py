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
size matters. At extreme scale swap in the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond") — same DataFrame skeleton, fewer rounds.
"""

from __future__ import annotations

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
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if not edges_distinct:
        sym = sym.distinct()
    sym = sym.localCheckpoint(eager=True)  # reused every round — cut the source plan

    # each round's aggregate carries the node's previous label through
    # as __own, so the convergence probe is a filter over the freshly
    # checkpointed round output — no extra join job per round.
    null_label = F.when(F.lit(False), F.col("label"))  # typed NULL matching the node type
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for it in range(max_iter):
        own = labels.select("node", "label", F.col("label").alias("__own"))
        neighbor_labels = sym.join(
            labels.withColumnRenamed("node", "dst"), on="dst"
        ).select(F.col("src").alias("node"), "label", null_label.alias("__own"))
        new_labels = (
            own.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("__own").alias("__own"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        # round 0 always changes something when any edge exists — skip
        # the convergence probe (one fewer job per call)
        if it > 0:
            changed = new_labels.where(F.col("label") < F.col("__own")).limit(1).count()
            if changed == 0:
                break
        labels = new_labels.select("node", "label")
    return labels.select("node", "label")


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
    joined = items.join(
        comps.withColumnRenamed("node", id_col), on=id_col, how="left"
    )
    return joined.withColumn(
        "cluster_id", F.coalesce(F.col("label"), F.col(id_col))
    ).drop("label")
