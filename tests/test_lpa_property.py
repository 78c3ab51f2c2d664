"""label_propagation must agree exactly with a naive sequential
reference of the SAME contract (synchronous rounds, modal neighbor
label, ties to the smallest label) on arbitrary symmetric graphs —
pinning that the distributed join/argmax formulation implements the
deterministic variant, not free-tie LPA."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import label_propagation


def _naive_lpa(und: set[tuple[int, int]], rounds: int) -> dict[int, int]:
    nbrs: dict[int, list[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            votes = Counter(labels[m] for m in ns)
            top = max(votes.values())
            new[n] = min(lab for lab, c in votes.items() if c == top)
        labels = new
    return labels


def _spark_lpa(spark, und: set[tuple[int, int]], rounds: int) -> dict[int, int]:
    sym = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src int, dst int")
    return {r.node: r.lab for r in label_propagation(edges, rounds).collect()}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=1, max_size=20
    ),
    rounds=st.integers(1, 3),
)
def test_lpa_matches_sequential_reference(spark, pairs, rounds):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    if not und:
        return
    assert _spark_lpa(spark, und, rounds) == _naive_lpa(und, rounds)


def test_lpa_disjoint_cliques_converge_to_min_labels(spark):
    # disjoint triangles each converge to their own min label; with a
    # bridge added, min-tie LPA deliberately LEAKS the smaller label
    # across (bridge endpoints adopt the smallest neighbor label on
    # 1-1 vote ties) — both behaviors pinned against the reference.
    tri1 = {(0, 1), (1, 2), (0, 2)}
    tri2 = {(10, 11), (11, 12), (10, 12)}
    got = _spark_lpa(spark, tri1 | tri2, 3)
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}
    bridged = tri1 | tri2 | {(2, 10)}
    assert _spark_lpa(spark, bridged, 3) == _naive_lpa(bridged, 3)


def _naive_bfs(und: set[tuple[int, int]], sources: set[int], rounds: int) -> dict[int, int]:
    nbrs: dict[int, list[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    dist = {s: 0 for s in sources if s in nbrs}
    for _ in range(rounds):
        new = dict(dist)
        for n, d in dist.items():
            for m in nbrs[n]:
                if m not in new or new[m] > d + 1:
                    new[m] = d + 1
        dist = new
    return dist


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=1, max_size=20
    ),
    rounds=st.integers(0, 4),
)
def test_bfs_relaxation_matches_sequential_reference(spark, pairs, rounds):
    # mirror graph_bfs_distances' loop shape on a crafted symmetric
    # edge list: rounds of min-relaxation == the <=rounds-hop truth
    from pyspark.sql import functions as F

    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    if not und:
        return
    sources = {n for p in und for n in p if n <= 3}
    if not sources:
        return
    sym = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src int, dst int")
    dist = (
        edges.select(F.col("src").alias("node"))
        .where(F.col("node") <= 3)
        .distinct()
        .withColumn("dist", F.lit(0))
    )
    for _ in range(rounds):
        relax = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
    got = {r.node: r.dist for r in dist.collect()}
    assert got == _naive_bfs(und, sources, rounds)
