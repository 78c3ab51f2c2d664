"""kcore_peel run to a fixed point must agree exactly with the naive
sequential peel (repeatedly delete any node of degree < k) on arbitrary
undirected graphs — the classic theorem that the k-core is unique and
order-independent, so the DISTRIBUTED round-synchronous peel and the
one-node-at-a-time reference land on the same subgraph."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import kcore_peel


def _naive_kcore(undirected: set[tuple[int, int]], k: int) -> set[tuple[int, int]]:
    """Sequential reference: peel ANY degree-<k node until none remain."""
    edges = {(a, b) for a, b in undirected if a != b}
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        doomed = {n for n, d in deg.items() if d < k}
        if not doomed:
            return edges
        edges = {(a, b) for a, b in edges if a not in doomed and b not in doomed}


def _spark_kcore(spark, undirected: set[tuple[int, int]], k: int) -> set[tuple[int, int]]:
    und = [(a, b) for a, b in undirected if a != b]
    if not und:
        return set()
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src int, dst int")
    # rounds = node count bounds the cascade depth (each productive
    # round removes at least one node), so this always reaches the core
    n_nodes = len({x for p in und for x in p})
    core = kcore_peel(edges, k, n_nodes)
    out = {(r.src, r.dst) for r in core.collect()}
    return {(a, b) for a, b in out if a < b}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=1, max_size=22
    ),
    k=st.integers(2, 4),
)
def test_kcore_fixed_point_matches_sequential_peel(spark, pairs, k):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    assert _spark_kcore(spark, und, k) == _naive_kcore(und, k)


def test_kcore_clique_survives_chain_dissolves(spark):
    clique = {(a, b) for a in range(4) for b in range(4) if a < b}
    chain = {(10, 11), (11, 12), (12, 13)}
    core = _spark_kcore(spark, clique | chain, 3)
    assert core == clique  # K4 is 3-regular; the chain peels away entirely
