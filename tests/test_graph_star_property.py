"""large-star/small-star connected components must agree exactly with
min-label propagation on arbitrary pair graphs — chains (worst case for
propagation rounds), stars, cliques, and random edge soups."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _both(spark, pairs):
    edges = spark.createDataFrame(pairs, "src int, dst int")
    prop = {r.node: r.label for r in connected_components(edges).collect()}
    star = {r.node: r.label for r in connected_components_star(edges).collect()}
    return prop, star


def test_star_components_basic_shapes(spark):
    # chain (diameter 3), pair, self-loop — mirrors the propagation test
    prop, star = _both(spark, [(2, 1), (2, 3), (3, 4), (10, 11), (20, 20)])
    assert star == prop == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_star_components_long_chain(spark):
    # 0-1-2-...-15: log-round convergence territory
    prop, star = _both(spark, [(i, i + 1) for i in range(15)])
    assert star == prop
    assert set(star.values()) == {0}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), min_size=1, max_size=25
    )
)
def test_star_components_match_propagation(spark, pairs):
    prop, star = _both(spark, pairs)
    assert star == prop


def test_both_variants_warn_when_max_iter_exhausted(spark):
    # a diameter-8 chain cannot settle in one round under either
    # algorithm: the non-converged exit must be loud, not silent —
    # star-variant labels can even be contradictory (child + root rows)
    import pytest

    pairs = [(i, i + 1) for i in range(8)]
    edges = spark.createDataFrame(pairs, "src int, dst int")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(edges, max_iter=1)
    with pytest.warns(RuntimeWarning, match="did not stabilize"):
        connected_components_star(edges, max_iter=1)
