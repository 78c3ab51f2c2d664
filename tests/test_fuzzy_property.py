"""Property test: FastSS deletion-neighborhood fuzzy matching returns
EXACTLY the pair set of a brute-force levenshtein scan on random small
string corpora — the completeness theorem for distance 1 (substitution
collides on both delete-at-i variants, insertion/deletion collides on
the longer string's delete variant and the shorter string itself) plus
the verify step's false-positive elimination."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.fuzzy import (
    fuzzy_self_pairs,
)

# tiny alphabet + short strings: maximizes collision density (near-dup
# chains, equal strings after dedup, empty-adjacent strings)
_STRINGS = st.text(alphabet="ab", min_size=1, max_size=5)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_STRINGS, min_size=2, max_size=10))
def test_fuzzy_pairs_equal_bruteforce(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {(r.name_a, r.name_b, r.dist) for r in fuzzy_self_pairs(df, "name").collect()}
    uniq = sorted(set(names))
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) <= 1
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_STRINGS, min_size=2, max_size=10))
def test_fuzzy_pairs_k2_equal_bruteforce(spark, names):
    # the SymSpell-style depth-2 neighborhood must be COMPLETE at
    # distance 2 (and the verify exact) on adversarially dense corpora —
    # short strings over {a,b} maximize both neighborhood collisions and
    # true distance-2 chains (including pairs reached only via
    # insert+insert, delete+delete, and mixed scripts)
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_self_pairs(df, "name", max_distance=2).collect()
    }
    uniq = sorted(set(names))
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) <= 2
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_STRINGS, min_size=1, max_size=6),
    st.lists(_STRINGS, min_size=1, max_size=6),
)
def test_fuzzy_join_k2_equals_bruteforce(spark, left_names, right_names):
    # two-table blocking at distance 2, including duplicate input rows
    # (each occurrence must pair independently — the row-identity
    # contract) and cross-side empty-adjacent strings
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.fuzzy import fuzzy_join

    ldf = spark.createDataFrame([(n,) for n in left_names], "lname string")
    rdf = spark.createDataFrame([(n,) for n in right_names], "rname string")
    got = sorted(
        (r.lname, r.rname, r.dist)
        for r in fuzzy_join(ldf, rdf, "lname", "rname", max_distance=2).collect()
    )
    want = sorted(
        (a, b, _lev(a, b))
        for a in left_names
        for b in right_names
        if _lev(a, b) <= 2
    )
    assert got == want
