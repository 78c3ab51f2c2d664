"""Property test: the bucket-grid range joins agree with the naive
non-equi join (Spark's nested-loop path) on random data — for any
bucket width, since correctness must not depend on the tuning knob."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


@st.composite
def range_case(draw):
    points = draw(st.lists(st.integers(-30, 30), min_size=1, max_size=12))
    raw = draw(
        st.lists(st.tuples(st.integers(-30, 30), st.integers(0, 15)), min_size=1, max_size=8)
    )
    intervals = [(i, float(s), float(s + w)) for i, (s, w) in enumerate(raw)]
    width = draw(st.sampled_from([1.0, 3.0, 7.5, 64.0]))
    return [float(p) for p in points], intervals, width


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(range_case())
def test_point_in_interval_matches_naive(spark, case):
    points, intervals, width = case
    p = spark.createDataFrame([(i, x) for i, x in enumerate(points)], "pid int, x double")
    iv = spark.createDataFrame(intervals, "iid int, lo double, hi double")
    got = point_in_interval_join(p, iv, "x", "lo", "hi", bucket_width=width).select("pid", "iid")
    naive = p.join(iv, (p.x >= iv.lo) & (p.x < iv.hi)).select("pid", "iid")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(range_case())
def test_interval_overlap_matches_naive(spark, case):
    _, intervals, width = case
    left = spark.createDataFrame(intervals, "lid int, s double, e double")
    right = spark.createDataFrame(
        [(i + 100, lo - 1.0, hi + 1.0) for i, lo, hi in intervals], "rid int, s double, e double"
    )
    got = interval_overlap_join(
        left, right, "s", "e", "s", "e", bucket_width=width, right_prefix="r_"
    ).select("lid", "r_rid")
    naive = (
        left.alias("a")
        .join(
            right.alias("b"),
            (left.s < right.alias("b").e) & (right.alias("b").s < left.e),
        )
        .select("lid", "rid")
    )
    assert sorted(map(tuple, got.collect())) == sorted((l, r) for l, r in map(tuple, naive.collect()))
