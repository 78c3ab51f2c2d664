"""Property test: merge_upsert agrees with a straightforward pandas
dict-merge reference on random snapshots/change batches (unique keys per
side; NULLs allowed in data columns; random delete flags)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.merge import merge_upsert


@st.composite
def merge_case(draw):
    keys = st.integers(0, 12)
    vals = st.one_of(st.none(), st.integers(-5, 5))
    snap_keys = draw(st.lists(keys, unique=True, max_size=8))
    ch_keys = draw(st.lists(keys, unique=True, max_size=8))
    snap = [(k, draw(vals)) for k in snap_keys]
    changes = [(k, draw(vals), draw(st.booleans())) for k in ch_keys]
    return snap, changes


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(merge_case())
def test_merge_upsert_matches_dict_reference(spark, case):
    snap, changes = case
    snap_df = spark.createDataFrame(snap, "id int, v int") if snap else spark.createDataFrame([], "id int, v int")
    ch_df = (
        spark.createDataFrame(changes, "id int, v int, is_delete boolean")
        if changes
        else spark.createDataFrame([], "id int, v int, is_delete boolean")
    )
    got = {r.id: r.v for r in merge_upsert(snap_df, ch_df, ["id"], delete_col="is_delete").collect()}

    ref = {k: v for k, v in snap}
    for k, v, dele in changes:
        if dele:
            ref.pop(k, None)
        else:
            ref[k] = v
    assert got == ref


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(merge_case())
def test_snapshot_diff_recovers_the_change_feed(spark, case):
    """diff(before, merge(before, changes)) classifies exactly the keys
    the batch effectively touched — the CDC inverse property."""
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.merge import snapshot_diff

    snap, changes = case
    before = (
        spark.createDataFrame(snap, "id int, v int")
        if snap
        else spark.createDataFrame([], "id int, v int")
    )
    ch_df = (
        spark.createDataFrame(changes, "id int, v int, is_delete boolean")
        if changes
        else spark.createDataFrame([], "id int, v int, is_delete boolean")
    )
    after = merge_upsert(before, ch_df, ["id"], delete_col="is_delete")
    feed = {r.id: (r.change_type, r.v_before, r.v_after) for r in snapshot_diff(before, after, ["id"]).collect()}

    ref_before = {k: v for k, v in snap}
    ref_after = dict(ref_before)
    for k, v, dele in changes:
        if dele:
            ref_after.pop(k, None)
        else:
            ref_after[k] = v
    expected = {}
    for k in set(ref_before) | set(ref_after):
        if k not in ref_before:
            expected[k] = ("insert", None, ref_after[k])
        elif k not in ref_after:
            expected[k] = ("delete", ref_before[k], None)
        elif ref_before[k] != ref_after[k]:
            expected[k] = ("update", ref_before[k], ref_after[k])
    assert feed == expected


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(-1000, 1000)), min_size=1, max_size=30
    ),
    st.integers(1, 4),
)
def test_partial_agg_any_slicing_merges_to_full(spark, rows, n_slices):
    """Associativity/commutativity of the mergeable aggregate state:
    ANY partition of the input into slices merges to the full answer."""
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.aggregates import (
        finalize_agg,
        merge_partial_aggs,
        partial_agg,
    )

    df = spark.createDataFrame([(k, float(v)) for k, v in rows], "k string, v double")
    slices = [
        df.where((F.crc32(F.concat_ws("|", "k", "v")) % n_slices) == i)
        for i in range(n_slices)
    ]
    merged = finalize_agg(
        merge_partial_aggs([partial_agg(s, ["k"], "v") for s in slices], ["k"])
    )
    full = finalize_agg(partial_agg(df, ["k"], "v"))
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}
