"""Property test: merge_upsert agrees with a straightforward pandas
dict-merge reference on random snapshots/change batches (unique keys per
side; NULLs allowed in data columns; random delete flags)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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
