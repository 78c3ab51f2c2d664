"""Property test: asof_join agrees with pandas merge_asof — an
independent reference implementation — on random key/timestamp data.

Right side is constrained to unique (key, ts) (merge_asof's pick among
equal timestamps is otherwise ambiguous); the left side may duplicate
freely (covered via left_id)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.asof import asof_join


@st.composite
def asof_case(draw):
    keys = ["A", "B", "C"]
    n_right = draw(st.integers(1, 8))
    right_slots = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 20)),
            min_size=n_right,
            max_size=n_right,
            unique=True,
        )
    )
    right = [(k, t, float(100 * i)) for i, (k, t) in enumerate(right_slots)]
    left = draw(
        st.lists(
            st.tuples(st.sampled_from(keys + ["Z"]), st.integers(0, 20)),
            min_size=1,
            max_size=8,
        )
    )
    return left, right


@given(case=asof_case())
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas_merge_asof(spark, direction, case):
    left_rows, right_rows = case
    left_pd = pd.DataFrame(
        [{"lid": i, "sym": k, "t": t} for i, (k, t) in enumerate(left_rows)]
    )
    right_pd = pd.DataFrame(right_rows, columns=["sym", "t", "px"])

    left = spark.createDataFrame(left_pd, "lid int, sym string, t int")
    right = spark.createDataFrame(right_pd, "sym string, t int, px double")
    out = asof_join(
        left, right, on=["sym"], left_ts="t", right_ts="t",
        direction=direction, how="left", left_id="lid",
    )
    got = {r.lid: r.px for r in out.collect()}

    expected_pd = pd.merge_asof(
        left_pd.sort_values(["t", "lid"]),
        right_pd.sort_values("t"),
        on="t",
        by="sym",
        direction=direction,
        allow_exact_matches=True,
    )
    expected = {
        int(r.lid): (None if pd.isna(r.px) else float(r.px))
        for r in expected_pd.itertuples()
    }
    assert got == expected


def test_cogrouped_strategy_matches_join_window_strategy(spark, sf_dir):
    # the two physical strategies for the same logical as-of join must
    # agree row-for-row: JVM join+window (asof_join) vs Arrow cogroup +
    # pd.merge_asof (asof_join_cogrouped), on a right side deduped to a
    # unique (key, ts) grain so the pick is well-defined in both.
    from pyspark.sql import functions as F

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.dedup import top_n_per_group
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sources.readers import read_testdata

    events = read_testdata(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = top_n_per_group(
        read_testdata(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderdate"],
        [F.desc("o_orderkey")],
    ).select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")

    jvm = (
        asof_join(
            events,
            orders.withColumnRenamed("o_custkey", "user_id"),
            on=["user_id"],
            left_ts="ts",
            right_ts="o_orderdate",
            how="left",
            left_id="event_id",
        )
        .select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")
    )
    arrow = asof_join_cogrouped(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        schema="event_id bigint, user_id bigint, ts timestamp, o_orderkey bigint, o_totalprice double",
    )
    assert {tuple(r) for r in jvm.collect()} == {tuple(r) for r in arrow.collect()}
