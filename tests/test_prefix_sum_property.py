"""Property test: the distributed prefix-sum (running_total) agrees with
the single-partition `sum() OVER (ORDER BY ...)` window it exists to
replace, on random values and partition counts."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.rowids import running_total


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.integers(0, 1000), min_size=1, max_size=30),
    nparts=st.integers(1, 5),
)
def test_running_total_matches_window(spark, vals, nparts):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r.k: r.cum_sum
        for r in running_total(df, ["k"], "v", num_partitions=nparts).collect()
    }
    acc, expect = 0, {}
    for k, v in rows:
        acc += v
        expect[k] = acc
    assert out == expect
