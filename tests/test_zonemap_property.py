"""Property test: the zone-map skipping read is ALWAYS identical to a
full scan + filter — for random data layouts (including all-null files,
single-value columns, empty ranges) and random bounds, open or closed.
The conservative-skip contract is the whole correctness story of the
statistics layer, so it gets the adversarial-input treatment."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
    create_versioned_table,
    read_versioned_table,
)


@st.composite
def table_and_bounds(draw):
    n = draw(st.integers(1, 40))
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(-5, 5).map(float)),
            min_size=n,
            max_size=n,
        )
    )
    parts = draw(st.lists(st.sampled_from(["A", "B"]), min_size=n, max_size=n))
    lo = draw(st.one_of(st.none(), st.integers(-6, 6).map(float)))
    hi = draw(st.one_of(st.none(), st.integers(-6, 6).map(float)))
    n_files = draw(st.integers(1, 5))
    return vals, parts, lo, hi, n_files


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(table_and_bounds())
def test_range_filter_equals_scan_plus_filter(spark, tmp_path_factory, case):
    vals, parts, lo, hi, n_files = case
    if lo is None and hi is None:
        lo = 0.0  # a vacuous filter tests nothing
    path = str(tmp_path_factory.mktemp("zm") / "t")
    rows = [(i, parts[i], vals[i]) for i in range(len(vals))]
    df = spark.createDataFrame(rows, "id long, part string, val double").repartition(
        n_files
    )
    create_versioned_table(df, path, ["part"])

    got = {
        r.id
        for r in read_versioned_table(
            spark, path, range_filter={"val": (lo, hi)}
        ).collect()
    }
    want = {
        i
        for i, v in enumerate(vals)
        if v is not None
        and (lo is None or v >= lo)
        and (hi is None or v <= hi)
    }
    assert got == want, (vals, parts, lo, hi, n_files)


# r5 advice (high): the ISO 'T'->' ' bound rewrite silently corrupted
# STRING-column range filters. Same full-scan-equivalence property,
# now over adversarial strings — 'T' anywhere, spaces, empties,
# prefix-of-each-other pairs — where any residual bound rewriting
# would misorder the zone-map compare and drop rows.
_STR = st.text(alphabet="TAb Tz", min_size=0, max_size=6)


@st.composite
def string_table_and_bounds(draw):
    n = draw(st.integers(1, 30))
    vals = draw(st.lists(st.one_of(st.none(), _STR), min_size=n, max_size=n))
    lo = draw(st.one_of(st.none(), _STR))
    hi = draw(st.one_of(st.none(), _STR))
    n_files = draw(st.integers(1, 4))
    return vals, lo, hi, n_files


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(string_table_and_bounds())
def test_string_range_filter_equals_scan_plus_filter(spark, tmp_path_factory, case):
    vals, lo, hi, n_files = case
    if lo is None and hi is None:
        lo = "T"
    path = str(tmp_path_factory.mktemp("zms") / "t")
    rows = [(i, "A", vals[i]) for i in range(len(vals))]
    df = spark.createDataFrame(rows, "id long, part string, name string").repartition(
        n_files
    )
    create_versioned_table(df, path, ["part"])

    got = {
        r.id
        for r in read_versioned_table(
            spark, path, range_filter={"name": (lo, hi)}
        ).collect()
    }
    want = {
        i
        for i, v in enumerate(vals)
        if v is not None
        and (lo is None or v >= lo)
        and (hi is None or v <= hi)
    }
    assert got == want, (vals, lo, hi, n_files)
