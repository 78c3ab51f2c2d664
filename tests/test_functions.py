"""Column-machinery tests: nest/flatten round trip (incl. a hypothesis
property), renames, drops, when-chains, map construction, SQL templating."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.functions.columns import (
    add_literal_columns,
    bulk_rename,
    drop_columns,
    prefix_select,
    strip_prefix,
)
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.functions.maps import keyed_map_column
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.functions.nesting import (
    flatten_structs,
    nest_columns,
)
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.functions.whenchain import when_chain
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sources.sql_templates import render_sql

from .conftest import rows_set


# ---------------------------------------------------------------- nest/flatten


def test_nest_builds_struct_tree(spark):
    df = spark.createDataFrame([(1, 2, 3, 9)], "a_b_c int, a_b_d int, a_e int, top int")
    nested = nest_columns(df)
    assert nested.columns == ["a", "top"]
    assert nested.schema["a"].dataType.simpleString() == "struct<b:struct<c:int,d:int>,e:int>"
    row = nested.collect()[0]
    assert row.a.b.c == 1 and row.a.b.d == 2 and row.a.e == 3 and row.top == 9


def test_flatten_inverts_nest(spark):
    df = spark.createDataFrame([(1, 2, 3, 9)], "a_b_c int, a_b_d int, a_e int, top int")
    back = flatten_structs(nest_columns(df))
    assert back.columns == df.columns
    assert rows_set(back) == rows_set(df)


def test_nest_conflict_raises(spark):
    df = spark.createDataFrame([(1, 2)], "a int, a_b int")
    with pytest.raises(ValueError):
        nest_columns(df)


@given(
    names=st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=3), min_size=1, max_size=3
        ).map("_".join),
        min_size=1,
        max_size=5,
        unique=True,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_nest_flatten_roundtrip_property(spark, names):
    # prefix conflicts (`a` and `a_b` both present) are rejected by
    # contract — only generate conflict-free namespaces
    flat = [n for n in names if not any(m != n and n.startswith(m + "_") for m in names)]
    flat = [n for n in flat if not any(m != n and m.startswith(n + "_") for m in flat)]
    if not flat:
        return
    df = spark.createDataFrame([tuple(range(len(flat)))], ", ".join(f"`{n}` int" for n in flat))
    back = flatten_structs(nest_columns(df))
    assert set(back.columns) == set(flat)
    assert rows_set(back.select(*flat)) == rows_set(df.select(*flat))


# ---------------------------------------------------------------- columns


def test_bulk_rename_single_projection(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    out = bulk_rename(df, {"a": "x"})
    assert out.columns == ["x", "b"]


def test_strip_prefix(spark):
    df = spark.createDataFrame([(1, 2)], "cleaned_a int, other int")
    assert strip_prefix(df, "cleaned_").columns == ["a", "other"]


def test_drop_columns_ignores_absent(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    assert drop_columns(df, ["b", "no_such"]).columns == ["a"]
    assert drop_columns(df, ["nope"]).columns == ["a", "b"]


def test_prefix_select(spark):
    df = spark.createDataFrame([(1, 2, 3)], "geo_x int, geo_y int, other int")
    assert prefix_select(df, ["geo_"], extra=["other"]) == ["other", "geo_x", "geo_y"]


def test_add_literal_columns_typed_null(spark):
    df = spark.createDataFrame([(1,)], "a int")
    out = add_literal_columns(df, {"tag": "v1", "missing": None}, types={"missing": "double"})
    assert out.schema["missing"].dataType.simpleString() == "double"
    row = out.collect()[0]
    assert row.tag == "v1" and row.missing is None


# ---------------------------------------------------------------- when-chain / maps


def test_when_chain_order_and_fallback(spark):
    df = spark.createDataFrame([("a",), ("b",), ("z",)], "k string")
    c = when_chain(
        [(F.col("k") == "a", "first"), (F.col("k") == "b", "second")], otherwise="NOT_APPLICABLE"
    )
    got = {r.k: r.out for r in df.select("k", c.alias("out")).collect()}
    assert got == {"a": "first", "b": "second", "z": "NOT_APPLICABLE"}


def test_when_chain_empty_raises(spark):
    with pytest.raises(ValueError):
        when_chain([])


def test_keyed_map_column(spark):
    df = spark.createDataFrame([("HOUSE", "villa"), ("FLAT", None)], "et string, sub string")
    out = df.select(keyed_map_column(F.col("et"), F.col("sub")).alias("m"))
    got = [r.m for r in out.collect()]
    assert got == [{"house": "villa"}, {"flat": "NOT_APPLICABLE"}]


# ---------------------------------------------------------------- SQL templates


def test_render_sql_substitutes():
    assert render_sql("SELECT * FROM t WHERE d >= '{lo}'", lo="2024-01-01").endswith("'2024-01-01'")


def test_render_sql_missing_param_raises():
    with pytest.raises(KeyError):
        render_sql("SELECT {a} {b}", a=1)


def test_render_sql_escaped_braces():
    assert render_sql("SELECT map{{'k': 1}} {x}", x=2) == "SELECT map{'k': 1} 2"
