"""The flagship composite: the reference's full per-slice pipeline
(SURVEY.md §3 invocation chain / §7 phase 5) as one oracle-checked query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipelines.market_analytics import market_analytics_pipeline
from ..sources.readers import read_testdata
from .registry import register

_CLOCK = "2026-01-01 00:00:00"


def _slice_sql(tag: str, status: str, measure: str) -> str:
    """One slice's CTE chain — mirrors pipelines.market_analytics.build_slice."""
    return f"""
    latest_{tag} AS (
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM (
            SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderstatus = '{status}'
        ) WHERE rn = 1
    ),
    counters_{tag} AS (
        SELECT l_orderkey AS o_orderkey,
               count(*) AS n_items,
               CAST(round(sum(CAST({measure} AS DECIMAL(30,8))), 2) AS DOUBLE) AS slice_value
        FROM lineitem GROUP BY l_orderkey
    ),
    stale_{tag} AS (
        SELECT s.o_custkey AS stale_ck
        FROM (SELECT o_custkey, max(o_orderdate) AS m FROM orders
              WHERE o_orderstatus = '{status}' GROUP BY o_custkey) s
        JOIN (SELECT o_custkey, max(o_orderdate) AS m FROM orders GROUP BY o_custkey) a
          ON s.o_custkey = a.o_custkey
        WHERE s.m < a.m
    ),
    slice_{tag} AS (
        SELECT l.o_orderkey, l.o_custkey, l.o_orderdate, l.o_totalprice,
               c.c_name, c.c_mktsegment,
               coalesce(k.n_items, 0)        AS n_items,
               coalesce(k.slice_value, 0.0)  AS slice_value,
               '{tag}'                       AS slice
        FROM latest_{tag} l
        LEFT JOIN customer c ON l.o_custkey = c.c_custkey
        JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 0) act
          ON l.o_custkey = act.c_custkey
        LEFT JOIN counters_{tag} k ON l.o_orderkey = k.o_orderkey
        WHERE l.o_custkey NOT IN (SELECT stale_ck FROM stale_{tag})
    )"""


def _pipeline_oracle() -> str:
    open_sql = _slice_sql("open", "O", "l_extendedprice * (1 - l_discount)")
    fin_sql = _slice_sql("finished", "F", "l_extendedprice * (1 - l_discount) * (1 + l_tax)")
    return f"""
    WITH {open_sql},
    {fin_sql}
    SELECT *, TIMESTAMP '{_CLOCK}' AS changelog_timestamp, 'run-42' AS changelog_run_id
    FROM (SELECT * FROM slice_open UNION ALL SELECT * FROM slice_finished)
    """


@register(
    "pipeline_market_analytics",
    oracle=_pipeline_oracle(),
    doc=(
        "Full pipeline assembly (reference script/main.py:305-368): per-slice "
        "config-bound measure columns, W1 dedup -> J2 enrich -> J3 existence "
        "filter -> J4/A3 counters -> J5/J6 stale elimination, slices unioned "
        "(U1) with frozen changelog metadata (X8)."
    ),
    tags=("bench",),
)
def pipeline_market_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return market_analytics_pipeline(
        read_testdata(spark, sf_dir, "orders"),
        read_testdata(spark, sf_dir, "customer"),
        read_testdata(spark, sf_dir, "lineitem"),
        run_id="run-42",
        frozen_clock=_CLOCK,
    )
