"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in the engine package's workload registry
(``st_bigdata_consume_batch_ma_with_cr_ecd_spark/workloads/``) — one
entry per implemented operator from SURVEY.md §2 plus the LLM-pipeline
extensions; this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import apply_session_conf  # noqa: E402
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads import (  # noqa: E402
    oracle_sql_map,
    queries_map,
)
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.relational import (  # noqa: E402
    q1_pricing_summary,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing-summary shape) on sf0.001."""
    apply_session_conf(spark)
    return q1_pricing_summary(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM ops)."""
    base = queries_map()

    def with_conf(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_session_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__doc__ = fn.__doc__
        return wrapped

    return {name: with_conf(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query; keys absent here get
    the driver's weaker rows-only check (SimHash, hyperplane LSH)."""
    return oracle_sql_map()
