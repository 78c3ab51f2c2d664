"""Aggregation operators (SURVEY.md §2.6, A1-A3).

All three shapes the reference uses, as composable helpers. Everything
here is built-in hash aggregation: Spark plans partial (map-side) +
final aggregates automatically, so shuffle volume is one row per
(mapper, key) — already the 100-TB-correct shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_max(df: DataFrame, keys: Sequence[str], col: str, alias: str | None = None) -> DataFrame:
    """A1: ``SELECT keys, max(col) FROM df GROUP BY keys``
    (reference ``2-basedata_df_query.sql:19-25``)."""
    return df.groupBy(*keys).agg(F.max(col).alias(alias or f"max_{col}"))


def max_by_agg(value: str | Column, ordering: str | Column) -> Column:
    """A2: argmax — the value from the row with the max ordering
    (reference ``2-basedata_df_query.sql:22`` uses SQL ``max_by``).
    Pass a *unique* ordering column for deterministic results."""
    return F.max_by(value, ordering)


def sum_coalesce(col: str | Column, default: object = 0) -> Column:
    """A3: ``SUM(COALESCE(col, default))``
    (reference ``2-basedata_df_query.sql:30-32,40-42``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.coalesce(c, F.lit(default)))


DECIMAL_SUM_TYPE = "decimal(30,8)"


def exact_sum(col: str | Column) -> Column:
    """Order-independent sum of a double column, as double.

    Plain ``SUM(double)`` depends on accumulation order (partial aggs,
    partition count, engine) in the last ulps — visible once rounded at
    a boundary. Casting per-row to decimal makes the addition exact and
    therefore identical on every engine and every partitioning; the
    final cast back to double is a single deterministic rounding.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL_SUM_TYPE)).cast("double")


def rounded_sum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent ROUND(SUM(col), scale) of a double column.

    Rounding must happen while the value is still decimal: both Spark
    and DuckDB round decimals with exact HALF_UP, whereas rounding the
    *double* differs at half-way points (Spark rounds the shortest
    decimal repr, DuckDB the binary value). Oracle twin:
    ``CAST(round(sum(CAST(x AS DECIMAL(30,8))), s) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DECIMAL_SUM_TYPE)), scale).cast("double")


def exact_avg(col: str | Column) -> Column:
    """Order-independent mean: exact decimal sum / count, in doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c) / F.count(c)
