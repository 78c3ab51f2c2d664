"""Top-1-per-group dedup (SURVEY.md §2.7, W1-W4).

The reference's single recurring window idiom: ``row_number() OVER
(PARTITION BY keys ORDER BY ord DESC) = 1`` then drop the rank column
(reference ``script/static_files/queries/1-basedata_first_query.sql:4-19``,
``3-basedata_df_final_query.sql:49-71``; rank drop ``script/main.py:123``).

Scale notes (100 TB):

- ``row_number`` over a window is a single hash shuffle on the
  partition keys followed by an in-partition sort — no global sort.
  Spark (3.5+) rewrites the ``rank = 1`` filter into
  ``WindowGroupLimit``, which pushes a per-partition top-1 *before*
  the shuffle (a partial "combiner" for windows), so the shuffle only
  carries one candidate row per (partition-key, mapper) — verify with
  ``explain``: look for ``WindowGroupLimit`` below the ``Exchange``.
- Callers must pass a *total* order (unique tiebreak last) or results
  are non-deterministic under ties (SURVEY.md §4 gotcha #1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANK_COL = "__rank"


def top_n_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    n: int = 1,
    rank_col: str = _RANK_COL,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the first ``n`` rows of each group under ``order_by``."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    out = ranked.where(F.col(rank_col) <= n)
    return out if keep_rank else out.drop(rank_col)


def latest_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_desc: Sequence[str | Column],
) -> DataFrame:
    """The reference's W1 shape: latest row per group, columns ordered
    descending (e.g. ``changeDate DESC, partitionChangeDate DESC``)."""
    order = [F.col(c).desc() if isinstance(c, str) else c.desc() for c in order_desc]
    return top_n_per_group(df, partition_by, order, n=1)


def drop_rank(df: DataFrame, rank_col: str = _RANK_COL) -> DataFrame:
    """P3 analogue of the reference's ``drop_fields(["rank"])``
    (``script/main.py:123``)."""
    return df.drop(rank_col)
