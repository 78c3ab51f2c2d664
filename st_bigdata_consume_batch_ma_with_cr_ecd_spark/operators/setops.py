"""Set operations (SURVEY.md §2.8, U1/U2).

The reference's ``sparkUnion`` helper builds ``(SELECT * ...) UNION
<ALL|DISTINCT> (SELECT * ...)`` over temp views (reference
``script/main.py:42-53``) — a *positional* union. We standardize on
``unionByName`` (schema-by-name, the safe contract) and document the
difference; ``allow_missing`` fills absent columns with NULLs.

``union_distinct`` at 100 TB: the DISTINCT is a full shuffle of the
union — prefer deduplicating the inputs first if they are individually
distinct on the output key.
"""

from __future__ import annotations

from collections.abc import Iterable
from functools import reduce

from pyspark.sql import DataFrame


def union_all_by_name(dfs: Iterable[DataFrame], *, allow_missing: bool = False) -> DataFrame:
    dfs = list(dfs)
    if not dfs:
        raise ValueError("union of zero DataFrames")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs)


def union_distinct_by_name(dfs: Iterable[DataFrame], *, allow_missing: bool = False) -> DataFrame:
    return union_all_by_name(dfs, allow_missing=allow_missing).distinct()


def union_slices(dfs: Iterable[DataFrame], how: str = "ALL") -> DataFrame:
    """Reference-API-shaped entry: ``how`` in {'ALL', 'DISTINCT'}
    (``script/main.py:42-53``)."""
    how = how.upper()
    if how == "ALL":
        return union_all_by_name(dfs)
    if how == "DISTINCT":
        return union_distinct_by_name(dfs)
    raise ValueError("how must be 'ALL' or 'DISTINCT'")
