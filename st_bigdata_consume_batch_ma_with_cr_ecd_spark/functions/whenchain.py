"""Programmatic CASE WHEN chains (SURVEY.md §2.9, X6).

The reference builds its estateType -> subTypes mapping as a loop of
``F.when`` calls with an ``otherwise`` fallback (reference
``script/helper.py:74-96``). Generalized: an ordered list of
(condition, value) pairs -> one Column. Pure expression — codegen'd,
no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def when_chain(branches: Sequence[tuple[Column, Column | object]], otherwise: Column | object = None) -> Column:
    if not branches:
        raise ValueError("when_chain needs at least one branch")
    out: Column | None = None
    for cond, val in branches:
        val_col = val if isinstance(val, Column) else F.lit(val)
        out = F.when(cond, val_col) if out is None else out.when(cond, val_col)
    return out.otherwise(otherwise if isinstance(otherwise, Column) else F.lit(otherwise))
