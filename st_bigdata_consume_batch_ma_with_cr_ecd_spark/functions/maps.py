"""Map-type construction (SURVEY.md §2.3, P8).

The reference emits ``subTypes`` as ``map<string,string>`` keyed by the
lower-cased estate type with a NOT_APPLICABLE fallback (reference
``script/helper.py:53-62,176-183``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def keyed_map_column(key: Column, value: Column, *, fallback: str = "NOT_APPLICABLE", lower_key: bool = True) -> Column:
    k = F.lower(key) if lower_key else key
    return F.create_map(k, F.coalesce(value, F.lit(fallback)))
