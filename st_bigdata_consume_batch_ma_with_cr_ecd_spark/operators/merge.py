"""Upsert (MERGE INTO) semantics over plain parquet (beyond reference).

The reference's closest move is delete-then-insert via ``purge_table``
+ catalog write (``main.py:397-416``); a modern CDC consumer wants
MERGE: apply a change batch (inserts/updates/deletes) onto a snapshot.
Without a table format (Delta/Iceberg) Spark has no transactional
MERGE on parquet, so this operator implements the standard
snapshot-rewrite pattern as ONE shuffle-efficient plan:

- ``merge_upsert`` computes the post-merge state: a full outer join on
  the key, change rows win, delete markers drop the row entirely.
- At write time, pair it with dynamic partition overwrite
  (``sinks.writers.overwrite_partitions``) so only partitions touched
  by the batch rewrite — the 100-TB property: cost scales with the
  CHANGED slice, not the table. Derive the touched-partition set from
  the batch (small) and semi-join the snapshot down to them first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    *,
    delete_col: str | None = None,
) -> DataFrame:
    """Apply ``changes`` onto ``snapshot`` by ``keys``: matching rows are
    replaced, new keys inserted, and rows whose change has
    ``delete_col = true`` removed. Column set = snapshot's columns.

    One full outer join on the key — at scale both sides shuffle once;
    if the batch is small Catalyst broadcasts it instead. For
    partitioned tables, pre-prune the snapshot to the batch's
    partitions (semi join) so the outer join never touches cold data.

    ``changes`` must carry at most one row per key (CDC batches should
    be pre-compacted to latest-per-key, e.g. via
    ``operators.dedup.top_n_per_group``); duplicate keys would fan the
    join out and emit duplicate output rows.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    data_cols = [c for c in snapshot.columns if c not in keys]
    # change-side presence is detected via a sentinel column that is never
    # null on the change side (data columns may legitimately hold nulls)
    marker = "__ch_present"
    joined = (
        snapshot.alias("__sn")
        .join(
            changes.withColumn(marker, F.lit(True)).alias("__ch"),
            on=list(keys),
            how="full_outer",
        )
    )
    present = F.col(f"__ch.{marker}").isNotNull()
    if delete_col is not None:
        joined = joined.where(~(present & F.coalesce(F.col(f"__ch.{delete_col}"), F.lit(False))))
    out_cols = [F.col(k) for k in keys] + [
        F.when(present, F.col(f"__ch.{c}")).otherwise(F.col(f"__sn.{c}")).alias(c)
        for c in data_cols
    ]
    return joined.select(*out_cols)
