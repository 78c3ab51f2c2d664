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


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: Sequence[str],
    *,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """CDC change feed between two table snapshots: classify every key
    as ``insert`` / ``delete`` / ``update`` in ONE full outer join on
    the key (null-safe column comparison); unchanged keys are dropped.

    The inverse of :func:`merge_upsert` — where merge applies a change
    batch to produce a snapshot, diff recovers the change batch from
    two snapshots (the "table_changes between versions" a lakehouse
    change feed serves, computable on plain parquet snapshots).

    Output: keys, ``change_type``, and ``<col>_before`` /
    ``<col>_after`` for every compared column (before-values null on
    insert, after-values null on delete). ``compare_cols`` defaults to
    all non-key columns of ``before``.

    Scale shape: one hash shuffle of each side on the key (or a
    broadcast if one snapshot is small); the null-safe compare runs
    inside the join's project, no second pass. At 100 TB prefer
    diffing partition-pruned slices (both sides filtered to the same
    partition range) so the join never touches cold data.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in before.columns if c not in keys]
    compare_cols = list(compare_cols)
    b = before.select(*keys, *compare_cols, F.lit(True).alias("__in_b")).alias("__b")
    a = after.select(*keys, *compare_cols, F.lit(True).alias("__in_a")).alias("__a")
    joined = b.join(a, on=keys, how="full_outer")
    in_b = F.col("__b.__in_b").isNotNull()
    in_a = F.col("__a.__in_a").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__b.{c}").eqNullSafe(F.col(f"__a.{c}"))
    change_type = (
        F.when(~in_b, F.lit("insert"))
        .when(~in_a, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out = joined.select(
        *[F.col(k) for k in keys],
        change_type.alias("change_type"),
        *[F.col(f"__b.{c}").alias(f"{c}_before") for c in compare_cols],
        *[F.col(f"__a.{c}").alias(f"{c}_after") for c in compare_cols],
    )
    return out.where(F.col("change_type").isNotNull())


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
