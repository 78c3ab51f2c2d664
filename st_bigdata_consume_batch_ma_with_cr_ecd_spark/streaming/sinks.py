"""Streaming sinks: exactly-once parquet output via foreachBatch +
idempotent partition overwrite.

Structured Streaming's file sink is append-only; a crashed-and-retried
micro-batch appends its rows TWICE. The standard fix is
``foreachBatch`` + an idempotent batch write: dynamic partition
overwrite replaces each partition the batch touches, so re-running a
micro-batch converges to the same files instead of duplicating them
(the checkpoint's epoch tracking plus write idempotence = effective
exactly-once).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.writers import overwrite_partitions


def partition_overwrite_batch_writer(
    path: str,
    partition_by: Sequence[str],
    *,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callback: optionally transform the
    micro-batch, then idempotently overwrite exactly the partitions it
    contains. Retrying the same epoch rewrites the same partitions with
    the same rows — no duplicates."""

    def write(batch: DataFrame, epoch_id: int) -> None:
        out = transform(batch) if transform is not None else batch
        if out.isEmpty():
            return
        overwrite_partitions(out, path, partition_by)

    return write


def run_stream_with_batch_sink(
    stream: DataFrame,
    path: str,
    partition_by: Sequence[str],
    *,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Drain a bounded stream through the idempotent partition sink
    (availableNow, so tests and backfills terminate)."""
    (
        stream.writeStream.foreachBatch(
            partition_overwrite_batch_writer(path, partition_by, transform=transform)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def cow_merge_batch_writer(
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str],
    *,
    delete_col: str | None = None,
    compact: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callback that MERGEs each micro-batch into a
    copy-on-write parquet table — the streaming CDC-apply pattern
    (Kafka change feed -> continuously maintained table) on plain
    parquet, no lakehouse library.

    Exactly-once story: ``merge_cow_table`` is idempotent for a given
    batch (re-applying converges — the crash-retry property pinned by
    tests/test_cow_table.py), and the stream checkpoint replays at
    micro-batch granularity, so a crashed epoch re-merges to the same
    state instead of double-applying.

    ``compact``: optional pre-merge reduction (e.g. latest-per-key via
    ``operators.dedup.top_n_per_group``) — a CDC batch must carry at
    most one row per key before merging.
    """

    def write(batch: DataFrame, epoch_id: int) -> None:
        from ..sinks.cowtable import merge_cow_table

        out = compact(batch) if compact is not None else batch
        if out.isEmpty():
            return
        merge_cow_table(
            batch.sparkSession, path, out, keys, partition_by, delete_col=delete_col
        )

    return write


def versioned_merge_batch_writer(
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str],
    *,
    delete_col: str | None = None,
    compact: Callable[[DataFrame], DataFrame] | None = None,
    app_id: str = "stream",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` CDC-apply into the VERSIONED table
    (sinks.versioned): each micro-batch lands as one atomic table
    version, so the stream's history becomes a queryable audit log —
    ``read_versioned_table(version=N)`` is the table exactly as of
    micro-batch N's commit.

    Exactly-once here is TRANSACTIONAL, not merely convergent: the
    merge records ``(app_id, epoch_id)`` in the manifest it publishes,
    and a replayed epoch (crash between the table commit and the
    checkpoint commit) is detected inside the same atomic rename that
    would publish it — skipped outright rather than re-applied. That
    is strictly stronger than the CoW writer's idempotent-re-merge
    story and holds even with concurrent writers on the same table.
    """

    def write(batch: DataFrame, epoch_id: int) -> None:
        from ..sinks.versioned import merge_versioned_table

        out = compact(batch) if compact is not None else batch
        if out.isEmpty():
            return
        merge_versioned_table(
            batch.sparkSession,
            path,
            out,
            keys,
            partition_by,
            delete_col=delete_col,
            txn=(app_id, epoch_id),
        )

    return write


def cms_batch_writer(
    path: str,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    app_id: str = "cms-stream",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` writer maintaining a LIVE Count-Min sketch
    (llm/sketches.py) in a versioned table: each micro-batch's delta
    sketch adds cell-wise into the stored grid, so the table always
    holds the frequency sketch of everything streamed so far — queryable
    mid-stream with ``cms_estimate``, time-travelable per micro-batch
    (version N = the sketch as of batch N), and bounded at
    depth*width cells forever no matter how many keys stream by.

    Exactly-once: the ADD must not double-apply on epoch replay, so the
    merge carries ``txn=(app_id, epoch_id)`` — the same atomic
    manifest-rename idempotence as the CDC writer, which matters more
    here because a replayed ADD is silently wrong (counts inflate)
    rather than merely redundant. The table is created EMPTY up front
    so the first data batch also rides the transactional path."""

    def write(batch: DataFrame, epoch_id: int) -> None:
        from ..llm.sketches import count_min_cells
        from ..sinks.versioned import (
            VersionedTableError,
            create_versioned_table,
            list_versions,
            merge_versioned_table,
        )

        spark = batch.sparkSession
        # create-before-empty-check: the table must exist from batch 0
        # even when the stream cold-starts empty — mid-stream consumers
        # read the (empty) sketch rather than hitting a missing manifest
        if not list_versions(spark, path):
            try:
                empty = spark.createDataFrame([], "row int, bucket long, c long")
                create_versioned_table(empty, path, ["row"])
            except VersionedTableError:
                pass  # another writer / a replay created it — fine
        if batch.isEmpty():
            return  # nothing to add this epoch
        # pin the delta once (deterministic per epoch) — the ADD side
        # is recomputed per merge ATTEMPT instead: a stale pre-read
        # would commit sums that overwrite a concurrent writer's counts
        # if this merge loses the optimistic race and retries (r4
        # advice: lost update). The callable receives each attempt's
        # fresh snapshot, making read-add-merge atomic under the
        # manifest-rename concurrency protocol.
        delta = count_min_cells(batch, key_col, depth=depth, width=width).localCheckpoint(
            eager=True
        )
        d = delta.select("row", "bucket", F.col("c").alias("__d"))

        def summed(snapshot: DataFrame) -> DataFrame:
            c = snapshot.select("row", "bucket", F.col("c").alias("__c"))
            return d.join(c, ["row", "bucket"], "left").select(
                F.col("row").cast("int").alias("row"),
                F.col("bucket").cast("long").alias("bucket"),
                (F.col("__d") + F.coalesce(F.col("__c"), F.lit(0))).cast("long").alias("c"),
            )

        merge_versioned_table(
            spark,
            path,
            summed,
            ["row", "bucket"],
            ["row"],
            txn=(app_id, epoch_id),
        )

    return write
