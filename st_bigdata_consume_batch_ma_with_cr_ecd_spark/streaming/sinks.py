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
