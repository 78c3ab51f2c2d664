"""Structured Streaming equivalents (SURVEY.md §2.11 notes the reference
is batch-only despite kafka/kinesis table names — these are the stream
counterparts a real consume layer needs).

Local testing pattern: a parquet directory drives the stream
(``readStream`` + ``availableNow``/``processAllAvailable``) into a
memory sink, which makes streaming results comparable against a batch
SQL oracle. In production swap the source for Kafka and the sink for a
partitioned parquet/foreachBatch writer — the transformation graph is
unchanged.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling- (or, with ``slide``, sliding-/hopping-) window counts +
    sums with late-data watermark. A sliding window assigns each event
    to window/slide overlapping windows (state grows by that factor —
    the price of overlap).

    Works on both a streaming and a batch DataFrame (the watermark is a
    no-op in batch) — the same graph serves both runtimes.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    # decimal sum, rounded while still decimal -> order- and engine-
    # independent total (see operators.aggregates.rounded_sum)
    total = F.round(F.sum(F.col(value_col).cast("decimal(30,8)")), 2).cast("double")
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide is not None
        else F.window(F.col(ts_col), window)
    )
    return (
        src.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), total.alias("total_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "total_value")
    )


def streaming_dedup(events: DataFrame, *, ts_col: str = "ts", id_col: str = "event_id", watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once-per-id dedup. State caveat (the r3 review
    caught the original docstring overclaiming): ``dropDuplicates``
    without the event-time column in the key NEVER evicts state — the
    watermark here bounds lateness, not state size. For bounded drains
    and bounded id spaces that's fine; for unbounded key spaces use
    :func:`streaming_dedup_within_watermark`, which evicts a key at the
    horizon (the production default)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.dropDuplicates([id_col])


def streaming_dedup_within_watermark(
    events: DataFrame, *, ts_col: str = "ts", id_col: str = "event_id", watermark: str = "1 hour"
) -> DataFrame:
    """Modern (Spark 3.5+) dedup: ``dropDuplicatesWithinWatermark``
    EVICTS a key's state once the watermark passes its first sighting —
    bounded state even when the key space is unbounded, which plain
    ``dropDuplicates`` (state kept forever unless the event-time column
    is part of the key) cannot guarantee. The semantic trade: a
    duplicate arriving later than the watermark delay is re-emitted, so
    this is at-most-once-per-horizon, the right contract for replayed
    logs where duplicates cluster near each other in time."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [id_col]
        )
    return events.dropDuplicates([id_col])  # batch: horizon is infinite


def run_stream_to_memory(
    spark: SparkSession,
    parquet_path: str,
    transform,
    *,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive ``transform(stream_df)`` over a parquet directory to
    completion via a memory sink; returns the materialized result.

    ``complete`` mode emits every window (no watermark withholding) —
    right for bounded smoke runs; real deployments use ``append`` +
    checkpointing.
    """
    schema = spark.read.parquet(parquet_path).schema
    if os.path.isfile(parquet_path):
        # FileStreamSource requires a directory source (basePath must be a
        # directory); expose a single-file table through a symlink dir.
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(parquet_path, os.path.join(d, os.path.basename(parquet_path)))
        parquet_path = d
    stream = spark.readStream.schema(schema).parquet(parquet_path)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        transform(stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    return spark.table(name)


def stream_interval_join_pairs(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 600,
    watermark: str | None = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each left row pairs with right rows in
    ``[left_ts - lookback, left_ts)``; ``how='left_outer'`` keeps
    unmatched left rows (right columns null).

    Structured Streaming refuses stream-stream joins without an
    EQUALITY predicate (state would be all-pairs); the same bucket-grid
    rewrite as ``operators.rangejoin`` supplies one: both event times
    map onto a ``lookback``-wide grid (the left side explodes to the ≤2
    buckets its window touches), the join keys on the bucket id, and
    the exact range stays as a residual. The two-sided time bound then
    lets the engine EXPIRE join state at the watermark — an unbounded
    condition grows state forever, the #1 stream-stream join failure
    at production scale. Works identically on batch frames (watermarks
    are no-ops) — one graph, two runtimes.

    Which side explodes onto the grid depends on ``how``: inner joins
    explode the LEFT side (either works — pairs are identical), but a
    LEFT OUTER join must keep each left row single-rowed, otherwise an
    unmatched left event would emit one null row per touched bucket.
    So for ``left_outer`` the RIGHT side explodes to the ≤2 buckets
    whose left-windows it could serve, and each (left, right) pair
    still matches in exactly one bucket (the left's own). Outer null
    emission happens at watermark advance: a left row is released once
    the watermark passes ``left_ts`` (no future right row can satisfy
    ``right_ts < left_ts``) — rows at the stream's current frontier
    are correctly WITHHELD awaiting more data, so bounded drains
    should scope the left side to events strictly before the frontier.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    width = lookback_seconds * 1_000_000  # grid in micros
    # Outer-emission boundary: the GLOBAL watermark is the MIN across
    # all watermark operators, and outer emission of a left row needs
    # `watermark > left_ts` STRICTLY. If the left branch gets its OWN
    # watermark node downstream of a filter, its watermark tops out at
    # the latest SURVIVING left event — which is exactly the unmatched
    # row most likely to need null emission, so it is withheld forever
    # (and moving the filter just moves the stuck boundary with it).
    # Pass ``watermark=None`` and watermark the SHARED upstream stream
    # once, BEFORE any filtering: the event-time column survives
    # filters and renames, both join inputs ride one watermark node,
    # and the boundary sits at the full stream's frontier. (Dropping
    # the left watermark entirely does NOT work either: without an
    # event-time column in left state, null rows never emit at all.)
    if watermark is None:
        lw, rw = left, right
    else:
        lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
        rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right

    def bucket(col: str) -> F.Column:
        return F.floor(F.unix_micros(F.col(col).cast("timestamp")) / F.lit(width)).cast("long")

    if how == "inner":
        lb = lw.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(
                        (F.unix_micros(F.col(left_ts).cast("timestamp")) - F.lit(width))
                        / F.lit(width)
                    ).cast("long"),
                    F.floor(
                        F.unix_micros(F.col(left_ts).cast("timestamp")) / F.lit(width)
                    ).cast("long"),
                )
            ),
        )
        rb = rw.withColumn("__bucket", bucket(right_ts))
    else:
        lb = lw.withColumn("__bucket", bucket(left_ts))
        rb = rw.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(
                        F.unix_micros(F.col(right_ts).cast("timestamp")) / F.lit(width)
                    ).cast("long"),
                    (
                        F.floor(
                            F.unix_micros(F.col(right_ts).cast("timestamp")) / F.lit(width)
                        )
                        + 1
                    ).cast("long"),
                )
            ),
        )
    cond = (
        (F.col("l.__bucket") == F.col("r.__bucket"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback_seconds} SECONDS")
        )
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}"))
    )
    return lb.alias("l").join(rb.alias("r"), cond, how).drop("__bucket")
