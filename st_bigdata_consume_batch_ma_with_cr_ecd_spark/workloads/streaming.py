"""Streaming query battery — Structured Streaming over the events table,
verified against batch SQL oracles (the stream drains a bounded parquet
source, so streaming and batch must agree exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.pipelines import run_stream_to_memory, windowed_event_counts
from .registry import register


@register(
    "streaming_hourly_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window agg (watermark + window) drained via availableNow; equals the batch GROUP BY.",
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.ts is parquet TIMESTAMP(NANOS): stream it as long, rebuild
    # the timestamp inside the streaming graph (see sources.readers).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def transform(s: DataFrame) -> DataFrame:
        s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return windowed_event_counts(s, window="1 hour", watermark="1 hour")

    return run_stream_to_memory(spark, f"{sf_dir}/events.parquet", transform, output_mode="complete")


@register(
    "streaming_dedup_ids",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    doc="Stateful streaming dedup: dropDuplicates on event_id within the watermark horizon; event_id is unique in the testdata so the drained stream equals the batch table exactly.",
)
def streaming_dedup_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipelines import streaming_dedup

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def transform(s: DataFrame) -> DataFrame:
        s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return streaming_dedup(s, watermark="1 hour").select("event_id", "user_id", "event_type")

    return run_stream_to_memory(spark, f"{sf_dir}/events.parquet", transform, output_mode="append")
