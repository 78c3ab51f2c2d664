"""Streaming query battery — Structured Streaming over the events table,
verified against batch SQL oracles (the stream drains a bounded parquet
source, so streaming and batch must agree exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import normalize_event_ts
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
    # whatever physical type events.ts arrives in (nanos-as-long, NTZ,
    # timestamp), normalize it inside the streaming graph (sources.readers).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def transform(s: DataFrame) -> DataFrame:
        s = normalize_event_ts(s)
        return windowed_event_counts(s, window="1 hour", watermark="1 hour")

    return run_stream_to_memory(spark, f"{sf_dir}/events.parquet", transform, output_mode="complete")


@register(
    "streaming_sliding_counts",
    oracle="""
    WITH w AS (
        SELECT event_type, value,
               unnest([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
                       time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                           - INTERVAL '30 minutes']) AS window_start
        FROM events
    )
    SELECT window_start, event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_value
    FROM w GROUP BY 1, 2
    """,
    doc="Sliding/hopping-window streaming agg (1-hour windows every 30 min): "
    "each event lands in exactly 2 overlapping windows — 2x state vs "
    "tumbling, the overlap price. The batch oracle replays the window "
    "assignment by bucketing each event to its two covering window starts "
    "(both engines align windows on epoch :00/:30 boundaries).",
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def transform(s: DataFrame) -> DataFrame:
        s = normalize_event_ts(s)
        return windowed_event_counts(s, window="1 hour", slide="30 minutes", watermark="1 hour")

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
        s = normalize_event_ts(s)
        return streaming_dedup(s, watermark="1 hour").select("event_id", "user_id", "event_type")

    return run_stream_to_memory(spark, f"{sf_dir}/events.parquet", transform, output_mode="append")


@register(
    "streaming_dedup_bounded_state",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    doc="Bounded-state streaming dedup (Spark 3.5+ "
    "dropDuplicatesWithinWatermark): per-key state is EVICTED once the "
    "watermark passes its first sighting — the production answer to "
    "dropDuplicates' forever-growing state on unbounded key spaces. "
    "event_id is unique in the testdata, so the drained stream equals the "
    "batch table exactly (duplicates beyond the horizon would re-emit — "
    "documented at-most-once-per-horizon semantics).",
)
def streaming_dedup_bounded_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipelines import streaming_dedup_within_watermark

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def transform(s: DataFrame) -> DataFrame:
        s = normalize_event_ts(s)
        return streaming_dedup_within_watermark(s, watermark="1 hour").select(
            "event_id", "user_id", "event_type"
        )

    return run_stream_to_memory(spark, f"{sf_dir}/events.parquet", transform, output_mode="append")


@register(
    "session_windows",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    doc="Session windows (30-min inactivity gap) via F.session_window — the same graph runs under Structured Streaming with a watermark; the DuckDB oracle is the classic gaps-and-islands formulation.",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_testdata

    ev = read_testdata(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


@register(
    "streaming_stateful_user_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4)  AS total_value,
           round(max(value), 4)  AS max_value
    FROM events GROUP BY user_id
    """,
    doc="Custom stateful operator via applyInPandasWithState (Arrow-batched per-key GroupState): running per-user stats whose final drained state equals the batch GROUP BY.",
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_user_stats

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def transform(s: DataFrame) -> DataFrame:
        return running_user_stats(s.select("user_id", "value"))

    out = run_stream_to_memory(spark, f"{sf_dir}/events.parquet", transform, output_mode="update")
    # update mode re-emits a key per micro-batch; keep the final state
    from ..operators.dedup import top_n_per_group

    latest = top_n_per_group(out, ["user_id"], [F.col("n_events").desc()])
    return latest.select(
        "user_id", "n_events",
        F.round("total_value", 4).alias("total_value"),
        F.round("max_value", 4).alias("max_value"),
    )


@register(
    "streaming_interval_join",
    oracle="""
    SELECT a.event_id, count(*) AS n_preceding
    FROM events a JOIN events b
      ON CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
     AND CAST(b.ts AS TIMESTAMP) <  CAST(a.ts AS TIMESTAMP)
    WHERE a.event_type = 'purchase'
    GROUP BY a.event_id
    """,
    doc="Stream-stream interval self-join: purchases pair with any event in "
    "their preceding 10 minutes while both streams flow. The two-sided "
    "time-range predicate is what lets the engine EXPIRE join state at the "
    "watermark — the unbounded version grows state forever. Drained pairs "
    "aggregate to the same counts as the batch range join "
    "(range_event_proximity), proving batch/stream parity.",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipelines import stream_interval_join_pairs

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def transform(s: DataFrame) -> DataFrame:
        s = normalize_event_ts(s)
        purchases = s.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
        )
        others = s.select(F.col("ts").alias("o_ts"))
        return stream_interval_join_pairs(
            purchases, others, left_ts="p_ts", right_ts="o_ts"
        ).select("p_id")

    pairs = run_stream_to_memory(
        spark, f"{sf_dir}/events.parquet", transform, output_mode="append"
    )
    return pairs.groupBy(F.col("p_id").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_preceding")
    )


@register(
    "streaming_interval_join_outer",
    oracle="""
    WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events)
    SELECT a.event_id, count(b.ts) AS n_preceding
    FROM events a
    CROSS JOIN mx
    LEFT JOIN events b
      ON CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
     AND CAST(b.ts AS TIMESTAMP) <  CAST(a.ts AS TIMESTAMP)
    WHERE a.event_type = 'purchase' AND CAST(a.ts AS TIMESTAMP) < mx.m
    GROUP BY a.event_id
    """,
    doc="Stream-stream LEFT OUTER interval join: purchases keep a row even "
    "with NO preceding event (n_preceding = 0) — the semantics the inner "
    "join structurally cannot give. Outer null emission is watermark-"
    "driven: a purchase is released once the watermark passes its event "
    "time (the two-sided range bound proves no future match can arrive), "
    "so rows at the stream frontier are correctly withheld awaiting more "
    "data. BOTH join inputs ride ONE watermark node applied to the "
    "shared stream BEFORE the purchase filter (the event-time column "
    "survives filters/renames), so the boundary sits at the FULL "
    "stream's frontier — a per-branch watermark downstream of the "
    "filter would top out at the last surviving purchase and withhold "
    "exactly the unmatched row this query exists to emit "
    "(pipelines.py documents the trap). The drain scopes purchases to "
    "strictly before the frontier and the oracle mirrors that bound. "
    "The bucket-grid equality key explodes the RIGHT side here (a "
    "single-rowed left is what makes outer emission emit exactly once).",
)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_testdata
    from ..streaming.pipelines import stream_interval_join_pairs

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    frontier = read_testdata(spark, sf_dir, "events").agg(F.max("ts")).first()[0]

    def transform(s: DataFrame) -> DataFrame:
        s = normalize_event_ts(s).withWatermark("ts", "0 seconds")
        purchases = s.where(
            (F.col("event_type") == "purchase") & (F.col("ts") < F.lit(frontier))
        ).select(F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        others = s.select(F.col("ts").alias("o_ts"))
        return stream_interval_join_pairs(
            purchases,
            others,
            left_ts="p_ts",
            right_ts="o_ts",
            watermark=None,  # the shared upstream watermark governs both sides
            how="left_outer",
        ).select("p_id", "o_ts")

    pairs = run_stream_to_memory(
        spark, f"{sf_dir}/events.parquet", transform, output_mode="append"
    )
    return pairs.groupBy(F.col("p_id").alias("event_id")).agg(
        F.count("o_ts").alias("n_preceding")
    )


@register(
    "streaming_static_enrich",
    oracle="""
    WITH tiers AS (
        SELECT user_id, CASE WHEN count(*) >= 25 THEN 'heavy' ELSE 'light' END AS tier
        FROM events GROUP BY user_id
    )
    SELECT t.tier, count(*) AS n_events,
           CAST(round(sum(CAST(e.value AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_value
    FROM events e JOIN tiers t ON e.user_id = t.user_id
    GROUP BY t.tier
    """,
    doc="Stream-static join: the flowing events stream enriches against a "
    "static dimension (per-user tier) computed in batch — the broadcast "
    "refresh pattern every streaming consumer needs (dims re-read per "
    "micro-batch, no stream state). Drained totals equal the batch join.",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the static dim: computed once in batch, broadcast into the stream
    static_tiers = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.when(F.col("n") >= 25, "heavy").otherwise("light").alias("tier"),
        )
    )

    def transform(s: DataFrame) -> DataFrame:
        enriched = s.join(F.broadcast(static_tiers), "user_id")
        return enriched.groupBy("tier").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,8)")), 2)
            .cast("double")
            .alias("total_value"),
        )

    return run_stream_to_memory(
        spark, f"{sf_dir}/events.parquet", transform, output_mode="complete"
    )
