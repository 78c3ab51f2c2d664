"""Range joins: point-in-interval and interval-overlap (beyond reference).

The reference's visibility check joins a listing's event date into a
validity period with an equi key plus a date-range residual
(``2-basedata_df_query.sql:14-20``) — Spark handles that shape well
(sort-merge join on the key, range as residual). What Spark does NOT
handle well is a range join with **no equi key**: the optimizer can
only produce ``BroadcastNestedLoopJoin`` (small side) or
``CartesianProduct`` (big-big) — both O(n·m) and fatal at 100 TB.

This module adds the standard bucketing rewrite that turns a pure
range join into an equi join:

- Chop the domain into fixed-width buckets.
- An interval ``[start, end)`` is exploded to every bucket it touches
  (``sequence(floor(start/w), floor(end/w))``); a point belongs to
  exactly one bucket.
- Join on the bucket id (shuffle hash / sort-merge — parallel,
  partitionable), then re-check the exact range predicate as a cheap
  residual.
- For interval×interval overlap, a pair may co-occur in several
  buckets; we emit it only in the bucket containing
  ``max(start_a, start_b)`` — each overlapping pair has exactly one
  such bucket, so no ``distinct`` pass is needed.

Cost model: with bucket width ~ the typical interval length, each
interval lands in ≤2 buckets, so the exploded side grows ≤2× while the
join becomes hash-partitionable across the cluster. Skewed buckets
(rush-hour spikes) are handled by AQE skew-join splitting, which only
works because this IS now a shuffle join.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["point_in_interval_join", "interval_overlap_join"]

_BUCKET = "__range_bucket"


def _is_temporal(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, (T.TimestampType, T.TimestampNTZType, T.DateType))


def _width_value(width: int | float | _dt.timedelta, temporal: bool) -> int | float:
    """Bucket width in the bin domain (micros for temporal columns)."""
    if isinstance(width, _dt.timedelta):
        if not temporal:
            raise TypeError("timedelta width requires timestamp/date range columns")
        micros = int(width.total_seconds() * 1_000_000)
        if micros <= 0:
            raise ValueError("bucket width must be positive")
        return micros
    if width <= 0:
        raise ValueError("bucket width must be positive")
    return width


def _bin(col: Column, temporal: bool, width: int | float) -> Column:
    # unix_micros only takes TIMESTAMP; NTZ/date are reinterpreted in the
    # session zone (UTC in our session factory), which is a consistent
    # monotone mapping — fine for bucketing.
    base = F.unix_micros(col.cast("timestamp")) if temporal else col
    return F.floor(base / F.lit(width)).cast("long")


MAX_BUCKETS_PER_INTERVAL = 100_000


def _bucket_seq(start: Column, end: Column, temporal: bool, width, *, what: str) -> Column:
    """The interval's bucket sequence, guarded: one open-ended/sentinel
    interval (end = 9999-12-31 against a minute-wide grid) would explode
    into billions of rows — the blow-up this operator exists to prevent.
    Exceeding the cap fails LOUDLY with the offending span instead of
    hanging a task."""
    lo, hi = _bin(start, temporal, width), _bin(end, temporal, width)
    span = hi - lo + 1
    guarded_hi = F.when(
        span > MAX_BUCKETS_PER_INTERVAL,
        F.raise_error(
            F.concat(
                F.lit(
                    f"{what}: interval spans more than {MAX_BUCKETS_PER_INTERVAL} "
                    "buckets (span="
                ),
                span.cast("string"),
                F.lit(") — widen bucket_width or clean sentinel end values"),
            )
        ).cast("long"),
    ).otherwise(hi)
    return F.sequence(lo, guarded_hi)


def _prefixed(df: DataFrame, prefix: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{prefix}{c}") for c in df.columns])


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str,
    start: str,
    end: str,
    *,
    bucket_width: int | float | _dt.timedelta,
    point_prefix: str = "",
    interval_prefix: str = "",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` — WITHOUT an equi key.

    Both sides are bucketed on ``bucket_width`` so the physical plan is
    a shuffle join on the bucket id, never a nested loop. A point falls
    in exactly one bucket and an interval appears once per touched
    bucket, so the output needs no deduplication.

    ``point_prefix`` / ``interval_prefix`` rename the respective sides'
    columns (``points`` keeps its names by default); use them when the
    two sides share column names (e.g. a self join).

    When you DO have an equi key, skip this operator: a plain
    ``join(on=key)`` with the range as a residual is one shuffle on the
    key and strictly better.
    """
    temporal = _is_temporal(points, point)
    if temporal != _is_temporal(intervals, start):
        raise TypeError(f"point column {point!r} and interval columns must both be temporal")
    width = _width_value(bucket_width, temporal)

    p = _prefixed(points, point_prefix) if point_prefix else points
    i = _prefixed(intervals, interval_prefix) if interval_prefix else intervals
    point_c, start_c, end_c = point_prefix + point, interval_prefix + start, interval_prefix + end

    p = p.withColumn(_BUCKET, _bin(F.col(point_c), temporal, width))
    i = i.withColumn(
        _BUCKET,
        F.explode(
            _bucket_seq(
                F.col(start_c), F.col(end_c), temporal, width,
                what="point_in_interval_join",
            )
        ),
    )
    joined = p.join(i, on=_BUCKET, how="inner").where(
        (F.col(point_c) >= F.col(start_c)) & (F.col(point_c) < F.col(end_c))
    )
    return joined.drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    *,
    bucket_width: int | float | _dt.timedelta,
    left_prefix: str = "",
    right_prefix: str = "",
) -> DataFrame:
    """Join interval rows that overlap: ``left_start < right_end AND
    right_start < left_end`` (half-open convention) — without an equi
    key and without a nested-loop plan.

    Both sides explode to the buckets they touch and join on the
    bucket id. A pair that overlaps across several buckets is emitted
    only in the bucket containing ``greatest(left_start, right_start)``
    — exactly one bucket per pair, so no ``distinct`` is needed and
    the operator stays streaming-friendly (no global dedup state).
    """
    temporal = _is_temporal(left, left_start)
    if temporal != _is_temporal(right, right_start):
        raise TypeError("both sides' interval columns must share temporality")
    width = _width_value(bucket_width, temporal)

    ls, le = left_prefix + left_start, left_prefix + left_end
    rs, re_ = right_prefix + right_start, right_prefix + right_end
    lf = _prefixed(left, left_prefix) if left_prefix else left
    rf = _prefixed(right, right_prefix) if right_prefix else right

    lf = lf.withColumn(
        _BUCKET,
        F.explode(_bucket_seq(F.col(ls), F.col(le), temporal, width, what="interval_overlap_join")),
    )
    rf = rf.withColumn(
        _BUCKET,
        F.explode(_bucket_seq(F.col(rs), F.col(re_), temporal, width, what="interval_overlap_join")),
    )
    anchor = _bin(F.greatest(F.col(ls), F.col(rs)), temporal, width)
    joined = (
        lf.join(rf, on=_BUCKET, how="inner")
        .where((F.col(ls) < F.col(re_)) & (F.col(rs) < F.col(le)))
        .where(F.col(_BUCKET) == anchor)
    )
    return joined.drop(_BUCKET)
