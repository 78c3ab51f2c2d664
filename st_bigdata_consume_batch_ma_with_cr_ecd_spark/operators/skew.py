"""Skew mitigation: salting for hot join/aggregation keys.

AQE's skew-join splitting (on in our session factory) handles most
skew at runtime by splitting oversized sort-merge partitions. Salting
is the structural fallback for the cases AQE can't fix: a hash
aggregation with one giant group, or a broadcast-ineligible join where
one key holds a double-digit share of the rows. Both transforms are
result-identical to their unsalted forms — the salt only changes *where*
rows meet, never *which* rows meet — so they carry DuckDB oracles in the
workload battery like any other operator.

Salt choice: ``rand(seed) * buckets`` on the big side. The salt value
never influences the result, only the distribution, so a per-task
random draw is safe; the seed keeps runs reproducible for debugging.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The big side gets a random salt in [0, buckets); the small side is
    exploded ``buckets``-fold so every (key, salt) combination exists.
    A hot key's rows now land in ``buckets`` shuffle partitions instead
    of one. Cost: the small side shuffles ``buckets`` copies — use for
    moderately-sized right sides that are too big to broadcast.

    ``how`` must preserve the big side's rows ('inner' or 'left').
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' (big side preserved)")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    big_s = big.withColumn(_SALT, (F.rand(seed) * buckets).cast("int"))
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return big_s.join(small_s, [*on, _SALT], how).drop(_SALT)


_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str | Column, str]],
    *,
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output name -> (column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the reassociable aggregates).
    Phase 1 aggregates on (keys + salt) — the hot group's rows combine
    in ``buckets`` parallel partial groups — phase 2 merges partials on
    the true keys. Identical results to a direct groupBy.

    (Spark's hash aggregate already does map-side partials per task;
    salting additionally splits the *reduce side* of a giant group.)
    """
    for name, (_, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{name}: fn must be one of {sorted(_PARTIAL)}")
    salt = (F.rand(seed) * buckets).cast("int")
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(*[_PARTIAL[fn](col).alias(name) for name, (col, fn) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_FINAL[fn](name).alias(name) for name, (_, fn) in aggs.items()]
    )
