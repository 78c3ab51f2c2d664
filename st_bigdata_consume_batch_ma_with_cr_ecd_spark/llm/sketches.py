"""Count-Min sketch: fixed-memory frequency estimation at stream scale.

The 100-TB problem: per-key exact counts need state proportional to the
key cardinality (unbounded for URLs, n-grams, IPs). A Count-Min sketch
holds a ``depth x width`` grid of counters — a few KB, REGARDLESS of
cardinality — where every observation increments one counter per row
(bucket chosen by a per-row hash) and a key's estimate is the MIN of
its ``depth`` counters: always >= the true count (collisions only add),
within ``2N/width`` of it with probability ``1 - 2^-depth``.

Spark shape: the grid is just a ``(row, bucket) -> count`` DataFrame.
Building it is one ``explode(depth) -> groupBy(row, bucket).count()``
— map-side partial aggregation contracts each mapper's output to at
most ``depth*width`` cells before the shuffle, so the shuffle volume is
O(sketch size), not O(data). Sketches MERGE by unioning cell frames and
re-summing (used by the incremental-ingest path), exactly like any
partial aggregate. Estimation joins a model-sized probe set against the
cells (probes broadcast).

Hashing rides :func:`..functions.columns.md5_prefix_int` — the repo's
cross-engine deterministic hash — so a DuckDB oracle can replay the
sketch bit-for-bit (no RNG, no engine-specific sketch internals, unlike
``approx_count_distinct``'s HLL which is pytest-bounded only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import md5_prefix_int


def _bucket(row_col, key_col, width: int):
    """Row ``i``'s hash of ``key``: md5('<i>:<key>') folded into
    [0, width). One md5 per (row, key) — the K independent hash
    functions come from salting, the K-M trick's cheap cousin."""
    return (
        md5_prefix_int(F.concat(row_col.cast("string"), F.lit(":"), key_col))
        .cast("bigint")
        % width
    )


def count_min_cells(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: ``(row, bucket, c)`` cells, at most
    ``depth * width`` rows total. Absent cells are implicitly zero."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    keyed = df.select(F.col(key_col).cast("string").alias("__k")).select("__k", rows)
    return (
        keyed.select("row", _bucket(F.col("row"), F.col("__k"), width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_cms(*cell_frames: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): cell-wise sum.
    (Counters are linear — this is what makes the sketch a partial
    aggregate you can build per day/partition and combine.)"""
    if not cell_frames:
        raise ValueError("need at least one sketch")
    out = cell_frames[0]
    for f in cell_frames[1:]:
        out = out.unionByName(f)
    return out.groupBy("row", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-query the sketch for every key in ``keys`` (a model-sized
    frame — it broadcasts): ``est = min over rows of cell(row,
    h_row(key))``, with absent cells read as 0 (left join), so keys the
    sketch never saw estimate correctly as 0."""
    kd = keys.select(F.col(key_col).alias("__key")).distinct()
    probe_rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    probes = kd.select("__key", probe_rows).withColumn(
        "bucket", _bucket(F.col("row"), F.col("__key").cast("string"), width)
    )
    return (
        F.broadcast(probes)
        .join(cells, ["row", "bucket"], "left")
        .groupBy("__key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
        .withColumnRenamed("__key", key_col)
    )
