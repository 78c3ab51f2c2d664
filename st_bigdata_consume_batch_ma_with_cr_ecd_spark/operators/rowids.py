"""Contiguous global row ids without the one-partition trap.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole dataset into ONE task — the classic accidental serialization
(fatal at 100 TB). ``monotonically_increasing_id`` scales but its ids
are sparse and partition-dependent. Training pipelines want both:
dense 0..N-1 ids, assigned in a deterministic total order, computed in
parallel.

The standard two-phase trick:

1. range-partition + sort by the order columns (parallel global sort —
   the same machinery as ``df.orderBy``, N tasks);
2. count rows per partition (tiny aggregate, one row per partition to
   the driver — the only driver data is the partition histogram);
3. broadcast the prefix-sum offsets and add them to each partition's
   local 0-based index inside one ``mapInPandas`` pass.

Determinism: ids follow the caller's order columns, which must be a
total order (unique) — same contract as every window in this engine.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = dense 0..N-1 ids in the total order given by
    ``order_cols``, with no single-task stage anywhere in the plan."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty (and a total order)")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    # materialize ONCE: the histogram job and the id-assignment job must
    # see the *same* range bounds, and repartitionByRange re-samples per
    # job. (At extreme scale, persist to storage or compute explicit
    # bounds instead of localCheckpoint.)
    ordered = ordered.localCheckpoint(eager=True)

    pid = "__pid"
    with_pid = ordered.withColumn(pid, F.spark_partition_id())
    counts = dict(
        with_pid.groupBy(pid).count().collect()  # one row per partition
    )
    offsets = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]

    from pyspark.sql import types as T

    # build a NEW StructType: StructType.add mutates the df's cached schema
    out_schema = T.StructType(list(with_pid.schema.fields) + [T.StructField(id_col, T.LongType())])

    def add_ids(batches: Iterator) -> Iterator:
        local = {}
        for pdf in batches:
            for p, grp in pdf.groupby(pid, sort=False):
                start = offsets[p] + local.get(p, 0)
                grp = grp.copy()
                grp[id_col] = range(start, start + len(grp))
                local[p] = local.get(p, 0) + len(grp)
                yield grp

    return with_pid.mapInPandas(add_ids, schema=out_schema).drop(pid)


def running_total(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    *,
    out_col: str = "cum_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global cumulative sum of ``value_col`` in the total order given by
    ``order_cols`` — same two-phase trick as :func:`assign_contiguous_ids`
    (``sum() OVER (ORDER BY ...)`` with no PARTITION BY is the same
    one-task trap as global ``row_number``):

    1. range-partition + sort (parallel global sort);
    2. per-partition value sums -> driver prefix-sum (one number per
       partition, the model not the data);
    3. per-partition local cumsum + broadcast offset in one
       ``mapInPandas`` pass.

    ``out_col`` is the INCLUSIVE running total (``... ROWS UNBOUNDED
    PRECEDING`` semantics). Values must be integral (long out)."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty (and a total order)")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    ordered = ordered.localCheckpoint(eager=True)  # pin range bounds across the 2 jobs

    pid = "__pid"
    with_pid = ordered.withColumn(pid, F.spark_partition_id())
    sums = dict(
        with_pid.groupBy(pid).agg(F.sum(value_col).alias("s")).collect()
    )
    offsets = {}
    acc = 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p] or 0

    from pyspark.sql import types as T

    out_schema = T.StructType(list(with_pid.schema.fields) + [T.StructField(out_col, T.LongType())])

    def add_cumsum(batches: Iterator) -> Iterator:
        local = {}
        for pdf in batches:
            for p, grp in pdf.groupby(pid, sort=False):
                grp = grp.copy()
                base = offsets[p] + local.get(p, 0)
                run = grp[value_col].cumsum()
                grp[out_col] = run + base
                local[p] = local.get(p, 0) + int(grp[value_col].sum())
                yield grp

    return with_pid.mapInPandas(add_cumsum, schema=out_schema).drop(pid)
