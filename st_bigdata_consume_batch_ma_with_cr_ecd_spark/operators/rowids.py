"""Contiguous global row ids / running totals without the one-partition trap.

``row_number() OVER (ORDER BY ...)`` or ``sum() OVER (ORDER BY ...)``
with no PARTITION BY collapses the whole dataset into ONE task — the
classic accidental serialization (fatal at 100 TB).
``monotonically_increasing_id`` scales but its ids are sparse and
partition-dependent. Training pipelines want both: dense 0..N-1 ids (or
exact running totals), assigned in a deterministic total order, computed
in parallel.

The standard two-phase trick (shared scaffolding `_two_phase_assign`):

1. range-partition + sort by the order columns (parallel global sort —
   the same machinery as ``df.orderBy``, N tasks);
2. one statistic per partition (count or sum — a tiny aggregate, one
   row per partition to the driver: the model, never the data);
3. broadcast the prefix-sum offsets and assign per-partition values
   inside one ``mapInPandas`` pass.

Determinism: outputs follow the caller's order columns, which must be a
total order (unique) — same contract as every window in this engine.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _two_phase_assign(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    out_col: str,
    partition_stat,
    batch_assign: Callable,
    num_partitions: int | None = None,
) -> DataFrame:
    """Shared two-phase scaffolding: ``partition_stat`` is the per-partition
    aggregate Column whose prefix sums become the offsets; ``batch_assign``
    maps (pandas group, base offset) -> (values for ``out_col``, how much
    of the offset the group consumed)."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty (and a total order)")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    # materialize ONCE: the stats job and the assignment job must see the
    # *same* range bounds, and repartitionByRange re-samples per job. (At
    # extreme scale, persist to storage or compute explicit bounds
    # instead of localCheckpoint.)
    ordered = ordered.localCheckpoint(eager=True)

    pid = "__pid"
    with_pid = ordered.withColumn(pid, F.spark_partition_id())
    stats = dict(
        with_pid.groupBy(pid).agg(partition_stat.alias("s")).collect()  # one row per partition
    )
    offsets = {}
    acc = 0
    for p in sorted(stats):
        offsets[p] = acc
        acc += stats[p] or 0

    from pyspark.sql import types as T

    # build a NEW StructType: StructType.add mutates the df's cached schema
    out_schema = T.StructType(list(with_pid.schema.fields) + [T.StructField(out_col, T.LongType())])

    def op(batches: Iterator) -> Iterator:
        local = {}
        for pdf in batches:
            for p, grp in pdf.groupby(pid, sort=False):
                grp = grp.copy()
                base = offsets[p] + local.get(p, 0)
                values, consumed = batch_assign(grp, base)
                grp[out_col] = values
                local[p] = local.get(p, 0) + consumed
                yield grp

    return with_pid.mapInPandas(op, schema=out_schema).drop(pid)


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = dense 0..N-1 ids in the total order given by
    ``order_cols``, with no single-task stage anywhere in the plan."""

    def assign(grp, base):
        return range(base, base + len(grp)), len(grp)

    return _two_phase_assign(
        df,
        order_cols,
        out_col=id_col,
        partition_stat=F.count(F.lit(1)),
        batch_assign=assign,
        num_partitions=num_partitions,
    )


def running_total(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    *,
    out_col: str = "cum_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global cumulative sum of ``value_col`` in the total order given by
    ``order_cols`` — the distributed replacement for the one-task
    ``sum() OVER (ORDER BY ...)`` window.

    ``out_col`` is the INCLUSIVE running total (``... ROWS UNBOUNDED
    PRECEDING`` semantics). Values must be integral; the local cumsum is
    forced to int64 — Arrow hands int columns over as int32 when the
    Spark type is IntegerType, and a partition summing past 2^31-1 would
    otherwise wrap silently (exactly the scale this operator exists for).
    """

    def assign(grp, base):
        # NULL values contribute 0 to the running total (matching the
        # partition_stat's F.sum, which skips nulls) — Arrow hands a
        # nullable int column over as float64 with NaN, and a bare
        # astype('int64') would raise on the first NULL
        run = grp[value_col].fillna(0).astype("int64").cumsum()
        consumed = int(run.iloc[-1]) if len(run) else 0
        return run + base, consumed

    return _two_phase_assign(
        df,
        order_cols,
        out_col=out_col,
        partition_stat=F.sum(value_col),
        batch_assign=assign,
        num_partitions=num_partitions,
    )
