"""Parallelism guards for compute-heavy operators.

A Spark scan's task count comes from the *file layout* (one task per
split), not from the cost of what runs on top of it. For cheap
projections that's right; for operators that do heavy per-row work
(shingling, per-shingle md5 fan-out, SimHash) a small file count
serializes the whole stage — locally, a single-file 5 000-doc table ran
the entire MinHash compute on 1 of 32 cores.

``ensure_min_partitions`` is the fix: round-robin repartition *only
when* the current partition count is below the session's default
parallelism. At production scale (100 TB => tens of thousands of
splits) the guard is a no-op — the condition is checked plan-side
without running a job — so the extra shuffle is paid exactly when it's
cheapest (input small enough to have few splits) and skipped when it
would hurt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin to ``n`` partitions iff it
    currently has fewer; no-op (and no job) otherwise.

    ``n`` defaults to the session's ``sparkContext.defaultParallelism``
    (= total cores in local mode).
    """
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    # metadata probe only, no compute — the one sanctioned low-level touch
    if df.rdd.getNumPartitions() >= n:  # noqa: rdd
        return df
    return df.repartition(n)
