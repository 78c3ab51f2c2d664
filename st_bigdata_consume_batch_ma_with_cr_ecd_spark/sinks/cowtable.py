"""Copy-on-write MERGE over plain partitioned parquet (beyond reference).

The reference ships Delta in its job configuration but never uses it
(``deployment/glue.tf:143,145`` sets ``--datalake-formats=delta`` and
the Delta session extension; every actual write is plain parquet via
``purge_table`` + append, ``script/main.py:395-416``). This module
supplies the MERGE-capable table the configuration gestures at,
without requiring a lakehouse library in the runtime: the classic
copy-on-write pattern — read ONLY the partitions a change batch
touches, apply MERGE semantics, overwrite ONLY those partitions.

Cost model at 100 TB: a merge reads and rewrites the touched slice,
never the table. Deriving the touched set needs one column-pruned
scan of (keys x partition columns) — parquet reads two thin columns,
not the data — plus the batch's own partition values.

Consistency model (honest, documented): per-partition overwrite is
atomic at the directory-commit level, but a multi-partition merge is
NOT a transaction — a crash mid-merge can leave some partitions
merged and others not. The recovery story is idempotence: re-applying
the same change batch converges to the same final state (proved by
``tests/test_cow_table.py``), the same contract as the reference's
purge+append pair. For cross-partition atomicity use a real table
format (Delta/Iceberg) — this module deliberately stops at what plain
parquet can guarantee.

Two edge cases a naive dynamic-partition-overwrite MERGE gets wrong,
both handled here and both pinned by tests:

- **cross-partition key moves**: a change row can carry a new value
  for a partition column; the key's OLD partition must also rewrite
  (to drop the old row) even though the batch has no row landing in
  it. The touched set is therefore batch partitions UNION partitions
  currently holding the batch's keys.
- **emptied partitions**: dynamic overwrite only replaces partitions
  PRESENT in the output; a partition whose rows were all
  deleted/moved produces no output rows and would silently keep its
  stale files. Those directories are deleted explicitly through the
  Hadoop FileSystem API (works on local/HDFS/S3A alike).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_upsert


def create_cow_table(
    df: DataFrame, path: str, partition_by: Sequence[str], *, mode: str = "overwrite"
) -> None:
    """Initial snapshot write: standard hive-layout partitioned parquet."""
    if not partition_by:
        raise ValueError("partition_by must be non-empty (CoW merges are partition-scoped)")
    df.write.mode(mode).partitionBy(*list(partition_by)).parquet(path)


def read_cow_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _partition_filter(parts: list[dict], partition_by: Sequence[str]):
    """One OR-of-ANDs predicate selecting exactly ``parts`` — shaped so
    Catalyst turns it into partition pruning on the scan."""
    clause = None
    for p in parts:
        term = None
        for c in partition_by:
            eq = F.col(c).eqNullSafe(F.lit(p[c]))
            term = eq if term is None else term & eq
        clause = term if clause is None else clause | term
    return clause


def merge_cow_table(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: Sequence[str],
    partition_by: Sequence[str],
    *,
    delete_col: str | None = None,
) -> list[dict]:
    """MERGE ``changes`` into the table at ``path``; returns the list of
    partition-value dicts that were rewritten (for observability/tests).

    Steps, each scoped to the touched slice:

    1. touched = partitions named by the batch UNION partitions holding
       the batch's keys (thin key+partition scan, batch side broadcast).
    2. snapshot slice = table pruned to touched partitions.
    3. :func:`..operators.merge.merge_upsert` applies replace/insert/
       delete semantics (change rows win; ``delete_col`` drops rows).
    4. dynamic partition overwrite writes partitions present in the
       result; touched partitions that came back EMPTY are deleted via
       the Hadoop FileSystem API.

    The merged slice is materialized (``localCheckpoint``) before the
    write: the write would otherwise re-read the very files it is
    replacing mid-job. Cost scales with the touched slice, not the
    table.
    """
    partition_by = list(partition_by)
    if not partition_by:
        raise ValueError("partition_by must be non-empty")
    if delete_col is not None and delete_col in partition_by:
        raise ValueError("delete_col cannot be a partition column")
    snapshot = read_cow_table(spark, path)

    # 1. the touched-partition set: batch's own landing partitions ...
    batch_parts = [r.asDict() for r in changes.select(*partition_by).distinct().collect()]
    # ... plus partitions currently holding the batch's keys (covers
    # cross-partition moves and delete markers with stale partition
    # values). Thin column-pruned scan; the key set broadcasts.
    key_set = changes.select(*list(keys)).distinct()
    old_parts = [
        r.asDict()
        for r in snapshot.join(F.broadcast(key_set), on=list(keys), how="leftsemi")
        .select(*partition_by)
        .distinct()
        .collect()
    ]
    touched: list[dict] = []
    for p in batch_parts + old_parts:
        if p not in touched:
            touched.append(p)
    if not touched:
        return []

    # 2.-3. merge the pruned slice only
    pruned = snapshot.where(_partition_filter(touched, partition_by))
    merged = merge_upsert(pruned, changes, list(keys), delete_col=delete_col)
    # materialize BEFORE overwriting the files the plan reads from
    merged = merged.localCheckpoint(eager=True)

    # 4a. drop directories of partitions that ended up empty — dynamic
    # overwrite cannot see them (no output rows land there)
    result_parts = [r.asDict() for r in merged.select(*partition_by).distinct().collect()]
    emptied = [p for p in touched if p not in result_parts]
    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        root = jvm.org.apache.hadoop.fs.Path(path)
        fs = root.getFileSystem(conf)
        # values must use the SAME escaping Spark used when writing the
        # directories (spaces, ':', '%', ... are percent-encoded) — a
        # raw f"{col}={value}" path silently misses the directory and
        # the "deleted" rows resurface on the next read
        escape = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
        for p in emptied:
            # null partition values live in Hive's default-partition dir
            subdir = "/".join(
                f"{c}={'__HIVE_DEFAULT_PARTITION__' if p[c] is None else escape(str(p[c]))}"
                for c in partition_by
            )
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{subdir}"), True)

    # 4b. rewrite exactly the non-empty touched partitions via the
    # shared dynamic-overwrite writer (sinks.writers), which asserts
    # partitionOverwriteMode=dynamic — a static-mode session here would
    # wipe the whole table
    if result_parts:
        from .writers import overwrite_partitions

        overwrite_partitions(merged, path, partition_by)
    return touched


def vacuum_cow_table(
    spark: SparkSession, path: str, *, min_age_seconds: int = 3600
) -> list[str]:
    """Remove orphaned job-attempt artifacts under a CoW table root.

    A merge that crashes between Spark committing its files and the
    job finishing can leave ``_temporary`` attempt directories (and
    ``.crc``/``._*`` metadata strays) inside partition directories;
    parquet readers ignore them, but they accumulate on every crash
    and, on object stores, cost real list/storage overhead. Walks the
    table via the Hadoop FileSystem API (local/HDFS/S3A alike) and
    deletes them. Returns the deleted paths (observability/tests).

    Data files are NEVER touched: only ``_temporary`` directories and
    dot/underscore-prefixed stray files outside the root's own
    ``_SUCCESS`` marker — and only when older than ``min_age_seconds``
    (default 1h): a ``_temporary`` directory younger than that may be
    the LIVE staging dir of a concurrent write to the same table, and
    deleting it would fail that job at commit. Pass ``0`` only when no
    writer can be running.
    """
    import time

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    deleted: list[str] = []
    cutoff_ms = (time.time() - min_age_seconds) * 1000.0

    def old_enough(st) -> bool:
        return st.getModificationTime() <= cutoff_ms

    def walk(p):
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory():
                if name == "_temporary":
                    if old_enough(st):
                        fs.delete(st.getPath(), True)
                        deleted.append(st.getPath().toString())
                else:
                    walk(st.getPath())
            elif (
                (name.startswith(".") or name.startswith("_"))
                and name != "_SUCCESS"
                and old_enough(st)
            ):
                fs.delete(st.getPath(), False)
                deleted.append(st.getPath().toString())

    walk(root)
    return deleted
