"""Shared store -> merge -> serve lifecycle for incremental index stores.

Every served index in this engine — dedup signature stores (MinHash /
image dHash / audio contour), the IVF inverted file, the bit-packed
IVFADC code table, the BM25 posting lists, and the corpus factory's
content state — runs the SAME operating model (the reference's rolling
incremental window, main.py:203-217, generalized to index maintenance):

1. **historic build** — transform last night's corpus ONCE into index
   rows and persist them as a versioned table (the scale probe builds
   this untimed per corpus size; gate queries build it in-query
   because a driver gate query is self-contained);
2. **batch-only transform** — the nightly job runs the expensive work
   (decode / tokenize / encode / shingle) for the ARRIVING BATCH only;
3. **atomic partition-scoped MERGE** — batch rows land as one new
   version; copy-on-write rewrites only the partitions the batch
   touches, so per-night index cost tracks the batch, never the
   corpus (the merge-touches-only-batch contract is pytest-pinned per
   index via manifest comparison);
4. **manifest-pruned serve** — queries read the post-merge snapshot
   with ``partition_filter`` so only the partitions the query batch
   touches (probed cells, query-term buckets, ...) are ever opened;
5. **maintenance** — OPTIMIZE (files-per-dir compaction, optionally
   Z-ordered), COALESCE HISTORY (fold accumulated ingest segments
   into the base partition — OPTIMIZE bounds files per dir, this
   bounds the DIR count under perpetual nightly appends; r13, from
   the segment-accumulation probe's finding), and VACUUM
   (manifest/commit retention) run on the same table without
   changing served results.

r11 verdict ask #6: five bespoke copies of this skeleton had grown in
``workloads/llm.py`` / ``workloads/graph_retrieval.py``; this module is
the single implementation, with the per-index transforms (what a row
IS) staying at the call sites as plugs. Pure plumbing extraction: the
class methods call the exact same ``sinks.versioned`` functions with
the exact same arguments the inline copies did, so plans, store
layouts, and hashes are unchanged.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import (
    coalesce_versioned_partitions,
    compact_versioned_table,
    create_versioned_table,
    merge_versioned_table,
    read_versioned_table,
    vacuum_versioned_table,
)

__all__ = ["IncrementalIndexStore", "fresh_index_root", "served_snapshot"]


def fresh_index_root(name: str) -> str:
    """A pre-cleaned scratch root for an in-query index build. The pid
    is part of the path (r9 ADVICE): a fixed tmp path would let two
    concurrent sessions ``rmtree`` each other's still-lazily-read
    index files mid-query."""
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_{name}_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    return root


class IncrementalIndexStore:
    """One versioned index table under the incremental lifecycle.

    ``keys`` are the merge upsert keys (the index's row identity);
    ``partition_by`` is the physical layout serving prunes on — the
    partition columns ARE the index structure (cid for inverted files,
    (seg, tb) for posting lists, ingest_bucket for signature stores).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        keys: Sequence[str],
        partition_by: Sequence[str],
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.partition_by = list(partition_by)

    def build(self, hist_rows: DataFrame) -> "IncrementalIndexStore":
        """Persist the historic corpus's index rows as version 1."""
        create_versioned_table(hist_rows, self.path, self.partition_by)
        return self

    def merge(
        self,
        batch_rows: DataFrame,
        *,
        txn: tuple[str, int] | None = None,
    ) -> "IncrementalIndexStore":
        """Upsert the batch's index rows as ONE atomic new version.
        Copy-on-write at partition granularity: only partitions holding
        batch keys are rewritten. ``txn`` = (app_id, epoch) makes a
        replayed streaming epoch a no-op inside the publishing rename
        (exactly-once for foreachBatch writers)."""
        kwargs = {} if txn is None else {"txn": txn}
        merge_versioned_table(
            self.spark,
            self.path,
            batch_rows,
            keys=self.keys,
            partition_by=self.partition_by,
            **kwargs,
        )
        return self

    def serve(self, partition_filter: dict | None = None) -> DataFrame:
        """The post-merge snapshot, read BACK FROM STORAGE — pruned at
        the MANIFEST to ``partition_filter`` (e.g. the query batch's
        probed cells / term buckets) so unneeded partitions' files are
        never opened, let alone scanned."""
        if partition_filter is None:
            return read_versioned_table(self.spark, self.path)
        return read_versioned_table(
            self.spark, self.path, partition_filter=partition_filter
        )

    def optimize(self, **kwargs) -> list[dict]:
        """OPTIMIZE: compact fragmented partitions (nightly merges leave
        one file per merge per touched partition) into few large files,
        published as a new version; serving results are unchanged."""
        return compact_versioned_table(self.spark, self.path, **kwargs)

    def vacuum(self, **kwargs) -> list[str]:
        """VACUUM: reclaim superseded manifests/commit dirs beyond the
        retention window; the live snapshot is untouched."""
        return vacuum_versioned_table(self.spark, self.path, **kwargs)

    def coalesce_history(self, col: str, into) -> list[dict]:
        """Fold accumulated ingest segments into the base segment.
        OPTIMIZE bounds files per dir; THIS bounds the dir count under
        perpetual nightly merges that append a fresh ``col`` value per
        night. ``col`` must be ingest provenance serving never reads —
        every other column is carried bit-identically, so served
        results that ignore ``col`` are unchanged (probe-asserted).
        Nightly merges continue on top with fresh ``col`` values."""
        return coalesce_versioned_partitions(
            self.spark, self.path, col=col, into=into
        )


def served_snapshot(
    spark: SparkSession,
    name: str,
    hist_rows: DataFrame,
    batch_rows: DataFrame,
    *,
    keys: Sequence[str],
    bucket_col: str = "ingest_bucket",
) -> DataFrame:
    """The ingest-bucket lifecycle in one call — the signature-store
    shape (historic rows stamped bucket 0, batch rows merged as bucket
    1, post-merge snapshot returned from storage). The bucket IS the
    partition key: the historic partition's manifest entries survive a
    batch merge with zero IO because the disjoint key sets guarantee
    no bucket-0 partition is touched."""
    store = IncrementalIndexStore(
        spark,
        f"{fresh_index_root(name)}/index",
        keys=keys,
        partition_by=[bucket_col],
    )
    store.build(hist_rows.withColumn(bucket_col, F.lit(0)))
    store.merge(batch_rows.withColumn(bucket_col, F.lit(1)))
    return store.serve()
