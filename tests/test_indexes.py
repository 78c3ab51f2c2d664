"""sinks/indexes.py — the shared store->merge->serve lifecycle (r11
verdict ask #6). The five index families' own contracts stay pinned by
their existing tests (signature store zero-IO, BM25 segment model,
IVFADC maintenance, ...); this file pins the MODULE's API so a future
plug can rely on it without re-deriving the skeleton."""

from __future__ import annotations

from pyspark.sql import functions as F

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.indexes import (
    IncrementalIndexStore,
    fresh_index_root,
    served_snapshot,
)
from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
    _read_manifest,
    list_versions,
)

from .conftest import rows_set


def _rows(spark, ids, cell_of):
    return spark.createDataFrame(
        [(i, cell_of(i), f"payload{i}") for i in ids],
        "vec_id bigint, cid int, payload string",
    )


def test_incremental_index_store_full_lifecycle(spark, tmp_path):
    store = IncrementalIndexStore(
        spark, str(tmp_path / "idx"), keys=["vec_id"], partition_by=["cid"]
    )
    # build: historic rows land in cells 0/1
    store.build(_rows(spark, range(0, 20), lambda i: i % 2))
    # merge: the batch touches ONLY cell 2 — copy-on-write must carry
    # the historic cells' manifest entries over byte-identical (the
    # merge-touches-only-batch contract every index family relies on)
    store.merge(_rows(spark, range(20, 25), lambda i: 2))
    versions = list_versions(spark, store.path)
    assert len(versions) == 2
    m0 = _read_manifest(spark, store.path, versions[0])
    m1 = _read_manifest(spark, store.path, versions[1])
    hist0 = [e for e in m0["entries"] if e["partition"]["cid"] in (0, 1)]
    hist1 = [e for e in m1["entries"] if e["partition"]["cid"] in (0, 1)]
    assert hist0 == hist1 and hist0, "merge rewrote untouched partitions"

    # serve: manifest-pruned read opens only the filtered cell's files
    pruned = store.serve({"cid": [2]})
    assert rows_set(pruned.select("vec_id")) == {(i,) for i in range(20, 25)}
    assert all("cid=2" in f for f in pruned.inputFiles())
    full = store.serve()
    assert full.count() == 25

    # merge is an UPSERT on keys: re-sending a key replaces its row
    store.merge(
        spark.createDataFrame([(24, 2, "updated")], "vec_id bigint, cid int, payload string")
    )
    assert rows_set(store.serve({"cid": [2]}).where("vec_id = 24")) == {
        (24, 2, "updated")
    }

    # maintenance: OPTIMIZE is layout-only, VACUUM keeps the snapshot
    before = rows_set(store.serve())
    store.optimize()
    assert rows_set(store.serve()) == before, "OPTIMIZE changed served rows"
    store.vacuum(keep_last=1, min_age_seconds=0)
    assert rows_set(store.serve()) == before, "VACUUM broke the live snapshot"


def test_served_snapshot_buckets_and_returns_store_read(spark):
    hist = spark.createDataFrame([(i, f"s{i}") for i in range(6)], "doc_id long, sig string")
    batch = spark.createDataFrame([(i, f"s{i}") for i in range(6, 9)], "doc_id long, sig string")
    snap = served_snapshot(spark, "pytest_snapshot", hist, batch, keys=["doc_id"])
    got = rows_set(snap.select("doc_id", "sig", "ingest_bucket"))
    want = {(i, f"s{i}", 0) for i in range(6)} | {(i, f"s{i}", 1) for i in range(6, 9)}
    assert got == want
    # the snapshot is a STORAGE read, not the input lineage: parquet-fed
    assert snap.inputFiles(), "snapshot not backed by stored files"


def test_fresh_index_root_is_pid_scoped_and_clean(spark):
    import os

    root = fresh_index_root("pytest_root")
    assert str(os.getpid()) in root
    os.makedirs(root)
    (open(os.path.join(root, "stale"), "w")).close()
    assert fresh_index_root("pytest_root") == root
    assert not os.path.exists(root), "fresh_index_root must pre-clean"
