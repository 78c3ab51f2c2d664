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


def _seg_rows(spark, ids, seg):
    return spark.createDataFrame(
        [(i, seg, i % 3, i * 10) for i in ids],
        "key bigint, seg int, tb int, val bigint",
    )


def test_coalesce_history_folds_segments(spark, tmp_path):
    """coalesce_history: the fourth lifecycle verb. OPTIMIZE bounds
    files per dir; this bounds the DIR count under perpetual nightly
    segment appends — fold N accumulated seg partitions into the base,
    values (minus the provenance col) bit-identical, dirs back to
    O(residual partition values), and the store keeps merging."""
    store = IncrementalIndexStore(
        spark, str(tmp_path / "segidx"), keys=["key"], partition_by=["seg", "tb"]
    )
    store.build(_seg_rows(spark, range(0, 9), seg=0))
    for night in range(1, 4):  # three nightly segments on top
        store.merge(_seg_rows(spark, range(9 * night, 9 * night + 9), seg=night))
    before = rows_set(store.serve().select("key", "tb", "val"))
    m = _read_manifest(spark, store.path, list_versions(spark, store.path)[-1])
    assert len(m["entries"]) == 12  # 4 segs x 3 buckets

    folded = store.coalesce_history("seg", 0)
    assert len(folded) == 9, "three seg=1..3 x 3 buckets should fold"
    # provenance-blind content is bit-identical
    assert rows_set(store.serve().select("key", "tb", "val")) == before
    # dir count collapses to the residual partition values...
    m2 = _read_manifest(spark, store.path, list_versions(spark, store.path)[-1])
    assert len(m2["entries"]) == 3
    assert all(e["partition"]["seg"] == 0 for e in m2["entries"])
    # ...and every dir is ONE fresh file (absorbers folded in, not
    # left stacked beside the rewrite)
    pruned = store.serve({"tb": [0, 1, 2]})
    assert len(pruned.inputFiles()) == 3
    # a pruned serve on the residual col still works
    assert rows_set(store.serve({"tb": [1]}).select("key")) == {
        (k,) for k in range(36) if k % 3 == 1
    }

    # the store keeps operating: a fresh segment merges on top
    store.merge(_seg_rows(spark, range(36, 45), seg=1))
    assert store.serve().count() == 45
    m3 = _read_manifest(spark, store.path, list_versions(spark, store.path)[-1])
    assert len(m3["entries"]) == 6  # 3 folded + 3 new seg=1 dirs
    # ...and a second fold absorbs it back into the base
    assert len(store.coalesce_history("seg", 0)) == 3
    assert store.serve().count() == 45

    # idempotent: nothing left to fold -> no version written
    v = list_versions(spark, store.path)[-1]
    assert store.coalesce_history("seg", 0) == []
    assert list_versions(spark, store.path)[-1] == v


def test_coalesce_history_rejects_non_partition_column(spark, tmp_path):
    import pytest

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        VersionedTableError,
    )

    store = IncrementalIndexStore(
        spark, str(tmp_path / "badidx"), keys=["key"], partition_by=["seg", "tb"]
    )
    store.build(_seg_rows(spark, range(0, 6), seg=0))
    with pytest.raises(VersionedTableError, match="not a partition column"):
        store.coalesce_history("val", 0)


def test_coalesce_history_retries_after_losing_commit_race(
    spark, tmp_path, monkeypatch
):
    """Coalesce is 'just another commit', so it must survive losing the
    manifest CAS to a concurrent writer: re-read the new latest,
    recompute the victim set, and land the fold on top — not fail, and
    not fold against the pre-race snapshot."""
    import json
    import time

    from pathlib import Path

    import st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned as V

    store = IncrementalIndexStore(
        spark, str(tmp_path / "raceidx"), keys=["key"], partition_by=["seg", "tb"]
    )
    store.build(_seg_rows(spark, range(0, 9), seg=0))
    store.merge(_seg_rows(spark, range(9, 18), seg=1))
    before = rows_set(store.serve().select("key", "tb", "val"))

    real = V._write_manifest
    calls = {"n": 0}

    def flaky(spark_, path, candidate):
        calls["n"] += 1
        if calls["n"] == 1:
            # a concurrent no-op commit claims the contested version
            # number first, then this writer's CAS reports the loss —
            # the retry must fold against the PLANTED version
            cur = V._read_manifest(spark_, path, candidate["version"] - 1)
            competing = dict(cur, version=candidate["version"], ts=time.time())
            Path(V._manifest_path(path, candidate["version"])).write_text(
                json.dumps(competing)
            )
            return False
        return real(spark_, path, candidate)

    monkeypatch.setattr(V, "_write_manifest", flaky)
    folded = store.coalesce_history("seg", 0)
    assert calls["n"] >= 2, "coalesce never retried the lost CAS"
    assert len(folded) == 3  # seg=1 x 3 buckets, recomputed post-race
    assert rows_set(store.serve().select("key", "tb", "val")) == before
    m = _read_manifest(spark, store.path, list_versions(spark, store.path)[-1])
    assert len(m["entries"]) == 3
    assert all(e["partition"]["seg"] == 0 for e in m["entries"])


def test_coalesce_then_remerge_keeps_key_identity(spark, tmp_path):
    """Upsert keys are table-global row identity: after a fold, tonight
    re-sending a folded key under a NEW segment must replace the base
    copy (merge rewrites the old partition too), never duplicate it —
    and vacuum after the fold keeps the live snapshot intact."""
    store = IncrementalIndexStore(
        spark, str(tmp_path / "remergeidx"), keys=["key"], partition_by=["seg", "tb"]
    )
    store.build(_seg_rows(spark, range(0, 6), seg=0))
    store.merge(_seg_rows(spark, range(6, 12), seg=1))
    store.coalesce_history("seg", 0)
    store.merge(
        spark.createDataFrame(
            [(3, 2, 0, 999)], "key bigint, seg int, tb int, val bigint"
        )
    )
    assert rows_set(store.serve().where("key = 3").select("key", "seg", "val")) == {
        (3, 2, 999)
    }
    assert store.serve().count() == 12
    before = rows_set(store.serve().select("key", "tb", "val"))
    store.vacuum(keep_last=1, min_age_seconds=0)
    assert rows_set(store.serve().select("key", "tb", "val")) == before
