"""Versioned parquet table (sinks/versioned.py): time travel, atomic
manifest swap, optimistic concurrency, emptied partitions, vacuum."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
    VersionedTableError,
    _manifest_path,
    create_versioned_table,
    latest_version,
    list_versions,
    merge_versioned_table,
    read_versioned_table,
    table_history,
    vacuum_versioned_table,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 30.0), (4, "B", 40.0)],
        "id long, part string, val double",
    )


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_create_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    assert create_versioned_table(_base(spark), path, ["part"]) == 1
    assert rows(read_versioned_table(spark, path)) == rows(_base(spark))
    assert latest_version(spark, path) == 1


def test_merge_makes_new_version_and_time_travel_keeps_old(spark, tmp_path):
    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    changes = spark.createDataFrame(
        [
            (2, "B", 21.0, False),  # update + cross-partition move A -> B
            (5, "C", 50.0, False),  # insert into a brand-new partition
            (3, "B", 0.0, True),  # delete
        ],
        "id long, part string, val double, is_deleted boolean",
    )
    touched = merge_versioned_table(
        spark, path, changes, ["id"], ["part"], delete_col="is_deleted"
    )
    assert {p["part"] for p in touched} == {"A", "B", "C"}
    assert latest_version(spark, path) == 2
    assert rows(read_versioned_table(spark, path)) == {
        (1, "A", 10.0),
        (2, "B", 21.0),
        (4, "B", 40.0),
        (5, "C", 50.0),
    }
    # version 1 still reads its original immutable files
    assert rows(read_versioned_table(spark, path, version=1)) == rows(_base(spark))


def test_merge_retries_after_losing_commit_race(spark, tmp_path):
    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    # simulate a concurrent writer that claimed version 2 with a no-op
    # manifest: the merge must lose the race once, re-read v2, and land
    # its result as v3
    m1 = json.loads((tmp_path / "t" / "_manifests" / "v0000000001.json").read_text())
    m2 = dict(m1, version=2)
    (tmp_path / "t" / "_manifests" / "v0000000002.json").write_text(json.dumps(m2))
    changes = spark.createDataFrame(
        [(1, "A", 11.0, False)], "id long, part string, val double, is_deleted boolean"
    )
    merge_versioned_table(spark, path, changes, ["id"], ["part"], delete_col="is_deleted")
    assert latest_version(spark, path) == 3
    assert (1, "A", 11.0) in rows(read_versioned_table(spark, path))


def test_emptied_partition_drops_entry_but_stays_in_history(spark, tmp_path):
    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    deletes = spark.createDataFrame(
        [(3, "B", 0.0, True), (4, "B", 0.0, True)],
        "id long, part string, val double, is_deleted boolean",
    )
    merge_versioned_table(spark, path, deletes, ["id"], ["part"], delete_col="is_deleted")
    latest = read_versioned_table(spark, path)
    assert rows(latest) == {(1, "A", 10.0), (2, "A", 20.0)}
    # no tombstone directory games: v1 still sees partition B
    old = read_versioned_table(spark, path, version=1)
    assert rows(old.where(F.col("part") == "B")) == {(3, "B", 30.0), (4, "B", 40.0)}
    hist = table_history(spark, path)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["n_partitions"] == 1  # only A survives in v2


def test_vacuum_reclaims_unreferenced_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    for delta in (1.0, 2.0):
        changes = spark.createDataFrame(
            [(1, "A", 10.0 + delta, False)],
            "id long, part string, val double, is_deleted boolean",
        )
        merge_versioned_table(
            spark, path, changes, ["id"], ["part"], delete_col="is_deleted"
        )
    assert list_versions(spark, path) == [1, 2, 3]
    deleted = vacuum_versioned_table(spark, path, keep_last=1)
    assert deleted, "expected superseded commits and manifests to be deleted"
    assert list_versions(spark, path) == [3]
    # the retained version still reads completely
    assert (1, "A", 12.0) in rows(read_versioned_table(spark, path))
    with pytest.raises(VersionedTableError):
        read_versioned_table(spark, path, version=1)


def test_no_op_merge_writes_no_version(spark, tmp_path):
    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    empty = spark.createDataFrame(
        [], "id long, part string, val double, is_deleted boolean"
    )
    assert merge_versioned_table(
        spark, path, empty, ["id"], ["part"], delete_col="is_deleted"
    ) == []
    assert latest_version(spark, path) == 1


def test_manifest_path_is_zero_padded_for_ordering():
    assert _manifest_path("/t", 7).endswith("v0000000007.json")
