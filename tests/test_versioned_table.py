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


def test_merge_callable_changes_recompute_against_retry_snapshot(spark, tmp_path):
    # r5 advice fix: a read-modify-write merge (CMS add) must not
    # commit values derived from a pre-race snapshot. Pass changes as a
    # callable; make its FIRST invocation trigger a concurrent commit
    # (so the outer merge loses the manifest race), and assert the
    # retry's result includes the concurrent writer's update — the
    # lost-update scenario, made deterministic.
    path = str(tmp_path / "t")
    create_versioned_table(
        spark.createDataFrame([(1, "A", 10.0)], "id long, part string, val double"),
        path,
        ["part"],
    )
    calls = {"n": 0}

    def add_five(snapshot):
        calls["n"] += 1
        if calls["n"] == 1:
            # concurrent writer bumps id=1 to 100.0 AFTER our snapshot
            # was taken but BEFORE our commit: we must lose the race
            merge_versioned_table(
                spark,
                path,
                spark.createDataFrame([(1, "A", 100.0)], "id long, part string, val double"),
                ["id"],
                ["part"],
            )
        return snapshot.where(F.col("id") == 1).select(
            "id", "part", (F.col("val") + F.lit(5.0)).alias("val")
        )

    merge_versioned_table(spark, path, add_five, ["id"], ["part"])
    assert calls["n"] == 2, "callable must re-run against the retry snapshot"
    # 100 + 5, NOT 10 + 5: the concurrent write survives the retry
    assert rows(read_versioned_table(spark, path)) == {(1, "A", 105.0)}


def test_cms_writer_add_survives_interleaved_concurrent_merge(spark, tmp_path):
    # the same lost-update contract at the cms_batch_writer level: a
    # concurrent cell bump between the writer's snapshot and commit
    # must be summed into the final grid, not overwritten
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.streaming.sinks import (
        cms_batch_writer,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks import versioned as vmod

    table = str(tmp_path / "cms")
    writer = cms_batch_writer(table, "user_id", depth=3, width=16, app_id="w1")
    writer(spark.createDataFrame([("u1",)], "user_id string"), 0)
    base = {
        (r.row, r.bucket): r.c for r in read_versioned_table(spark, table).collect()
    }
    assert base and all(c == 1 for c in base.values())

    # interleave: while epoch-1's merge is in flight, another writer
    # commits the same single-key delta (u1 again). Patch the merge the
    # writer calls so the first changes-callable invocation performs
    # the concurrent commit.
    real_merge = vmod.merge_versioned_table
    state = {"fired": False}

    def racing_merge(sp, p, changes, keys, parts, **kw):
        def chg(snapshot):
            if not state["fired"]:
                state["fired"] = True
                writer2 = cms_batch_writer(table, "user_id", depth=3, width=16, app_id="w2")
                writer2(spark.createDataFrame([("u1",)], "user_id string"), 0)
            return changes(snapshot)

        return real_merge(sp, p, chg if callable(changes) else changes, keys, parts, **kw)

    import st_bigdata_consume_batch_ma_with_cr_ecd_spark.streaming.sinks as ssinks

    orig = ssinks.__dict__.get("merge_versioned_table")
    try:
        vmod_merge = vmod.merge_versioned_table
        vmod.merge_versioned_table = racing_merge
        # the writer imports inside the function body from ..sinks.versioned,
        # so patching the module attribute is what it sees
        writer(spark.createDataFrame([("u1",)], "user_id string"), 1)
    finally:
        vmod.merge_versioned_table = vmod_merge
        if orig is not None:
            ssinks.merge_versioned_table = orig
    final = {
        (r.row, r.bucket): r.c for r in read_versioned_table(spark, table).collect()
    }
    # three u1 increments total (epoch 0, concurrent, epoch 1): every
    # touched cell must read 3 — a stale-snapshot commit would leave 2
    assert final == {k: 3 for k in base}


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
    # min_age_seconds=0: the fixture's commits are seconds old and no
    # writer is running; the default 1h window exists to protect
    # in-flight merges that wrote data but not yet their manifest
    deleted = vacuum_versioned_table(spark, path, keep_last=1, min_age_seconds=0)
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


def test_streaming_cdc_apply_versions_every_micro_batch(spark, tmp_path):
    # the versioned twin of the CoW streaming capstone: each micro-batch
    # commits as one atomic version, so the stream's history is a
    # queryable audit log
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.dedup import (
        top_n_per_group,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.streaming.sinks import (
        versioned_merge_batch_writer,
    )

    table = str(tmp_path / "vt_stream")
    src_dir = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")

    snap = spark.createDataFrame(
        [(i, "DE" if i % 2 == 0 else "AT", float(i)) for i in range(5)],
        "id long, country string, amount double",
    )
    create_versioned_table(snap, table, ["country"])

    changes1 = spark.createDataFrame(
        [(1, "AT", 100.0, 1), (2, "DE", 200.0, 1), (7, "CH", 700.0, 1)],
        "id long, country string, amount double, seq int",
    )
    changes2 = spark.createDataFrame(
        [(1, "DE", 111.0, 2), (7, "CH", 777.0, 2)],  # 1 moves AT -> DE
        "id long, country string, amount double, seq int",
    )
    changes1.coalesce(1).write.parquet(src_dir)
    changes2.coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema("id long, country string, amount double, seq int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    writer = versioned_merge_batch_writer(
        table,
        ["id"],
        ["country"],
        compact=lambda b: top_n_per_group(b, ["id"], [F.col("seq").desc()]).drop("seq"),
    )
    (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    # one version per micro-batch on top of the snapshot
    assert list_versions(spark, table) == [1, 2, 3]
    final = rows(read_versioned_table(spark, table))
    assert final == {
        (0, "DE", 0.0),
        (1, "DE", 111.0),
        (2, "DE", 200.0),
        (3, "AT", 3.0),
        (4, "DE", 4.0),
        (7, "CH", 777.0),
    }
    # the audit log: version 2 is the table exactly after micro-batch 0
    mid = rows(read_versioned_table(spark, table, version=2))
    assert (1, "AT", 100.0) in mid and (7, "CH", 700.0) in mid


def test_txn_epoch_replay_is_skipped_atomically(spark, tmp_path):
    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    c1 = spark.createDataFrame(
        [(1, "A", 11.0, False)], "id long, part string, val double, is_deleted boolean"
    )
    assert merge_versioned_table(
        spark, path, c1, ["id"], ["part"], delete_col="is_deleted", txn=("app", 0)
    )
    # a crashed-and-replayed epoch arrives again — with DIFFERENT data;
    # the txn gate must skip it entirely (no new version, no change)
    c1_replay = spark.createDataFrame(
        [(1, "A", 999.0, False)], "id long, part string, val double, is_deleted boolean"
    )
    assert (
        merge_versioned_table(
            spark,
            path,
            c1_replay,
            ["id"],
            ["part"],
            delete_col="is_deleted",
            txn=("app", 0),
        )
        == []
    )
    assert latest_version(spark, path) == 2
    assert (1, "A", 11.0) in rows(read_versioned_table(spark, path))
    # the NEXT epoch applies normally
    assert merge_versioned_table(
        spark, path, c1_replay, ["id"], ["part"], delete_col="is_deleted", txn=("app", 1)
    )
    assert (1, "A", 999.0) in rows(read_versioned_table(spark, path))


def test_partition_filter_prunes_at_the_manifest(spark, tmp_path):
    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    pruned = read_versioned_table(spark, path, partition_filter={"part": "A"})
    assert rows(pruned) == {(1, "A", 10.0), (2, "A", 20.0)}
    # pruning happened at the manifest: only partition A's files are
    # inputs to the scan — partition B never touches the file system
    assert all("part=A" in f for f in pruned.inputFiles())
    with pytest.raises(VersionedTableError):
        read_versioned_table(spark, path, partition_filter={"nope": 1})
    empty = read_versioned_table(spark, path, partition_filter={"part": "Z"})
    assert empty.count() == 0 and empty.schema == _base(spark).schema


def test_partition_filter_accepts_value_lists(spark, tmp_path):
    # IN semantics for multi-partition probes (the IVF query batch
    # shape: prune the inverted file to the probed cells' partitions)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 0, 1.0), (2, 1, 2.0), (3, 2, 3.0), (4, 1, 4.0)],
        "id long, cid int, val double",
    )
    create_versioned_table(df, path, ["cid"])
    pruned = read_versioned_table(spark, path, partition_filter={"cid": [0, 2]})
    assert rows(pruned) == {(1, 0, 1.0), (3, 2, 3.0)}
    assert all(("cid=0" in f or "cid=2" in f) for f in pruned.inputFiles())
    # empty list = no matching partitions, schema intact
    empty = read_versioned_table(spark, path, partition_filter={"cid": []})
    assert empty.count() == 0 and empty.schema == df.schema


def test_numeric_looking_string_partition_values_survive_reads(spark, tmp_path):
    # regression: directory-name inference types by VALUE ('01' -> 1);
    # the reader must take partition values from the manifest instead
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "01", 1.0), (2, "007", 2.0), (3, "1e5", 3.0)],
        "id long, part string, val double",
    )
    create_versioned_table(df, path, ["part"])
    assert rows(read_versioned_table(spark, path)) == {
        (1, "01", 1.0),
        (2, "007", 2.0),
        (3, "1e5", 3.0),
    }
    pruned = read_versioned_table(spark, path, partition_filter={"part": "01"})
    assert rows(pruned) == {(1, "01", 1.0)}


def test_change_feed_reads_only_touched_partitions(spark, tmp_path):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        versioned_change_feed,
    )

    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    changes = spark.createDataFrame(
        [(1, "A", 11.0, False), (3, "B", 0.0, True)],
        "id long, part string, val double, is_deleted boolean",
    )
    merge_versioned_table(spark, path, changes, ["id"], ["part"], delete_col="is_deleted")
    feed = versioned_change_feed(
        spark, path, ["id"], from_version=1, to_version=2
    )
    got = {(r.id, r.change_type) for r in feed.collect()}
    assert got == {(1, "update"), (3, "delete")}
    # identical version -> empty feed, zero partitions read
    empty = versioned_change_feed(spark, path, ["id"], from_version=2, to_version=2)
    assert empty.count() == 0 and empty.inputFiles() == []


def test_compaction_coalesces_files_and_preserves_time_travel(spark, tmp_path):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        compact_versioned_table,
    )

    path = str(tmp_path / "t")
    # force fragmentation: many write tasks -> many files per partition
    df = spark.createDataFrame(
        [(i, "A" if i % 2 == 0 else "B", float(i)) for i in range(40)],
        "id long, part string, val double",
    ).repartition(8)
    create_versioned_table(df, path, ["part"])

    def files_per_partition():
        import collections
        import glob

        counts = collections.Counter()
        for f in glob.glob(f"{path}/data/*/part=*/*.parquet"):
            counts[f.split("/")[-2]] += 1
        return counts

    before = read_versioned_table(spark, path)
    before_rows = rows(before)
    assert max(files_per_partition().values()) > 1  # fragmented fixture

    compacted = compact_versioned_table(spark, path)
    assert {p["part"] for p in compacted} == {"A", "B"}
    assert latest_version(spark, path) == 2
    # content identical, layout coalesced
    assert rows(read_versioned_table(spark, path)) == before_rows
    latest_files = read_versioned_table(spark, path).inputFiles()
    per_dir = {}
    for f in latest_files:
        per_dir.setdefault(f.rsplit("/", 2)[-2], []).append(f)
    assert all(len(v) == 1 for v in per_dir.values())
    # the old fragmented layout still serves version 1 (time travel)
    assert rows(read_versioned_table(spark, path, version=1)) == before_rows
    # idempotent: nothing fragmented -> no-op, no new version
    assert compact_versioned_table(spark, path) == []
    assert latest_version(spark, path) == 2


def test_change_feed_sees_evolved_columns(spark, tmp_path):
    # r3 advisor (medium): the feed used to pin the FROM-version schema,
    # so an update touching ONLY an evolved column was classified
    # unchanged and dropped, and payloads never carried the new column.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        versioned_change_feed,
    )

    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])  # v1
    evo_schema = "id long, part string, val double, currency string, is_deleted boolean"
    merge_versioned_table(
        spark, path,
        spark.createDataFrame([(1, "A", 10.0, "eur", False)], evo_schema),
        ["id"], ["part"], delete_col="is_deleted", allow_schema_evolution=True,
    )  # v2: adds `currency`
    merge_versioned_table(
        spark, path,
        spark.createDataFrame([(1, "A", 10.0, "chf", False)], evo_schema),
        ["id"], ["part"], delete_col="is_deleted", allow_schema_evolution=True,
    )  # v3: changes ONLY the evolved column

    feed = versioned_change_feed(spark, path, ["id"], from_version=2, to_version=3)
    by_id = {r.id: r for r in feed.collect()}
    assert 1 in by_id, "evolved-column-only update must appear in the feed"
    assert by_id[1].change_type == "update"
    assert by_id[1].currency_before == "eur" and by_id[1].currency_after == "chf"
    assert by_id[1].val_before == 10.0 and by_id[1].val_after == 10.0

    # across the evolution boundary (v1 -> v2): pre-evolution rows read
    # the new column as typed null on the before side
    boundary = {r.id: r for r in
                versioned_change_feed(spark, path, ["id"], from_version=1, to_version=2).collect()}
    assert boundary[1].change_type == "update"
    assert boundary[1].currency_before is None and boundary[1].currency_after == "eur"


def test_compaction_honors_max_files_per_partition(spark, tmp_path):
    # r3 advisor (low): repartitioning by part_cols alone hashed every
    # partition value into ONE task, so max_files_per_partition > 1 was
    # a selection threshold that could never shape the output layout.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        compact_versioned_table,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "A", float(i)) for i in range(400)], "id long, part string, val double"
    ).repartition(16)
    create_versioned_table(df, path, ["part"])
    before_rows = rows(read_versioned_table(spark, path))

    compacted = compact_versioned_table(spark, path, max_files_per_partition=4)
    assert [p["part"] for p in compacted] == ["A"]
    per_dir: dict[str, int] = {}
    for f in read_versioned_table(spark, path).inputFiles():
        d = f.rsplit("/", 2)[-2]
        per_dir[d] = per_dir.get(d, 0) + 1
    assert all(1 < n <= 4 for n in per_dir.values()), per_dir
    assert rows(read_versioned_table(spark, path)) == before_rows


def test_schema_evolution_adds_column_with_per_version_schemas(spark, tmp_path):
    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    changes = spark.createDataFrame(
        [(1, "A", 11.0, "eur", False), (5, "C", 50.0, "usd", False)],
        "id long, part string, val double, currency string, is_deleted boolean",
    )
    merge_versioned_table(
        spark,
        path,
        changes,
        ["id"],
        ["part"],
        delete_col="is_deleted",
        allow_schema_evolution=True,
    )
    latest = read_versioned_table(spark, path)
    assert latest.columns == ["id", "part", "val", "currency"]
    got = {r.id: r.currency for r in latest.collect()}
    # evolved rows carry the value, pre-evolution rows read typed nulls
    assert got[1] == "eur" and got[5] == "usd"
    assert got[2] is None and got[3] is None and got[4] is None
    # time travel serves version 1 with version 1's schema
    v1 = read_versioned_table(spark, path, version=1)
    assert v1.columns == ["id", "part", "val"]
    assert rows(v1) == rows(_base(spark))
    # without the flag, unknown columns are ignored (legacy behavior);
    # change batches must still carry every CURRENT data column
    more = spark.createDataFrame(
        [(2, "A", 22.0, "chf", "zzz", False)],
        "id long, part string, val double, currency string, bogus string, is_deleted boolean",
    )
    merge_versioned_table(spark, path, more, ["id"], ["part"], delete_col="is_deleted")
    assert "bogus" not in read_versioned_table(spark, path).columns

    # evolving a partition column is refused
    bad = spark.createDataFrame(
        [(9, "A", 1.0, False)], "id long, part2 string, val double, is_deleted boolean"
    )
    with pytest.raises(VersionedTableError):
        merge_versioned_table(
            spark, path, bad.withColumnRenamed("part2", "part").withColumn("part2", F.lit("x")),
            ["id"], ["part2"], delete_col="is_deleted", allow_schema_evolution=True,
        )


def test_zone_map_skipping_prunes_files_and_preserves_results(spark, tmp_path):
    # per-file min/max stats recorded at commit must (a) never change a
    # result (conservative skip), (b) actually reduce the files read
    # when the predicate is selective, (c) be ignored gracefully for
    # pre-zone-map manifests.
    import json as _json
    from pathlib import Path as _P

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        _manifest_path,
    )

    path = str(tmp_path / "t")
    # 400 rows, val correlates with write order -> repartitionByRange
    # gives each of the 8 files a narrow val range
    df = (
        spark.createDataFrame(
            [(i, "A", float(i)) for i in range(400)], "id long, part string, val double"
        )
        .repartitionByRange(8, "val")
    )
    create_versioned_table(df, path, ["part"])

    full = read_versioned_table(spark, path)
    n_files_total = len(full.inputFiles())
    assert n_files_total == 8

    got = read_versioned_table(spark, path, range_filter={"val": (100.0, 149.0)})
    assert {r.id for r in got.collect()} == set(range(100, 150))
    assert len(got.inputFiles()) < n_files_total  # files actually skipped

    # open bounds work; result identical to a plain filter
    lo_only = read_versioned_table(spark, path, range_filter={"val": (350.0, None)})
    assert {r.id for r in lo_only.collect()} == set(range(350, 400))
    assert len(lo_only.inputFiles()) <= 2

    # unknown column and partition column are rejected
    with pytest.raises(VersionedTableError):
        read_versioned_table(spark, path, range_filter={"nope": (1, 2)})
    with pytest.raises(VersionedTableError):
        read_versioned_table(spark, path, range_filter={"part": ("A", "B")})

    # pre-zone-map manifest (files key stripped): same results, no skip
    mpath = _P(_manifest_path(path, 1).replace("file:", ""))
    m = _json.loads(mpath.read_text())
    for e in m["entries"]:
        e.pop("files", None)
    mpath.write_text(_json.dumps(m))
    legacy = read_versioned_table(spark, path, range_filter={"val": (100.0, 149.0)})
    assert {r.id for r in legacy.collect()} == set(range(100, 150))
    assert len(legacy.inputFiles()) == n_files_total


def test_zone_maps_survive_merge_and_skip_all_null_files(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "A", float(i)) for i in range(100)], "id long, part string, val double"
    ).repartitionByRange(4, "val")
    create_versioned_table(df, path, ["part"])
    changes = spark.createDataFrame(
        [(1000, "B", None, False)], "id long, part string, val double, is_deleted boolean"
    )
    merge_versioned_table(spark, path, changes, ["id"], ["part"], delete_col="is_deleted")
    # the all-null-val file in partition B is provably empty under a
    # val range predicate -> skipped entirely
    got = read_versioned_table(spark, path, range_filter={"val": (10.0, 20.0)})
    assert {r.id for r in got.collect()} == set(range(10, 21))
    assert all("part=B" not in f for f in got.inputFiles())
    # but a plain read still returns the B row
    assert read_versioned_table(spark, path).where(F.col("id") == 1000).count() == 1


def test_zorder_compaction_tightens_multi_column_skipping(spark, tmp_path):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        compact_versioned_table,
    )

    path = str(tmp_path / "t")
    # two independent dimensions: x = i // 64, y = i % 64 over a 64x64
    # grid; written hash-fragmented so initial per-file stats are wide
    rows = [(i, "A", float(i // 64), float(i % 64)) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, part string, x double, y double").repartition(16)
    create_versioned_table(df, path, ["part"])

    before = read_versioned_table(spark, path, range_filter={"y": (0.0, 7.0)})
    before_files = len(before.inputFiles())
    assert before_files == 16  # hash layout: every file spans all y values

    compacted = compact_versioned_table(
        spark, path, max_files_per_partition=8, zorder_by=["x", "y"]
    )
    assert compacted == [{"part": "A"}]

    # content identical across the rewrite
    assert read_versioned_table(spark, path).count() == 4096
    # a narrow band on EITHER z column now skips most files
    for col in ("x", "y"):
        narrow = read_versioned_table(spark, path, range_filter={col: (0.0, 7.0)})
        assert {r.id for r in narrow.collect()} == {
            i for i in range(4096)
            if 0 <= (i // 64 if col == "x" else i % 64) <= 7
        }
        n = len(narrow.inputFiles())
        assert n < 8, f"{col}: read {n} of 8 z-ordered files"

    # string zorder columns are rejected with a clear error
    with pytest.raises(VersionedTableError):
        compact_versioned_table(spark, path, zorder_by=["part"])


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    # the live streamed sketch (cell-wise ADD per micro-batch, txn-
    # idempotent) must equal the one-shot batch sketch over the same
    # data — sketch linearity carried through the streaming path — and
    # version history audits one sketch state per micro-batch.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.llm.sketches import (
        count_min_cells,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.streaming.sinks import (
        cms_batch_writer,
    )

    table = str(tmp_path / "cms")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.createDataFrame([(i, i % 7) for i in range(50)], "event_id long, user_id long")
    b2 = spark.createDataFrame([(i, i % 5) for i in range(50, 90)], "event_id long, user_id long")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    (
        stream.writeStream.foreachBatch(cms_batch_writer(table, "user_id", depth=3, width=16))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    streamed = {(r.row, r.bucket): r.c for r in
                read_versioned_table(spark, table).collect()}
    whole = b1.unionByName(b2)
    batch = {(r.row, r.bucket): r.c for r in
             count_min_cells(whole, "user_id", depth=3, width=16).collect()}
    assert streamed == batch
    # v1 = empty table, then one version per micro-batch
    assert list_versions(spark, table) == [1, 2, 3]
    assert read_versioned_table(spark, table, version=1).count() == 0


def test_bloom_point_lookup_skips_files(spark, tmp_path):
    # per-file Bloom index: a point lookup on a high-cardinality key
    # reads only the file(s) whose Bloom can't rule the value out;
    # results always equal a plain filter; absent keys read 0 files.
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "A", float(i)) for i in range(400)], "id long, part string, val double"
    ).repartition(8)  # hash layout: ids scattered, min/max useless
    create_versioned_table(df, path, ["part"], bloom_cols=["id"])

    total = len(read_versioned_table(spark, path).inputFiles())
    assert total == 8

    hit = read_versioned_table(spark, path, point_filter={"id": 123})
    assert [(r.id, r.val) for r in hit.collect()] == [(123, 123.0)]
    assert len(hit.inputFiles()) < total  # bloom actually skipped files

    miss = read_versioned_table(spark, path, point_filter={"id": 10**9})
    assert miss.count() == 0
    assert len(miss.inputFiles()) == 0  # proof of absence: zero files read

    # un-indexed column still filters correctly, no skip
    v = read_versioned_table(spark, path, point_filter={"val": 7.0})
    assert v.count() == 1

    # zone-map comparison on the same layout: range_filter can't skip
    # scattered ids (every file spans ~the full range)
    r = read_versioned_table(spark, path, range_filter={"val": (123.0, 123.0)})
    assert len(r.inputFiles()) == total

    # errors: unknown / partition columns
    with pytest.raises(VersionedTableError):
        read_versioned_table(spark, path, point_filter={"nope": 1})
    with pytest.raises(VersionedTableError):
        read_versioned_table(spark, path, point_filter={"part": "A"})
    with pytest.raises(VersionedTableError):
        create_versioned_table(_base(spark), str(tmp_path / "t2"), ["part"],
                               bloom_cols=["missing"])


def test_bloom_index_survives_merge_and_compaction(spark, tmp_path):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        compact_versioned_table,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "A", float(i)) for i in range(200)], "id long, part string, val double"
    ).repartition(6)
    create_versioned_table(df, path, ["part"], bloom_cols=["id"])
    changes = spark.createDataFrame(
        [(1000, "A", 1.5, False), (5, "A", 5.5, False)],
        "id long, part string, val double, is_deleted boolean",
    )
    merge_versioned_table(spark, path, changes, ["id"], ["part"], delete_col="is_deleted")
    # the merged commit carries a fresh bloom: new key found, updated value seen
    got = read_versioned_table(spark, path, point_filter={"id": 1000})
    assert [(r.id, r.val) for r in got.collect()] == [(1000, 1.5)]
    assert (5, 5.5) in {(r.id, r.val) for r in
                        read_versioned_table(spark, path, point_filter={"id": 5}).collect()}

    compact_versioned_table(spark, path, max_files_per_partition=2)
    after = read_versioned_table(spark, path, point_filter={"id": 1000})
    assert [(r.id, r.val) for r in after.collect()] == [(1000, 1.5)]
    assert read_versioned_table(spark, path).count() == 201


def test_range_filter_on_statless_table_still_returns_rows(spark, tmp_path):
    # r4 review: a table whose data columns are all outside _STAT_TYPES
    # (decimal/boolean) used to record files=[] and the skipping read
    # dropped every entry -> silent zero rows.
    from decimal import Decimal

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(Decimal("1.50"), True, "A"), (Decimal("2.50"), False, "A")],
        "amount decimal(10,2), flag boolean, part string",
    )
    create_versioned_table(df, path, ["part"])
    got = read_versioned_table(spark, path, range_filter={"amount": (2, 3)})
    assert [(r.amount, r.flag) for r in got.collect()] == [(Decimal("2.50"), False)]


def test_range_filter_date_bound_on_timestamp_column_keeps_boundary(spark, tmp_path):
    # r4 review: a date-grained bound used to compare lexicographically
    # below the file's midnight timestamp stat and falsely skip the file
    import datetime as dt

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, "A", dt.datetime(2024, 1, 15, 0, 0, 0)),   # exactly midnight
            (2, "A", dt.datetime(2024, 1, 16, 12, 0, 0)),
        ],
        "id long, part string, ts timestamp",
    ).repartitionByRange(2, "ts")
    create_versioned_table(df, path, ["part"])
    # upper bound as a DATE: must keep the midnight row (date promotes
    # to midnight in the row filter, so skipping must agree)
    got = read_versioned_table(
        spark, path, range_filter={"ts": (None, dt.date(2024, 1, 15))}
    )
    assert [r.id for r in got.collect()] == [1]
    # same day-grained STRING bound takes the same normalization
    got2 = read_versioned_table(
        spark, path, range_filter={"ts": ("2024-01-15", None)}
    )
    assert {r.id for r in got2.collect()} == {1, 2}


def test_bloom_cols_reject_nonstring_noninteger_types(spark, tmp_path):
    # r4 review: Python str() and Spark cast-to-string disagree for
    # booleans/doubles, which would turn proof-of-absence into false
    # absence — such columns are refused at create time.
    with pytest.raises(VersionedTableError, match="bloom_cols must be"):
        create_versioned_table(
            _base(spark), str(tmp_path / "t"), ["part"], bloom_cols=["val"]
        )


def test_range_filter_boundary_normalizations(spark, tmp_path):
    # r4 review round 2: midnight datetime on a DATE column and
    # minute-grained string on a TIMESTAMP column used to false-skip
    # boundary files via strict-prefix lexicographic compares
    import datetime as dt

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (1, "A", dt.date(2024, 1, 16), dt.datetime(2024, 1, 15, 12, 0, 0)),
            (2, "A", dt.date(2024, 1, 20), dt.datetime(2024, 1, 20, 9, 30, 0)),
        ],
        "id long, part string, d date, ts timestamp",
    ).repartitionByRange(2, "d")
    create_versioned_table(df, path, ["part"])

    # datetime at exact midnight vs date stat: equality must keep the file
    got = read_versioned_table(
        spark, path, range_filter={"d": (dt.datetime(2024, 1, 16, 0, 0), None)}
    )
    assert {r.id for r in got.collect()} == {1, 2}
    # minute-grained string bound on timestamp: equal row must survive
    got2 = read_versioned_table(
        spark, path, range_filter={"ts": (None, "2024-01-15 12:00")}
    )
    assert {r.id for r in got2.collect()} == {1}
    # string with a time part on a DATE column truncates to the day
    # (matching Spark's string->date cast in the row filter)
    got3 = read_versioned_table(
        spark, path, range_filter={"d": ("2024-01-16 12:00:00", None)}
    )
    assert {r.id for r in got3.collect()} == {1, 2}


def test_range_filter_string_column_bound_with_T_not_rewritten(spark, tmp_path):
    # r5 advice (high): the ISO 'T'->' ' rewrite must be gated on
    # temporal columns. On a plain STRING column a bound containing 'T'
    # ('Tom' -> ' om', and ' ' sorts below every printable char) used to
    # lexicographically LOWER the upper bound and falsely prune files —
    # silently dropping rows and breaking full-scan equivalence.
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "A", "Alice"), (2, "A", "Bob"), (3, "A", "Tom"), (4, "A", "Zed")],
        "id long, part string, name string",
    ).repartitionByRange(4, "name")
    create_versioned_table(df, path, ["part"])

    got = read_versioned_table(spark, path, range_filter={"name": (None, "Tom")})
    # full-scan equivalence: same rows as a plain <= filter
    assert {r.id for r in got.collect()} == {1, 2, 3}
    # lower bound with 'T' symmetric case
    got2 = read_versioned_table(spark, path, range_filter={"name": ("Tom", None)})
    assert {r.id for r in got2.collect()} == {3, 4}
    # and an actual-T-containing exact match survives skipping
    got3 = read_versioned_table(spark, path, range_filter={"name": ("Tom", "Tom")})
    assert {r.id for r in got3.collect()} == {3}
    assert len(got3.inputFiles()) < 4  # zone maps still skip


def test_range_filter_rejects_mistyped_bound(spark, tmp_path):
    # r5 advice: a bound not comparable to the column's stats used to
    # raise a bare TypeError from inside the prune loop; the read must
    # refuse it up front, naming the column
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "A", "x", 1.0)], "id long, part string, name string, val double"
    )
    create_versioned_table(df, path, ["part"])
    with pytest.raises(VersionedTableError, match="name"):
        read_versioned_table(spark, path, range_filter={"name": (1, 2)})
    with pytest.raises(VersionedTableError, match="val"):
        read_versioned_table(spark, path, range_filter={"val": ("low", None)})
    with pytest.raises(VersionedTableError, match="val"):
        read_versioned_table(spark, path, range_filter={"val": (None, True)})


def test_bloom_point_filter_rejects_mistyped_probe(spark, tmp_path):
    # r4 review round 2: a float probe on a bigint bloom column hashes
    # 'b0:123.0' vs the build side's 'b0:123' — false absence; the read
    # now refuses mistyped probes instead of silently returning nothing
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "A", float(i)) for i in range(50)], "id long, part string, val double"
    )
    create_versioned_table(df, path, ["part"], bloom_cols=["id"])
    with pytest.raises(VersionedTableError, match="must be an int"):
        read_versioned_table(spark, path, point_filter={"id": 123.0})
    with pytest.raises(VersionedTableError, match="must be an int"):
        read_versioned_table(spark, path, point_filter={"id": True})
    assert read_versioned_table(spark, path, point_filter={"id": 7}).count() == 1


def test_cms_writer_creates_table_on_empty_first_batch(spark, tmp_path):
    # r4 review round 2: an empty batch-0 must still create the empty
    # v1 table so mid-stream consumers never hit a missing manifest
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.streaming.sinks import (
        cms_batch_writer,
    )

    table = str(tmp_path / "cms")
    writer = cms_batch_writer(table, "user_id", depth=3, width=16)
    empty = spark.createDataFrame([], "event_id long, user_id long")
    writer(empty, 0)
    assert list_versions(spark, table) == [1]
    assert read_versioned_table(spark, table).count() == 0
    writer(spark.createDataFrame([(1, 5)], "event_id long, user_id long"), 1)
    assert read_versioned_table(spark, table).agg(F.sum("c")).collect()[0][0] == 3


def test_tags_pin_versions_through_merges_and_vacuum(spark, tmp_path):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        create_tag,
        delete_tag,
        list_tags,
        read_versioned_table,
        resolve_tag,
    )

    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    assert create_tag(spark, path, "training-cut") == 1  # defaults to latest
    v1_rows = rows(read_versioned_table(spark, path, tag="training-cut"))
    assert v1_rows == rows(_base(spark))

    # three more versions so v1 falls outside any keep_last=2 window
    for i in range(3):
        ch = spark.createDataFrame(
            [(10 + i, "A", 99.0 + i, False)],
            "id long, part string, val double, is_deleted boolean",
        )
        merge_versioned_table(
            spark, path, ch, ["id"], ["part"], delete_col="is_deleted"
        )
    assert latest_version(spark, path) == 4
    assert list_tags(spark, path) == {"training-cut": 1}

    vacuum_versioned_table(spark, path, keep_last=2, min_age_seconds=0)
    # v1 is tagged: manifest AND data must survive the vacuum
    assert rows(read_versioned_table(spark, path, tag="training-cut")) == v1_rows
    # untagged v2 is outside keep_last and must be gone
    assert list_versions(spark, path) == [1, 3, 4]

    # immutable by default; replace retargets; delete removes
    with pytest.raises(VersionedTableError):
        create_tag(spark, path, "training-cut")
    assert create_tag(spark, path, "training-cut", replace=True) == 4
    assert resolve_tag(spark, path, "training-cut") == 4
    delete_tag(spark, path, "training-cut")
    assert list_tags(spark, path) == {}
    with pytest.raises(VersionedTableError):
        resolve_tag(spark, path, "training-cut")


def test_tag_validation_and_exclusivity(spark, tmp_path):
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import create_tag

    path = str(tmp_path / "t")
    create_versioned_table(_base(spark), path, ["part"])
    with pytest.raises(VersionedTableError):
        create_tag(spark, path, "../escape")
    with pytest.raises(VersionedTableError):
        create_tag(spark, path, "nope", version=99)  # nonexistent version
    create_tag(spark, path, "ok")
    with pytest.raises(VersionedTableError):
        read_versioned_table(spark, path, version=1, tag="ok")  # mutually exclusive


def test_grouped_commit_read_preserves_adversarial_partition_values(spark, tmp_path):
    # r11: entries from one commit read as ONE hive scan with the
    # user-supplied schema typing the partition columns. The values
    # this grouping must NOT corrupt: zero-padded strings ('01' — the
    # by-value inference trap the module documents), booleans, None,
    # and hive-escaped characters; '' and the literal null sentinel
    # must fall back to the per-entry literal path and still round-trip.
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        create_versioned_table,
        read_versioned_table,
    )

    rows = [
        (1, "01", True, "x"),
        (2, "1", False, "a b=c/d%2F"),
        (3, "2", None, None),
        (6, "01", True, "x"),  # same partition as row 1
    ]
    df = spark.createDataFrame(
        rows, "id bigint, p string, q boolean, r string"
    )
    path = str(tmp_path / "adversarial")
    create_versioned_table(df, path, ["p", "q", "r"])
    got = sorted(map(tuple, read_versioned_table(spark, path).collect()))
    assert got == sorted(rows), f"partition values corrupted: {got}"
    # the string '01' must come back as the STRING '01', never 1
    assert ("01" in {r[1] for r in got}) and (1 not in {r[1] for r in got})
    # pruning still works through the grouped path
    pruned = read_versioned_table(spark, path, partition_filter={"p": "01"})
    assert sorted(r["id"] for r in pruned.collect()) == [1, 6]
    # '' and the literal null sentinel cannot round-trip hive layout
    # (they conflate with None's sentinel dir): rejected at WRITE —
    # the old reader hit PATH_NOT_FOUND on them instead
    import pytest as _pt

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.versioned import (
        VersionedTableError,
    )

    bad = spark.createDataFrame([(7, "", True, "x")], "id bigint, p string, q boolean, r string")
    with _pt.raises(VersionedTableError, match="null sentinel"):
        create_versioned_table(bad, str(tmp_path / "bad"), ["p", "q", "r"])
    # one commit -> the grouped entries should plan as ONE scan: every
    # input file shares the single commit dir
    commits = {
        f.split("/data/")[1].split("/")[0]
        for f in read_versioned_table(spark, path).inputFiles()
    }
    assert len(commits) == 1
