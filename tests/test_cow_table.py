"""Copy-on-write parquet table: MERGE roundtrips, partition-scoped
rewrites, cross-partition key moves, emptied partitions, idempotent
re-application (the crash-recovery contract)."""

from __future__ import annotations

import os

import pytest

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.cowtable import (
    create_cow_table,
    merge_cow_table,
    read_cow_table,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "cow")
    snap = spark.createDataFrame(
        [
            (1, "DE", 10.0),
            (2, "DE", 20.0),
            (3, "AT", 30.0),
            (4, "CH", 40.0),
        ],
        "id long, country string, amount double",
    )
    create_cow_table(snap, path, ["country"])
    return path


def _rows(spark, path):
    return {
        (r.id, r.country, r.amount)
        for r in read_cow_table(spark, path).collect()
    }


def test_upsert_insert_and_delete_roundtrip(spark, table):
    changes = spark.createDataFrame(
        [
            (2, "DE", 25.0, False),  # update in place
            (5, "AT", 55.0, False),  # brand-new key
            (3, "AT", 0.0, True),    # delete
        ],
        "id long, country string, amount double, is_deleted boolean",
    )
    touched = merge_cow_table(
        spark, table, changes, ["id"], ["country"], delete_col="is_deleted"
    )
    assert {p["country"] for p in touched} == {"DE", "AT"}
    assert _rows(spark, table) == {
        (1, "DE", 10.0),
        (2, "DE", 25.0),  # updated
        (5, "AT", 55.0),  # inserted; id=3 deleted
        (4, "CH", 40.0),  # untouched partition
    }


def test_untouched_partitions_keep_their_files(spark, table):
    # the 100-TB property: a merge into DE must not rewrite CH's files
    ch_dir = os.path.join(table, "country=CH")
    before = {f: os.path.getmtime(os.path.join(ch_dir, f)) for f in os.listdir(ch_dir)}
    changes = spark.createDataFrame([(1, "DE", 11.0)], "id long, country string, amount double")
    touched = merge_cow_table(spark, table, changes, ["id"], ["country"])
    assert touched == [{"country": "DE"}]
    after = {f: os.path.getmtime(os.path.join(ch_dir, f)) for f in os.listdir(ch_dir)}
    assert before == after  # same files, same mtimes — never rewritten


def test_cross_partition_key_move_drops_old_row(spark, table):
    # id=4 moves CH -> DE: the batch has no CH row, but CH must still
    # rewrite (here: empty out) or the table would hold the key twice
    changes = spark.createDataFrame([(4, "DE", 44.0)], "id long, country string, amount double")
    merge_cow_table(spark, table, changes, ["id"], ["country"])
    rows = _rows(spark, table)
    assert (4, "DE", 44.0) in rows
    assert not any(c == "CH" for _, c, _ in rows)  # CH emptied, stale dir gone
    assert not os.path.isdir(os.path.join(table, "country=CH"))


def test_emptied_partition_by_delete_marker(spark, table):
    changes = spark.createDataFrame(
        [(4, "CH", 0.0, True)], "id long, country string, amount double, is_deleted boolean"
    )
    merge_cow_table(spark, table, changes, ["id"], ["country"], delete_col="is_deleted")
    assert _rows(spark, table) == {(1, "DE", 10.0), (2, "DE", 20.0), (3, "AT", 30.0)}
    assert not os.path.isdir(os.path.join(table, "country=CH"))


def test_reapplying_same_batch_is_idempotent(spark, table):
    # the crash-recovery contract: partial failure -> rerun the batch,
    # state converges (same rows, second touched set identical)
    changes = spark.createDataFrame(
        [
            (2, "DE", 25.0, False),
            (4, "DE", 44.0, False),  # CH -> DE move
            (3, "AT", 0.0, True),    # delete
        ],
        "id long, country string, amount double, is_deleted boolean",
    )
    merge_cow_table(spark, table, changes, ["id"], ["country"], delete_col="is_deleted")
    state1 = _rows(spark, table)
    merge_cow_table(spark, table, changes, ["id"], ["country"], delete_col="is_deleted")
    assert _rows(spark, table) == state1 == {
        (1, "DE", 10.0),
        (2, "DE", 25.0),
        (4, "DE", 44.0),
    }


def test_partial_crash_state_converges_on_retry(spark, table, tmp_path):
    # A multi-partition merge is not a transaction: simulate a crash
    # that committed DE's rewrite but left AT untouched, by restoring
    # AT's pre-merge files after a full merge. Re-applying the SAME
    # batch from that mixed state must converge to the fully-merged
    # table — the documented recovery contract.
    import shutil

    changes = spark.createDataFrame(
        [(2, "DE", 25.0, False), (3, "AT", 0.0, True)],
        "id long, country string, amount double, is_deleted boolean",
    )
    backup = str(tmp_path / "at_backup")
    shutil.copytree(os.path.join(table, "country=AT"), backup)
    merge_cow_table(spark, table, changes, ["id"], ["country"], delete_col="is_deleted")
    done = _rows(spark, table)

    # crash simulation: AT never committed
    shutil.rmtree(os.path.join(table, "country=AT"), ignore_errors=True)
    shutil.copytree(backup, os.path.join(table, "country=AT"))
    assert _rows(spark, table) != done  # genuinely partial now

    merge_cow_table(spark, table, changes, ["id"], ["country"], delete_col="is_deleted")
    assert _rows(spark, table) == done


def test_empty_batch_is_a_no_op(spark, table):
    before = _rows(spark, table)
    changes = spark.createDataFrame([], "id long, country string, amount double")
    assert merge_cow_table(spark, table, changes, ["id"], ["country"]) == []
    assert _rows(spark, table) == before


def test_partitionless_table_is_rejected(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="partition_by"):
        create_cow_table(df, str(tmp_path / "x"), [])


def test_change_feed_recovered_via_snapshot_diff(spark, table, tmp_path):
    # the lakehouse table_changes(v1, v2) pattern on plain parquet:
    # snapshot the table before a merge, diff snapshots afterwards —
    # the recovered feed classifies exactly the rows the batch touched
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.merge import snapshot_diff

    v1_path = str(tmp_path / "v1")
    read_cow_table(spark, table).write.parquet(v1_path)

    changes = spark.createDataFrame(
        [
            (2, "DE", 99.0, False),  # update
            (3, "AT", 0.0, True),    # delete
            (9, "CH", 90.0, False),  # insert
        ],
        "id long, country string, amount double, is_deleted boolean",
    )
    merge_cow_table(spark, table, changes, ["id"], ["country"], delete_col="is_deleted")

    feed = snapshot_diff(
        spark.read.parquet(v1_path), read_cow_table(spark, table), ["id"]
    )
    got = {r.id: r.change_type for r in feed.collect()}
    assert got == {2: "update", 3: "delete", 9: "insert"}


def test_vacuum_removes_orphan_attempt_artifacts(spark, table):
    import os

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.cowtable import (
        vacuum_cow_table,
    )

    # simulate a crashed merge: a _temporary attempt dir + a stray
    # hidden file inside a partition directory
    os.makedirs(os.path.join(table, "country=DE", "_temporary", "0"), exist_ok=True)
    # (not a .crc name: Hadoop local FS hides checksum shadows from listing)
    stray = os.path.join(table, "country=AT", "_orphan_attempt_marker")
    open(stray, "w").write("x")
    before = _rows(spark, table)
    # default min-age spares FRESH artifacts (they may belong to a live
    # concurrent writer); explicit 0 reclaims them
    assert vacuum_cow_table(spark, table) == []
    deleted = vacuum_cow_table(spark, table, min_age_seconds=0)
    assert any("_temporary" in d for d in deleted)
    assert any("_orphan_attempt_marker" in d for d in deleted)
    assert not os.path.isdir(os.path.join(table, "country=DE", "_temporary"))
    assert not os.path.exists(stray)
    # data untouched
    assert _rows(spark, table) == before


def test_streaming_cdc_apply_maintains_cow_table(spark, tmp_path):
    # the capstone integration: a change stream MERGEs into the CoW
    # table per micro-batch (foreachBatch); the continuously-maintained
    # table must equal the batch-computed latest-per-key state
    from pyspark.sql import functions as F

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.operators.dedup import top_n_per_group
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.sinks.cowtable import (
        create_cow_table,
        read_cow_table,
    )
    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.streaming.sinks import (
        cow_merge_batch_writer,
    )

    table = str(tmp_path / "cow_stream")
    src_dir = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")

    # initial snapshot: ids 0..4 in two countries
    snap = spark.createDataFrame(
        [(i, "DE" if i % 2 == 0 else "AT", float(i)) for i in range(5)],
        "id long, country string, amount double",
    )
    create_cow_table(snap, table, ["country"])

    # a change log with multiple versions per key across two files
    # (files arrive as separate micro-batches under maxFilesPerTrigger)
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
    writer = cow_merge_batch_writer(
        table,
        ["id"],
        ["country"],
        compact=lambda b: top_n_per_group(
            b, ["id"], [F.col("seq").desc()]
        ).drop("seq"),
    )
    (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    got = {(r.id, r.country, r.amount) for r in read_cow_table(spark, table).collect()}
    # latest state: 0,3,4 untouched; 1 -> DE/111 (second version wins);
    # 2 -> DE/200; 7 inserted with its latest version
    assert got == {
        (0, "DE", 0.0),
        (3, "AT", 3.0),
        (4, "DE", 4.0),
        (1, "DE", 111.0),
        (2, "DE", 200.0),
        (7, "CH", 777.0),
    }


def test_emptied_partition_with_escaped_value_is_deleted(spark, tmp_path):
    # partition values Spark percent-encodes on write (spaces, ':') must
    # be deleted via the SAME escaping — a raw f"{col}={value}" path
    # silently misses the dir and deleted rows resurface
    import os

    path = str(tmp_path / "cow_esc")
    snap = spark.createDataFrame(
        [(1, "North America", 1.0), (2, "EU", 2.0)],
        "id long, region string, amount double",
    )
    create_cow_table(snap, path, ["region"])
    assert os.path.isdir(os.path.join(path, "region=North America"))
    changes = spark.createDataFrame(
        [(1, "North America", 0.0, True)],
        "id long, region string, amount double, is_deleted boolean",
    )
    merge_cow_table(spark, path, changes, ["id"], ["region"], delete_col="is_deleted")
    assert not os.path.isdir(os.path.join(path, "region=North America"))
    assert _idless_rows(spark, path) == {(2, "EU", 2.0)}


def _idless_rows(spark, path):
    return {tuple(r) for r in read_cow_table(spark, path).select("id", "region", "amount").collect()}
