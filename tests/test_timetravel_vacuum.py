"""Snapshot time travel and vacuum garbage collection."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.cdc.merge import merge_into
from pipelinewise_spark.lake.table import DATA_DIR, LakeTable


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    events = generate_change_events(
        spark, n_convs=10, turns_per_conv=3, n_updates=50, delete_pct=10
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    merge_into(table, events.where(F.col("lsn") <= 30), batch_id=0, stream="s")
    v1 = table.version
    v1_state = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()
    }
    merge_into(table, events.where(F.col("lsn") > 30), batch_id=1, stream="s")
    assert table.version > v1

    old = table.read(version=v1)
    old_state = {(r["conv_id"], r["turn_idx"]): r["text"] for r in old.collect()}
    assert old_state == v1_state
    assert table.read().count() != len(v1_state) or old_state != {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()
    }
    # historical bookmarks visible too
    assert table.load_manifest(v1)["bookmarks"]["s"]["lsn"] == 30


def test_vacuum_reclaims_unreferenced(spark, tmp_path):
    events = generate_change_events(
        spark, n_convs=10, turns_per_conv=3, n_updates=50, delete_pct=0
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    merge_into(table, events.where(F.col("lsn") <= 30), batch_id=0, stream="s")
    merge_into(table, events.where(F.col("lsn") > 30), batch_id=1, stream="s")
    before = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()
    }
    data_dir = os.path.join(table.path, DATA_DIR)
    n_files_before = len(os.listdir(data_dir))
    # orphan tmp dir from a "crashed" writer
    os.makedirs(os.path.join(table.path, "_tmp-write-deadbeef"), exist_ok=True)

    stats = table.vacuum(keep_versions=1, min_age_sec=0)
    assert stats["removed_files"] > 0
    assert stats["removed_manifests"] >= 2  # v0 create + v1 superseded
    assert len(os.listdir(data_dir)) < n_files_before
    assert not os.path.isdir(os.path.join(table.path, "_tmp-write-deadbeef"))

    # current snapshot intact after vacuum (cold reopen)
    t2 = LakeTable(spark, str(tmp_path / "t2"))
    after = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t2.read().collect()}
    assert after == before
    assert t2.bookmarks["s"]["lsn"] == 80
