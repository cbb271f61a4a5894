"""Streaming + exactly-once: availableNow micro-batch runs over a file
source, checkpointed resume, and crash-replay convergence (reference
analog: resumable state-file tests + bounded binlog runs, SURVEY §1.4)."""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.cdc.oracle import fold_events
from pipelinewise_spark.cdc.pipeline import CdcPipeline
from pipelinewise_spark.lake.table import LakeTable

EVENT_COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


@pytest.fixture(scope="module")
def events(spark):
    df = generate_change_events(
        spark, n_convs=25, turns_per_conv=4, n_updates=150, delete_pct=10, dup_every=9
    ).persist()
    df.count()
    yield df
    df.unpersist()


def _write_chunks(events, base, bounds):
    """One parquet file per LSN chunk, mtimes increasing so the file
    source enumerates them oldest-first (the log-order contract)."""
    os.makedirs(base, exist_ok=True)
    for i, (lo, hi) in enumerate(bounds):
        d = os.path.join(base, f"chunk-{i}")
        (
            events.where((F.col("lsn") > lo) & (F.col("lsn") <= hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(d)
        )
        now = time.time() + i  # strictly increasing mtimes across chunks
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                os.utime(os.path.join(d, fn), (now, now))


def _expected(events, **kw):
    rows = [r.asDict() for r in events.select(*EVENT_COLS).collect()]
    return fold_events(rows, TRANSCRIPT_KEY, **kw)


def _assert_final(table, expected):
    actual = {(d["conv_id"], d["turn_idx"]): d.asDict() for d in table.read().collect()}
    assert set(actual) == set(expected)
    for k, exp in expected.items():
        assert actual[k]["text"] == exp["text"], k


def test_available_now_end_to_end(spark, tmp_path, events):
    base = str(tmp_path / "ev")
    _write_chunks(events, base, [(0, 100), (100, 180), (180, 250)])
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=8
    )
    pipe = CdcPipeline(table, stream="public-transcripts")
    pipe.run_file_stream(
        base + "/chunk-*", str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    assert len(pipe.history) >= 3
    _assert_final(table, _expected(events))
    assert table.bookmarks["public-transcripts"]["lsn"] == 250


def test_kill_and_resume_from_checkpoint(spark, tmp_path, events):
    """Run 1 sees only the first chunks; 'crash'; more data lands; run 2
    with the same checkpoint picks up where run 1 stopped and converges."""
    base = str(tmp_path / "ev2")
    ckpt = str(tmp_path / "ckpt2")
    _write_chunks(events, base, [(0, 100), (100, 180)])
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=8
    )
    pipe = CdcPipeline(table, stream="s")
    pipe.run_file_stream(base + "/chunk-*", ckpt, max_files_per_trigger=1)
    assert table.bookmarks["s"]["lsn"] == 180
    v_mid = table.version

    # late chunk arrives; fresh pipeline object = process restart
    _write_chunks(events, base, [(0, 100), (100, 180), (180, 250)])
    pipe2 = CdcPipeline(LakeTable(spark, str(tmp_path / "t2")), stream="s")
    pipe2.run_file_stream(base + "/chunk-*", ckpt, max_files_per_trigger=1)
    table.refresh()
    assert table.version > v_mid
    _assert_final(table, _expected(events))
    assert table.bookmarks["s"]["lsn"] == 250


def test_spark_batch_replay_is_idempotent(spark, tmp_path, events):
    """Simulate Spark re-running a foreachBatch after a commit-but-crash:
    same batch_id → applied-batch-id guard no-ops, state unchanged."""
    table = LakeTable.create(
        spark, str(tmp_path / "t3"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=8
    )
    pipe = CdcPipeline(table, stream="s")
    pipe.apply_batch(events.where(F.col("lsn") <= 150), batch_id=0)
    pipe.apply_batch(events.where(F.col("lsn") > 150), batch_id=1)
    v = table.version
    m = pipe.apply_batch(events.where(F.col("lsn") > 150), batch_id=1)
    assert m["skipped"] is True and table.version == v
    _assert_final(table, _expected(events))


def test_replay_helper_matches_oracle(spark, tmp_path, events):
    table = LakeTable.create(
        spark, str(tmp_path / "t4"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=8
    )
    CdcPipeline(table, stream="s").replay(events, n_batches=4)
    _assert_final(table, _expected(events))
