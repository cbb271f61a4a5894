"""Merge-on-read mode: O(batch) delta commits, read-time resolution,
compaction folding, CoW/MoR interop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.cdc.merge import merge_into
from pipelinewise_spark.cdc.oracle import fold_events
from pipelinewise_spark.cdc.pipeline import CdcPipeline
from pipelinewise_spark.lake.table import LakeTable

EVENT_COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


@pytest.fixture(scope="module")
def events(spark):
    df = generate_change_events(
        spark, n_convs=20, turns_per_conv=4, n_updates=120, delete_pct=12, dup_every=9
    ).persist()
    df.count()
    yield df
    df.unpersist()


def _expected(events, **kw):
    rows = [r.asDict() for r in events.select(*EVENT_COLS).collect()]
    return fold_events(rows, TRANSCRIPT_KEY, **kw)


def _assert_equal(table, expected):
    actual = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert set(actual) == set(expected)
    for k, exp in expected.items():
        assert actual[k]["text"] == exp["text"], k


def test_mor_replay_matches_oracle_hard_delete(spark, tmp_path, events):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    pipe = CdcPipeline(table, stream="s", mode="mor")
    pipe.replay(events, n_batches=3)
    # deltas only — base never written
    assert not any(table.manifest["buckets"].values())
    assert any(table.manifest.get("deltas", {}).values())
    _assert_equal(table, _expected(events))
    assert table.bookmarks["s"]["lsn"] == 200


def test_mor_compaction_folds_and_drops_tombstones(spark, tmp_path, events):
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    CdcPipeline(table, stream="s", mode="mor").replay(events, n_batches=3)
    expected = _expected(events)
    table.compact()
    assert not any(table.manifest.get("deltas", {}).values())
    _assert_equal(table, expected)
    # tombstones physically gone: raw base read equals resolved read
    base_rows = table.read(resolve_deltas=False).count()
    assert base_rows == len(expected)


def test_mor_soft_delete_property(spark, tmp_path, events):
    table = LakeTable.create(
        spark, str(tmp_path / "t3"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY,
        num_buckets=4, properties={"soft_delete": True},
    )
    CdcPipeline(table, stream="s", mode="mor").replay(events, n_batches=2)
    exp = _expected(events, soft_delete=True)
    actual = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert set(actual) == set(exp)
    for k, e in exp.items():
        if e["_deleted"]:
            assert actual[k]["_sdc_deleted_at"] is not None, k


def test_mor_then_cow_interop(spark, tmp_path, events):
    """MoR deltas then a CoW merge: the CoW read resolves outstanding
    deltas and the rewrite clears them — one consistent result."""
    table = LakeTable.create(
        spark, str(tmp_path / "t4"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    merge_into(table, events.where(F.col("lsn") <= 120), batch_id=0,
               stream="s", mode="mor")
    assert any(table.manifest["deltas"].values())
    merge_into(table, events.where(F.col("lsn") > 120), batch_id=1, stream="s")
    assert not any(table.manifest.get("deltas", {}).values())
    _assert_equal(table, _expected(events))


def test_mor_batch_id_idempotence(spark, tmp_path, events):
    table = LakeTable.create(
        spark, str(tmp_path / "t5"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    merge_into(table, events, batch_id=0, stream="s", mode="mor")
    v = table.version
    m = merge_into(table, events, batch_id=0, stream="s", mode="mor")
    assert m["skipped"] and table.version == v
    _assert_equal(table, _expected(events))
