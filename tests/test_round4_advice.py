"""Round-4 advice fixes: (1) NULL-PK rejection on the snapshot/overwrite
path (same observe-counted pre-commit gate as the merge paths), (2) the
change-feed source never moves its end offset backward past a manifest
rollback, (3) build_project validates YAML key_properties against an
existing table's on-disk key_cols at wiring time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.cdc.merge import merge_into
from pipelinewise_spark.cdc.snapshot import initial_load
from pipelinewise_spark.lake.stream_source import _LakeTableStreamReader
from pipelinewise_spark.lake.table import LakeTable, NullKeyError


def _snapshot(spark, n=20, null_key_rows=0):
    ev = generate_change_events(
        spark, n_convs=max(4, n // 4), turns_per_conv=4, n_updates=0
    )
    snap = ev.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).limit(n)
    if null_key_rows:
        nulled = snap.limit(null_key_rows).withColumn(
            "conv_id", F.lit(None).cast("string")
        )
        snap = snap.union(nulled)
    return snap


def test_overwrite_rejects_null_primary_key(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY,
        num_buckets=2,
    )
    with pytest.raises(NullKeyError, match="NULL"):
        initial_load(t, _snapshot(spark, null_key_rows=3), lsn0=100)
    # the failed load published NO state: table is still empty at v0
    assert t.refresh().version == 0
    assert t.read().count() == 0
    # and the clean snapshot then loads fine + the tail merges against it
    initial_load(t, _snapshot(spark), lsn0=100)
    assert t.refresh().read().count() == 20
    assert t.bookmarks["default"]["lsn"] == 100


def test_overwrite_without_keys_skips_null_gate(spark, tmp_path):
    # append-only/keyless tables legitimately hold NULLs anywhere
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, key_cols=[],
        num_buckets=2, bucket_cols=["role"],
    )
    t.overwrite(_snapshot(spark, null_key_rows=2))
    assert t.refresh().read().count() == 22


def test_stream_reader_end_offset_never_regresses(spark, tmp_path):
    ev = generate_change_events(spark, n_convs=6, turns_per_conv=2, n_updates=5)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY,
        num_buckets=2,
    )
    merge_into(t, ev, batch_id=0)
    reader = _LakeTableStreamReader(None, {"path": t.path})
    latest = t.refresh().version
    # caught up: latestOffset == checkpoint, empty partition plan
    assert reader.latestOffset() == {"version": latest}
    assert reader.partitions({"version": latest}, {"version": latest}) == []
    # checkpoint ahead of the table (rollback / re-create) → loud error,
    # never a backward-moving offset that re-emits delivered ranges
    with pytest.raises(RuntimeError, match="rolled back"):
        reader.partitions({"version": latest + 5}, {"version": latest})
    # mid-run rollback tripwire: once v_latest was observed, a smaller
    # latest manifest set is a corrupted feed, not an empty batch
    reader._max_seen = latest + 5
    with pytest.raises(RuntimeError, match="moved backward"):
        reader.latestOffset()


def test_build_project_rejects_key_drift_against_existing_table(
    spark, tmp_path
):
    from pipelinewise_spark.config import build_project

    yaml_fmt = """
id: "x"
type: "tap-mysql"
db_conn: {{host: h, port: 3306, user: u, password: p, dbname: d}}
target: "lake"
schemas:
  - source_schema: "s"
    tables:
      - table_name: "conversations"
        replication_method: "LOG_BASED"
        key_properties: {keys}
"""

    def provider(stream):
        return TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY

    root = str(tmp_path / "lake")
    build_project(
        spark, yaml_fmt.format(keys='["conv_id", "turn_idx"]'),
        lake_root=root, schema_provider=provider, num_buckets=2,
    )
    # same YAML re-wires fine; drifted key_properties fail at wiring time
    build_project(
        spark, yaml_fmt.format(keys='["conv_id", "turn_idx"]'),
        lake_root=root, schema_provider=provider, num_buckets=2,
    )
    with pytest.raises(ValueError, match="key_properties"):
        build_project(
            spark, yaml_fmt.format(keys='["conv_id"]'),
            lake_root=root, schema_provider=provider, num_buckets=2,
        )
