"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.cdc.merge import merge_into
from pipelinewise_spark.cdc.pipeline import CdcPipeline
from pipelinewise_spark.lake.table import LakeTable
from pipelinewise_spark.singer import protocol
from pipelinewise_spark.sources.jdbc import sql_literal


def test_compact_on_keyless_table(spark, tmp_path):
    """bucket_expr on a no-PK table must not call F.hash() with zero args."""
    schema = StructType([StructField("payload", StringType())])
    table = LakeTable.create(spark, str(tmp_path / "t"), schema, [], num_buckets=2)
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "payload string, lsn long"
    ).select("*", F.lit("I").alias("op"))
    merge_into(table, df, batch_id=0)
    merge_into(table, df.withColumn("lsn", F.col("lsn") + 10), batch_id=1)
    assert any(len(fl) > 1 for fl in table.manifest["buckets"].values())
    table.compact(max_files_per_bucket=1)
    assert all(len(fl) <= 1 for fl in table.manifest["buckets"].values())
    assert table.read().count() == 4


def test_delete_with_null_time_extracted_survives_roundtrip(spark, tmp_path):
    """A D event with NULL time_extracted must still decode as a delete."""
    ev = generate_change_events(
        spark, n_convs=4, turns_per_conv=2, n_updates=20, delete_pct=50
    ).withColumn("time_extracted", F.lit(None).cast("timestamp"))
    n_deletes = ev.where(F.col("op") == "D").count()
    assert n_deletes > 0
    path = str(tmp_path / "s.jsonl")
    protocol.write_singer_file(
        ev, ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        "s", {"type": "object", "properties": {}}, TRANSCRIPT_KEY, path,
    )
    decoded = protocol.decode_records(spark.read.text(path), TRANSCRIPT_SCHEMA, stream="s")
    assert decoded.where(F.col("op") == "D").count() == n_deletes


def test_sql_literal_rendering():
    assert sql_literal(5) == "5"
    assert sql_literal(5.5) == "5.5"
    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "TRUE"
    assert sql_literal("o'brien") == "'o''brien'"
    assert (
        sql_literal(datetime.datetime(2024, 1, 2, 3, 4, 5))
        == "TIMESTAMP '2024-01-02 03:04:05.000000'"
    )
    assert sql_literal(datetime.date(2024, 1, 2)) == "DATE '2024-01-02'"


def test_versioned_name_collision_disambiguated(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=2
    )
    table.evolve([
        {"action": "version_column", "name": "tool", "type": "long",
         "versioned_name": "tool_20260101_0000"},
    ])
    table.evolve([
        {"action": "version_column", "name": "tool", "type": "double",
         "versioned_name": "tool_20260101_0000"},  # same minute suffix
    ])
    logicals = [f["logical"] for f in table.manifest["fields"]]
    assert len(logicals) == len(set(logicals))
    assert "tool_20260101_0000" in logicals and "tool_20260101_0000_2" in logicals
    table.read().collect()  # no AMBIGUOUS_REFERENCE


def test_replay_bounds_with_large_lsn_base(spark, tmp_path):
    """LSN bases far from 0 must still split into real batches and the
    minimum-LSN event must not be dropped."""
    base = 10**12
    ev = generate_change_events(
        spark, n_convs=6, turns_per_conv=2, n_updates=20, delete_pct=0
    ).withColumn("lsn", F.col("lsn") + base)
    table = LakeTable.create(
        spark, str(tmp_path / "t3"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=2
    )
    pipe = CdcPipeline(table, stream="s")
    out = pipe.replay(ev, n_batches=4)
    applied = [m for m in out if m.get("inserted") or m.get("updated")]
    assert len(applied) >= 3  # real spread, not one giant final batch
    assert table.read().count() == 12
    assert table.bookmarks["s"]["lsn"] == base + 32
