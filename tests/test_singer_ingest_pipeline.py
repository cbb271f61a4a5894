"""Top-level singer ingest: SCHEMA-driven evolution + ACTIVATE_VERSION
handling + auto-compaction, through CdcPipeline.ingest_singer_lines."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.cdc.pipeline import CdcPipeline
from pipelinewise_spark.lake.table import LakeTable
from pipelinewise_spark.singer import protocol, schema as sschema

PAYLOAD_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_singer_ingest_with_mid_stream_schema_change(spark, tmp_path):
    events = generate_change_events(
        spark, n_convs=10, turns_per_conv=3, n_updates=40, delete_pct=10
    )
    js = sschema.struct_to_jsonschema(TRANSCRIPT_SCHEMA)
    f1 = str(tmp_path / "part1.jsonl")
    protocol.write_singer_file(
        events.where(F.col("lsn") <= 40), PAYLOAD_COLS, "s", js,
        TRANSCRIPT_KEY, f1,
    )

    # part 2 carries an evolved schema (new nullable lang column, F3)
    evolved = StructType(
        list(TRANSCRIPT_SCHEMA.fields) + [StructField("lang", StringType())]
    )
    js2 = sschema.struct_to_jsonschema(evolved)
    f2 = str(tmp_path / "part2.jsonl")
    protocol.write_singer_file(
        events.where(F.col("lsn") > 40).withColumn("lang", F.lit("en")),
        PAYLOAD_COLS + ["lang"], "s", js2, TRANSCRIPT_KEY, f2,
    )
    # append an ACTIVATE_VERSION control line (targets: no-op/log)
    with open(f2, "a") as fh:
        fh.write(json.dumps({"type": "ACTIVATE_VERSION", "stream": "s", "version": 7}) + "\n")

    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    pipe = CdcPipeline(table, stream="s")
    m1 = pipe.ingest_singer_lines(spark.read.text(f1), batch_id=0)
    assert m1["inserted"] > 0
    assert "lang" not in table.data_cols

    m2 = pipe.ingest_singer_lines(spark.read.text(f2), batch_id=1)
    assert "lang" in table.data_cols  # SCHEMA message drove evolution
    df = table.read()
    assert df.where(F.col("lang") == "en").count() > 0
    assert df.where(F.col("lang").isNull()).count() > 0
    assert any(h.get("control") == "activate_version" for h in pipe.history)


def test_auto_compaction_after_batches(spark, tmp_path):
    """CoW merges replace bucket files (chains stay short); append-only
    loads GROW chains — auto-compaction folds them back."""
    events = generate_change_events(
        spark, n_convs=8, turns_per_conv=3, n_updates=60, delete_pct=0
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA, [],  # no PK → append
        num_buckets=2, bucket_col="conv_id",
    )
    pipe = CdcPipeline(table, stream="s", compact_every=4, max_files_per_bucket=1,
                       primary_key_required=False)
    pipe.replay(events, n_batches=4)
    assert all(len(fl) <= 1 for fl in table.manifest["buckets"].values())
    assert table.manifest["summary"]["operation"] == "compact"
    # content survives compaction (append-only: every event is a row)
    assert table.read().count() == events.count()


def test_quarantine_mode_diverts_malformed_records(spark, tmp_path):
    """validate='quarantine' (dead-letter queue): malformed RECORD
    payloads and wholly-unparseable lines land in a sibling quarantine
    LakeTable with the raw line + reason; clean rows still merge; a
    replay of the same batch duplicates neither side. Permissive mode
    would have nulled the mismatched field and merged the husk;
    strict mode would have killed the whole pipeline."""
    events = generate_change_events(
        spark, n_convs=6, turns_per_conv=2, n_updates=8, delete_pct=0
    )
    js = sschema.struct_to_jsonschema(TRANSCRIPT_SCHEMA)
    f = str(tmp_path / "frames.jsonl")
    protocol.write_singer_file(
        events, PAYLOAD_COLS, "s", js, TRANSCRIPT_KEY, f
    )
    n_clean = sum(
        1 for ln in open(f) if json.loads(ln)["type"] == "RECORD"
    )
    with open(f, "a") as fh:
        # type mismatch: turn_idx is a string — permissive would null it
        fh.write(json.dumps({
            "type": "RECORD", "stream": "s",
            "record": {"conv_id": "cX", "turn_idx": "NOT-A-NUMBER",
                       "text": "t", "_sdc_lsn": 999},
        }) + "\n")
        # framing garbage: not even JSON
        fh.write('{"type":"RECORD" this is not json\n')
        # another stream's malformed record: NOT this pipeline's problem
        fh.write(json.dumps({
            "type": "RECORD", "stream": "other",
            "record": {"conv_id": 7, "turn_idx": "x", "_sdc_lsn": 1},
        }).replace('"conv_id": 7', '"turn_idx": []') + "\n")

    table = LakeTable.create(
        spark, str(tmp_path / "tq"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY,
        num_buckets=4,
    )
    pipe = CdcPipeline(table, stream="s", validate="quarantine")
    m = pipe.ingest_singer_lines(spark.read.text(f), batch_id=0)
    assert m["quarantined"] == 2  # bad record + garbage line, not 'other'
    assert m["inserted"] > 0
    # the husk did NOT merge
    assert table.read().where(F.col("conv_id") == "cX").count() == 0
    qt = LakeTable(spark, pipe.quarantine_path)
    q = {r["reason"]: r["value"] for r in qt.read().collect()}
    assert set(q) == {"malformed_record", "unparseable_line"}
    assert "NOT-A-NUMBER" in q["malformed_record"]
    # DLQ rows carry a synthetic monotonic lsn (= the numeric batch id):
    # without one, 1024 quarantining batches evict the replay window and
    # the ExactlyOnceWindowError guard bricks the pipeline forever
    assert {r["_lsn"] for r in qt.read().select("_lsn").collect()} == {0}
    # replay same batch: neither side duplicates
    m2 = pipe.ingest_singer_lines(spark.read.text(f), batch_id=0)
    assert m2.get("skipped") or m2.get("inserted", 0) == 0
    assert qt.refresh().read().count() == 2
    # clean rows all merged exactly once
    assert table.read().count() == table.read().select(
        "conv_id", "turn_idx").distinct().count()
    assert n_clean > 0
