"""Singer framing roundtrip + JSON-Schema type mapping + end-to-end
ingest from a singer-framed text file (reference: tap stdout → target
stdin pipe, SURVEY §1.1)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, DecimalType, DoubleType, IntegerType, LongType,
    StringType, TimestampType,
)

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.cdc.oracle import fold_events
from pipelinewise_spark.cdc.pipeline import CdcPipeline
from pipelinewise_spark.lake.table import LakeTable
from pipelinewise_spark.singer import protocol, schema as sschema

EVENT_COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
PAYLOAD_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_jsonschema_type_mapping_roundtrip():
    cases = [
        ({"type": ["null", "integer"], "minimum": -(2**31), "maximum": 2**31 - 1}, IntegerType()),
        ({"type": ["null", "integer"]}, LongType()),
        ({"type": ["null", "number"]}, DoubleType()),
        ({"type": ["null", "number"], "multipleOf": 0.01}, DecimalType(38, 2)),
        ({"type": ["null", "boolean"]}, BooleanType()),
        ({"type": ["null", "string"], "format": "date-time"}, TimestampType()),
        ({"type": ["null", "object"]}, StringType()),
        ({"type": ["null", "array"]}, StringType()),
        ({"type": ["null", "string"]}, StringType()),
    ]
    for js, expected in cases:
        assert sschema.jsonschema_to_spark_type(js) == expected, js
    # struct → jsonschema → struct is stable for the transcript payload
    js = sschema.struct_to_jsonschema(TRANSCRIPT_SCHEMA)
    back = sschema.jsonschema_to_struct(js)
    assert [f.name for f in back.fields] == [f.name for f in TRANSCRIPT_SCHEMA.fields]
    assert back["turn_idx"].dataType == IntegerType()
    assert back["ts"].dataType == TimestampType()


@pytest.fixture(scope="module")
def events(spark):
    df = generate_change_events(
        spark, n_convs=15, turns_per_conv=4, n_updates=80, delete_pct=10
    ).persist()
    df.count()
    yield df
    df.unpersist()


def test_singer_file_roundtrip_and_ingest(spark, tmp_path, events):
    path = str(tmp_path / "stream.singer.jsonl")
    js = sschema.struct_to_jsonschema(TRANSCRIPT_SCHEMA)
    protocol.write_singer_file(
        events, PAYLOAD_COLS, "public-transcripts", js, TRANSCRIPT_KEY, path,
        state_every=50,
    )
    with open(path) as fh:
        first = json.loads(fh.readline())
    assert first["type"] == "SCHEMA" and first["key_properties"] == TRANSCRIPT_KEY

    lines = spark.read.text(path)
    ctrl = protocol.collect_control_messages(lines)
    assert len(ctrl["SCHEMA"]) == 1
    assert ctrl["STATE"] == []  # STATE never collected driver-side by default
    hwm = {r["stream"]: r["max_lsn"] for r in protocol.state_high_watermarks(lines).collect()}
    assert hwm["public-transcripts"] == 140

    payload = sschema.jsonschema_to_struct(ctrl["SCHEMA"][0]["schema"])
    decoded = protocol.decode_records(lines, payload, stream="public-transcripts")
    assert decoded.count() == events.count()
    # D ops survive the _sdc_deleted_at encoding
    assert (
        decoded.where(F.col("op") == "D").count()
        == events.where(F.col("op") == "D").count()
    )

    # full ingest: singer file → decode → merge == oracle fold
    table = LakeTable.create(
        spark, str(tmp_path / "t"), payload, TRANSCRIPT_KEY, num_buckets=8
    )
    CdcPipeline(table, stream="public-transcripts").apply_batch(decoded, batch_id=0)
    expected = fold_events(
        [r.asDict() for r in events.select(*EVENT_COLS).collect()], TRANSCRIPT_KEY
    )
    actual = {(d["conv_id"], d["turn_idx"]): d.asDict() for d in table.read().collect()}
    assert set(actual) == set(expected)
    for k, exp in expected.items():
        assert actual[k]["text"] == exp["text"]
        assert actual[k]["ts"] == exp["ts"].replace(tzinfo=None)


def test_write_singer_file_rejects_state_every_zero(spark, tmp_path):
    """state_every=0 used to ZeroDivisionError on the first record,
    killing the export stream mid-batch; it now fails at the call."""
    import pytest

    from pipelinewise_spark.cdc.events import (
        TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA,
    )
    from pipelinewise_spark.cdc.gen import generate_change_events
    from pipelinewise_spark.singer import protocol, schema as sschema

    ev = generate_change_events(spark, n_convs=2, turns_per_conv=2,
                                n_updates=0)
    js = sschema.struct_to_jsonschema(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError, match="state_every"):
        protocol.write_singer_file(
            ev, ["conv_id", "turn_idx", "text"], "s", js,
            TRANSCRIPT_KEY, str(tmp_path / "x.singer"), state_every=0,
        )
