"""S12 executed end-to-end: ``kafka_stream_reader(...).load()`` →
``decode_records`` → merge, through the in-process broker stub
(:mod:`pipelinewise_spark.sources.kafka_stub`). The adapter wiring —
option names, startingOffsets JSON, bookmark-convention conversion,
maxOffsetsPerTrigger pacing, checkpointed resume — runs for real; only
the broker is a local JSONL log (the jar-gated JVM source is
byte-identical from ``.load()`` onward)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.pipeline import CdcPipeline
from pipelinewise_spark.lake.table import LakeTable
from pipelinewise_spark.sources.kafka import kafka_stream_reader
from pipelinewise_spark.sources.kafka_stub import (
    InProcessKafkaSource,
    append_messages,
)

STREAM = "my_db-conversations"


def _frame(conv, turn, lsn, text, deleted=None):
    rec = {
        "conv_id": conv,
        "turn_idx": turn,
        "role": "user",
        "text": text,
        "tool": None,
        "ts": "2024-01-01T00:00:00+00:00",
        "_sdc_lsn": lsn,
    }
    if deleted:
        rec["_sdc_deleted_at"] = deleted
    return json.dumps(
        {
            "type": "RECORD",
            "stream": STREAM,
            "record": rec,
            "time_extracted": "2024-01-01T00:00:01+00:00",
        }
    )


@pytest.fixture()
def stub(spark):
    spark.dataSource.register(InProcessKafkaSource)
    yield


def _reader(spark, log_dir, **kw):
    return kafka_stream_reader(
        spark,
        "stub-broker:9092",
        "transcripts",
        options={"log.dir": log_dir},
        format="kafka_stub",
        **kw,
    )


def _collect_values(spark, reader, ckpt, runs=1):
    """Drive bounded availableNow run(s) against a shared checkpoint and
    return every singer frame the sink saw (foreachBatch runs on the
    driver in local mode, so a closure list works)."""
    seen: list[str] = []
    for _ in range(runs):
        q = (
            reader.load()
            .selectExpr("CAST(value AS STRING) AS value")
            .writeStream.foreachBatch(
                lambda df, bid: seen.extend(r.value for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    return seen


def test_kafka_to_merge_end_to_end(spark, stub, tmp_path):
    """Full chain: 2-partition topic of singer frames (updates + a
    delete) → capped micro-batches → CdcPipeline.ingest_singer_lines →
    final table state equals the LSN fold."""
    log = str(tmp_path / "log")
    append_messages(
        log, "transcripts", 0,
        [
            _frame("A", 0, 1, "a0-v1"),
            _frame("A", 1, 2, "a1-v1"),
            _frame("A", 0, 5, "a0-v2"),  # later update wins
            _frame("A", 2, 6, "a2-v1"),
        ],
    )
    append_messages(
        log, "transcripts", 1,
        [
            _frame("B", 0, 3, "b0-v1"),
            _frame("B", 1, 4, "b1-v1"),
            _frame("B", 1, 7, None, deleted="2024-01-02T00:00:00+00:00"),
        ],
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY,
        num_buckets=2,
    )
    # multi-partition topics: batch boundaries follow per-partition
    # offsets, not global LSN order — the LSN prefix filter must be off
    # (exactly-once = checkpoint + batch-id guard, the tap_kafka model)
    pipe = CdcPipeline(t, stream=STREAM, filter_applied_lsn=False)
    reader = _reader(
        spark, log, starting_offsets="earliest", max_offsets_per_trigger=3
    )
    ckpt = str(tmp_path / "ckpt")
    runs = 0
    while (
        t.refresh().bookmarks.get(STREAM, {}).get("lsn") != 7 and runs < 10
    ):
        q = (
            reader.load()
            .selectExpr("CAST(value AS STRING) AS value")
            .writeStream.foreachBatch(
                lambda df, bid: pipe.ingest_singer_lines(df, batch_id=bid)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        runs += 1
    # pacing: 7 messages at cap 3 → ≥3 bounded runs, like the
    # reference's bounded consumer loops (tap_kafka/sync.py:117-468)
    assert runs >= 3
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in t.refresh().read().collect()
    }
    assert got == {
        ("A", 0): "a0-v2",
        ("A", 1): "a1-v1",
        ("A", 2): "a2-v1",
        ("B", 0): "b0-v1",
        # (B,1) hard-deleted by lsn 7
    }
    # live append after drain: the SAME checkpoint picks up only the tail
    append_messages(log, "transcripts", 0, [_frame("C", 0, 8, "c0-v1")])
    q = (
        reader.load()
        .selectExpr("CAST(value AS STRING) AS value")
        .writeStream.foreachBatch(
            lambda df, bid: pipe.ingest_singer_lines(df, batch_id=bid)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert t.refresh().bookmarks[STREAM]["lsn"] == 8
    assert t.read().where(F.col("conv_id") == "C").count() == 1


def test_kafka_bookmark_convention_matrix(spark, stub, tmp_path):
    """The last-consumed vs next-offset off-by-one, executed through the
    real reader: a reference bookmark {p0: 2} must resume AT offset 3
    (re-reads nothing, loses nothing); a Spark-convention bookmark must
    render verbatim (resume AT 2) — each verified by the frames the
    stream actually delivers."""
    log = str(tmp_path / "log")
    append_messages(
        log, "transcripts", 0,
        [_frame("A", i, i + 1, f"t{i}") for i in range(5)],
    )
    # reference convention (default): offset 2 was CONSUMED → next is 3
    ref = _collect_values(
        spark,
        _reader(spark, log, starting_offsets={"0": 2}),
        str(tmp_path / "c1"),
    )
    assert [json.loads(v)["record"]["turn_idx"] for v in ref] == [3, 4]
    # Spark convention: 2 IS the next offset → starts at 2
    nxt = _collect_values(
        spark,
        _reader(
            spark, log,
            starting_offsets={"0": 2},
            bookmark_is_last_consumed=False,
        ),
        str(tmp_path / "c2"),
    )
    assert [json.loads(v)["record"]["turn_idx"] for v in nxt] == [2, 3, 4]
    # sentinels pass through both conventions
    earliest = _collect_values(
        spark,
        _reader(spark, log, starting_offsets={"0": -2}),
        str(tmp_path / "c3"),
    )
    assert len(earliest) == 5
    latest = _collect_values(
        spark,
        _reader(spark, log, starting_offsets={"0": -1}),
        str(tmp_path / "c4"),
    )
    assert latest == []


def test_kafka_wire_schema_matches_jvm_source(spark, stub, tmp_path):
    """The stub must present the REAL source's schema — downstream code
    written against it ports to the jar-backed source unchanged."""
    log = str(tmp_path / "log")
    append_messages(log, "transcripts", 0, [_frame("A", 0, 1, "x")], key="k")
    df = _reader(spark, log, starting_offsets="earliest").load()
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]
    vals = _collect_values(
        spark, _reader(spark, log, starting_offsets="earliest"),
        str(tmp_path / "c"),
    )
    assert json.loads(vals[0])["type"] == "RECORD"


def test_kafka_stub_data_loss_and_new_partitions(spark, stub, tmp_path):
    """Real-source edge semantics: a partition created after the stream
    started joins the feed from offset 0; a log truncated below the
    checkpointed offset fails loudly under failOnDataLoss (the default)
    and clamps silently only when explicitly waived."""
    from pipelinewise_spark.sources.kafka_stub import _StubKafkaStreamReader

    log = str(tmp_path / "log")
    append_messages(log, "transcripts", 0, [_frame("A", i, i + 1, "x")
                                            for i in range(4)])
    rdr = _StubKafkaStreamReader(
        {"log.dir": log, "subscribe": "transcripts",
         "startingOffsets": "earliest"}
    )
    start = rdr.initialOffset()
    rows, end = rdr.read(start)
    assert end["transcripts"]["0"] == 4
    # late partition: created after the checkpointed offset map
    append_messages(log, "transcripts", 1, [_frame("B", 0, 9, "y")])
    rows, end2 = rdr.read(end)
    vals = list(rows)
    assert end2["transcripts"]["1"] == 1 and len(vals) == 1
    # truncation below the checkpoint: loud by default, clamped on waiver
    import os

    os.remove(os.path.join(log, "transcripts-0.jsonl"))
    append_messages(log, "transcripts", 0, [_frame("A", 0, 99, "z")])
    with pytest.raises(RuntimeError, match="data loss"):
        rdr.read(end2)
    waived = _StubKafkaStreamReader(
        {"log.dir": log, "subscribe": "transcripts",
         "startingOffsets": "earliest", "failOnDataLoss": "false"}
    )
    rows, end3 = waived.read(end2)
    assert list(rows) == [] and end3["transcripts"]["0"] == 4
