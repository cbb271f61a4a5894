"""Singer-spec message framing (SCHEMA / RECORD / STATE / ACTIVATE_VERSION)
as DataFrame codecs.

The reference's taps and targets speak newline-delimited JSON over pipes
(SURVEY §1.1). Here the framed stream is a DataFrame of lines; decode is
pure column expressions (``get_json_object`` + ``from_json`` — no per-row
Python), encode is ``to_json``. SCHEMA/STATE messages are rare control
lines and are collected driver-side.

Engine extension (documented): RECORD messages carry the event's log
position as ``record._sdc_lsn`` so that per-event ordering survives
distribution. The reference relies on physical line order instead (single
pipe, single thread) — meaningless under parallel reads. STATE messages
keep the standard shape ``{bookmarks: {stream: {lsn}}}``
(``logical_replication.py:677-684``).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pipelinewise_spark.singer.schema import jsonschema_to_struct

LSN_FIELD = "_sdc_lsn"
DELETED_FIELD = "_sdc_deleted_at"


# ------------------------------------------------------------------ decode

def message_type(line_col=None):
    return F.get_json_object(
        F.col("value") if line_col is None else line_col, "$.type"
    )


def collect_control_messages(lines: DataFrame, *, include_state: bool = False) -> dict:
    """Driver-side collect of SCHEMA / ACTIVATE_VERSION lines
    (control-plane: O(streams), tiny). RECORD lines stay distributed.

    STATE lines are NOT collected by default: they are informational here
    (the bookmark committed in the LakeTable manifest is authoritative,
    ``cdc/pipeline.py``) and at the reference's 1-per-1000 cadence a
    10^10-event stream carries 10^7 of them — a driver collect would be a
    scale bug. Use :func:`state_high_watermarks` for a distributed
    aggregate, or ``include_state=True`` for bounded fixtures."""
    types = ["SCHEMA", "ACTIVATE_VERSION"] + (["STATE"] if include_state else [])
    rows = lines.where(message_type().isin(*types)).collect()
    out = {"SCHEMA": [], "STATE": [], "ACTIVATE_VERSION": []}
    for r in rows:
        msg = json.loads(r["value"])
        out[msg["type"]].append(msg)
    return out


def state_high_watermarks(lines: DataFrame) -> DataFrame:
    """Distributed reduction of STATE lines → one (stream, max_lsn) row per
    stream. The shuffle carries only the partial-aggregated per-stream
    maxima regardless of how many STATE lines the log holds."""
    from pyspark.sql.types import LongType, MapType, StringType, StructField
    from pyspark.sql.types import StructType as _St

    bm_type = MapType(
        StringType(), _St([StructField("lsn", LongType(), True)])
    )
    return (
        lines.where(message_type() == "STATE")
        .select(
            F.explode(
                F.from_json(
                    F.get_json_object("value", "$.value.bookmarks"), bm_type
                )
            ).alias("stream", "bm")
        )
        .groupBy("stream")
        .agg(F.max("bm.lsn").alias("max_lsn"))
    )


def decode_records(
    lines: DataFrame,
    payload_schema: StructType | dict,
    *,
    stream: str | None = None,
    validate: str = "permissive",
    claim_unparseable: bool = True,
) -> DataFrame:
    """RECORD lines → change-event DataFrame (lsn, op, stream, payload...,
    time_extracted). Deletes are RECORDs whose ``_sdc_deleted_at`` is set
    (reference: ``binlog.py:519-543``); inserts and updates are both
    upserts (``op = 'U'``) — the merge only distinguishes D.

    ``validate`` — T12, the reference's opt-in record validation
    (``target_postgres/__init__.py:33-42``: reject, don't corrupt):
    ``"permissive"`` (default) nulls unparseable fields; ``"strict"``
    fails the job on the first malformed RECORD payload (FAILFAST);
    ``"quarantine"`` keeps the batch flowing but TAGS malformed rows
    instead of silently nulling them — the output gains two columns,
    ``_sdc_rejected`` (the raw offending line text, NULL on clean rows;
    Spark's ``columnNameOfCorruptRecord`` fires on both unparseable
    JSON and per-field type mismatches) and ``_sdc_reject_reason``
    (``malformed_record`` | ``unparseable_line``); wholly-unparseable
    lines (framing so broken the stream can't be read) are INCLUDED in
    quarantine output rather than silently dropped. The caller splits
    on ``_sdc_rejected`` — see ``CdcPipeline`` for the dead-letter
    wiring."""
    if validate not in ("permissive", "strict", "quarantine"):
        raise ValueError(
            f"validate must be permissive|strict|quarantine, got {validate!r}"
        )
    if isinstance(payload_schema, dict):
        payload_schema = jsonschema_to_struct(payload_schema)
    # build a fresh field list — StructType.add mutates, and the
    # constructor aliases the caller's list
    from pyspark.sql.types import LongType, StringType, StructField

    envelope = StructType(
        list(payload_schema.fields)
        + [StructField(LSN_FIELD, LongType()), StructField(DELETED_FIELD, StringType())]
    )
    if validate == "strict":
        # strict mode filters BEFORE parsing so FAILFAST fires only on
        # this stream's RECORDs (a foreign stream's malformed payload is
        # not this pipeline's error) — pays the extra get_json_object
        rec = lines.where(message_type() == "RECORD")
        if stream is not None:
            rec = rec.where(F.get_json_object("value", "$.stream") == stream)
        parsed = rec.select(
            F.get_json_object("value", "$.stream").alias("stream"),
            F.from_json(
                F.get_json_object("value", "$.record"), envelope,
                {"mode": "FAILFAST"},
            ).alias("r"),
            F.to_timestamp(F.get_json_object("value", "$.time_extracted")).alias(
                "time_extracted"
            ),
        )
    else:
        # fast path: ONE from_json parse of the whole frame per line
        # (type + stream + record + time_extracted) instead of 5 separate
        # JSON parses — the tap-faithful ingest profile is CPU-bound on
        # exactly this decode (BENCH.md singer_decode rows)
        quarantine = validate == "quarantine"
        full = StructType(
            [
                StructField("type", StringType()),
                StructField("stream", StringType()),
                StructField("record", envelope),
                StructField("time_extracted", StringType()),
            ]
            + ([StructField("_corrupt", StringType())] if quarantine else [])
        )
        opts = (
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
            if quarantine else {}
        )
        m = lines.select(F.from_json("value", full, opts).alias("m"))
        cond = F.col("m.type") == "RECORD"
        if stream is not None:
            cond = cond & (F.col("m.stream") == stream)
        if quarantine and claim_unparseable:
            # framing so broken the type can't even be read belongs in
            # the dead-letter output, not on the floor. A line like that
            # is stream-UNATTRIBUTABLE, so when several pipelines decode
            # the same mixed frames (MultiStreamPipeline), exactly ONE of
            # them claims it (claim_unparseable) — otherwise every
            # stream's quarantine records the same garbage line.
            cond = cond | (
                F.col("m.type").isNull() & F.col("m._corrupt").isNotNull()
            )
        extra = (
            [
                F.col("m._corrupt").alias("_sdc_rejected"),
                F.when(F.col("m._corrupt").isNull(), F.lit(None))
                .when(F.col("m.type").isNull(), F.lit("unparseable_line"))
                .otherwise(F.lit("malformed_record"))
                .cast("string")
                .alias("_sdc_reject_reason"),
            ]
            if quarantine else []
        )
        parsed = m.where(cond).select(
            F.col("m.stream").alias("stream"),
            F.col("m.record").alias("r"),
            # permissive contract: unparseable timestamps null out (ANSI
            # mode would otherwise fail the whole batch on one bad line)
            F.try_to_timestamp(F.col("m.time_extracted")).alias("time_extracted"),
            *extra,
        )
    tail = (
        ["_sdc_rejected", "_sdc_reject_reason"]
        if validate == "quarantine" else []
    )
    return parsed.select(
        F.col(f"r.{LSN_FIELD}").alias("lsn"),
        F.when(F.col(f"r.{DELETED_FIELD}").isNotNull(), F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "stream",
        *[F.col(f"r.{f.name}").alias(f.name) for f in payload_schema.fields],
        "time_extracted",
        *tail,
    )


# ------------------------------------------------------------------ encode

def encode_records(
    events: DataFrame,
    payload_cols: list[str],
    *,
    lsn_col: str = "lsn",
    op_col: str = "op",
    stream_col: str = "stream",
    ts_pattern: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
) -> DataFrame:
    """Change events → singer RECORD lines (column ``value``). Timestamps
    serialize ISO-8601 with explicit offset — the reference's
    canonicalization (``binlog.py:208-219``)."""
    record = F.struct(
        F.col(lsn_col).cast("long").alias(LSN_FIELD),
        *[F.col(c).alias(c) for c in payload_cols],
        # MUST be non-null for every D (to_json drops null fields and the
        # decoder derives op from this field's presence) — fall back to
        # the epoch sentinel when time_extracted is missing
        F.when(
            F.col(op_col) == "D",
            F.coalesce(
                F.date_format(F.col("time_extracted"), ts_pattern),
                F.lit("1970-01-01T00:00:00.000000+00:00"),
            ),
        ).alias(DELETED_FIELD),
    )
    line = F.to_json(
        F.struct(
            F.lit("RECORD").alias("type"),
            F.col(stream_col).alias("stream"),
            record.alias("record"),
            F.date_format(F.col("time_extracted"), ts_pattern).alias(
                "time_extracted"
            ),
        )
    )
    return events.select(line.alias("value"), F.col(lsn_col).alias("_order"))


def schema_message(stream: str, json_schema: dict, key_properties: list[str]) -> str:
    return json.dumps(
        {
            "type": "SCHEMA",
            "stream": stream,
            "schema": json_schema,
            "key_properties": key_properties,
        }
    )


def state_message(bookmarks: dict) -> str:
    return json.dumps({"type": "STATE", "value": {"bookmarks": bookmarks}})


def write_singer_file(
    events: DataFrame,
    payload_cols: list[str],
    stream: str,
    json_schema: dict,
    key_properties: list[str],
    path: str,
    *,
    state_every: int = 1000,
) -> None:
    """Serialize a bounded event set to one singer-framed text file:
    SCHEMA, then RECORDs in LSN order with STATE lines every
    ``state_every`` records (reference cadence: ``binlog.py:36``).
    Driver-side writer for fixtures/tests — the scale path ships parquet
    or Kafka, not text frames. RECORDs are forced onto ``stream`` so the
    frames stay self-consistent with the SCHEMA line."""
    if state_every < 1:
        raise ValueError(
            f"state_every must be >= 1, got {state_every} (a final STATE "
            f"line is always written; there is no 'no STATE' mode)"
        )
    events = events.withColumn("stream", F.lit(stream))
    lines: Iterator = (
        encode_records(events, payload_cols)
        .orderBy("_order")
        .select("value", "_order")
        .toLocalIterator()
    )
    with open(path, "w") as fh:
        fh.write(schema_message(stream, json_schema, key_properties) + "\n")
        n = 0
        last_lsn = None
        for row in lines:
            fh.write(row["value"] + "\n")
            n += 1
            last_lsn = row["_order"]
            if n % state_every == 0:
                fh.write(state_message({stream: {"lsn": last_lsn}}) + "\n")
        if last_lsn is not None:
            fh.write(state_message({stream: {"lsn": last_lsn}}) + "\n")
