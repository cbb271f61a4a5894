"""Change-event model: the binlog/WAL-shaped stream the engine ingests.

The reference decodes binlog RowsEvents / wal2json actions into Singer
RECORD messages (``tap-mysql .../binlog.py:478-543``; ``tap-postgres
.../logical_replication.py:380-493``). Here the decoded stream is simply a
DataFrame with this envelope; decode from singer-framed JSON lines lives in
:mod:`pipelinewise_spark.singer.protocol`.

Ops: ``I`` (insert, after-image), ``U`` (update, full after-image —
binlog_row_image=FULL required, ``binlog.py:56-78``), ``D`` (delete,
before-image; the target sets ``_sdc_deleted_at``, ``binlog.py:519-543``).
``lsn`` is the total order of the log (Postgres LSN int64 /
MySQL ``file<<32+pos``, ``logical_replication.py:46-76``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OPS = ("I", "U", "D")

#: Transcript payload columns (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

TRANSCRIPT_KEY = ["conv_id", "turn_idx"]


def change_event_schema(payload: StructType = TRANSCRIPT_SCHEMA) -> StructType:
    """Envelope: (lsn, op, stream, time_extracted) + payload columns."""
    return StructType(
        [
            StructField("lsn", LongType()),
            StructField("op", StringType()),
            StructField("stream", StringType()),
            *payload.fields,
            StructField("time_extracted", TimestampType()),
        ]
    )


CHANGE_EVENT_SCHEMA = change_event_schema()
