"""In-process Kafka broker stub (Python Data Source API) — executes the
S12 reader path end-to-end without the ``spark-sql-kafka`` jar.

The production adapter (:mod:`pipelinewise_spark.sources.kafka`) renders
reference tap-kafka bookmarks into Spark's ``startingOffsets`` JSON and
builds ``spark.readStream.format("kafka")``. The jar is absent in this
sandbox, so until now ``.load()`` had never executed. This module
registers a Python streaming DataSource under the SAME short name
``kafka`` that honors the SAME wire contract the real source exposes:

- options ``subscribe``, ``startingOffsets`` (``earliest`` / ``latest``
  / per-partition JSON spec with -2/-1 sentinels),
  ``maxOffsetsPerTrigger`` (total cap, distributed across partitions
  proportionally to lag — Kafka source semantics), ``failOnDataLoss``;
- output schema identical to the real source: ``key binary, value
  binary, topic string, partition int, offset long, timestamp
  timestamp, timestampType int``;
- offsets are ``{topic: {partition: next_offset}}`` — the inclusive
  NEXT offset to read, exactly the convention
  :func:`pipelinewise_spark.sources.kafka.render_starting_offsets`
  converts reference last-consumed bookmarks into.

Backing log: one JSONL file per partition at
``<log.dir>/<topic>-<partition>.jsonl``; the line number IS the offset
(append-only, immutable — Kafka's log abstraction). Messages appended
between micro-batches are picked up like a live topic.

This is a TEST/DEV harness: reads are driver-side
(SimpleDataSourceStreamReader) and everything lives on local disk. In
production, deploy with the real ``spark-sql-kafka-0-10`` package — the
adapter code path is byte-identical from ``.load()`` onward.

Reference: ``tap-kafka/tap_kafka/sync.py:117-468`` (consumer loop,
offset bookmarks); this stub replaces only the broker, not the adapter.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def _part_file(log_dir: str, topic: str, partition: int) -> str:
    return os.path.join(log_dir, f"{topic}-{partition}.jsonl")


def append_messages(
    log_dir: str,
    topic: str,
    partition: int,
    values: list[str],
    *,
    key: str | None = None,
    ts_millis: int = 1704067200000,
) -> None:
    """Producer half of the stub: append ``values`` to the partition log
    (offset = line number). Deterministic default timestamp
    (2024-01-01T00:00:00Z) keeps runs reproducible."""
    os.makedirs(log_dir, exist_ok=True)
    with open(_part_file(log_dir, topic, partition), "a") as fh:
        for v in values:
            fh.write(
                json.dumps({"key": key, "value": v, "ts": ts_millis}) + "\n"
            )


def _partitions(log_dir: str, topic: str) -> list[int]:
    pre = f"{topic}-"
    parts = sorted(
        int(n[len(pre) : -6])
        for n in os.listdir(log_dir)
        if n.startswith(pre) and n.endswith(".jsonl")
    )
    if not parts:
        raise RuntimeError(
            f"stub broker has no partitions for topic {topic!r} in {log_dir}"
        )
    return parts


def _end_offsets(log_dir: str, topic: str) -> dict[str, int]:
    ends: dict[str, int] = {}
    for p in _partitions(log_dir, topic):
        with open(_part_file(log_dir, topic, p)) as fh:
            ends[str(p)] = sum(1 for _ in fh)
    return ends


class _StubKafkaStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        opts = {k.lower(): v for k, v in options.items()}
        self.log_dir = opts["log.dir"]
        if "subscribe" not in opts:
            raise ValueError("option 'subscribe' is required")
        self.topic = opts["subscribe"]
        self.starting = opts.get("startingoffsets", "latest")
        cap = opts.get("maxoffsetspertrigger")
        self.max_per_trigger = int(cap) if cap else None
        # real-source default is true: data loss (log truncated below a
        # checkpointed offset) fails the query unless explicitly waived
        self.fail_on_data_loss = (
            str(opts.get("failondataloss", "true")).lower() != "false"
        )

    def initialOffset(self) -> dict:
        ends = _end_offsets(self.log_dir, self.topic)
        if self.starting == "earliest":
            return {self.topic: {p: 0 for p in ends}}
        if self.starting == "latest":
            return {self.topic: ends}
        spec = json.loads(self.starting)[self.topic]
        out: dict[str, int] = {}
        for p, end in ends.items():
            o = int(spec.get(p, -1))
            out[p] = 0 if o == -2 else end if o == -1 else o
        return {self.topic: out}

    def read(self, start: dict):
        begin = dict(start[self.topic])
        ends = _end_offsets(self.log_dir, self.topic)
        # partitions created AFTER the stream started (topic repartition)
        # join the feed from offset 0 — the real source's behavior
        for p in ends:
            begin.setdefault(p, 0)
        for p in begin:
            if ends.get(p, 0) < int(begin[p]) and self.fail_on_data_loss:
                raise RuntimeError(
                    f"data loss: partition {p} log end {ends.get(p, 0)} "
                    f"< checkpointed offset {begin[p]} (truncated); set "
                    f"failOnDataLoss=false to skip"
                )
        lag = {
            p: max(0, ends.get(p, 0) - int(begin.get(p, 0))) for p in begin
        }
        total = sum(lag.values())
        if self.max_per_trigger is not None and total > self.max_per_trigger:
            # real Kafka-source admission control: the total cap is split
            # across partitions proportionally to lag, remainder by
            # partition order (deterministic)
            cap = self.max_per_trigger
            take = {p: cap * v // total for p, v in lag.items()}
            rem = cap - sum(take.values())
            for p in sorted(lag, key=int):
                if rem <= 0:
                    break
                room = lag[p] - take[p]
                add = min(room, rem)
                take[p] += add
                rem -= add
        else:
            take = lag
        end = {
            self.topic: {p: int(begin.get(p, 0)) + take[p] for p in begin}
        }
        return (
            iter(list(self._rows(begin, end[self.topic]))),
            end,
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(list(self._rows(start[self.topic], end[self.topic])))

    def _rows(self, begin: dict, upto: dict) -> Iterator[tuple]:
        for p in sorted(begin, key=int):
            lo, hi = int(begin[p]), int(upto.get(p, begin[p]))
            if hi <= lo:
                continue
            with open(_part_file(self.log_dir, self.topic, int(p))) as fh:
                for off, line in enumerate(fh):
                    if off < lo:
                        continue
                    if off >= hi:
                        break
                    m = json.loads(line)
                    yield (
                        m["key"].encode() if m.get("key") else None,
                        m["value"].encode(),
                        self.topic,
                        int(p),
                        off,
                        _dt.datetime.fromtimestamp(
                            m["ts"] / 1000.0, tz=_dt.timezone.utc
                        ),
                        0,  # CreateTime, like the real source
                    )


class InProcessKafkaSource(DataSource):
    """``spark.dataSource.register(InProcessKafkaSource)`` then
    ``kafka_stream_reader(..., format="kafka_stub")`` resolves here.
    (Spark reserves the short name ``kafka`` for the JVM source even
    when its jar is absent — DATA_SOURCE_ALREADY_EXISTS — so the stub
    registers under its own name and the adapter exposes the format as
    a parameter; every other option and the offset contract are
    identical.) Requires option ``log.dir``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_stub"

    def schema(self) -> StructType:
        return KAFKA_WIRE_SCHEMA

    def simpleStreamReader(self, schema: StructType):
        return _StubKafkaStreamReader(dict(self.options))
