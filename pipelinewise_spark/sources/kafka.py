"""S12 — Kafka change-stream source (reference: tap-kafka,
``tap_kafka/sync.py:117-468``).

The reference manages per-partition offset bookmarks itself (auto-commit
off, ``sync.py:133``; bookmark shape ``{partition, offset, timestamp}``,
``sync.py:80-93``). Spark's Kafka source owns exactly that state natively
in the streaming checkpoint, so the adapter is configuration + singer
decode. The ``spark-sql-kafka`` package is not present in this sandbox —
the reader builds lazily and only fails at ``.load()`` if the jar is
missing, which keeps this module importable and unit-testable.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def render_starting_offsets(
    topic: str, bookmark: dict, *, last_consumed: bool = True
) -> str:
    """Bookmark ``{partition: offset}`` → Spark's ``startingOffsets``
    JSON spec ``{"topic": {"partition": offset}}``.

    .. warning:: BEHAVIOR CHANGE vs early engine versions: the default
       now treats bookmark offsets as LAST-CONSUMED (the reference
       tap_kafka convention) and bumps non-sentinel offsets by +1. A
       caller persisting Spark-convention NEXT-OFFSET bookmarks must
       pass ``last_consumed=False`` explicitly — relying on the old
       verbatim default would silently SKIP one message per partition,
       a loss no downstream guard can repair. When handed a dict whose
       provenance is unknown, require the caller to state the
       convention rather than guessing.

    The offset SEMANTICS are an explicit parameter because the two
    conventions differ by one and a silent mismatch either skips or
    duplicates a message per partition:

    - ``last_consumed=True`` (default) — the REFERENCE convention:
      ``tap_kafka``'s ``update_bookmark`` stores ``message.offset()``
      (the last message consumed) and deliberately re-reads it on
      resume (``tap_kafka/sync.py:80-93``). Spark's ``startingOffsets``
      is the NEXT offset to consume (inclusive start), so non-sentinel
      offsets are incremented here — verbatim conversion would
      re-consume one message per partition (harmless downstream, the
      LSN/batch-id guards absorb duplicates, but pointless work).
    - ``last_consumed=False`` — the bookmark already holds next-offset
      (Spark-convention) values: rendered verbatim. Use this for
      bookmarks produced by Spark itself; incrementing those would
      SKIP one message per partition, which no downstream guard can
      repair.

    Sentinels pass through in both modes (-2 = earliest, -1 = latest).
    Partition keys must be strings, offsets integers."""
    bump = 1 if last_consumed else 0
    return json.dumps(
        {
            topic: {
                str(p): (int(o) if int(o) < 0 else int(o) + bump)
                for p, o in bookmark.items()
            }
        },
        sort_keys=True,
    )


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: dict | str = "earliest",
    max_offsets_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
    bookmark_is_last_consumed: bool = True,
    format: str = "kafka",
):
    """Builds the readStream for a singer-framed (or raw JSON) topic.
    Follow with ``.load().selectExpr("CAST(value AS STRING) as value")`` →
    :func:`pipelinewise_spark.singer.protocol.decode_records`.

    ``starting_offsets`` accepts the reference's bookmark dict
    ({partition: offset}) and renders Spark's JSON offset spec; see
    :func:`render_starting_offsets` for the last-consumed vs next-offset
    convention (``bookmark_is_last_consumed``).

    .. important:: pair the consuming pipeline with
       ``CdcPipeline(filter_applied_lsn=False)``: a multi-partition
       topic's micro-batch boundaries follow per-partition OFFSETS, so
       LSNs are NOT globally non-decreasing across batches and the
       LSN-bookmark prefix filter would drop a lagging partition's
       frames as replays. Exactly-once then rests on the Spark
       checkpoint + the merge's batch-id guard — the same
       per-partition-offset bookmark model the reference tap uses
       (``tap_kafka/sync.py:80-93``). Caught by the
       ``s12_kafka_stream_fold`` oracle query.

    ``format`` defaults to the real JVM source; tests pass
    ``"kafka_stub"`` (:mod:`pipelinewise_spark.sources.kafka_stub`) to
    execute this exact wiring — same options, same offset JSON, same
    wire schema — without the ``spark-sql-kafka`` jar (Spark reserves
    the name ``kafka`` so the stub cannot shadow it)."""
    if isinstance(starting_offsets, dict):
        starting_offsets = render_starting_offsets(
            topic, starting_offsets, last_consumed=bookmark_is_last_consumed
        )
    reader = (
        spark.readStream.format(format)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader
