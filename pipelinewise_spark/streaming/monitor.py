"""Streaming observability operators over the change stream.

The CDC apply path itself needs no watermarks (log order is the contract
— SURVEY §2.7); these operators cover the monitoring surface the
reference exposes through its logs and `pipelinewise status`
(``cli/pipelinewise.py``), re-expressed as Structured Streaming:

- :func:`windowed_change_rates` — event-time windowed I/U/D rates with a
  watermark so late events (a tap replaying an overlap window) still
  count into their own window instead of skewing the current one.
- :func:`running_conv_stats` — an ``applyInPandasWithState`` custom
  stateful operator: per-conversation running (n_events, max_lsn,
  n_deletes) that survives micro-batch boundaries via the state store —
  the per-key incremental aggregation shape that windowed aggs can't
  express (unbounded key lifetime, update-mode emission every batch).

Both run identically under ``readStream`` (state store) and plain batch
DataFrames (the stateful variant is then a groupBy — used by the tests
as the oracle).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

CONV_STATS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_events", LongType()),
        StructField("max_lsn", LongType()),
        StructField("n_deletes", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("max_lsn", LongType()),
        StructField("n_deletes", LongType()),
    ]
)


def windowed_change_rates(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    op_col: str = "op",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Event-time windowed per-op counts. On a stream, the watermark
    bounds state: events later than ``watermark`` behind the max seen
    event time are dropped from their (already emitted) window — the
    standard late-data trade-off. Works identically on a batch frame
    (watermark is a no-op there)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.sum(F.when(F.col(op_col) == "I", 1).otherwise(0)).alias("n_inserts"),
            F.sum(F.when(F.col(op_col) == "U", 1).otherwise(0)).alias("n_updates"),
            F.sum(F.when(F.col(op_col) == "D", 1).otherwise(0)).alias("n_deletes"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_inserts", "n_updates", "n_deletes", "n_events",
        )
    )


def _conv_stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """State update function: fold this micro-batch's events for one
    conversation into the running counters and emit the new totals."""
    if state.exists:
        n_events, max_lsn, n_deletes = state.get
    else:
        n_events, max_lsn, n_deletes = 0, -1, 0
    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            n_deletes += int((pdf["op"] == "D").sum())
    state.update((n_events, max_lsn, n_deletes))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_events": [n_events],
            "max_lsn": [max_lsn],
            "n_deletes": [n_deletes],
        }
    )


def running_conv_stats(events: DataFrame) -> DataFrame:
    """Per-conversation running stats across micro-batches. On a stream,
    state lives in the state store (one row per conv_id, updated each
    batch — Update output mode); on a batch frame this degenerates to a
    plain groupBy, which the tests use as the oracle."""
    if not events.isStreaming:
        return events.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
        )
    return events.groupBy("conv_id").applyInPandasWithState(
        _conv_stats_fn,
        outputStructType=CONV_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
