"""Streaming observability operators: watermarked windowed rates and the
applyInPandasWithState per-conversation stateful aggregator (state
persists across micro-batches via the state store)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.cdc.events import CHANGE_EVENT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.streaming import running_conv_stats, windowed_change_rates


@pytest.fixture(scope="module")
def events(spark):
    df = generate_change_events(
        spark, n_convs=12, turns_per_conv=4, n_updates=80, delete_pct=15
    ).persist()
    df.count()
    yield df
    df.unpersist()


def test_windowed_change_rates_batch_oracle(spark, events):
    out = {
        r["window_start"]: r
        for r in windowed_change_rates(events, window="1 hour").collect()
    }
    events.createOrReplaceTempView("ev")
    exp = spark.sql("""
        SELECT window(ts, '1 hour').start AS ws,
               sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS n_inserts,
               sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS n_deletes,
               count(*) AS n_events
        FROM ev GROUP BY 1
    """).collect()
    assert len(exp) == len(out) > 0
    for r in exp:
        got = out[r["ws"]]
        assert (got["n_inserts"], got["n_deletes"], got["n_events"]) == (
            r["n_inserts"], r["n_deletes"], r["n_events"]
        )


def test_running_conv_stats_across_microbatches(spark, events, tmp_path):
    """applyInPandasWithState: two micro-batches (maxFilesPerTrigger=1),
    per-conv counters must ACCUMULATE across them (state store), ending
    equal to the batch groupBy oracle."""
    base = str(tmp_path / "chunks")
    os.makedirs(base)
    import time as _t

    for i, (lo, hi) in enumerate([(0, 90), (90, 10**9)]):
        d = f"{base}/c{i}"
        events.where((F.col("lsn") > lo) & (F.col("lsn") <= hi)) \
            .coalesce(1).write.mode("overwrite").parquet(d)
        now = _t.time() + i
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                os.utime(os.path.join(d, fn), (now, now))

    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/*")  # glob into the per-chunk subdirs
    )
    q = (
        running_conv_stats(stream)
        .writeStream.format("memory")
        .queryName("conv_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.sql("SELECT * FROM conv_stats").collect()
    # last update per conv = the accumulated totals
    final = {}
    for r in updates:  # memory sink appends update rows in batch order
        final[r["conv_id"]] = (r["n_events"], r["max_lsn"], r["n_deletes"])
    exp = {
        r["conv_id"]: (r["n_events"], r["max_lsn"], r["n_deletes"])
        for r in running_conv_stats(events).collect()  # batch oracle
    }
    assert final == exp
    # state genuinely crossed micro-batches: some conv got >1 update row
    from collections import Counter

    per_conv = Counter(r["conv_id"] for r in updates)
    assert max(per_conv.values()) > 1
