"""Small shared physical-plan helpers for the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_cores(df: DataFrame, *cols: str) -> DataFrame:
    """Widen a narrow scan to the session's core count (hash-partitioned
    by ``cols`` — deterministic, no keyless-repartition sort). The bench
    tables are single row-group parquet files that split into 1-2 scan
    partitions, so every stage before the first exchange runs on 1-2 of
    the 32 cores; a real multi-file corpus already scans wide and is
    left alone (only widen, never narrow — scale-adaptive, guide §2).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    # Only FILE-BACKED scans are widened: the file count bounds the
    # split count for the single-row-group files this guards against,
    # and the probe is pure metadata (~10ms; DataFrame.rdd costs ~1s on
    # first use). A non-file frame (streaming micro-batch, in-memory
    # test frame, checkpoint) is returned untouched — the CDC gate
    # signs one micro-batch per trigger and must not pay a repartition
    # exchange + partition probe per batch for typically-small inputs.
    if n_files == 0 or n_files >= target:
        return df
    return df.repartition(target, *cols)
