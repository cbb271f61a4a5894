"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship path: the events table read as a
binlog-shaped change stream and applied through the full CDC engine
(LSN dedup → bucket-pruned CoW MERGE → atomic bookmark commit) into a
LakeTable, returning the final upserted state.

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators; oracle SQL is
DuckDB-compatible ANSI over the same parquet views.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC-apply the sf0.001 events change stream end-to-end."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    from pipelinewise_spark.cdc.pipeline import CdcPipeline
    from pipelinewise_spark.lake.table import LakeTable

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    changes = events.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.lit("public-events").alias("stream"),
        "user_id",
        "event_type",
        "value",
        "props",
        "ts",
        F.col("ts").alias("time_extracted"),
    )
    payload = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="pw-entry-")
    table = LakeTable.create(
        spark, os.path.join(path, "t"), payload, ["user_id"], num_buckets=8
    )
    CdcPipeline(table, stream="public-events").replay(changes, n_batches=3)
    return table.read()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pipelinewise_spark.queries import QUERIES

    def _utc(fn):
        # timestamp-formatting queries must render in UTC regardless of
        # the harness session's timezone (oracle parquet is naive/UTC)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return wrapped

    return {name: _utc(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from pipelinewise_spark.queries import ORACLES

    return dict(ORACLES)
