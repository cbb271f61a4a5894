"""JDBC source adapters: full-table snapshot, key-based incremental scan,
partial-sync range export (SURVEY §2.1 S10/S11/S15, §2.3 J6).

No database or JDBC driver exists in this sandbox, so these build the
*reader configuration* — the part that encodes the reference's semantics —
and only touch the network when ``.load()`` is called by the caller.

Reference mappings:
- PK-range snapshot pagination (``tap_mysql/.../full_table.py:92-113``;
  xmin pagination ``tap_postgres/.../full_table.py:126-138``) →
  ``partitionColumn/lowerBound/upperBound/numPartitions`` partitioned read:
  Spark issues one bounded SELECT per partition in parallel, which is the
  reference's resumable pagination made concurrent.
- FastSync bulk export with 50k fetchmany + split-gzip CSV
  (``fastsync/commons/tap_mysql.py:411-499``, ``split_gzip.py``) →
  ``fetchsize`` + the partitioned read; file splitting disappears (Spark
  partitioning).
- Key-based incremental ``WHERE key >= bookmark`` (``incremental.py:57-66``)
  → pushed-down predicate; the bookmark advances to ``max(key)`` per batch.
- Replica-first heavy reads (``tap_mysql.py:106-120``) → just the JDBC URL.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def sql_literal(v: Any) -> str:
    """Render a Python value as a safe SQL literal (quotes escaped,
    datetimes as standard TIMESTAMP/DATE literals) — ``repr`` is neither
    valid SQL for datetimes nor injection-safe for strings."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return str(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def snapshot_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str,
    lower_bound: Any,
    upper_bound: Any,
    num_partitions: int = 16,
    fetchsize: int = 50_000,
    properties: dict[str, str] | None = None,
):
    """Partitioned full-table snapshot read (the FastSync path)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def incremental_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    replication_key: str,
    bookmark: Any,
    fetchsize: int = 50_000,
    properties: dict[str, str] | None = None,
):
    """Key-based incremental scan: the bookmark predicate is part of the
    pushed-down query (``WHERE key >= bookmark``, inclusive like the
    reference so equal-key ties replay and upsert idempotently)."""
    query = f"SELECT * FROM {table} WHERE {replication_key} >= {sql_literal(bookmark)}"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def range_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    column: str,
    start: Any,
    end: Any,
    fetchsize: int = 50_000,
    properties: dict[str, str] | None = None,
):
    """Partial-sync ranged export (``fastsync/partialsync/utils.py:36-78``):
    ``WHERE column BETWEEN start AND end`` — feeds the same MERGE path."""
    query = (
        f"SELECT * FROM {table} WHERE {column} "
        f"BETWEEN {sql_literal(start)} AND {sql_literal(end)}"
    )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def next_bookmark(df: DataFrame, replication_key: str):
    """A1: bookmark = max(replication_key) of the loaded batch
    (``fastsync/commons/tap_mysql.py:280-309``)."""
    from pyspark.sql import functions as F

    return df.agg(F.max(replication_key)).collect()[0][0]
