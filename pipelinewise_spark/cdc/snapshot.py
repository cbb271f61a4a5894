"""Initial snapshot load + log-tail handoff (reference: FastSync).

The consistency trick the reference uses (``fastsync/mysql_to_snowflake.py:
100-110``; ``tap_mysql/__init__.py:240-299``): capture the log position
**lsn₀ BEFORE exporting the snapshot**, bulk-load the snapshot atomically,
then start the log tail from lsn₀. Events in the overlap window
(lsn₀, snapshot-read-time] replay against rows the snapshot already
reflects; the PK upsert + LSN guard makes the replay convergent, so
snapshot + overlapping tail ≡ exact table state.

Spark shape: the snapshot is any batch DataFrame (``spark.read.jdbc`` with
partitionColumn/numPartitions for a real database — the reference's
PK-range pagination ``full_table.py:92-113`` becomes JDBC partitioned
reads; parquet for lake-to-lake). The load is one atomic
``LakeTable.overwrite`` (reference: temp table + ``SWAP``/rename,
``fastsync/commons/target_snowflake.py:447-468``) that commits the lsn₀
bookmark in the same manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelinewise_spark.lake.table import LSN_COL, LakeTable


def initial_load(
    table: LakeTable,
    snapshot: DataFrame,
    *,
    lsn0: int,
    stream: str = "default",
) -> dict:
    """Atomic snapshot overwrite + lsn₀ bookmark in one commit. Snapshot
    rows carry ``_lsn = lsn₀`` so the merge guard treats any tail event
    with lsn > lsn₀ as newer; overlap replays (≤ lsn₀) are dropped by the
    bookmark prefix filter, exactly as a resumed tap would skip them."""
    df = snapshot.withColumn(LSN_COL, F.lit(int(lsn0)).cast("long"))
    return table.overwrite(
        df,
        bookmarks={stream: {"lsn": int(lsn0)}},
        summary={"operation": "initial_load", "lsn0": int(lsn0)},
    )
