"""S14 — MongoDB change-stream source (reference: tap-mongodb,
``tap_mongodb/sync_strategies/change_streams.py:73-240``).

Reference semantics reproduced Spark-first:

- record shape is ``{_id, document}`` — the key is the document id, the
  payload the WHOLE document as JSON (``sync_strategies/common.py:
  213-214``); deletes carry only ``_id`` + ``_sdc_deleted_at`` =
  clusterTime (``change_streams.py:166-173``);
- updates arrive with only the changed fields, so the reference BUFFERS
  updated ids and fetches the current full document at flush time,
  DISCARDING ids deleted later in the window (``change_streams.py:
  156-164`` + ``get_buffer_rows_from_db``). Here that is a DataFrame
  fold: :func:`updates_requiring_fetch` returns exactly the ids the
  reference would fetch, and :func:`apply_update_lookups` joins the
  caller-provided current documents back in. Change streams opened with
  ``fullDocument: updateLookup`` skip the fetch (the event already
  carries the document) — both paths supported;
- the bookmark is the resume token ``{_data: hex}``; tokens order
  lexicographically by ``_data`` and the restart token is the MIN
  non-null token across streams (``get_token_from_state:56-70``);
- the LSN for merge ordering derives from the BSON clusterTime
  ``(t << 32) | i`` — the same file<<32+off arithmetic the engine uses
  for MySQL binlog / Postgres LSNs (S8), so one merge path serves all
  three sources.

No pymongo in this sandbox: like the Kafka source, the live ``watch()``
cursor cannot run here; everything from the JSON change event onward is
real and oracle-checked (``s14_mongo_fold`` contract query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Relaxed-extended-JSON change stream event, one per line — the shape
#: ``db.watch()`` yields (documentKey/fullDocument/clusterTime/ns/_id).
CHANGE_STREAM_SCHEMA = (
    "struct<"
    "_id: struct<_data: string>, "
    "operationType: string, "
    "clusterTime: struct<`$timestamp`: struct<t: long, i: long>>, "
    "ns: struct<db: string, coll: string>, "
    "documentKey: struct<_id: string>, "
    "fullDocument: string"
    ">"
)


def cluster_lsn(t, i):
    """BSON Timestamp → merge LSN: ``(t << 32) | i`` (S8 arithmetic)."""
    return F.shiftleft(t.cast("long"), 32) + i.cast("long")


def decode_change_stream(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """One ``from_json`` per line (the single-parse discipline of the
    singer decoder) → standard change events:

    ``stream`` (db-coll, the reference's tap_stream_id format,
    ``change_streams.py:144``), ``_id``, ``document`` (full-doc JSON,
    NULL for deletes and for non-lookup updates), ``op`` I/U/D, ``lsn``,
    ``token`` (resume ``_data``), ``time_extracted``."""
    r = F.from_json(F.col(value_col), CHANGE_STREAM_SCHEMA)
    return (
        lines.select(r.alias("r"))
        # 'replace' (replace_one/save) is handled as an update WITH a full
        # document — strictly more than the reference, whose watch
        # pipeline $match excludes replace events entirely
        # (change_streams.py:104-107, a silent-data-loss hole there)
        .where(
            F.col("r.operationType").isin("insert", "update", "replace", "delete")
        )
        .select(
            F.concat_ws("-", F.col("r.ns.db"), F.col("r.ns.coll")).alias("stream"),
            F.col("r.documentKey._id").alias("_id"),
            F.col("r.fullDocument").alias("document"),
            F.when(F.col("r.operationType") == "insert", "I")
            .when(F.col("r.operationType") == "delete", "D")
            .otherwise("U")
            .alias("op"),
            cluster_lsn(
                F.col("r.clusterTime.`$timestamp`.t"),
                F.col("r.clusterTime.`$timestamp`.i"),
            ).alias("lsn"),
            F.col("r._id._data").alias("token"),
            F.timestamp_seconds(F.col("r.clusterTime.`$timestamp`.t")).alias(
                "time_extracted"
            ),
        )
    )


def updates_requiring_fetch(decoded: DataFrame) -> DataFrame:
    """The reference's update buffer as a fold: ids whose LAST event in
    the window is an update WITHOUT a full document (non-lookup change
    stream) — an id deleted later in the window is discarded exactly
    like ``update_buffer.discard`` (``change_streams.py:158``), and an
    id whose update already carries ``fullDocument`` needs no fetch.
    Columns: stream, _id, lsn (of the winning update)."""
    from pipelinewise_spark.cdc.dedup import latest_per_key

    last = latest_per_key(decoded, ["stream", "_id"], lsn_col="lsn")
    return last.where(
        (F.col("op") == "U") & F.col("document").isNull()
    ).select("stream", "_id", "lsn")


def apply_update_lookups(decoded: DataFrame, current_docs: DataFrame) -> DataFrame:
    """Join the caller-fetched CURRENT documents (``stream``, ``_id``,
    ``document``) onto the decoded events — the flush-time fetch of
    ``get_buffer_rows_from_db``. Updates that already carry a document
    keep it; fetched ids fill theirs; deletes stay document-less."""
    docs = current_docs.select(
        F.col("stream").alias("__s"),
        F.col("_id").alias("__i"),
        F.col("document").alias("__doc"),
    )
    return (
        decoded.join(
            docs,
            (F.col("stream") == F.col("__s")) & (F.col("_id") == F.col("__i")),
            "left",
        )
        .withColumn(
            "document",
            F.when(
                (F.col("op") == "U") & F.col("document").isNull(),
                F.col("__doc"),
            ).otherwise(F.col("document")),
        )
        .drop("__s", "__i", "__doc")
    )


def min_restart_token(decoded: DataFrame) -> DataFrame:
    """Resume-safe restart token: per-stream MAX token (the bookmark each
    stream would commit), then the MIN across streams — restarting there
    replays the laggard's overlap, which the LSN filter no-ops
    (reference: ``get_token_from_state`` sorts by ``_data`` and takes
    the first). Tokens are hex strings; lexicographic order IS the
    stream order. Columns: restart_token."""
    return (
        decoded.groupBy("stream")
        .agg(F.max("token").alias("t"))
        .agg(F.min("t").alias("restart_token"))
    )
