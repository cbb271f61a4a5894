#!/usr/bin/env python
"""Change-feed consumer job — the downstream ``spark-submit --py-files``
entrypoint (the ingest half lives in ``jobs/run_cdc.py``).

Tails a LakeTable's native change feed (``readStream.format("laketable")``,
offsets = manifest versions, exactly-once via the streaming checkpoint)
and drives one of three consumers:

- ``replica``  fold each micro-batch (tombstones → D ops, ``_lsn`` as the
  LSN) and MERGE into a second LakeTable — the replica-builder topology;
  the replica converges to the source's live state across restarts
  (tests/test_replication_chain.py proves convergence; this is the same
  wiring as a CLI).
- ``export``   append the raw feed to a parquet directory (training-data
  export tail; downstream consumers fold by ``_lsn``) — or, with
  ``--export-format csv``, headered CSV files (optionally gzip) under
  the target path: the reference's ``target-s3-csv`` shape
  (``singer-connectors/target-s3-csv``, flat delimited files an
  ``tap_s3_csv`` source reads straight back), point ``--target`` at
  ``s3a://...`` for the real thing. ``--export-format singer`` emits
  SCHEMA/RECORD/STATE framed text files (one per micro-batch, atomic
  rename, resumable) — the lake becomes a singer TAP any reference
  target can consume, closing the interop loop in both directions.
- ``index``    keep a persisted PQ / IVF / MinHash-LSH index current
  (``--index-kind``; ``auto`` reads the kind from index.json): drop CoW
  re-emits via the index's feed-LSN watermark, fold the remainder
  last-per-key, encode ONLY the true delta against the saved
  codebooks/centroids (PQ/IVF) or sign it (minhash, ``--text-col``),
  upsert, and propagate deletes (``functions/ann_index.append_*``/
  ``delete_*``, ``functions/dedup_index``). The index must already be
  fitted+saved by a batch job — this maintains it;
  ``--retrain-on-drift`` additionally refits PQ/IVF from the source's
  live rows when the drift probe trips (minhash never needs it:
  stateless hashing has no codebooks to age).

Bounded runs (``--available-now``, default) drain what exists and exit 0;
kill + rerun with the same --checkpoint resumes exactly. Omit it for a
continuous tail.

Usage:

    spark-submit --py-files dist/pipelinewise_spark.zip jobs/run_feed.py \\
        --source s3://bucket/lake/transcripts \\
        --checkpoint s3://bucket/ckpt/replica \\
        --mode replica --target s3://bucket/lake/transcripts-replica
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="source LakeTable path")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--mode", choices=["replica", "export", "index"],
                   default="replica")
    p.add_argument("--target", required=True,
                   help="replica table path / export dir / index dir")
    p.add_argument("--starting-version", type=int, default=0,
                   help="replay from this manifest version (default 0); "
                        "ignored once the checkpoint holds an offset")
    p.add_argument("--num-buckets", type=int, default=None,
                   help="replica bucket count (default: match the source)")
    p.add_argument("--vec-col", default="embedding",
                   help="index mode (pq/ivf): the embedding column")
    p.add_argument("--text-col", default=None,
                   help="index mode (minhash): the document text column "
                        "(default: the text_col pinned in the index.json "
                        "at fit time — override only when the feed names "
                        "the same content differently)")
    p.add_argument("--index-kind", choices=["pq", "ivf", "minhash", "auto"],
                   default="auto",
                   help="index mode: which maintenance pair to run "
                        "(auto reads the kind from the index.json)")
    p.add_argument("--retrain-on-drift", action="store_true",
                   help="index mode: after the drain, if the drift probe "
                        "trips (needs_retrain), refit the index from the "
                        "source's live rows — same geometry, fresh "
                        "codebooks/centroids, watermark carried forward")
    p.add_argument("--drift-factor", type=float, default=2.0,
                   help="needs_retrain threshold: retrain when the "
                        "rows-weighted delta quantization error exceeds "
                        "this multiple of the fit-time error (default 2.0)")
    p.add_argument("--drift-min-rows", type=int, default=1,
                   help="needs_retrain guard: ignore the probe until this "
                        "many delta rows accumulated since the last fit "
                        "(set to a few thousand in production so one noisy "
                        "vector cannot trigger a full-corpus retrain)")
    p.add_argument("--no-feed-watermark", dest="feed_watermark",
                   action="store_false", default=True,
                   help="index mode: disable the re-emit watermark filter. "
                        "REQUIRED when the source table's LSNs are not "
                        "globally monotonic across commits (e.g. ingested "
                        "from a multi-partition Kafka topic with "
                        "filter_applied_lsn=False, where a lagging "
                        "partition commits rows below an earlier commit's "
                        "max LSN — the watermark would drop them). Costs "
                        "O(touched-bucket) re-encodes per batch instead "
                        "of O(delta); correctness is unaffected either "
                        "way (re-encodes are same-content replaces)")
    p.add_argument("--export-format", choices=["parquet", "csv", "singer"],
                   default="parquet",
                   help="export mode output: parquet (default), headered "
                        "CSV (the reference's target-s3-csv shape), or "
                        "singer — SCHEMA/RECORD/STATE framed text files, "
                        "one per micro-batch, that any singer target can "
                        "consume (the lake becomes a TAP: full-circle "
                        "interop with the reference's ecosystem)")
    p.add_argument("--stream", default=None,
                   help="--export-format singer: the stream name in the "
                        "emitted frames (default: the source table's "
                        "directory name)")
    p.add_argument("--singer-state-every", type=int, default=1000,
                   help="--export-format singer: STATE line cadence "
                        "(reference: binlog.py UPDATE_BOOKMARK_PERIOD)")
    p.add_argument("--csv-delimiter", default=",",
                   help="--export-format csv field separator")
    p.add_argument("--csv-compression", choices=["none", "gzip"],
                   default="none",
                   help="--export-format csv: gzip emits .csv.gz parts "
                        "(the reference target's default)")
    p.add_argument("--max-bytes-per-partition", type=int, default=None)
    p.add_argument("--available-now", dest="available_now",
                   action="store_true", default=True)
    p.add_argument("--continuous", dest="available_now", action="store_false",
                   help="keep tailing instead of a bounded drain")
    p.add_argument("--timeout-sec", type=int, default=0,
                   help="await at most this long (0 = forever)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pipelinewise_spark.lake.stream_source import LakeTableStreamSource
    from pipelinewise_spark.lake.table import (
        METADATA_COLS, LakeTable, _struct_from_fields,
    )
    from pipelinewise_spark.session import warm_python_workers

    spark = SparkSession.builder.appName("pipelinewise-spark-feed").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.dataSource.register(LakeTableStreamSource)
    # this job's first real work IS a data-source drain — warm that
    # pool too (see session.warm_python_workers)
    warm_python_workers(spark, data_source=True)

    src = LakeTable(spark, args.source)
    payload_fields = [
        (f["logical"], f["type"])
        for f in src.manifest["fields"]
        if f["logical"] not in METADATA_COLS
    ]
    payload_cols = [n for n, _ in payload_fields]

    reader = (
        spark.readStream.format("laketable")
        .option("path", src.path)
        .option("startingVersion", args.starting_version)
    )
    if args.max_bytes_per_partition:
        reader = reader.option(
            "maxBytesPerPartition", args.max_bytes_per_partition
        )
    feed = reader.load()

    def fold_batch(df):
        """Feed micro-batch → change-event envelope: tombstones become D
        ops, ``_lsn`` is the total order; CoW bucket re-emits and
        multi-version keys are absorbed by the downstream merge's
        last-per-key LSN dedup."""
        return df.select(
            *payload_cols,
            F.col("_lsn").alias("lsn"),
            F.when(F.col("_sdc_deleted_at").isNotNull(), "D")
            .otherwise("U")
            .alias("op"),
        )

    # singer export is replication too: its D records come from
    # _sdc_deleted_at, which a hard-delete CoW rewrite never emits —
    # same silent-divergence failure as replica/index
    if (
        args.mode in ("replica", "index")
        or (args.mode == "export" and args.export_format == "singer")
    ) and src.key_cols and not (
        src.manifest["properties"].get("soft_delete", False)
    ):
        # a hard-delete source's CoW rewrite just DROPS the row — the
        # feed (files-added changelog) carries no tombstone, so neither
        # the replica nor the index could ever learn about the delete;
        # silent permanent divergence. Same guard shape as run_cdc's
        # property validation.
        p.error(
            f"{args.mode} mode needs a soft-delete source table "
            f"(create it with properties={{'soft_delete': True}}): a "
            f"hard-delete CoW rewrite emits no tombstone into the "
            f"change feed, so deletes would silently never propagate"
        )

    if args.mode == "replica":
        from pipelinewise_spark.cdc.pipeline import CdcPipeline
        from pipelinewise_spark.evolution.drift import reconcile

        if LakeTable.exists(args.target):
            replica = LakeTable(spark, args.target)
            # the source may have evolved since the replica was created
            # — without this, the replica's bucket writer would silently
            # project the new columns away on every batch
            reconcile(replica, _struct_from_fields(payload_fields))
            replica = replica.refresh()
        else:
            replica = LakeTable.create(
                spark, args.target,
                _struct_from_fields(payload_fields),
                src.key_cols,
                num_buckets=args.num_buckets or src.num_buckets,
            )
        pipe = CdcPipeline(replica, stream="replica")
        writer = feed.writeStream.foreachBatch(
            lambda df, bid: pipe.apply_batch(fold_batch(df), batch_id=bid)
        )
    elif args.mode == "index":
        from pipelinewise_spark.cdc.dedup import latest_per_key
        from pipelinewise_spark.functions import ann_index

        id_cols = src.key_cols
        if len(id_cols) != 1:
            p.error(
                f"index mode needs a single-column key (the index id); "
                f"source table is keyed on {id_cols}"
            )

        kind = args.index_kind
        if kind == "auto":
            kind = ann_index.index_kind(args.target)
        if kind == "minhash":
            from pipelinewise_spark.functions import dedup_index

            if args.retrain_on_drift:
                p.error("--retrain-on-drift does not apply to a minhash "
                        "index: the hashing is stateless (no codebooks "
                        "to age), increments are exact forever")
            # the saved text_col is authoritative — a CLI default must
            # not silently sign a different column than the fit did
            payload_col = (args.text_col
                           or dedup_index.load_minhash_index(
                               args.target)["text_col"])

            def append(target, live, vec_col=None):
                dedup_index.append_minhash_rows(
                    target, live, text_col=payload_col
                )

            delete = dedup_index.delete_minhash_ids
        else:
            payload_col = args.vec_col
            append = (ann_index.append_pq_codes if kind == "pq"
                      else ann_index.append_ivf_cells)
            delete = (ann_index.delete_pq_codes if kind == "pq"
                      else ann_index.delete_ivf_cells)

        def maintain(df, bid):
            # re-emit filter: a CoW bucket rewrite RE-EMITS the whole
            # bucket into the feed, but unchanged rows keep their
            # ORIGINAL _lsn — the index's watermark drops them so each
            # increment encodes O(true delta), not O(touched buckets).
            # NULL _lsn rows (bulk overwrite()-loaded, no change event)
            # always pass: they are genuinely new to the index. The
            # whole filter is off under --no-feed-watermark (sources
            # whose LSNs are not globally monotonic across commits).
            wm = (ann_index.feed_watermark(args.target)
                  if args.feed_watermark else None)
            fresh = df
            if wm is not None:
                fresh = df.where(
                    F.col("_lsn").isNull() | (F.col("_lsn") > wm)
                )
            # bulk rows fold as lsn -1: any real change event beats them
            fresh = fresh.withColumn(
                "_lsn", F.coalesce(F.col("_lsn"), F.lit(-1).cast("long"))
            )
            folded = latest_per_key(
                fold_batch(fresh), id_cols, lsn_col="lsn"
            ).persist()
            try:
                # lsn is coalesced non-null above, so max()=None ⇔ empty
                hi = folded.agg(F.max("lsn")).first()[0]
                if hi is None:
                    return  # batch was all re-emits: nothing new
                live = folded.where(F.col("op") != "D").select(
                    *id_cols, payload_col
                )
                # empty deltas no-op inside append_*
                append(args.target, live, vec_col=args.vec_col)
                dead = folded.where(F.col("op") == "D").select(*id_cols)
                if dead.limit(1).count():
                    delete(args.target, dead)
                if args.feed_watermark and hi > (
                    wm if wm is not None else -1
                ):
                    ann_index.set_feed_watermark(args.target, int(hi))
            finally:
                folded.unpersist()

        writer = feed.writeStream.foreachBatch(maintain)
    elif args.export_format == "singer":  # export, tap shape
        # The lake as a singer TAP: each micro-batch becomes ONE framed
        # text file (SCHEMA, RECORDs in LSN order, STATE lines) under
        # --target, named by batch id — a checkpoint replay rewrites the
        # SAME file (tmp + atomic rename), so downstream consumption
        # stays exactly-once. Singer framing is an inherently SERIAL
        # text protocol (the reference pipes tap|target through one
        # unix pipe), so the per-batch serialization is driver-side
        # streaming (toLocalIterator — never the whole batch in driver
        # memory); batch size is bounded by maxBytesPerPartition
        # packing. CoW re-emits appear as repeat U records with their
        # original lsn — idempotent upserts for any keyed singer target.
        # The SCHEMA line is pinned at stream start (Spark streaming
        # schemas are static for the query's lifetime): after a table
        # evolution, restart the export — the next run emits the new
        # SCHEMA and the new columns.
        import os as _os

        from pipelinewise_spark.singer.catalog import discover_lake_table
        from pipelinewise_spark.singer.protocol import write_singer_file

        stream_name = args.stream or _os.path.basename(
            src.path.rstrip("/"))
        entry = discover_lake_table(src, stream_name)
        key_props = list(src.key_cols)
        _os.makedirs(args.target, exist_ok=True)

        def emit_singer(df, bid):
            events = df.select(
                *payload_cols,
                F.col("_lsn").alias("lsn"),
                F.when(F.col("_sdc_deleted_at").isNotNull(), "D")
                .otherwise("U").alias("op"),
                F.col("_sdc_extracted_at").alias("time_extracted"),
            )
            if events.limit(1).count() == 0:
                return  # no empty frame files
            tmp = _os.path.join(
                args.target, f".batch-{int(bid):08d}.singer.tmp")
            write_singer_file(
                events, payload_cols, stream_name, entry["schema"],
                key_props, tmp, state_every=args.singer_state_every,
            )
            _os.replace(tmp, _os.path.join(
                args.target, f"batch-{int(bid):08d}.singer"))

        writer = feed.writeStream.foreachBatch(emit_singer)
    elif args.export_format == "csv":  # export, target-s3-csv shape
        from pyspark.sql.types import (
            ArrayType, BinaryType, MapType, StructType,
        )

        # CSV holds only atomic cells — an embedding/array column must
        # fail here with a usable message, not per-row in an executor
        bad = [
            f.name for f in feed.schema.fields
            if isinstance(f.dataType,
                          (ArrayType, BinaryType, MapType, StructType))
        ]
        if bad:
            print(
                f"--export-format csv cannot serialize column(s) {bad}; "
                f"export parquet instead", file=sys.stderr,
            )
            return 1
        writer = (
            feed.writeStream.format("csv")
            .option("path", args.target)
            .option("header", "true")
            .option("sep", args.csv_delimiter)
        )
        if args.csv_compression != "none":
            writer = writer.option("compression", args.csv_compression)
    else:  # export, parquet
        writer = feed.writeStream.format("parquet").option(
            "path", args.target
        )

    writer = writer.option("checkpointLocation", args.checkpoint)
    if args.available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    # stop_tap analog: SIGTERM/SIGINT on a continuous tail stops the
    # query and exits 0 — rerun with the same checkpoint resumes; safe
    # at any instant (bookmark commits atomically with the data)
    from pipelinewise_spark.streaming.control import run_until_stopped

    ok = run_until_stopped(q, timeout_sec=args.timeout_sec or None)
    if args.timeout_sec and not ok:
        q.stop()
        print("timed out waiting for the drain", file=sys.stderr)
        return 1
    if args.mode == "index":
        import json

        from pipelinewise_spark.functions import ann_index

        def report(extra=None):
            doc = ann_index._load_doc_any(args.target)
            # operator-facing drift report: retrain when the probe trips
            print(json.dumps({
                "index": args.target,
                "kind": doc["kind"],
                "feed_lsn_watermark": doc.get("feed_lsn_watermark"),
                "fit_error": doc.get("fit_error"),
                "last_delta_error": doc.get("last_delta_error"),
                "last_delta_rows": doc.get("last_delta_rows"),
                "needs_retrain": ann_index.needs_retrain(
                    args.target, factor=args.drift_factor,
                    min_rows=args.drift_min_rows,
                ),
                **(extra or {}),
            }))

        report()
        if args.retrain_on_drift and ann_index.needs_retrain(
            args.target, factor=args.drift_factor,
            min_rows=args.drift_min_rows,
        ):
            live = src.refresh().read().where(
                F.col("_sdc_deleted_at").isNull()
            ).select(*id_cols, args.vec_col)
            ann_index.retrain_index(
                spark, args.target, live, vec_col=args.vec_col
            )
            report(extra={"retrained": True})
    return 0


if __name__ == "__main__":
    sys.exit(main())
