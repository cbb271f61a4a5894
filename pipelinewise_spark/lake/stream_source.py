"""LakeTable as a first-class Spark STREAMING SOURCE (Python Data Source
API, Spark 4): ``spark.readStream.format("laketable")`` tails a table's
commit log — offsets are manifest versions, each micro-batch is the rows
the commits in ``(start, end]`` added.

This is the downstream half of the CDC story: the merge writes the
table exactly-once; consumers (a training-data pipeline, a replica
builder) tail it as a change feed with the SAME exactly-once guarantee,
because the offset range maps to immutable manifest versions and a
replayed range re-reads identical files. The reference has no analog —
its consumers poll warehouse tables by ``_sdc_*`` columns; here the
feed is a native ``readStream`` with checkpointed offsets.

Semantics (documented, not hidden):
- feed unit = FILES ADDED per commit (CoW bucket rewrites re-emit the
  rewritten buckets' rows — a bucket-level changelog; MoR delta appends
  and append-only tables emit exactly the batch rows). Downstream
  last-per-key folding collapses re-emits, same as any CDC consumer.
- reads happen via the SimpleDataSourceStreamReader (driver-side
  iterator) — the tail-consumer path for bounded feeds; bulk backfills
  should use ``LakeTable.read``/``changes_since`` (executor-parallel).

Register once per session::

    spark.dataSource.register(LakeTableStreamSource)
    df = (spark.readStream.format("laketable")
          .option("path", table.path).load())
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from pipelinewise_spark.lake.table import MANIFEST_DIR, _struct_from_fields


def _manifest_versions(path: str) -> list[int]:
    d = os.path.join(path, MANIFEST_DIR)
    return sorted(
        int(n[1:-5])
        for n in os.listdir(d)
        if n.startswith("v") and n.endswith(".json")
    )


def _load_manifest(path: str, version: int) -> dict:
    with open(os.path.join(path, MANIFEST_DIR, f"v{version:012d}.json")) as fh:
        return json.load(fh)


class _LakeTableStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = os.path.abspath(options["path"])
        self.schema = schema
        self.fields = _load_manifest(
            self.path, _manifest_versions(self.path)[-1]
        )["fields"]

    def initialOffset(self) -> dict:
        # start tailing AFTER the current version by default ("latest",
        # the change-feed convention); option startingVersion=0 replays
        # history from the beginning
        return {"version": _manifest_versions(self.path)[-1]}

    def _added_files(self, after: int, upto: int) -> list[str]:
        rels: list[str] = []
        for v in range(after + 1, upto + 1):
            try:
                m = _load_manifest(self.path, v)
            except FileNotFoundError:
                # vacuum(keep_versions=N) also drops superseded manifests
                # — a consumer lagging past retention must ERROR, never
                # silently thin the feed
                raise RuntimeError(
                    f"change-feed manifest v{v} was vacuumed; increase "
                    f"vacuum keep_versions above the consumer lag"
                )
            for ent in m.get("summary", {}).get("added_files", []):
                rels.append(ent["path"])
        return rels

    def read(self, start: dict):
        latest = _manifest_versions(self.path)[-1]
        if latest < start["version"]:
            # the table's version history moved BACKWARD past our
            # checkpoint (manifest rollback / table re-create) — the feed
            # identity is broken; advancing from the stale offset would
            # re-emit delivered ranges, so fail loudly instead
            raise RuntimeError(
                f"change-feed offset v{start['version']} is ahead of the "
                f"table's latest manifest v{latest}: the table was rolled "
                f"back or re-created; restart the consumer with a fresh "
                f"checkpoint"
            )
        if latest == start["version"]:
            # no new commits: the end offset must NOT move (returning a
            # recomputed 'latest' could only ever equal start here, but
            # returning start explicitly keeps offsets monotone by
            # construction)
            return iter([]), dict(start)
        end = {"version": latest}
        # a LIST iterator, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator, which generators reject
        return iter(list(self._rows(start["version"], latest))), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # exactly-once replay: same version range → same immutable
        # manifests → identical rows (files may have been vacuumed only
        # if the retention window was violated — same contract as any
        # table-format change feed)
        return iter(list(self._rows(start["version"], end["version"])))

    def _rows(self, after: int, upto: int) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        phys = [f["physical"] for f in self.fields]
        for rel in self._added_files(after, upto):
            full = os.path.join(self.path, rel)
            try:
                t = pq.read_table(full)
            except FileNotFoundError:
                # vacuumed beyond retention — fail loudly rather than
                # silently dropping a slice of the feed
                raise RuntimeError(
                    f"change-feed file {rel} was vacuumed; increase "
                    f"vacuum keep_versions above the consumer lag"
                )
            cols = []
            for p in phys:
                if p in t.column_names:
                    cols.append(t.column(p).to_pylist())
                else:  # pre-evolution file: logical column reads as NULL
                    cols.append([None] * t.num_rows)
            yield from zip(*cols)


class LakeTableStreamSource(DataSource):
    """``spark.readStream.format("laketable").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "laketable"

    def schema(self) -> StructType:
        path = os.path.abspath(self.options["path"])
        fields = _load_manifest(path, _manifest_versions(path)[-1])["fields"]
        return _struct_from_fields(
            [(f["logical"], f["type"]) for f in fields]
        )

    def simpleStreamReader(self, schema: StructType):
        reader = _LakeTableStreamReader(schema, dict(self.options))
        if str(self.options.get("startingVersion", "")) != "":
            reader.initialOffset = lambda: {  # type: ignore[method-assign]
                "version": int(self.options["startingVersion"])
            }
        return reader
