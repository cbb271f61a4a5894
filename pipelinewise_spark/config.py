"""Project-config loader: the reference's tap YAML → a wired engine.

PipelineWise's primary UX is a YAML project (``pipelinewise import`` +
``run_tap``): one file per tap declaring connection, target, and a
``schemas[].tables[]`` mapping with per-table ``replication_method``,
``replication_key`` and load-time ``transformations`` (samples:
``cli/samples/tap_mysql_mariadb.yml.sample``; loader ``cli/config.py``;
stream splitting ``cli/pipelinewise.py:172-368``). A user switching to
this engine keeps that file: :func:`build_project` turns the SAME shape
into LakeTables + compiled transformations + a
:class:`~pipelinewise_spark.cdc.pipeline.MultiStreamPipeline`, and
returns reader SPECS (module/function/kwargs) for each table's
replication method so the caller can bind live connections where they
exist (JDBC / Kafka / files) — the sandbox has no live databases, so
specs are data, not connections.

Not supported (loudly): vault-encrypted values (``!vault`` — decrypt
before handing the file over) and connector types outside the engine's
source surface.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from pipelinewise_spark.cdc.pipeline import CdcPipeline, MultiStreamPipeline
from pipelinewise_spark.lake.table import LakeTable
from pipelinewise_spark.transform.compiler import compile_transformations

#: tap ``type`` → the sources module that serves its reads.
SUPPORTED_TAP_TYPES = {
    "tap-mysql": "jdbc",
    "tap-postgres": "jdbc",
    "tap-oracle": "jdbc",
    "tap-snowflake": "jdbc",
    "tap-kafka": "kafka",
    "tap-s3-csv": "files",
    "tap-mongodb": "mongo",
}

REPLICATION_METHODS = ("LOG_BASED", "INCREMENTAL", "FULL_TABLE")


def load_tap_yaml(path_or_text: str) -> dict:
    """Parse a tap YAML (path or literal text). Rejects vault-encrypted
    scalars explicitly — the reference decrypts them with the project's
    master password (``cli/config.py``), which this engine does not
    hold."""
    import yaml

    text = path_or_text
    if os.path.exists(path_or_text):
        with open(path_or_text) as fh:
            text = fh.read()
    if "!vault" in text:
        raise ValueError(
            "vault-encrypted values are not supported; decrypt the "
            "project file before loading it"
        )
    cfg = yaml.safe_load(text)
    if not isinstance(cfg, dict) or "schemas" not in cfg:
        raise ValueError("not a PipelineWise tap config (no 'schemas' key)")
    return cfg


def _stream_id(source_schema: str, table: dict) -> str:
    # the reference's tap_stream_id format: "<schema>-<table>"
    return f"{source_schema}-{table['table_name']}"


def _transform_config(table: dict) -> list[dict]:
    """YAML ``transformations`` (column/type/when) → the transform-field
    JSON shape (field_id/type/when) the compiler takes — the same
    translation ``cli/config.py`` does when generating connector JSONs."""
    out = []
    for t in table.get("transformations", []) or []:
        entry = {"field_id": t["column"], "type": t["type"]}
        if t.get("when"):
            entry["when"] = t["when"]
        out.append(entry)
    return out


def reader_spec(cfg: dict, source_schema: str, table: dict) -> dict:
    """The read plan for one table, as data: which sources module /
    function serves its ``replication_method``, with the kwargs derived
    from ``db_conn`` — bind a live connection by calling
    ``pipelinewise_spark.sources.<module>.<function>(spark, **kwargs)``."""
    method = table.get("replication_method", "FULL_TABLE")
    if method not in REPLICATION_METHODS:
        raise ValueError(
            f"{_stream_id(source_schema, table)}: unknown "
            f"replication_method {method!r}"
        )
    tap_type = cfg.get("type", "")
    if tap_type not in SUPPORTED_TAP_TYPES:
        raise ValueError(f"unsupported tap type {tap_type!r}")
    module = SUPPORTED_TAP_TYPES[tap_type]
    conn = cfg.get("db_conn", {}) or {}
    spec: dict[str, Any] = {
        "module": module,
        "method": method,
        "table": f"{source_schema}.{table['table_name']}",
    }
    if module == "jdbc":
        spec["function"] = {
            "LOG_BASED": "incremental_reader",  # binlog/WAL tail feeds the
            # stream path; the JDBC reader serves its initial snapshot
            "INCREMENTAL": "incremental_reader",
            "FULL_TABLE": "snapshot_reader",
        }[method]
        spec["kwargs"] = {
            "url": "jdbc:%s://%s:%s/%s"
            % (
                "mysql" if tap_type == "tap-mysql" else "postgresql",
                conn.get("host", ""),
                conn.get("port", ""),
                conn.get("dbname", ""),
            ),
            "fetchsize": int(conn.get("export_batch_rows", 50000)),
        }
        if method == "INCREMENTAL":
            spec["kwargs"]["replication_key"] = table.get("replication_key")
    elif module == "kafka":
        spec["function"] = "kafka_stream_reader"
        spec["kwargs"] = {
            "bootstrap_servers": conn.get("bootstrap_servers", ""),
            "topic": conn.get("topic", ""),
        }
    elif module == "files":
        spec["function"] = "read_csv_batch"
        spec["kwargs"] = {
            "bucket": conn.get("bucket", ""),
            "prefix": conn.get("s3_key_prefix", ""),
        }
    elif module == "mongo":
        spec["function"] = "decode_change_stream"
        spec["kwargs"] = {}
    return spec


def build_project(
    spark: SparkSession,
    tap_config: dict | str,
    *,
    lake_root: str,
    schema_provider,
    num_buckets: int = 256,
    soft_delete: bool = False,
    max_concurrency: int = 4,
) -> dict:
    """Wire a whole tap project:

    - one :class:`LakeTable` per ``schemas[].tables[]`` entry at
      ``lake_root/<target_schema>/<table_name>`` (created if absent,
      with ``key_properties`` from the table entry or, failing that,
      from ``schema_provider``);
    - the YAML ``transformations`` compiled per stream (T3-T7 DSL);
    - a :class:`MultiStreamPipeline` keyed by the reference's
      ``<source_schema>-<table_name>`` stream ids;
    - a reader spec per table (see :func:`reader_spec`).

    ``schema_provider(stream_id) -> (StructType, key_cols)`` supplies
    the payload schema — from catalog discovery
    (:mod:`pipelinewise_spark.singer.catalog`) in a live deployment, or
    a static mapping in tests. Returns
    ``{"pipeline", "tables", "readers", "batch_size_rows"}``."""
    cfg = (
        tap_config
        if isinstance(tap_config, dict)
        else load_tap_yaml(tap_config)
    )
    pipelines: dict[str, CdcPipeline] = {}
    tables: dict[str, LakeTable] = {}
    readers: dict[str, dict] = {}
    for schema in cfg["schemas"]:
        src = schema["source_schema"]
        tgt = schema.get("target_schema", src)
        for table in schema["tables"]:
            stream = _stream_id(src, table)
            struct, keys = schema_provider(stream)
            keys = table.get("key_properties", keys)
            path = os.path.join(lake_root, tgt, table["table_name"])
            if LakeTable.exists(path):
                lt = LakeTable(spark, path)
            else:
                lt = LakeTable.create(
                    spark, path, struct, keys, num_buckets=num_buckets,
                    properties={"soft_delete": soft_delete}
                    if soft_delete
                    else None,
                )
            transform = None
            tconf = _transform_config(table)
            if tconf:
                fn = compile_transformations(tconf)
                transform = fn
            pipelines[stream] = CdcPipeline(
                lt, stream=stream, transform=transform,
                soft_delete=soft_delete or None,
            )
            tables[stream] = lt
            readers[stream] = reader_spec(cfg, src, table)
    return {
        "pipeline": MultiStreamPipeline(
            pipelines, max_concurrency=max_concurrency
        ),
        "tables": tables,
        "readers": readers,
        "batch_size_rows": int(cfg.get("batch_size_rows", 20000)),
    }
