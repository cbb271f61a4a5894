"""S16 — catalog discovery: produce Singer catalog entries (streams +
JSON schemas + key metadata) from Spark-visible schemas.

The reference walks ``information_schema`` (``tap_mysql/discover_utils.py:
123-238``, ``tap_postgres/discovery_utils.py``) and emits a catalog whose
``metadata`` marks key properties, replication method, and per-column
selection. Here discovery sources are: a DataFrame schema, a LakeTable
manifest, or JDBC metadata (a zero-row pushdown query). The same catalog
shape drives stream selection and the SCHEMA messages the engine emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipelinewise_spark.lake.table import METADATA_COLS, LakeTable
from pipelinewise_spark.singer.schema import struct_to_jsonschema


def _entry(
    stream: str,
    json_schema: dict,
    key_properties: list[str],
    *,
    replication_method: str = "LOG_BASED",
    selected: bool = True,
) -> dict:
    cols = list(json_schema.get("properties", {}))
    return {
        "tap_stream_id": stream,
        "stream": stream,
        "schema": json_schema,
        "key_properties": key_properties,
        "metadata": [
            {
                "breadcrumb": [],
                "metadata": {
                    "selected": selected,
                    "replication-method": replication_method,
                    "table-key-properties": key_properties,
                },
            },
            *[
                {
                    "breadcrumb": ["properties", c],
                    "metadata": {
                        "selected": True,
                        "inclusion": "automatic" if c in key_properties else "available",
                    },
                }
                for c in cols
            ],
        ],
    }


def discover_dataframe(
    df: DataFrame, stream: str, key_properties: list[str], **kw
) -> dict:
    return _entry(stream, struct_to_jsonschema(df.schema), key_properties, **kw)


def discover_lake_table(table: LakeTable, stream: str, **kw) -> dict:
    payload = [f for f in table.logical_schema.fields if f.name not in METADATA_COLS]
    from pyspark.sql.types import StructType

    return _entry(
        stream,
        struct_to_jsonschema(StructType(payload)),
        table.key_cols,
        **kw,
    )


def discover_jdbc(
    spark: SparkSession, url: str, table: str, key_properties: list[str],
    *, properties: dict[str, str] | None = None, **kw,
) -> dict:
    """Schema probe via a zero-row pushdown — the information_schema walk
    without a dialect-specific catalog query."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", f"SELECT * FROM {table} WHERE 1=0")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return discover_dataframe(reader.load(), table, key_properties, **kw)


def catalog(entries: list[dict]) -> dict:
    return {"streams": entries}


def selected_columns(entry: dict) -> list[str]:
    """T1 — projection resolution: only selected/automatic columns are
    extracted (``discover_utils.py:325-404``)."""
    out = []
    for m in entry["metadata"]:
        if m["breadcrumb"] and m["breadcrumb"][0] == "properties":
            md = m["metadata"]
            if md.get("selected") or md.get("inclusion") == "automatic":
                out.append(m["breadcrumb"][1])
    return out
