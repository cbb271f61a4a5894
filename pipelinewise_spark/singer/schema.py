"""JSON Schema (Draft-7, Singer flavor) ↔ Spark StructType mapping.

Reproduces the reference's target-side type mapping
(``target_postgres/db_sync.py:40-76``, ``target_snowflake/db_sync.py:
75-101``): object/array → JSON-serialized text (the engine keeps
semi-structured payloads as JSON strings and projects with
``get_json_object``/``from_json``), ``format: date-time`` → timestamp,
integer sized by its ``maximum`` bound, ``multipleOf`` decimals, booleans,
default string. And the tap-side reverse (``tap_mysql/discover_utils.py:
241-300``) for emitting SCHEMA messages.
"""

from __future__ import annotations

import decimal
import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

INT32_MAX = 2**31 - 1


def jsonschema_to_spark_type(prop: dict) -> DataType:
    types = prop.get("type", [])
    if isinstance(types, str):
        types = [types]
    types = [t for t in types if t != "null"]
    fmt = prop.get("format")
    if "array" in types:
        # typed-items arrays keep their element type (reference maps 20+
        # Postgres array types to typed-items JSON schemas,
        # tap_postgres/discovery_utils.py:253-351); item-less arrays fall
        # back to a JSON string like objects
        items = prop.get("items")
        if isinstance(items, dict) and items.get("type"):
            return ArrayType(jsonschema_to_spark_type(items))
        return StringType()
    if "object" in types:
        return StringType()  # JSON-serialized (reference: jsonb/variant)
    if fmt in ("date-time", "date", "time"):
        # reference maps date-time→timestamp; date is canonicalized to
        # T00:00:00+00:00 on the tap side (binlog.py:221-222)
        return TimestampType() if fmt != "time" else StringType()
    if "integer" in types:
        mx = prop.get("maximum")
        if mx is not None and abs(int(mx)) <= INT32_MAX and "minimum" in prop:
            return IntegerType()
        return LongType()
    if "number" in types:
        mof = prop.get("multipleOf")
        if mof is not None:
            scale = max(0, -decimal.Decimal(str(mof)).as_tuple().exponent)
            return DecimalType(38, min(scale, 37))
        return DoubleType()
    if "boolean" in types:
        return BooleanType()
    return StringType()


def spark_type_to_jsonschema(dt: DataType) -> dict:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int"):
        return {"type": ["null", "integer"], "minimum": -(2**31), "maximum": INT32_MAX}
    if s == "bigint":
        return {"type": ["null", "integer"]}
    if s in ("float", "double"):
        return {"type": ["null", "number"]}
    if s.startswith("decimal"):
        scale = dt.scale  # type: ignore[attr-defined]
        return {"type": ["null", "number"], "multipleOf": float(10**-scale)}
    if s == "boolean":
        return {"type": ["null", "boolean"]}
    if s in ("timestamp", "timestamp_ntz", "date"):
        return {"type": ["null", "string"], "format": "date-time"}
    if isinstance(dt, ArrayType):
        return {
            "type": ["null", "array"],
            "items": spark_type_to_jsonschema(dt.elementType),
        }
    if s.startswith(("map", "struct")):
        return {"type": ["null", "object"]}
    return {"type": ["null", "string"]}


def jsonschema_to_struct(schema: dict) -> StructType:
    return StructType(
        [
            StructField(name, jsonschema_to_spark_type(prop), True)
            for name, prop in schema.get("properties", {}).items()
        ]
    )


def struct_to_jsonschema(st: StructType) -> dict:
    return {
        "type": "object",
        "properties": {f.name: spark_type_to_jsonschema(f.dataType) for f in st.fields},
    }


def type_json(dt: DataType) -> Any:
    return json.loads(dt.json())
