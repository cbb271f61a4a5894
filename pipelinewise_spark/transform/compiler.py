"""The transformation/masking DSL → Column-expression compiler.

Reference: the ``transform-field`` inline connector (``transform_field/
transform.py:106-188``) and its SQL-rendering twin for FastSync
(``fastsync/commons/transform_utils.py:89-390``). Same config shape, same
mask semantics, compiled once into built-in Spark expressions — the whole
stage stays inside whole-stage codegen, no Python in the hot path.

Supported ``type`` values (``transform_field/__init__.py:37-47``):
SET-NULL, HASH, HASH-SKIP-FIRST-<n>, MASK-DATE, MASK-NUMBER, MASK-HIDDEN,
MASK-STRING-SKIP-ENDS-<n>. Conditions (``transform.py:12-103``): a list of
``when`` clauses ANDed together, each ``{column, equals}`` /
``{column, regex_match}``, optionally targeting a JSON sub-field via
``field_path``.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mask_expr(kind: str, c: Column, col_name: str, data_type: str) -> Column:
    if kind == "SET-NULL":
        return F.lit(None).cast(data_type)
    if kind == "HASH":
        return F.sha2(c.cast("string"), 256)
    if kind.startswith("HASH-SKIP-FIRST-"):
        # reference keeps value[:n] (characters) but hashes
        # value.encode('utf-8')[n:] (a BYTE slice) — transform.py:165-168;
        # sha2 over the binary substring reproduces that byte-for-byte,
        # including multibyte codepoints straddling the boundary
        n = int(kind.rsplit("-", 1)[1])
        return F.concat(
            F.substring(c, 1, n),
            F.sha2(F.substring(F.encode(c, "utf-8"), n + 1, 2147483647), 256),
        )
    if kind == "MASK-DATE":
        # keep year + time-of-day, reset month/day to 1 (transform.py:171-172)
        return F.make_timestamp(
            F.year(c), F.lit(1), F.lit(1), F.hour(c), F.minute(c),
            F.second(c).cast("decimal(8,6)"),
        )
    if kind == "MASK-NUMBER":
        return F.lit(0).cast(data_type if data_type else "long")
    if kind == "MASK-HIDDEN":
        return F.lit("hidden")
    if kind.startswith("MASK-STRING-SKIP-ENDS-"):
        n = int(kind.rsplit("-", 1)[1])
        ln = F.length(c)
        return F.when(
            ln > 2 * n,
            F.concat(
                F.substring(c, 1, n),
                F.repeat(F.lit("*"), (ln - 2 * n).cast("int")),
                c.substr(ln - n + 1, F.lit(n)),
            ),
        ).otherwise(F.repeat(F.lit("*"), ln.cast("int")))
    raise ValueError(f"unknown transformation type {kind!r}")


def _condition_expr(when: list[dict]) -> Column | None:
    if not when:
        return None
    parts = []
    for clause in when:
        target = F.col(clause["column"])
        if clause.get("field_path"):
            target = F.get_json_object(
                target, "$." + clause["field_path"].replace("/", ".")
            )
        if "equals" in clause:
            parts.append(target.cast("string") == F.lit(str(clause["equals"])))
        elif "regex_match" in clause:
            parts.append(target.cast("string").rlike(clause["regex_match"]))
        else:
            raise ValueError(f"unsupported condition {clause}")
    return reduce(lambda a, b: a & b, parts)


def compile_transformations(
    config: list[dict],
    *,
    stream: str | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """``config`` is the transform-field list: each entry
    ``{field_id, type, tap_stream_name?, when?}``. Returns a DataFrame →
    DataFrame function usable as the pipeline's inline transform stage."""
    active = [
        t
        for t in config
        if stream is None
        or t.get("tap_stream_name") in (None, stream)
    ]

    def apply(df: DataFrame) -> DataFrame:
        out = df
        for t in active:
            name = t["field_id"]
            if name not in out.columns:
                continue
            dtype = dict(out.dtypes)[name]
            c = F.col(name)
            masked = _mask_expr(t["type"], c, name, dtype)
            cond = _condition_expr(t.get("when") or [])
            expr = (
                masked
                if cond is None
                else F.when(cond, masked).otherwise(c)
            )
            out = out.withColumn(name, expr)
        return out

    return apply
