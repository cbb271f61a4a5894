"""Skew handling: salted repartitioning for hot keys.

The engine's primary skew defenses are structural — the LSN dedup is a
``max_by`` hash aggregate whose map-side partial aggregation collapses
hot-key traffic before any shuffle, and the merge join runs under AQE
skew-join splitting (``session.py``). Salting covers the remaining case:
a *placement-skewed* write, where bucketing by a coarse column
(``bucket_col='conv_id'`` read-locality layout) sends one hot
conversation's rows to a single bucket → a single writer task. Salting
the repartition key spreads one bucket across up to ``salt`` tasks
(north rule: "skew-aware repartitioning of hot conv_id keys").

The salt must be DETERMINISTIC (a hash of the row, not a random or
partition-id value) so stage retries re-produce identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_expr(cols: list[Column | str], salt: int) -> Column:
    """Deterministic salt in [0, salt): a row-content hash. Seeded with a
    constant offset so it decorrelates from Spark's own HashPartitioning
    of the same columns."""
    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.hash(F.lit(0x5A17), *exprs), F.lit(salt))


def salted_repartition(
    df: DataFrame,
    key_cols: list[Column | str],
    num_partitions: int,
    *,
    salt: int = 4,
    salt_cols: list[Column | str] | None = None,
) -> DataFrame:
    """Repartition by (key, salt): rows of one hot key spread over up to
    ``salt`` partitions instead of one. Use when the downstream operation
    is per-row (writes, maps) — NOT before an aggregation that needs all
    rows of a key together (there, re-aggregate after de-salting)."""
    s = salt_expr(salt_cols if salt_cols is not None else key_cols, salt)
    exprs = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return df.repartition(num_partitions, *exprs, s)
