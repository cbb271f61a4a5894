"""Deterministic sampling + shard assignment for training-data export.

The last stage of a 100-TB corpus pipeline (after dedup/quality
filtering) is SELECTING a subset and WRITING it as stable shards. Both
must be deterministic functions of the row — not `rand()` — so a re-run
over the same corpus reproduces byte-identical shards (resumable
exports, A/B-able data recipes) and no driver-side shuffle/sort is
needed at any scale:

- :func:`deterministic_sample` — keep a row iff a uniform hash of its
  id lands under the rate. Per-stratum rates (e.g. per language)
  express mixture recipes. One pure-expression filter: no shuffle, no
  state, exactly reproducible.
- :func:`shard_assignment` — shard = hash(id) mod n_shards plus a
  stable within-shard sort key: every executor can write its shard
  files independently, and the shard ↔ row mapping survives re-runs
  (contrast `repartition(n)` whose round-robin depends on input
  partitioning).

Hashes are md5-derived (first 15 hex nibbles → BIGINT via conv) — the
same engine-portability trick as the MinHash/SimHash operators, so any
SQL engine reproduces the exact sample/shards (DuckDB oracle:
``("0x" || substr(md5(x), 1, 15))::BIGINT``; 60 bits keeps the value
positive in both engines).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 60-bit hash space (15 hex nibbles): positive in a signed 64-bit long
#: in both Spark and DuckDB, so thresholds/mod agree exactly.
HASH_SPACE = 1 << 60


def _threshold(rate: float) -> int:
    """``floor(rate · 2⁶⁰)`` computed in EXACT decimal arithmetic — a
    binary-float multiply can land one ulp off the value a SQL engine
    computes from the decimal literal (0.2·2⁶⁰ differs by 13 in float64),
    which would make the keep/drop boundary engine-dependent. Matches
    the oracle's ``CAST(floor(rate * 2^60) AS BIGINT)`` exactly."""
    return int(Decimal(str(rate)) * HASH_SPACE)


def _hash60(col: Column, salt: str) -> Column:
    """Uniform 60-bit integer from md5(salt|value) — engine-portable.
    NULL ids hash to NULL (``concat`` propagates, matching SQL's
    ``md5('salt|' || id)``): a NULL-id row is DROPPED by the sample
    filter and gets NULL shard/sort_key, identically in both engines —
    never silently collapsed onto one shared hash."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    rate: float | dict[str, float],
    *,
    stratify_col: str | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Reproducible Bernoulli sample: keep iff hash60(id) < rate·2⁶⁰.

    ``rate`` may be a single float, or (with ``stratify_col``) a
    {stratum: rate} dict expressing a mixture recipe — unlisted strata
    drop (rate 0). Changing ``salt`` draws an independent sample; the
    same salt always reproduces the same rows, which is what makes
    corpus recipes diffable and exports resumable. Pure expression
    filter — Catalyst pushes it to the scan; no shuffle at any scale."""
    h = _hash60(F.col(id_col), salt)
    if isinstance(rate, dict):
        if stratify_col is None:
            raise ValueError("per-stratum rates require stratify_col")
        # chained CASE: per-stratum threshold, default 0 = drop
        thr = None
        for stratum, r in sorted(rate.items()):
            lit = F.lit(_threshold(r)).cast("long")
            cond = F.col(stratify_col) == stratum
            thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
        thr = thr.otherwise(F.lit(0).cast("long"))
    else:
        thr = F.lit(_threshold(float(rate))).cast("long")
    return df.where(h < thr)


def shard_assignment(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    *,
    salt: str = "shard",
) -> DataFrame:
    """Stable shard id + within-shard ordering key for training export:
    ``shard = hash60(id) % n_shards``, ``sort_key = hash60(id)`` (a
    deterministic corpus shuffle — hash order decorrelates neighboring
    source rows, the usual requirement before sequential training
    reads). Downstream: ``.repartition(n_shards, "shard")`` +
    ``sortWithinPartitions("sort_key")`` + partitioned write gives
    byte-stable shards with exactly one shuffle."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = _hash60(F.col(id_col), salt)
    return df.withColumn("sort_key", h).withColumn(
        "shard", F.pmod(h, F.lit(n_shards)).cast("int")
    )
