"""Deterministic, distributed change-event generator (FIXTURES.md F2-F4).

Everything is a pure column expression over ``spark.range`` ids, so the
generated stream is identical regardless of parallelism / partitioning —
the property the scaling benchmark (local[8] vs local[32] on the SAME
input) depends on. Seeded xxhash64 mixing replaces ``rand()`` (which is
partition-dependent).

Shape knobs mirror the fixture spec: insert/update/delete mix,
duplicate-replay fraction (exactly-once test), Zipf-ish hot-key skew
(``skew_alpha`` > 1 concentrates update traffic on low conv ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _mix(seed: int, tag: str, col):
    """Deterministic pseudo-random long in [0, 2^63) from (seed, tag, id)."""
    return F.abs(F.xxhash64(F.lit(seed), F.lit(tag), col))


def _conv_id(conv_idx):
    return F.concat(F.lit("conv-"), F.lpad(conv_idx.cast("string"), 8, "0"))


def _payload(conv_idx, turn_idx, lsn):
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.pmod(turn_idx, F.lit(4)) + 1).cast("int"),
    )
    return {
        "conv_id": _conv_id(conv_idx),
        "turn_idx": turn_idx.cast("int"),
        "role": role,
        "text": F.concat_ws(
            "-", F.lit("text"), conv_idx.cast("string"), turn_idx.cast("string"),
            F.lit("v"), lsn.cast("string"),
        ),
        "tool": F.when(
            role == "tool",
            F.concat(F.lit("tool_"), F.pmod(turn_idx, F.lit(7)).cast("string")),
        ).otherwise(F.lit(None).cast("string")),
        "ts": F.timestamp_seconds(F.lit(BASE_EPOCH) + lsn),
    }


def generate_change_events(
    spark: SparkSession,
    *,
    n_convs: int = 100,
    turns_per_conv: int = 10,
    n_updates: int = 500,
    delete_pct: int = 5,
    dup_every: int = 0,
    skew_alpha: float = 1.0,
    seed: int = 42,
    stream: str = "public-transcripts",
    num_partitions: int | None = None,
) -> DataFrame:
    """INSERT phase (one per (conv, turn), lsn 1..N) followed by an
    UPDATE/DELETE phase over existing keys (lsn N+1..N+n_updates).

    ``dup_every=k`` re-emits every k-th phase-2 event verbatim (same lsn)
    — the at-least-once replay the dedup/merge must absorb.
    ``skew_alpha>1`` skews phase-2 conv choice toward low conv ids
    (u^alpha transform of a uniform hash).
    """
    n_inserts = n_convs * turns_per_conv
    ins_ids = spark.range(0, n_inserts, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    ins = ins_ids.select(
        (i + 1).alias("lsn"),
        F.lit("I").alias("op"),
        F.lit(stream).alias("stream"),
        *_as_cols(
            _payload(
                F.floor(i / F.lit(turns_per_conv)),
                F.pmod(i, F.lit(turns_per_conv)),
                i + 1,
            )
        ),
    )

    upd_ids = spark.range(0, n_updates, 1, num_partitions or spark.sparkContext.defaultParallelism)
    u = F.col("id")
    uniform = (_mix(seed, "conv", u) % F.lit(1_000_000)) / F.lit(1_000_000.0)
    conv_idx = F.least(
        F.floor(F.pow(uniform, F.lit(float(skew_alpha))) * F.lit(n_convs)),
        F.lit(n_convs - 1),
    )
    turn_idx = _mix(seed, "turn", u) % F.lit(turns_per_conv)
    lsn = F.lit(n_inserts) + u + 1
    op = F.when(_mix(seed, "op", u) % 100 < delete_pct, F.lit("D")).otherwise(F.lit("U"))
    upd = upd_ids.select(
        lsn.alias("lsn"),
        op.alias("op"),
        F.lit(stream).alias("stream"),
        *_as_cols(_payload(conv_idx, turn_idx, lsn)),
    )
    events = ins.unionByName(upd)
    if dup_every and dup_every > 0:
        dups = upd.where(F.pmod(F.col("lsn"), F.lit(dup_every)) == 0)
        events = events.unionByName(dups)
    return events.withColumn("time_extracted", F.col("ts"))


def _as_cols(payload: dict) -> list:
    return [c.alias(n) for n, c in payload.items()]
