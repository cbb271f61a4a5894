"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
container — marked clearly below); everything Spark-side is real and
tested: schema contract, batch iteration shape, partition sizing, and the
deterministic fake feature extractor used to validate the plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

#: Canonical multimodal asset schema: payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def real_decode(payload: bytes, mime: str):  # pragma: no cover - stub
    """STUB: the actual image/audio decode (PIL/librosa/ffmpeg) is not
    available in this container. At deployment this returns the decoded
    ndarray; the Spark plumbing around it is identical."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg — not present in sandbox"
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: normalized bytes of the
    sha256 digest. Lets every Spark-side contract be tested for real."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(assets: DataFrame, *, dim: int = 8, use_real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas`` — the decode
    runs once per Arrow batch (thousands of rows), not per row. Output is
    FEATURE_SCHEMA; partitioning is preserved (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_real_decode:  # pragma: no cover - stub path
                feats = [real_decode(p, m) for p, m in zip(payloads, pdf["mime"])]
            else:
                feats = [_fake_features(p, dim) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0).astype("int64"),
                    "content_hash": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("offset", LongType()),
        StructField("n_bytes", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(assets: DataFrame, *, frame_size: int = 32) -> DataFrame:
    """Frame sampling over opaque media payloads: each asset expands to
    ``ceil(len/frame_size)`` frames of (offset, n_bytes, sha256-of-slice).
    Arrow-batched ``mapInPandas`` — cardinality-changing, one pass, no
    shuffle; at deployment the byte-slice step is the ffmpeg/PIL frame
    decode (stubbed here like :func:`real_decode`, the slicing and hashing
    plumbing is real and oracle-checkable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "kind", "frame_idx", "offset", "n_bytes", "frame_hash"
            )}
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                data = bytes(payload or b"")
                for i, off in enumerate(range(0, max(len(data), 1), frame_size)):
                    chunk = data[off:off + frame_size]
                    out["asset_id"].append(aid)
                    out["kind"].append(kind)
                    out["frame_idx"].append(i)
                    out["offset"].append(off)
                    out["n_bytes"].append(len(chunk))
                    out["frame_hash"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, FRAME_SCHEMA)


def features_hex_str(content_hash, dim: int = 8):
    """Contract-surface serialization of the deterministic fake features:
    byte i of the sha256 digest / 255, formatted ``%.6f`` and comma-joined.
    Derived from the hex digest with integer math (``conv`` base-16) so the
    value is engine-portable — the DuckDB oracle reproduces it exactly,
    with no float32 representation drift (the typed ``features`` array
    stays float32 and is validated in pytest instead)."""
    parts = []
    for i in range(dim):
        byte = F.conv(F.substring(content_hash, 2 * i + 1, 2), 16, 10).cast("int")
        parts.append(F.format_string("%.6f", byte / F.lit(255.0)))
    return F.concat_ws(",", *parts)


def generate_fake_assets(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic binary assets for testing the plumbing."""
    df = spark.range(0, n, 1, partitions)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col("id").alias("asset_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-"), kind).alias("mime"),
        F.encode(
            F.concat(F.lit("blob-"), F.col("id").cast("string"),
                     F.repeat(F.lit("x"), (F.pmod(F.col("id"), F.lit(7)) * 13).cast("int"))),
            "utf-8",
        ).cast("binary").alias("payload"),
        (F.pmod(F.col("id"), F.lit(640)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(480)) + 1).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(9000)) + 1).cast("int").alias("duration_ms"),
    )
