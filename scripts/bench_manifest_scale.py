"""Manifest scale bound (VERDICT r3 item 5): measure commit wall time,
file-prune time, and load time on a synthetic manifest of >=100k files —
the file count a ~100 TB table with 4096 buckets x ~25 files/bucket
carries. Run: python scripts/bench_manifest_scale.py [n_files]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark.lake.table import (  # noqa: E402
    MANIFEST_DIR,
    LakeTable,
    _write_manifest,
)


def synth_manifest(base: dict, n_files: int, n_buckets: int = 4096) -> dict:
    m = dict(base)
    buckets: dict[str, list[str]] = {str(b): [] for b in range(n_buckets)}
    fstats = {}
    per = max(1, -(-n_files // n_buckets))
    i = 0
    for b in range(n_buckets):
        for j in range(per):
            rel = f"data/b{b:05d}-v{j:08d}-synthetictoken{i:09d}-0.parquet"
            buckets[str(b)].append(rel)
            fstats[rel] = {
                "_lsn": [i * 1000, i * 1000 + 999],
                "conv_id": [f"conv-{i:012d}", f"conv-{i+50:012d}"],
                "turn_idx": [0, 511],
                "ts": [1704067200000000 + i, 1704067200000000 + i + 10**9],
            }
            i += 1
    m.update(version=1, buckets=buckets, deltas={}, file_stats=fstats,
             summary={"added_files": [], "replaced_buckets": []})
    return m


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    from pipelinewise_spark.session import get_spark

    spark = get_spark(master="local[2]", shuffle_partitions=2)
    root = tempfile.mkdtemp(prefix="manifest-scale-")
    schema = StructType([
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
        StructField("_pad", LongType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(root, "t"), schema,
        ["conv_id", "turn_idx"], num_buckets=4096,
    )
    m = synth_manifest(t.manifest, n_files)

    t0 = time.perf_counter()
    _write_manifest(t.path, m)
    w0 = time.perf_counter() - t0
    sz = os.path.getsize(
        os.path.join(t.path, MANIFEST_DIR, "v%012d.json" % 1)
    )

    t0 = time.perf_counter()
    t = LakeTable(spark, t.path)
    load = time.perf_counter() - t0
    assert sum(len(v) for v in t.manifest["buckets"].values()) >= n_files

    # commit wall: ONE small merge-shaped commit against the big manifest
    # (a real parquet file so footer-stats lineage runs like production)
    import pyarrow as pa
    import pyarrow.parquet as pq

    newrel = "data/b00007-v99999999-newfiletoken-0.parquet"
    pq.write_table(
        pa.table({"conv_id": ["c"], "turn_idx": [1], "_lsn": [5]}),
        os.path.join(t.path, newrel),
    )
    t0 = time.perf_counter()
    t.commit(
        added={"7": [newrel]},
        replaced_buckets=[7],
        batch_id=123,
        summary={"operation": "merge"},
    )
    commit_s = time.perf_counter() - t0  # includes flat→segmented split

    # steady-state segmented commit: a 50-bucket merge-shaped commit
    added = {}
    for b in range(50):
        rel = f"data/b{b:05d}-v88888888-steadytoken{b:04d}-0.parquet"
        os.link(os.path.join(t.path, newrel), os.path.join(t.path, rel))
        added[str(b)] = [rel]
    t0 = time.perf_counter()
    t.commit(
        added=added,
        replaced_buckets=list(range(50)),
        batch_id=124,
        summary={"operation": "merge"},
    )
    commit_steady_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    t = LakeTable(spark, t.path)
    load_seg = time.perf_counter() - t0

    # prune wall: stats_filter selection over every file (driver loop)
    norm = {"_lsn": (99_000_000, 99_500_000)}
    t0 = time.perf_counter()
    kept = [
        rel
        for fl in t.manifest["buckets"].values()
        for rel in fl
        if t._stats_keep(t.manifest, rel, norm)
    ]
    prune_s = time.perf_counter() - t0

    out = {
        "n_files": n_files,
        "manifest_bytes_flat": sz,
        "write_full_flat_s": round(w0, 3),
        "load_flat_s": round(load, 3),
        "commit_transition_s": round(commit_s, 3),
        "commit_segmented_s": round(commit_steady_s, 3),
        "load_segmented_s": round(load_seg, 3),
        "prune_s": round(prune_s, 3),
        "kept_files": len(kept),
        "segments": len(t.manifest.get("segments", {})),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
