"""SparkSession factory with the engine's required settings.

UTC session timezone (the reference canonicalizes all datetimes to UTC,
``tap-mysql .../binlog.py:208-219``), AQE on (runtime skew-join / partition
coalescing — the reference has no skew handling at all, SURVEY §4), and
Arrow enabled for the vectorized pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pipelinewise-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if shuffle_partitions is None:
        # local[N] → N shuffle partitions; for cluster masters (yarn,
        # spark://, k8s) fall back to Spark's default — size it to ~2-3x
        # total cores / target partition bytes via explicit argument.
        inner = master.split("[")[-1].rstrip("]") if master.startswith("local") else ""
        try:
            shuffle_partitions = max(int(inner), 1) if inner not in ("*", "") else 32
        except ValueError:
            shuffle_partitions = 32
        if not master.startswith("local"):
            shuffle_partitions = 200
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT96 (the legacy default) writes NO footer statistics for
        # timestamps — it blocks both Spark's own ts predicate pushdown
        # and the manifest's per-file bounds (LakeTable file skipping)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # shuffle scratch on RAM-backed storage when available — the
        # single-disk /tmp of this sandbox serializes shuffle writes; on a
        # real cluster this is the executors' local NVMe
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_GRAFT_LOCAL_DIR",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.parallelPartitionDiscovery.parallelism", "32")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
