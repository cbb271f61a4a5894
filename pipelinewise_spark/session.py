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
        # HotSpot refuses to JIT-compile methods past 8000 bytecodes
        # (DontCompileHugeMethods), so a whole-stage-codegen function
        # bigger than that runs in the BYTECODE INTERPRETER — measured
        # 4x slower than Spark's own interpreted-expression fallback on
        # the wide unrolled dot-product/minhash projections (ab bench,
        # OPTIMIZATION_r08.md). Capping at the JIT limit makes Spark
        # fall back per-stage exactly when JIT would have bailed.
        # Host-JVM property, not a local[32] tune.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def warm_python_workers(
    spark: SparkSession, *, data_source: bool = False
) -> None:
    """Pre-spawn the Python worker pool before latency-sensitive work.

    The first Python-executed stage of a session (Python Data Source
    reads, Arrow UDFs) pays worker-process spawn + pyarrow/pandas import
    once per core — measured ~7 s at local[32] regardless of data size
    (BENCH.md round 5: a 100-row change-feed drain cold = 6.99 s, the
    600k-row drain warm = 2.3 s). A long-running stream amortizes this
    to zero, but a bounded availableNow run eats it inside its first
    micro-batch; calling this first moves the one-off outside the
    measured/latency path. One tiny Arrow batch per core; workers are
    reused afterward (spark.python.worker.reuse defaults true).

    ``data_source=True`` additionally warms the Python Data Source read
    path, which keeps its OWN worker-module pool (pyspark.sql.worker.*
    plan/read modules) that the mapInArrow ping does not touch — the
    residual ~2 s first-drain premium measured in BENCH.md round 5. It
    drains a throwaway 1-row LakeTable through the real ``laketable``
    stream source; opt-in because it is only worth ~2 s to jobs whose
    first real work IS a bounded feed drain (jobs/run_feed.py sets
    it)."""
    import pyarrow  # noqa: F401  (fail here, loudly, not in executors)

    sc = spark.sparkContext
    n = max(int(sc.defaultParallelism), 1)

    def _touch(it):
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        yield from it

    spark.range(n, numPartitions=n).mapInArrow(
        _touch, "id long"
    ).write.format("noop").mode("overwrite").save()
    if data_source:
        _warm_data_source_pool(spark)


def _warm_data_source_pool(spark: SparkSession) -> None:
    import os as _os
    import shutil
    import tempfile

    from pyspark.sql.types import LongType, StructField, StructType

    from pipelinewise_spark.lake.stream_source import LakeTableStreamSource
    from pipelinewise_spark.lake.table import LakeTable

    spark.dataSource.register(LakeTableStreamSource)
    base = tempfile.mkdtemp(prefix="pw-warm-ds-")
    try:
        t = LakeTable.create(
            spark, _os.path.join(base, "t"),
            StructType([StructField("id", LongType())]), ["id"],
            num_buckets=1,
        )
        t.overwrite(spark.range(1))
        q = (
            spark.readStream.format("laketable")
            .option("path", t.path).option("startingVersion", 0).load()
            .writeStream.format("noop")
            .option("checkpointLocation", _os.path.join(base, "ck"))
            .trigger(availableNow=True).start()
        )
        if not q.awaitTermination(120):
            q.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)
