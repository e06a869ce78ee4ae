"""SparkSession factory with scale-aware defaults.

Local mode is the test harness; the config keys chosen here are the ones
that matter identically on a 1000-executor cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), shuffle
partition count sized to parallelism, Arrow enabled for the pandas-UDF
slow path, and a UTC session timezone so date arithmetic is stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "error_analysis_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Round 11 (guide §3.1/§9): let the planner pick shuffled-hash
        # over sort-merge when its size conditions hold, and let AQE
        # rewrite SMJ→SHJ at runtime when every post-shuffle partition
        # is small — skips both sorts of big-big joins (the tpch pack
        # lineitem⋈orders shapes). Identical join semantics; the 256 MB
        # per-partition bound keeps the hash build safely in task
        # memory at any scale (partition sizing, not core count,
        # governs it — valid on a cluster, not a local[32] trick).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                "256m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata writes TIMESTAMP(NANOS) parquet; read as long + convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
