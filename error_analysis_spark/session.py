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
        # Round 11 note: preferSortMergeJoin=false +
        # maxShuffledHashJoinLocalMapThreshold=256m (guide §3.1/§9) was
        # TRIED and REVERTED — a controlled same-box A/B showed it
        # consistently 2-3×-ing several join-shaped queries
        # (so3_full_outer 0.22→0.80 s, sketch_grouped_quantiles
        # 0.52→1.09 s, a5_mean_variogram 0.98→2.44 s min-of-3 warm)
        # with no reproducible win on the tpch packs at bench scale.
        # Measurement over theory (guide §1.2: config comes last).
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
