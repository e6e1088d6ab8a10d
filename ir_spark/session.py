"""SparkSession factory with scale-aware defaults.

Local sandbox runs ``local[N]`` in one JVM; on a real cluster the same
settings apply (AQE, Arrow, UTC) and the master/memory flags come from
spark-submit.  Everything here is plain public Spark configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ir_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        # ~2x cores locally; on a cluster this is overridden per job
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("IR_SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # FAIR lets concurrent query jobs share executor slots instead
        # of queueing whole-job FIFO — the concurrent-serving path puts
        # each client thread in its own pool (see use_query_pool; pools
        # are fair-shared against each other).  Sequential workloads
        # see FIFO-identical behavior (single default pool).
        .config("spark.scheduler.mode",
                os.environ.get("IR_SPARK_SCHEDULER", "FAIR"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def use_query_pool(spark: SparkSession, pool: str) -> None:
    """Assign THIS thread's subsequent jobs to a named fair-scheduler
    pool.  Concurrent serving calls this once per client thread (each
    client in its own pool -> queries fair-share the executors instead
    of head-of-line blocking).  PySpark pins Python threads to JVM
    threads (PYSPARK_PIN_THREAD, default on), so the local property is
    correctly thread-scoped."""
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
