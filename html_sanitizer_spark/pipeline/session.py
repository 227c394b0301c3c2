"""SparkSession factory with the engine's preferred configs.

Tuned for the sanitize workload: Arrow transport on, 10k records/batch
with a byte-cap guard (HTML strings are fat rows — mega-span batches are
bounded by ``maxBytesPerBatch`` directly rather than by an artificially
small record count), AQE on for post-shuffle coalescing and skew
handling. On a real cluster the same settings apply; only ``master`` /
executor sizing differ (shipped via spark-submit --py-files).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "html-sanitizer-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    executors: int | None = None,
    executor_cores: int = 2,
    executor_mem_mb: int = 2048,
) -> SparkSession:
    """``executors=N`` switches from local[...] threads to
    ``local-cluster[N, executor_cores, executor_mem_mb]`` — N REAL executor
    JVMs (own heap, own GC, own Python workers) talking to the driver over
    the block/shuffle services, the closest single-host proxy to a
    multi-executor cluster and the shape the N->4N executor scaling
    evidence runs on (bench.py --scaling-executors)."""
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if executors is not None:
        master = f"local-cluster[{executors},{executor_cores},{executor_mem_mb}]"
        parallelism = executors * executor_cores
    else:
        master = f"local[{parallelism}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 2)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # pin event-time semantics: window()/date_trunc alignment must not
        # depend on the host's JVM timezone (and the DuckDB oracles replay
        # timestamps as naive UTC)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r08 (guide §4.2): 10k records/batch amortizes the per-batch
        # Arrow<->pandas hop — measured 2.5x on the exploded sanitize leg
        # vs the old 2048 — while maxBytesPerBatch (Spark 4) is the DIRECT
        # memory guard the small record cap used to approximate: a batch
        # of mega-spans is cut off by bytes long before 10k records. Both
        # env-overridable for corpora with different row-size profiles.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"))
        .config("spark.sql.execution.arrow.maxBytesPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH_BYTES",
                               str(32 * 1024 * 1024)))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if executors is not None:
        # leave headroom under the local-cluster worker's memory cap
        builder = builder.config(
            "spark.executor.memory", f"{max(executor_mem_mb - 512, 512)}m"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
