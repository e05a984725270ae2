"""SparkSession factory with the engine's standard configuration.

Scale posture (100 TB / 1000-executor target, tested on local[N]):
- AQE on (runtime coalesce, skew-join handling for the fetch-sim joins).
- Arrow execution on for the three pandas-UDF stages; batch size tuned so a
  batch of URLs (~100 bytes each) stays ~8-16 MiB.
- shuffle.partitions defaults to the core count locally; on a real cluster
  it is set to match the frontier/url_seen bucket count so storage
  partitioning lines up with shuffle partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # match local parallelism; on a cluster, set to the table bucket count
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = 32 if inner == "*" else int(inner)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's parallelismFirst coalesces shuffles down to ~defaultParallelism
        # partitions; at local[8] that meant 9-task stages whose last task ran
        # alone for seconds (1.125 waves — event-log measured ~60% idle cores).
        # Pinning the target holds the post-coalesce plan shape CONSTANT across
        # cluster sizes (the bench's N→4N posture: partitioning fixed, cores
        # the only variable) and packs small waves instead of straggler tails.
        .config("spark.default.parallelism", "32")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: this single JVM hosts driver + all executor threads,
        # so the budget covers checkpoint blocks (pinned, non-evictable)
        # AND every concurrent task's sort/hash execution memory — 8g OOM'd
        # once admission checkpoints its bloom-flagged stream per round
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # no stage-progress bars on stderr: the bench's machine-readable
        # stdout tail must never be buried under console-progress noise
        # (the round-3 driver artifact captured only progress bars)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # FAIR task scheduling: the round plan submits jobs from several
        # driver threads (stager writes, broadcast-exchange builds, the
        # main materialization chain). Under FIFO a tiny broadcast-build
        # scan queues behind a staged write's long task wave and the main
        # chain stalls on it (event-log measured: 3-6 s walls on <2 s of
        # task time); FAIR gives every concurrent job a slot share so the
        # critical path never starves behind background writes.
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
