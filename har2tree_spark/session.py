"""SparkSession factory with scale-aware defaults.

Local-mode knobs are test-scale; the same settings (AQE, skew join,
shuffle partitions ~ cores, Arrow batching) are what we would set on a
1000-executor cluster, just with cluster-scaled values.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "har2tree_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: local[N] core count. Defaults to $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: defaults to parallelism (local rule: ~= cores; on a
    real cluster this scales with executor count — the N vs 4N scaling
    protocol in BENCH/BASELINE.md sets it proportionally per run).
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = parallelism

    builder = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Always use the single-file sort shuffle writer (r8, guide §2.1).
        # The bypass-merge writer kicks in whenever a shuffle has <=200
        # partitions and writes ONE FILE PER REDUCE PARTITION per map task
        # (then concatenates them): at 128 shuffle partitions that is 128
        # creates+appends per map task — measured on this host's ext4 as
        # ~400 ms/task of shuffle-write time and ~25 CPU-seconds per
        # 32-task stage for a 20 KB shuffle; with the sort writer the same
        # stage writes 13 ms. The sort writer is the scale-safe default
        # everywhere (one data + one index file per map task regardless of
        # reduce count); bypass only ever wins when partitions are few AND
        # file metadata ops are cheap. Env override for hosts where the
        # bypass path is profitable.
        .config(
            "spark.shuffle.sort.bypassMergeThreshold",
            os.environ.get("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "0"),
        )
        # Unix-domain sockets for the executor<->Python-worker channel
        # (Spark 4.1). The channel is host-local by construction on any
        # deployment (workers fork next to their executor), so skipping
        # the TCP handshake+loopback stack is scale-safe, not a local-mode
        # trick. Measured (r8): identity 32-task Arrow stage 0.295 s ->
        # 0.252 s best-of-6, every sample better; ~40-50 ms saved per
        # Python-stage job. Env override for hosts without UDS support.
        .config(
            "spark.python.unix.domain.socket.enabled",
            os.environ.get("SPARK_GRAFT_PYTHON_UDS", "true"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
