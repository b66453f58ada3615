"""SparkSession factory with scale-oriented defaults.

Tuned for local[N] testing but every knob is the one you'd set on a
1000-executor cluster: AQE on (runtime re-plan + skew-join splitting),
explicit shuffle partitioning, Arrow for every pandas-UDF exchange,
broadcast threshold for the small dimension tables (dns / denylist /
robots all broadcast).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def total_cores(master: str) -> int:
    """Advertised parallelism of a master string; 0 = unknown (local[*]).

    local[N] -> N; local[N,F] -> N (F is task maxFailures, NOT a core
    multiplier); local-cluster[E,C,M] -> E*C; anything else -> 0.
    """
    if "[" not in master:
        return 0
    inner = master[master.index("[") + 1 : -1]
    if master.startswith("local-cluster") and "," in inner:
        execs, cores = inner.split(",")[:2]
        return int(execs) * int(cores)
    threads = inner.split(",")[0]
    return 0 if threads == "*" else int(threads)


def get_spark(
    app_name: str = "crawler-core-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # shuffle partitions sized to the parallelism level; at cluster scale this
    # would be ~2-3x total cores (AQE coalesces the excess at runtime).
    if shuffle_partitions is None:
        n = total_cores(master)
        shuffle_partitions = max(8, 2 * n) if n else 64

    # one BLAS thread per python worker: N workers x M BLAS spin-threads
    # otherwise oversubscribe the box into a context-switch storm (measured
    # as 30% sys time with idle CPUs during pandas-UDF stages).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # sized for BINARY image rows (~50 KB each): batch bytes scale with
        # row width × batch size × concurrent tasks, so wide-row tables need
        # small batches or every core OOMs the shared heap at once.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # binary image bytes must never inflate shuffle buffers; cap file split
        # size so a 100TB scan yields right-sized tasks.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local"):
        # single-box: no data locality to wait for — a nonzero locality
        # wait only adds scheduling stalls between the many small driver
        # jobs. On a real cluster keep the default (HDFS/shuffle locality).
        b = b.config("spark.locality.wait", "0s")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
