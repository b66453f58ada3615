"""Structured-Streaming view of the results log (A2 done-notifications).

The crawl engine itself deliberately uses self-scheduled micro-batches
with snapshot commits (SURVEY.md §7.2) — but the *monitoring* side of
the reference (the done-notification consumer,
``core/ProgressMonitor.java:97-133`` fed by the RabbitMQ done queue,
``orchestration/RabbitMqOrchestrationProvider.java:155-171``) maps
naturally onto ``readStream``: the append-only results table IS the
notification stream.  This module exposes it as one, for operators who
want live counters without polling the snapshot log:

- ``stream_results``      — file-source stream over committed results
                            snapshots (new snapshot dirs = new events)
- ``status_counts_stream``— tumbling-window per-status counters with a
                            watermark for late results
- ``run_to_memory``       — drain with ``trigger(availableNow=True)``
                            into an in-memory sink (the test/CLI path)

The watermark bounds state exactly like the reference's 5-minute done-
queue TTL bounds its unconsumed notifications.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the subset of result columns the monitor consumes (A2): everything else
# is pruned at the stream source.
RESULTS_STREAM_SCHEMA = (
    "job_id string, bulk_scan_id string, status string, batch_id int, ts double"
)


def stream_results(
    spark: SparkSession, path_glob: str, schema: str = RESULTS_STREAM_SCHEMA
) -> DataFrame:
    """File-source stream over results parquet snapshots.

    ``path_glob`` e.g. ``<store_root>/results/*`` — each committed
    snapshot directory becomes a new micro-batch of done-notifications.
    """
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(path_glob)
    )


def status_counts_stream(
    results: DataFrame,
    window_seconds: float = 60.0,
    watermark_seconds: float = 300.0,
) -> DataFrame:
    """A2 as a streaming aggregation: per-(window, status) counts.

    The virtual clock ``ts`` (seconds) becomes an event-time column; the
    watermark (default 300 s, mirroring the reference's 5-min done-queue
    TTL) lets late results from retried batches fold in while bounding
    state — NOTE: state is only actually dropped in ``update``/``append``
    output modes; ``complete`` mode (the in-memory test sink) retains it.
    """
    evt = results.withColumn("event_time", F.timestamp_seconds(F.col("ts")))
    return (
        evt.withWatermark("event_time", f"{int(watermark_seconds)} seconds")
        .groupBy(
            F.window("event_time", f"{int(window_seconds)} seconds").alias("win"),
            F.col("status"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            "status",
            "n",
        )
    )


def run_to_memory(
    counts: DataFrame,
    query_name: str = "progress_counts",
    timeout_s: float = 120.0,
    output_mode: str = "complete",
):
    """Drain all available input into an in-memory table and stop.

    Returns the finished StreamingQuery; read the result with
    ``spark.table(query_name)``.

    State-boundedness caveat: in ``complete`` output mode (the in-memory
    test/CLI sink) Spark IGNORES the watermark and retains all aggregation
    state — the 5-min-TTL analogy in ``status_counts_stream`` only holds
    in ``update``/``append`` modes, which is what a long-running sink must
    use (pass ``output_mode="update"``).
    """
    q = (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
