"""Streaming monitor (A2 as readStream): the committed results log
consumed as a done-notification stream with watermarked windowed counts."""

import pytest
from pyspark.sql import functions as F

from crawler_core_spark.streaming.progress import (
    run_to_memory,
    status_counts_stream,
    stream_results,
)


def test_streaming_status_counts(spark, store, tmp_path):
    rows = [
        # (job_id, bulk_scan_id, status, batch_id, ts)
        ("j1", "bs", "SUCCESS", 0, 5.0),
        ("j2", "bs", "SUCCESS", 0, 15.0),
        ("j3", "bs", "EMPTY", 0, 20.0),
        ("j4", "bs", "SUCCESS", 1, 65.0),
        ("j5", "bs", "ERROR", 1, 70.0),
    ]
    df = spark.createDataFrame(
        rows, "job_id string, bulk_scan_id string, status string, batch_id int, ts double"
    )
    # two commits -> two snapshot dirs, as the engine would produce
    store.write(df.filter(F.col("batch_id") == 0), "results", mode="append")
    store.write(df.filter(F.col("batch_id") == 1), "results", mode="append")

    src = stream_results(spark, f"{store.root}/results/*")
    counts = status_counts_stream(src, window_seconds=60.0)
    run_to_memory(counts, query_name="t_progress")

    got = {
        (r["window_start"].second + r["window_start"].minute * 60, r["status"]): r["n"]
        for r in spark.table("t_progress").collect()
    }
    assert got == {
        (0, "SUCCESS"): 2,
        (0, "EMPTY"): 1,
        (60, "SUCCESS"): 1,
        (60, "ERROR"): 1,
    }


def test_stateful_progress_stream_matches_batch_monitor(spark, store):
    """applyInPandasWithState per-scan progress: the streamed EMA with the
    reference alpha schedule must equal the batch ProgressMonitor fed the
    same done-rows in the same total order."""
    from crawler_core_spark.plans.monitor import ProgressMonitor
    from crawler_core_spark.streaming.stateful import progress_state_stream

    rows = [
        # (job_id, bulk_scan_id, status, batch_id, ts, crawl_pos)
        ("j1", "bs", "SUCCESS", 0, 5.0, 0),
        ("j2", "bs", "SUCCESS", 0, 5.0, 1),
        ("j3", "bs", "ERROR", 0, 5.0, 2),
        ("j4", "bs", "DEDUPED", 0, 5.0, None),
        ("j5", "bs", "SUCCESS", 1, 10.0, 3),
        ("j6", "bs", "EMPTY", 1, 10.0, 4),
        ("k1", "bs2", "SUCCESS", 0, 5.0, 0),
    ]
    schema = (
        "job_id string, bulk_scan_id string, status string, batch_id int, "
        "ts double, crawl_pos long"
    )
    df = spark.createDataFrame(rows, schema)
    store.write(df, "results", mode="append")

    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(f"{store.root}/results/*")
    )
    out = progress_state_stream(src)
    q = (
        out.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["bulk_scan_id"]: r for r in spark.table("t_state").collect()}

    # batch-side reference: same rows, same (ts, batch_id, crawl_pos) order
    mon = ProgressMonitor(expected_total=5)
    for _, _, status, _, ts, _ in sorted(
        [r for r in rows if r[1] == "bs" and r[2] != "DEDUPED"],
        key=lambda r: (r[4], r[3], r[5] if r[5] is not None else -1),
    ):
        mon.on_done(status, now=ts)
    assert got["bs"]["total_done"] == 5
    assert got["bs"]["ema"] == pytest.approx(mon.moving_average)
    assert got["bs"]["successful"] == 3 and got["bs"]["errors"] == 1
    assert got["bs2"]["total_done"] == 1
