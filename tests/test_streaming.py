"""Streaming monitor (A2 as readStream): the committed results log
consumed as a done-notification stream with watermarked windowed counts."""

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
