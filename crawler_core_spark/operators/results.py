"""Results-side operators: latest-wins retrieval (O2), lookup by target (J5),
and the write-path status invariant (T6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_result_per_job(results: DataFrame) -> DataFrame:
    """O2 — most-recent-result-wins, mirroring
    ``persistence/MongoPersistenceProvider.java:362-370`` (sort timestamp
    desc, limit 1 per job) / ``dummy/DummyPersistenceProvider.java:53-59``.
    Tie-break on batch_id then crawl_pos for a total order."""
    order = [F.desc(c) for c in ("ts", "batch_id", "crawl_pos") if c in results.columns]
    w = Window.partitionBy("job_id").orderBy(*order)
    return (
        results.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def results_for_target(results: DataFrame, target: str) -> DataFrame:
    """J5 — $or hostname/ip lookup (MongoPersistenceProvider.java:292-298)."""
    return results.filter((F.col("hostname") == target) | (F.col("ip") == target))


def assert_status_invariant(results: DataFrame, job_status_col: str = "status", result_status_col: str = "result_status") -> None:
    """T6 — scanResult.status must equal jobDescription.status
    (MongoPersistenceProvider.java:250-258); gate before commit."""
    if result_status_col not in results.columns:
        return
    bad = results.filter(F.col(job_status_col) != F.col(result_status_col)).count()
    if bad:
        raise ValueError(f"status invariant violated on {bad} rows")
