"""Custom stateful streaming operator — per-bulk-scan progress state via
``applyInPandasWithState`` (the Spark primitive for operators the built-in
windowed aggregations can't express).

The reference's ProgressMonitor keeps MUTABLE per-scan state across
done-notifications: cumulative per-status counters + the exponential
moving average with its attempt-count-dependent alpha schedule
(``core/ProgressMonitor.java:97-133``: alpha = 0.1 once totalDone > 20,
else 2/(totalDone+1)).  A sequential recurrence like that EMA cannot be a
watermark-windowed aggregation (the alpha depends on the running count),
so it is exactly the ``applyInPandasWithState`` shape: the results log
streamed as done-notifications, grouped by ``bulk_scan_id``, with a
GroupState holding ``(total_done, ema, per-status counts)``.

Scale: state is O(#bulk scans) rows of a dozen scalars — the same "only
O(1) aggregates per scan reach the coordinator" property as the batch
monitor (SURVEY.md §4 item 5). Timeouts bound state like the reference's
5-minute done-queue TTL (``RabbitMqOrchestrationProvider.java:46-49``).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from crawler_core_spark import STATUS_NAMES

# state: total_done, ema, last_ts, then one cumulative count per status
STATE_SCHEMA = (
    "total_done LONG, ema DOUBLE, last_ts DOUBLE, "
    + ", ".join(f"n_{s.lower()} LONG" for s in STATUS_NAMES)
)
OUTPUT_SCHEMA = (
    "bulk_scan_id STRING, total_done LONG, ema DOUBLE, successful LONG, "
    "errors LONG"
)

_ERROR_IDX = [i for i, s in enumerate(STATUS_NAMES) if s not in ("SUCCESS", "DEDUPED", "TO_BE_EXECUTED", "RUNNING", "EMPTY")]


def progress_state_fn(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """One GroupState per bulk_scan_id; replays the reference's exact
    EMA/alpha recurrence over the incoming done-rows ordered by
    ``(ts, batch_id, crawl_pos)`` — the same total order the batch
    monitor uses, so both paths converge to identical numbers."""
    if state.hasTimedOut:
        # done-queue TTL analogue: drop idle scan state
        state.remove()
        return
    if state.exists:
        vals = list(state.get)
    else:
        vals = [0, -1.0, 0.0] + [0] * len(STATUS_NAMES)
    total_done, ema, last_ts = int(vals[0]), float(vals[1]), float(vals[2])
    counts = [int(v) for v in vals[3:]]
    sidx = {s: i for i, s in enumerate(STATUS_NAMES)}

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(
        ["ts", "batch_id", "crawl_pos"], na_position="first", kind="mergesort"
    )
    for ts, status in zip(rows["ts"], rows["status"]):
        if status == "DEDUPED":  # never went through a worker (no notification)
            continue
        counts[sidx[status]] += 1
        total_done += 1
        alpha = 0.1 if total_done > 20 else 2.0 / (total_done + 1)
        duration = float(ts) - last_ts
        last_ts = float(ts)
        ema = alpha * duration + (1 - alpha) * ema

    state.update(tuple([total_done, ema, last_ts] + counts))
    state.setTimeoutDuration(300_000)  # 5-min TTL, reference done-queue
    errors = sum(counts[i] for i in _ERROR_IDX)
    yield pd.DataFrame(
        {
            "bulk_scan_id": [key[0]],
            "total_done": [total_done],
            "ema": [ema],
            "successful": [counts[sidx["SUCCESS"]]],
            "errors": [errors],
        }
    )


def progress_state_stream(results: DataFrame) -> DataFrame:
    """results stream (job_id, bulk_scan_id, status, batch_id, ts,
    crawl_pos) -> per-bulk-scan running progress rows."""
    return (
        results.groupBy("bulk_scan_id")
        .applyInPandasWithState(
            progress_state_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
