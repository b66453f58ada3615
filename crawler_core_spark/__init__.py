"""crawler_core_spark — a PySpark-native URL-frontier / fetch-scheduling engine.

A from-scratch reimplementation of the *semantics* of tls-attacker/Crawler-Core
(reference at /root/reference, v1.5.1-SNAPSHOT) on an idiomatic Spark
DataFrame architecture:

- the RabbitMQ job queue      -> a *frontier* table + rank-over-window batch selection
- MongoDB result collections  -> append-only *results* table with atomic batch commits
- Quartz publish job          -> one declarative DataFrame pipeline (parse -> dns ->
                                 denylist -> status split -> counters)
- worker thread pools         -> Spark task parallelism; timeouts are data (deadline col)
- ack-until-persisted         -> multi-table atomic commit log (Iceberg-style snapshots
                                 over parquet, see storage.py)

Extensions mandated by BASELINE.json (north_rule), not present in the reference:
partitioned-Bloom URL-seen set, per-host politeness + robots.txt scheduling,
priority queue, image payload invariants (PSNR/caption).
"""

__version__ = "0.1.0"

JOB_STATUSES = [
    # constant/JobStatus.java:15-43 (name, is_error)
    ("TO_BE_EXECUTED", False),
    ("RUNNING", False),
    ("UNRESOLVABLE", True),
    ("RESOLUTION_ERROR", True),
    ("DENYLISTED", True),
    ("SUCCESS", False),
    ("EMPTY", False),
    ("ERROR", True),
    ("SERIALIZATION_ERROR", True),
    ("CANCELLED", True),
    ("INTERNAL_ERROR", True),
    ("CRAWLER_ERROR", True),
    # [EXT] north_rule robots enforcement (no reference analogue; FIXTURES.md §5)
    ("ROBOTS_BLOCKED", True),
    # [EXT] north_rule URL-seen dedup: a job whose canonical URL was already
    # fetched reaches this terminal state instead of being fetched again.
    ("DEDUPED", False),
]

ERROR_STATUSES = [name for name, is_err in JOB_STATUSES if is_err]
STATUS_NAMES = [name for name, _ in JOB_STATUSES]
