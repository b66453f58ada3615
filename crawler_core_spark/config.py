"""Scan-run configuration (ScanConfig / BulkScanInfo semantics).

Mirrors ``data/ScanConfig.java:22-57`` (scannerDetail, reexecutions,
timeout, parallelProbes, excludedProbes) and ``data/BulkScanInfo.java:17-33``
(bulkScanId + scanConfig + isMonitored serialized into every queued job).
Defaults follow ``config/ControllerCommandConfig.java:41-72``:
reexecutions=3, parallelProbes=1, scanDetail=NORMAL, excludedProbes=[].

In the dataflow engine the config rides every frontier row as one struct
column (constant within a bulk scan -> run-length-encoded to ~nothing in
parquet, broadcast-cheap in joins), which is the Spark realization of the
reference's per-job ``BulkScanInfo`` serialization that
``ControllerTest.java:54-121`` pins (excludedProbes + parallelProbes must
arrive on each queued job).

Reexecution semantics: "The number of times to retry failed scans"
(``ScanConfig.java:41``). The engine requeues a job whose attempt failed
with a retryable error status (ERROR, CRAWLER_ERROR) until
``attempt == reexecutions``; every attempt persists its own result row
(append log, O2 latest-wins), matching the reference where each execution
persists.  INTERNAL_ERROR is different: nothing is persisted and the job
is redelivered WITHOUT consuming an attempt (``core/Worker.java:108-112``:
interrupted -> no persist -> unacked redelivery).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference default scan timeout: 840_000 ms (WorkerCommandConfig.java:38-44)
DEFAULT_SCAN_TIMEOUT_MS = 840_000.0

# statuses that consume a reexecution attempt (retryable scan failures)
RETRYABLE_STATUSES = ("ERROR", "CRAWLER_ERROR")

SCAN_CONFIG_SCHEMA = (
    "scanner_detail: string, reexecutions: int, timeout_ms: double, "
    "parallel_probes: int, excluded_probes: array<string>"
)


@dataclass(frozen=True)
class ScanConfig:
    scanner_detail: str = "NORMAL"          # ControllerCommandConfig.java:46
    reexecutions: int = 3                   # ControllerCommandConfig.java:57
    timeout_ms: float = DEFAULT_SCAN_TIMEOUT_MS
    parallel_probes: int = 1                # ControllerCommandConfig.java:72
    excluded_probes: tuple[str, ...] = ()

    def as_column(self) -> Column:
        """The config as a constant struct column (BulkScanInfo on each job)."""
        probes = (
            F.array(*[F.lit(p) for p in self.excluded_probes])
            if self.excluded_probes
            else F.array().cast("array<string>")
        )
        return F.struct(
            F.lit(self.scanner_detail).alias("scanner_detail"),
            F.lit(int(self.reexecutions)).alias("reexecutions"),
            F.lit(float(self.timeout_ms)).alias("timeout_ms"),
            F.lit(int(self.parallel_probes)).alias("parallel_probes"),
            probes.alias("excluded_probes"),
        )

    def as_dict(self) -> dict:
        return {
            "scanner_detail": self.scanner_detail,
            "reexecutions": int(self.reexecutions),
            "timeout_ms": float(self.timeout_ms),
            "parallel_probes": int(self.parallel_probes),
            "excluded_probes": list(self.excluded_probes),
        }


@dataclass(frozen=True)
class BulkScanInfo:
    """data/BulkScanInfo.java:17-33 — the worker-facing scan identity."""
    bulk_scan_id: str
    scan_config: ScanConfig = field(default_factory=ScanConfig)
    monitored: bool = False
    notify_url: str | None = None
