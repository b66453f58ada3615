"""Progress monitoring (A2-A5) — driver-side over the tiny counters table.

Mirrors ``core/ProgressMonitor.java``:
- cumulative per-status counters (A2, BulkScanJobCounters.java:33-41)
- global average duration (A3, ProgressMonitor.java:106-107)
- EMA + ETA with the reference's exact alpha schedule (A4, :108-114):
  alpha = 0.1 once totalDone > 20, else 2/(totalDone+1)
- final rollup (A5, :166-175) and the completion condition
  totalDone == expectedTotal (:134-136).

All inputs are O(1)-rows-per-batch aggregates; nothing O(frontier) ever
reaches the driver (SURVEY.md §4 item 5).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ProgressMonitor:
    expected_total: int
    total_done: int = 0
    moving_average: float = -1.0  # java init: movingAverageDuration = -1
    last_time: float = 0.0
    start_time: float = 0.0
    status_counts: dict = field(default_factory=dict)

    def on_done(self, status: str, now: float) -> None:
        """One done-notification (ProgressMonitor.java:97-133), virtual time."""
        self.status_counts[status] = self.status_counts.get(status, 0) + 1
        self.total_done += 1
        alpha = 0.1 if self.total_done > 20 else 2.0 / (self.total_done + 1)
        duration = now - self.last_time
        self.last_time = now
        self.moving_average = alpha * duration + (1 - alpha) * self.moving_average

    def on_batch(self, statuses: list[str], now: float) -> None:
        for s in statuses:
            self.on_done(s, now)

    @property
    def global_average(self) -> float:
        return (self.last_time - self.start_time) / self.total_done if self.total_done else 0.0

    @property
    def eta(self) -> float:
        return (self.expected_total - self.total_done) * self.moving_average

    @property
    def finished(self) -> bool:
        return self.total_done == self.expected_total

    def final_rollup(self) -> dict:
        """A5 — BulkScan finalization fields (ProgressMonitor.java:166-175)."""
        return {
            "finished": True,
            "successful_scans": self.status_counts.get("SUCCESS", 0),
            "job_status_counters": dict(self.status_counts),
        }
