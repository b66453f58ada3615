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

    def on_batch_counts(self, counts: dict, now: float) -> None:
        """Batch update from per-status COUNTS — the O(1)-driver form the
        engine feeds (the counts are already in hand from the results
        write's Observation; expanding them into an O(batch) status list
        was the round-3 scale flag).

        Mathematically identical to calling ``on_done`` once per row at
        the same ``now``: the first row contributes duration = now -
        last_time, every subsequent row duration 0, so
        ``ma_m = ma_1 * prod_{i=2..m} (1 - alpha(total+i))`` — and the
        alpha schedule makes that product closed-form:
        ``(1-alpha(t)) = (t-1)/(t+1)`` for t <= 20 telescopes to
        ``(lo-1)*lo / (hi*(hi+1))``; for t > 20 it is ``0.9^count``.
        O(1) regardless of batch size."""
        m = int(sum(counts.values()))
        if m == 0:
            return
        for s, k in counts.items():
            self.status_counts[s] = self.status_counts.get(s, 0) + int(k)
        t1 = self.total_done + 1
        a1 = 0.1 if t1 > 20 else 2.0 / (t1 + 1)
        ma = a1 * (now - self.last_time) + (1 - a1) * self.moving_average
        lo, hi = self.total_done + 2, self.total_done + m
        if lo <= hi:
            small_hi = min(hi, 20)
            if lo <= small_hi:  # telescoped (t-1)/(t+1) run, t in [lo, small_hi]
                ma *= (lo - 1) * lo / (small_hi * (small_hi + 1))
            big = hi - max(lo - 1, 20)
            if big > 0:  # the t > 20 plateau: constant alpha 0.1
                ma *= 0.9**big
        self.total_done += m
        self.last_time = now
        self.moving_average = ma

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
