"""Host-load self-measurement for benchmarks.

This sandbox is a Firecracker guest on a shared host: CPU steal bursts
inflate wall-clock timings unpredictably (VERDICT r2 "what's wrong" #1
— the round-2 bench record mis-reported in both directions because
runs carried no evidence of host conditions). Every timed run now
records the guest-wide steal%% over its own window, so a reader can
separate engine regressions from host noise without re-running.
"""
from __future__ import annotations

import time


def cpu_snapshot() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from /proc/stat's cpu line."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError, IndexError):
        return (0, 0)


def steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    """Steal%% of total CPU time between two snapshots (0.0 if the
    window is empty or /proc/stat was unreadable)."""
    dt = after[0] - before[0]
    ds = after[1] - before[1]
    if dt <= 0:
        return 0.0
    return round(100.0 * ds / dt, 2)


class TimedRuns:
    """Collect (elapsed_sec, steal_pct) per run; expose best + detail."""

    def __init__(self) -> None:
        self.secs: list[float] = []
        self.steals: list[float] = []

    def run(self, fn):
        snap = cpu_snapshot()
        t0 = time.time()
        result = fn()
        dt = time.time() - t0
        self.secs.append(round(dt, 3))
        self.steals.append(steal_pct(snap, cpu_snapshot()))
        return result

    @property
    def best(self) -> float:
        return min(self.secs)

    def detail(self) -> dict:
        return {"runs_sec": self.secs, "runs_steal_pct": self.steals}
