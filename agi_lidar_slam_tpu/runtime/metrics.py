"""Structured observability: per-scan metrics to JSONL + stage timers.

The reference's observability is printf + TicToc wall-clock timers
(A-LOAM tic_toc.h:10-24; S-FAST_LIO omp_get_wtime prints "Whole mapping
time(ms)" laserMapping.cpp:792-796) — nothing machine-readable. Here every
scan appends one JSON line (residual counts, convergence, timing, map
occupancy) so runs are diffable and regressions bisectable.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional


class StageTimer:
    """Wall-clock stage timing (TicToc analog); accumulates per-stage totals."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.last_ms: float = 0.0  # duration of the most recent stage (ms)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            self.last_ms = dt * 1e3

    def summary(self) -> Dict[str, float]:
        return {
            k: {"total_s": round(v, 4), "mean_ms": round(v / self.counts[k] * 1e3, 3),
                "count": self.counts[k]}
            for k, v in self.totals.items()
        }


class MetricsWriter:
    """Append-only JSONL metrics sink. Use log_scan per processed sweep."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f = open(path, "a") if path else None
        self.n = 0

    def log(self, record: Dict[str, Any]) -> None:
        self.n += 1
        if self._f is not None:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()

    def log_scan(self, frame: int, result, wall_ms: float, extra: Dict[str, Any] | None = None):
        """Record one engine step (works with ScanResult / LioResult / LivoxResult)."""
        rec: Dict[str, Any] = {"frame": int(frame), "wall_ms": round(wall_ms, 3)}
        stats = getattr(result, "stats", None)
        if stats is not None:
            rec.update(
                n_corner=int(stats.n_corner), n_surf=int(stats.n_surf),
                rms=float(stats.rms), degenerate=bool(stats.degenerate),
            )
        if hasattr(result, "n_matches"):
            rec.update(n_matches=int(result.n_matches), rms=float(result.rms))
        if hasattr(result, "n_dropped"):
            rec["n_dropped"] = int(result.n_dropped)  # map inserts lost (full chains)
        pose = getattr(result, "pose", None)
        if pose is not None:
            rec["t"] = [round(float(x), 4) for x in pose.t]
        if extra:
            rec.update(extra)
        self.log(rec)

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
