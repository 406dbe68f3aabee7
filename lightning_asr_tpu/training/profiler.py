"""Per-hook wall-time profiler — the reference's ``profiler="simple"``
(``/root/reference/train.py:243``) prints a per-hook timing table at fit
end.  Also exposes jax.profiler trace capture for deep TPU profiling."""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Optional


class SimpleProfiler:
    def __init__(self):
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)
        self._start = time.monotonic()

    @contextmanager
    def profile(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._totals[name] += dt
            self._counts[name] += 1

    def summary(self) -> str:
        total_elapsed = time.monotonic() - self._start
        lines = [
            "",
            "Profiler Report (simple)",
            f"{'Action':<32}{'Mean (s)':>12}{'Calls':>10}{'Total (s)':>12}{'%':>8}",
            "-" * 74,
        ]
        for name in sorted(self._totals, key=self._totals.get, reverse=True):
            tot = self._totals[name]
            cnt = self._counts[name]
            lines.append(
                f"{name:<32}{tot / cnt:>12.5f}{cnt:>10}{tot:>12.3f}"
                f"{100.0 * tot / max(total_elapsed, 1e-9):>8.1f}"
            )
        lines.append("-" * 74)
        lines.append(f"{'TOTAL ELAPSED':<32}{'':>12}{'':>10}{total_elapsed:>12.3f}")
        return "\n".join(lines)


@contextmanager
def jax_trace(log_dir: Optional[str]):
    """Capture a jax.profiler device trace (view in TensorBoard/Perfetto)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
