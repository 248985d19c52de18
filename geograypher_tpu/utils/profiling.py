"""First-class tracing/profiling (SURVEY.md §5: the reference has only
tqdm bars and ad-hoc time.time() deltas; this framework makes stage timing
and device traces a module).

Usage::

    from geograypher_tpu.utils.profiling import stage_timer, device_trace

    with stage_timer("aggregate"):
        ...

    with device_trace("/tmp/jax-trace"):      # opens in TensorBoard/XProf
        run_pipeline()

    print(stage_timer.report())
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict

logger = logging.getLogger("geograypher_tpu.profiling")


class _StageTimer:
    """Accumulating named wall-clock stage timer."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, log: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if log:
                logger.info("%s: %.1f ms", name, dt * 1e3)

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def report(self) -> str:
        lines = ["stage                          total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:30s} {t:8.3f} {c:7d} {t / c * 1e3:9.2f}")
        return "\n".join(lines)


stage_timer = _StageTimer()


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace scope (viewable in TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up on the device trace timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
