"""Structured per-stage wall-clock timers.

The reference only had ad-hoc commented-out prints
(scan_matching_odometry_nodelet.cpp:120-128); here timing is a first-class
observable feeding the scans/sec and LM ms/iter benchmark metrics.
"""

import collections
import contextlib
import os
import time


@contextlib.contextmanager
def device_trace(label="dgs"):
    """jax.profiler trace scope, enabled by DGS_TRACE=<output dir>.

    Produces TensorBoard-loadable device traces for kernel-level analysis
    (the deep-profiling layer above the wall-clock StageTimer).
    """
    out = os.environ.get("DGS_TRACE")
    if not out:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(out, label)):
        yield


class StageTimer:
    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def reset(self):
        """Clear accumulated stats (e.g. after a compile-warmup phase, so
        means reflect steady-state timings only)."""
        self.totals.clear()
        self.counts.clear()

    def mean_ms(self, name):
        c = self.counts[name]
        return 1000.0 * self.totals[name] / c if c else 0.0

    def summary(self):
        return {
            name: {
                "count": self.counts[name],
                "total_s": round(self.totals[name], 4),
                "mean_ms": round(self.mean_ms(name), 3),
            }
            for name in sorted(self.totals)
        }
